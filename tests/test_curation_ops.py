"""Unit contracts for the web-corpus curation operators (q110-q114):
boilerplate n-gram audit, Gopher repetition filters, benchmark
decontamination, hash splits, and melt. Value-exactness vs the DuckDB
oracles is pinned by the registered queries; these tests pin the edge
cases the synthetic corpus only hits probabilistically."""

import hashlib

import pyarrow as pa
import ray.data as rd


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _md5_frac(i: int) -> float:
    return int(
        hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8], 16
    ) / float(1 << 32)


def test_repetition_stats_known_values():
    from barks_ocr_ray.functions.curation import repetition_stats

    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                [
                    "a a a b",  # bigrams: 'a a' x2, 'a b' -> top 2/3
                    "x y",  # one bigram
                    "solo",  # < 2 tokens: excluded
                    "",  # empty: excluded
                    "  C c  c ",  # case-fold + edge whitespace
                ]
            )
        ).take_all()
    }
    assert set(out) == {0, 1, 4}
    d0 = out[0]
    assert d0["n_tokens"] == 4 and d0["top_bigram_n"] == 2
    assert d0["dup_token_frac"] == 0.5  # 2 distinct / 4
    assert d0["top_bigram_frac"] == 0.6667  # 2 / 3
    d1 = out[1]
    assert d1["top_bigram_n"] == 1 and d1["dup_token_frac"] == 0.0
    d4 = out[4]  # 'c c c' after fold/split
    assert d4["n_tokens"] == 3 and d4["top_bigram_n"] == 2
    assert d4["dup_token_frac"] == 0.6667  # 1 distinct / 3


def test_repetition_stats_multi_doc_isolation():
    """Bigram runs must not leak across doc boundaries within a block:
    doc 0 ends with 'z' and doc 1 starts with 'z' — 'z z' is no one's
    bigram."""
    from barks_ocr_ray.functions.curation import repetition_stats

    out = {
        r["doc_id"]: r
        for r in repetition_stats(_docs(["p z", "z q"])).take_all()
    }
    assert out[0]["top_bigram_n"] == 1 and out[1]["top_bigram_n"] == 1


def test_boilerplate_ngram_stats_flags_shared_trigram():
    from barks_ocr_ray.functions.curation import boilerplate_ngram_stats

    boiler = "click here now"
    texts = [f"{boiler} doc number {i}" for i in range(4)] + [
        "totally unique words only here",
        "tiny doc",  # < 3 tokens: excluded
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngram_stats(
            _docs(texts), min_docs=4
        ).take_all()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    for i in range(4):
        # the shared 5-token prefix 'click here now doc number'
        # carries 3 trigrams present in all 4 docs
        assert out[i]["n_boiler"] == 3, out[i]
        assert out[i]["n_grams"] == 4  # 6 tokens
        assert out[i]["boiler_frac"] == 0.75
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_frac"] == 0.0


def test_boilerplate_ngram_stats_empty_frequent_set():
    """min_docs above any df: the no-frequent-grams path still emits
    every doc with zeros (typed, not schema-less)."""
    from barks_ocr_ray.functions.curation import boilerplate_ngram_stats

    out = boilerplate_ngram_stats(
        _docs(["one two three", "four five six"]), min_docs=99
    ).take_all()
    assert len(out) == 2
    assert all(r["n_boiler"] == 0 and r["boiler_frac"] == 0.0 for r in out)


def test_boilerplate_counts_occurrences_not_distinct():
    """A doc repeating a boilerplate trigram counts every occurrence."""
    from barks_ocr_ray.functions.curation import boilerplate_ngram_stats

    rep = "buy now today"
    texts = [f"{rep} filler {rep}"] + [f"{rep} pad {i}" for i in range(3)]
    out = {
        r["doc_id"]: r
        for r in boilerplate_ngram_stats(_docs(texts), min_docs=4).take_all()
    }
    # doc 0: tokens = 7 -> 5 trigrams, 'buy now today' occurs twice
    assert out[0]["n_grams"] == 5 and out[0]["n_boiler"] == 2


def test_decontaminate_flags_shared_window():
    from barks_ocr_ray.functions.curation import decontaminate

    # deterministic split: find ids on each side of the 0.1 cut
    hold_id = next(i for i in range(1000) if _md5_frac(i) < 0.1)
    train_ids = [i for i in range(1000) if _md5_frac(i) >= 0.1][:2]
    span = "one two three four five six seven eight"
    texts_by_id = {
        hold_id: f"benchmark prompt {span} answer",
        train_ids[0]: f"training doc contains {span} verbatim copy",
        train_ids[1]: "clean training doc with no overlap at all nine",
    }
    ids = sorted(texts_by_id)
    out = decontaminate(
        _docs([texts_by_id[i] for i in ids], ids=ids),
        holdout_frac=0.1,
        window=8,
    ).take_all()
    assert {r["doc_id"] for r in out} == {train_ids[0]}
    assert out[0]["n_hits"] == 1  # exactly the 8-token span


def test_decontaminate_empty_holdout_is_typed_empty():
    from barks_ocr_ray.functions.curation import decontaminate

    train_id = next(i for i in range(1000) if _md5_frac(i) >= 0.1)
    ds = decontaminate(
        _docs(["some training words " * 4], ids=[train_id]),
        holdout_frac=0.1,
        window=8,
    )
    assert ds.count() == 0
    assert set(ds.schema().names) == {"doc_id", "n_hits"}


def test_hash_split_stats_partition_totals():
    from barks_ocr_ray.functions.curation import hash_split_stats

    n = 300
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
            "n_chars": pa.array([10] * n, pa.int64()),
        }
    )
    rows = hash_split_stats(rd.from_arrow(t)).take_all()
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["chars"] for r in rows) == 10 * n
    # replay the assignment rule for one cell
    exp_train_en = sum(
        1 for i in range(n) if i % 2 and _md5_frac(i) < 0.8
    )
    got = {
        (r["split"], r["lang"]): r["n_docs"] for r in rows
    }
    assert got[("train", "en")] == exp_train_en


def test_melt_reshape_round_trip():
    from barks_ocr_ray.functions.relational import melt

    t = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "a": pa.array([1.5, 2.5], pa.float64()),
            "b": pa.array([10, 20], pa.int64()),
        }
    )
    rows = melt(rd.from_arrow(t), ["k"], ["a", "b"]).take_all()
    assert len(rows) == 4
    got = {(r["k"], r["metric"]): r["value"] for r in rows}
    assert got[(1, "a")] == 1.5 and got[(2, "b")] == 20.0
    assert all(isinstance(v, float) for v in got.values())


def test_token_budget_sample_matches_sequential_replay():
    """The distributed ordered prefix sum (bucketed offsets + local
    cumsum) equals a sequential walk in (u, doc_id) order, including
    the budget boundary and stratum isolation."""
    from barks_ocr_ray.functions.curation import token_budget_sample

    n = 120
    ids = list(range(n))
    langs = ["en" if i % 3 else "de" for i in ids]
    texts = ["tok " * (5 + i % 7) for i in ids]  # 5..11 tokens
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    budget = 100
    got = {
        (r["lang"], r["doc_id"])
        for r in token_budget_sample(
            rd.from_arrow(t), budget=budget, n_buckets=8
        ).take_all()
    }
    # sequential replay
    exp = set()
    for lang in set(langs):
        docs = sorted(
            (i for i in ids if langs[i] == lang),
            key=lambda i: (_md5_frac(i), i),
        )
        cum = 0
        for i in docs:
            cum += 5 + i % 7
            if cum <= budget:
                exp.add((lang, i))
            else:
                break
    assert got == exp and len(exp) > 3


def test_clean_corpus_gates():
    """Each gate drops exactly its target: the exact-dup loser, the
    repetition outlier, the contaminated doc; the clean doc survives."""
    from barks_ocr_ray.functions.curation import clean_corpus

    hold_id = next(i for i in range(1000) if _md5_frac(i) < 0.1)
    train_ids = [i for i in range(1000) if _md5_frac(i) >= 0.1][:5]
    span = "alpha beta gamma delta epsilon zeta eta theta"
    # >= 11 tokens so a unique bigram stays under the 0.1 gate
    dup_text = (
        "this exact training document appears fully twice across the "
        "whole corpus body"
    )
    texts_by_id = {
        hold_id: f"benchmark {span} suffix",
        train_ids[0]: (
            "a clean document with mostly distinct words plus several "
            "more of them"
        ),
        train_ids[1]: dup_text,
        train_ids[2]: dup_text,  # exact-dup loser (higher id)
        train_ids[3]: "spam spam spam spam spam spam ham",  # repetition
        train_ids[4]: f"copied prompt {span} trailing words",  # contaminated
    }
    ids = sorted(texts_by_id)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts_by_id[i] for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
        }
    )
    kept = {
        r["doc_id"]
        for r in clean_corpus(
            rd.from_arrow(t), holdout_frac=0.1, window=8
        ).take_all()
    }
    assert train_ids[0] in kept
    assert min(train_ids[1], train_ids[2]) in kept  # dedup winner stays
    assert max(train_ids[1], train_ids[2]) not in kept
    assert train_ids[3] not in kept  # dup_token_frac 6/7 > 0.7... via gate
    assert train_ids[4] not in kept  # shares the 8-token span
    assert hold_id not in kept  # holdout never in the training output


def test_except_all_multiplicity_clamp():
    """q121's emit rule: max(0, n_left - n_right) copies — right-side
    surplus clamps to zero, right-side-missing keys keep full count."""
    import numpy as np
    import pyarrow.compute as pc

    # replay the emit kernel directly (the distributed plumbing is
    # pinned by the q121 oracle; this pins the clamp arithmetic)
    t = pa.table(
        {
            "o_orderpriority": pa.array(["a", "b", "c"]),
            "n_left": pa.array([5, 2, 3], pa.int64()),
            "n_right": pa.array([2, 7, None], pa.int64()),
        }
    )
    nl = t.column("n_left").to_numpy(zero_copy_only=False)
    nr = pc.fill_null(t.column("n_right"), pa.scalar(0, pa.int64()))
    reps = np.maximum(nl - nr.to_numpy(zero_copy_only=False), 0)
    assert list(reps) == [3, 0, 3]


def test_hourly_gap_audit_known_values():
    """q120 semantics on crafted events: same-hour events dedup to one
    active hour, gaps = span - active, single-hour user has zero gaps.
    (Cross-block partial merge is exercised by the sf-corpus oracle,
    whose events span many read blocks.)"""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from barks_ocr_ray.pipelines.queries import q120_hourly_gap_audit

    h = 3_600_000_000  # one hour in us
    rows = [
        (1, 0 * h + 5),     # user 1, hour 0
        (1, 0 * h + 99),    # same hour, different event
        (1, 2 * h + 1),     # hour 2 -> span 3, active 2, gap 1
        (2, 10 * h),        # user 2: single hour
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    sf_dir = tempfile.mkdtemp(prefix="q120_sf_")
    pq.write_table(t, os.path.join(sf_dir, "events.parquet"))
    out = {r["user_id"]: r for r in q120_hourly_gap_audit(sf_dir).take_all()}
    assert out[1]["span_hours"] == 3
    assert out[1]["active_hours"] == 2
    assert out[1]["gap_hours"] == 1
    assert out[2] == {
        "user_id": 2,
        "span_hours": 1,
        "active_hours": 1,
        "gap_hours": 0,
    }
    shutil.rmtree(sf_dir)


def test_broadcast_gate_fallbacks_match(monkeypatch):
    """The broadcast and distributed-join paths of the q110/q115 gates
    produce identical results: force the join fallback by zeroing the
    caps and compare against the broadcast path."""
    import barks_ocr_ray.functions.curation as cur

    boiler = "click here now"
    texts = [f"{boiler} doc number {i}" for i in range(4)] + [
        "totally unique words only here today friends",
    ]
    broadcast = sorted(
        map(dict, cur.boilerplate_ngram_stats(_docs(texts), min_docs=4).take_all()),
        key=lambda r: r["doc_id"],
    )
    monkeypatch.setattr(cur, "BROADCAST_FREQ_CAP", 0)
    joined = sorted(
        map(dict, cur.boilerplate_ngram_stats(_docs(texts), min_docs=4).take_all()),
        key=lambda r: r["doc_id"],
    )
    assert broadcast == joined

    # contamination anti-join: broadcast vs left_outer+null-filter
    hold_id = next(i for i in range(1000) if _md5_frac(i) < 0.1)
    train_ids = [i for i in range(1000) if _md5_frac(i) >= 0.1][:2]
    span = "one two three four five six seven eight"
    texts_by_id = {
        hold_id: f"benchmark prompt {span} answer",
        train_ids[0]: f"training doc contains {span} verbatim copy here",
        train_ids[1]: (
            "clean training doc with many more distinct tokens in the "
            "body text"
        ),
    }
    ids = sorted(texts_by_id)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts_by_id[i] for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
        }
    )
    kept_b = {
        r["doc_id"]
        for r in cur.clean_corpus(
            rd.from_arrow(t), holdout_frac=0.1, window=8
        ).take_all()
    }
    monkeypatch.setattr(cur, "BROADCAST_CONTAM_CAP", 0)
    kept_j = {
        r["doc_id"]
        for r in cur.clean_corpus(
            rd.from_arrow(t), holdout_frac=0.1, window=8
        ).take_all()
    }
    assert kept_b == kept_j
    assert train_ids[1] in kept_b and train_ids[0] not in kept_b


def test_distributed_kmeans_equals_sequential_golden():
    """q126's distributed Lloyd's rounds are bit-equal to the plain
    numpy replay on a crafted multi-block corpus (micro-int arithmetic
    leaves no float order-dependence anywhere)."""
    import numpy as np

    from barks_ocr_ray.functions.ann import distributed_kmeans
    from barks_ocr_ray.golden_dedup import golden_kmeans

    rngless = [
        [float((i * 7 + d * 3) % 11) / 11.0 - 0.5 for d in range(8)]
        for i in range(40)
    ]
    t = pa.table(
        {
            "vec_id": pa.array(list(range(40)), pa.int64()),
            "embedding": pa.array(rngless, pa.list_(pa.float32())),
        }
    )
    got = sorted(
        map(
            dict,
            distributed_kmeans(
                rd.from_arrow(t).repartition(4), k=3, rounds=3
            ).take_all(),
        ),
        key=lambda r: (r["cluster"], r["dim"]),
    )
    exp = golden_kmeans(t, k=3, rounds=3).to_pylist()
    exp = sorted(exp, key=lambda r: (r["cluster"], r["dim"]))
    assert got == exp
    assert sum(r["n"] for r in got) // 8 == 40  # n repeated per dim


def test_boilerplate_fallback_join_matches_broadcast(monkeypatch):
    """Force the fallback (df-window join + heavy-hitter broadcast
    split) by zeroing the broadcast gate and shrinking the df window:
    results must be identical to the fused broadcast path."""
    from barks_ocr_ray.functions import curation

    boiler = "click here now"
    texts = [f"{boiler} doc number {i}" for i in range(6)] + [
        "totally unique words only here",
    ]
    want = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"], r["boiler_frac"])
        for r in curation.boilerplate_ngram_stats(
            _docs(texts), min_docs=4
        ).take_all()
    }
    monkeypatch.setattr(curation, "BROADCAST_FREQ_CAP", 0)
    # cap 5 puts df=6 grams in the broadcast top and none in the window;
    # cap 99 puts everything in the window join — both must agree
    for cap in (5, 99):
        monkeypatch.setattr(curation, "FREQ_TOP_DF_CAP", cap)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_boiler"], r["boiler_frac"])
            for r in curation.boilerplate_ngram_stats(
                _docs(texts), min_docs=4
            ).take_all()
        }
        assert got == want, cap
