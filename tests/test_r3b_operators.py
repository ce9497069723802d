"""Unit contracts for the round-3 training-data operators: PII
redaction (cleaning.pii_redact), benchmark decontamination
(contamination.*), shuffled sequence packing (packing.sequence_pack —
the distributed two-level prefix sum), and epoch-weighted corpus
mixing (packing.mix_corpora). Value-exactness vs SQL is pinned by the
q60-q63 oracles; these pin the semantic edges the synthetic corpus
can't reach (stage ordering, empty eval sets, budget boundaries,
integer weights)."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(rows, id_type=pa.int64()):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], id_type),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


# --- read planning ---------------------------------------------------------


def test_read_table_small_file_never_emits_empty_blocks(tmp_path):
    """A small parquet file must not be shredded into empty read blocks
    (any map over an empty block emits a schema-less table — the
    RefBundle warning class), and the scanner schema must carry no
    pandas metadata (unhashable pa.Schema defeats shuffle schema
    dedup)."""
    import pandas as pd
    import ray

    from barks_ocr_ray.functions.relational import read_table

    df = pd.DataFrame({"doc_id": range(7), "text": ["x"] * 7})
    df.to_parquet(tmp_path / "documents.parquet")
    mat = read_table(str(tmp_path), "documents").materialize()
    seen = 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            t = ray.get(ref)
            assert t.num_rows > 0
            assert not t.schema.metadata
            seen += t.num_rows
    assert seen == 7


# --- PII redaction ---------------------------------------------------------


def test_pii_redact_counts_and_stage_order():
    from barks_ocr_ray.functions.cleaning import pii_redact

    docs = _docs(
        [
            (1, "mail a.b@x.org and c@y.io, call 555-123-4567"),
            (2, "host 10.0.0.1 and 192.168.1.255 up"),
            # the email eats its embedded dotted-quad FIRST (stage
            # order): no <IP> may survive inside <EMAIL>
            (3, "ping admin@10.0.0.99mx.net"),
            (4, "nothing here"),
        ]
    )
    out = pii_redact(docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_phones"] == 1
    assert out.loc[1, "clean_text"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert out.loc[2, "n_ips"] == 2
    assert out.loc[2, "clean_text"] == "host <IP> and <IP> up"
    assert out.loc[3, "n_emails"] == 1 and out.loc[3, "n_ips"] == 0
    assert out.loc[4, "clean_text"] == "nothing here"
    assert (
        out.loc[4, ["n_emails", "n_phones", "n_ips"]] == 0
    ).all()


# --- decontamination -------------------------------------------------------


def test_decontaminate_flags_shared_shingles():
    from barks_ocr_ray.functions.contamination import (
        decontaminate,
        eval_shingle_set,
    )

    secret = "the quick brown fox jumps over the lazy dog"
    ev = eval_shingle_set(_docs([(100, secret)]), k=5)
    train = _docs(
        [
            (1, "intro text then " + secret + " closing words"),
            (2, "totally unrelated content with many plain words"),
            (3, "tiny doc"),  # < k tokens: zero shingles
        ]
    )
    out = (
        decontaminate(train, ev, k=5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] >= 5
    assert not out.loc[2, "contaminated"] and out.loc[2, "n_hits"] == 0
    assert out.loc[3, "n_shingles"] == 0 and not out.loc[3, "contaminated"]


def test_decontaminate_empty_eval_set():
    from barks_ocr_ray.functions.contamination import decontaminate

    out = (
        decontaminate(
            _docs([(1, "some ordinary text with enough tokens here")]),
            pa.array([], pa.string()),
            k=5,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_hits"] == 0 and not out.loc[1, "contaminated"]


# --- sequence packing ------------------------------------------------------


def test_sequence_pack_matches_local_scan():
    from barks_ocr_ray.functions.packing import sequence_pack

    rows = [(i, ("tok " * (i % 7 + 1)).strip()) for i in range(1, 41)]
    rows.append((99, ""))  # zero-token doc occupies no budget
    out = (
        sequence_pack(_docs(rows), budget=10, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # local reference: md5-sorted order, running offset
    ref = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i, n)
        for i, n in [(i, len(t.split())) for i, t in rows]
    )
    off = 0
    for key, i, n in ref:
        assert out.loc[i, "shuffle_key"] == key
        assert out.loc[i, "seq_id"] == off // 10, i
        assert out.loc[i, "seq_pos"] == off % 10, i
        off += n
    # packing is dense: every sequence except the last starts in-order
    assert out["seq_id"].max() == (off - 1) // 10


def test_sequence_pack_budget_boundary():
    from barks_ocr_ray.functions.packing import sequence_pack

    # 4 docs x 5 tokens, budget 5: each doc exactly fills one sequence
    rows = [(i, "a b c d e") for i in range(1, 5)]
    out = sequence_pack(_docs(rows), budget=5, num_partitions=2).to_pandas()
    assert sorted(out["seq_id"]) == [0, 1, 2, 3]
    assert (out["seq_pos"] == 0).all()


# --- signature-attach gate -------------------------------------------------


def test_attach_column_broadcast_matches_join():
    """The small-side broadcast path and the distributed-join path of
    _attach_column must produce identical rows (the measured-size gate
    only changes the mechanism, never the result)."""
    import pandas as pd

    from barks_ocr_ray.functions.dedupe import _attach_column

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 5], pa.int64()),
                "doc_b": pa.array([3, 4, 6], pa.int64()),
            }
        )
    )
    per_doc = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "sig": pa.array(
                    [bytes([i] * 8) for i in range(1, 7)], pa.binary()
                ),
            }
        )
    )

    def run(rows_hint):
        out = _attach_column(
            pairs, per_doc, "doc_a", "sig", "sig_a", 2,
            per_doc_rows=rows_hint,
        )
        return (
            out.to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    joined, broadcast = run(None), run(6)
    pd.testing.assert_frame_equal(
        joined[["doc_a", "doc_b", "sig_a"]],
        broadcast[["doc_a", "doc_b", "sig_a"]],
    )
    assert list(broadcast["sig_a"]) == [
        bytes([1] * 8),
        bytes([2] * 8),
        bytes([5] * 8),
    ]


# --- model-scored quality --------------------------------------------------


def test_quality_model_scores_and_edges():
    from barks_ocr_ray.functions.inference import quality_model_score

    good = (
        "The report was finished on time. It is clear and the team "
        "said they can use it each day. There was a word for that!"
    )
    docs = _docs([(1, good), (2, "x" * 20), (3, ""), (4, None)])
    out = (
        quality_model_score(docs)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "keep"]) and out.loc[1, "quality_score"] > 0.5
    assert not out.loc[2, "keep"]  # punct-free token wall scores low
    # empty and null text both score as the empty-text constant (b)
    assert out.loc[3, "quality_score"] == out.loc[4, "quality_score"] == -2.0
    assert not out.loc[3, "keep"] and not out.loc[4, "keep"]


# --- exact distributed quantiles -------------------------------------------


def _q_ref(vals, q):
    """DuckDB quantile_disc reference: ceil(q*n)-th smallest, 1-based."""
    import math

    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_distributed_quantiles_match_reference():
    import numpy as np

    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    rng = np.random.RandomState(7)
    # heavy duplicate mass + outliers + negatives
    vals = np.concatenate(
        [
            rng.randint(-50, 50, 5000).astype(float),
            np.full(3000, 13.5),  # heavy single value
            rng.uniform(1e6, 2e6, 10),
        ]
    )
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    out = distributed_quantiles(ds, "x", qs, pull_cap=200)
    got = dict(zip(out.column("q").to_pylist(), out.column("value").to_pylist()))
    for q in qs:
        assert got[q] == _q_ref(vals, q), q


def test_distributed_quantiles_degenerate_inputs():
    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    # all-equal column: every quantile is that value
    ds = rd.from_arrow(pa.table({"x": pa.array([7.0] * 500, pa.float64())}))
    out = distributed_quantiles(ds, "x", [0.1, 0.5, 0.9], pull_cap=50)
    assert out.column("value").to_pylist() == [7.0, 7.0, 7.0]
    # single row; q=1.0 endpoint
    one = rd.from_arrow(pa.table({"x": pa.array([3.25], pa.float64())}))
    out1 = distributed_quantiles(one, "x", [0.5, 1.0])
    assert out1.column("value").to_pylist() == [3.25, 3.25]
    # empty input: typed empty result
    import ray.data as _rd

    empty = _rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    out0 = distributed_quantiles(empty, "x", [0.5])
    assert out0.num_rows == 0 and out0.column_names == ["q", "value"]


# --- HLL count-distinct ----------------------------------------------------


def test_hll_count_distinct_accuracy_and_invariance():
    from barks_ocr_ray.functions.sketches import hll_count_distinct

    for true_n in (100, 5000, 50_000):
        vals = [f"value-{i % true_n}" for i in range(true_n * 2)]
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.string())}))
        est = hll_count_distinct(ds, "x").column("n_distinct_est")[0].as_py()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
        # deterministic and partitioning-invariant
        est2 = (
            hll_count_distinct(ds.repartition(13), "x")
            .column("n_distinct_est")[0]
            .as_py()
        )
        assert est == est2


# --- corpus mixing ---------------------------------------------------------


def test_mix_corpora_integer_and_fractional_weights():
    from barks_ocr_ray.functions.packing import mix_corpora

    a = _docs([(i, "x") for i in range(1, 21)])
    b = _docs([(f"u{i}", "y") for i in range(5)], id_type=pa.string())
    out = mix_corpora(
        [("a", a, 2.0), ("b", b, 1.5)]
    ).to_pandas()
    a_rows = out[out["corpus"] == "a"]
    b_rows = out[out["corpus"] == "b"]
    # integer weight: exactly 2 epochs per doc, no md5 dependence
    assert len(a_rows) == 40
    assert sorted(a_rows["epoch"].unique()) == [0, 1]
    counts = b_rows.groupby("doc_id").size()
    assert set(counts) <= {1, 2} and len(counts) == 5
    # deterministic: the extra-epoch decision replays md5 exactly
    for did, n in counts.items():
        frac = (
            int(hashlib.md5(f"b:{did}:mix".encode()).hexdigest()[:8], 16)
            / float(1 << 32)
        )
        assert n == (2 if frac < 0.5 else 1)
