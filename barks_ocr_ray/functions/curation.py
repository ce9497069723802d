"""Web-corpus curation operators — the training-data cleaning passes a
100-TB Common-Crawl-style pipeline runs between extraction and training,
beyond the reference's own surface (its corpus hygiene role is the
group-check predicate family, /root/reference/src/barks_ocr/pipeline/
group_checks.py — these are the web-scale siblings):

* ``boilerplate_ngram_stats`` — C4/RefinedWeb-style frequent-n-gram
  audit: n-grams appearing in many distinct documents are boilerplate
  (nav bars, cookie banners); per-doc boilerplate fraction drives the
  drop decision.
* ``repetition_stats`` — Gopher repetition filters: per-doc duplicate
  -token fraction and most-frequent-bigram fraction, fully vectorized
  (one Arrow split kernel + numpy run-length math per block; no
  per-row Python in the hot path).
* ``decontaminate`` — benchmark decontamination: training docs sharing
  any exact W-token window with a held-out (benchmark) split are
  flagged, via a distributed semi-join on window hashes (the shape of
  an n-gram-overlap decontamination pass against an eval set).
* ``hash_split_stats`` — deterministic train/val/test assignment from
  an md5 fraction of the doc id (pure row function: reproducible under
  any partitioning, no RNG state), with per-(split, lang) stats.

Scale notes (100 TB): every operator here is exchange-bounded — the
n-gram df aggregation ships per-block partials (never one row per
token occurrence); the decontamination join ships fixed-width (hash,
id) rows; splits and repetition stats are pure per-row/per-block
functions with zero doc-keyed exchange.
"""

from __future__ import annotations

import numpy as np
import ray
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.functions.hashing import splitmix64, unit_fractions
from barks_ocr_ray.functions.relational import (
    compact_nonempty,
    round_like_duckdb,
)
from barks_ocr_ray.functions.text import TOKEN_RE, Tokenizer

#: broadcast-vs-join gates (rows): below these, a small side ships ONCE
#: via ray.put and applies as a vectorized is_in; above, the distributed
#: hash join is the unbounded-safe path (extraction.py 'auto' precedent)
BROADCAST_FREQ_CAP = 2_000_000
BROADCAST_CONTAM_CAP = 2_000_000
#: fallback-join df window: grams in more docs than this are broadcast
#: (provably few: <= total (gram, doc) pairs / cap) — join-skew guard
FREQ_TOP_DF_CAP = 100_000


def _id_fracs(col, method: str = "md5") -> np.ndarray:
    """Deterministic unit uniform of an id column — md5 (oracle-parity,
    per-row C call, replayed exactly by the DuckDB oracles) or the
    vectorized splitmix64 production path (same keep rates, no per-row
    Python; see functions/hashing.py)."""
    ids = (
        col.to_pylist()
        if method == "md5"
        else col.to_numpy(zero_copy_only=False)
    )
    return unit_fractions(ids, method=method)


# --- C4-style boilerplate n-gram audit ------------------------------------


class _BlockNgramDF(Tokenizer):
    """Per-block document-frequency partials: ONE (ngram, nd) row per
    distinct n-gram per block (nd = docs in the block containing it), so
    the wide df aggregation shuffles block partials, never one row per
    n-gram occurrence."""

    def __init__(self, n: int = 3):
        super().__init__()
        self.n = n

    def _doc_grams(self, text: str) -> list[str]:
        toks = self.tokens(text or "")
        n = self.n
        return [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        nd: _Counter = _Counter()
        for s in batch.column("text"):
            nd.update(set(self._doc_grams(s.as_py())))
        grams = list(nd.keys())
        return pa.table(
            {
                "ngram": pa.array(grams, pa.string()),
                "nd": pa.array([nd[g] for g in grams], pa.int64()),
            }
        )


class _DocNgramCounts(_BlockNgramDF):
    """(doc_id, ngram, n_occ) — one row per DISTINCT n-gram per doc with
    its occurrence count (the doc-resolution explode the per-doc audit
    joins against the frequent set)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        out_d, out_g, out_n = [], [], []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            counts = _Counter(self._doc_grams(s.as_py()))
            out_d.extend([doc_id] * len(counts))
            out_g.extend(counts.keys())
            out_n.extend(counts.values())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "ngram": pa.array(out_g, pa.string()),
                "n_occ": pa.array(out_n, pa.int64()),
            }
        )


class _DocBoilerStats(Tokenizer):
    """Fused broadcast-path audit: with the frequent set shipped ONCE
    (ray.put -> resolved per actor in __init__), a single tokenize pass
    emits the FINAL per-doc row (doc_id, n_grams, n_boiler,
    boiler_frac) block-locally — no per-gram exchange, no doc-keyed
    groupby, no totals join. Collapses the broadcast branch's
    3-execution plan to 1 (measured: q110 sf0.1 wall ~11.6s with the
    join plan)."""

    def __init__(self, fset_ref, n: int = 3):
        super().__init__()
        self.n = n
        self.fset = ray.get(fset_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        fs = self.fset
        ids, totals, nboil = [], [], []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            toks = self.tokens(s.as_py() or "")
            if len(toks) < n:
                continue
            total = len(toks) - n + 1
            c = 0
            for i in range(total):
                if " ".join(toks[i : i + n]) in fs:
                    c += 1
            ids.append(doc_id)
            totals.append(total)
            nboil.append(c)
        tot = np.asarray(totals, np.float64)
        frac = round_like_duckdb(
            np.asarray(nboil, np.float64) / np.maximum(tot, 1.0), 4
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(totals, pa.int64()),
                "n_boiler": pa.array(nboil, pa.int64()),
                "boiler_frac": pa.array(frac, pa.float64()),
            }
        )


def boilerplate_ngram_stats(
    docs: Dataset,
    *,
    min_docs: int = 5,
    ngram: int = 3,
    concurrency: int = 4,
) -> Dataset:
    """Per-doc boilerplate fraction: the share of a doc's token n-gram
    occurrences whose n-gram appears in >= ``min_docs`` distinct docs
    corpus-wide (C4's "three-sentence dedup" / RefinedWeb's frequent
    -line scrub, at n-gram granularity).

    Plan (exchange-bounded): (1) frequent set F from BLOCK-level df
    partials -> one small n-gram-keyed aggregation; (2) per-doc counts
    join F on ngram (the one corpus-scale exchange: fixed-width
    distinct-gram rows, never text) -> per-doc sum; (3) per-doc totals
    are computed block-locally from a vectorized token count (zero
    exchange) and left-joined with the matches. Emits docs with >= 1
    n-gram (i.e. >= ``ngram`` tokens)."""
    text_ds = docs.select_columns(["doc_id", "text"])

    nd_parts = text_ds.map_batches(
        _BlockNgramDF,
        fn_constructor_kwargs={"n": ngram},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    # n-gram df: key cardinality is the n-gram vocabulary (bounded by
    # token-vocab^n, heavily concentrated in practice) — modest partitions.
    # nd is KEPT through the filter so the fallback path can window by df.
    freq = (
        nd_parts.groupby("ngram", num_partitions=hash_partitions(8))
        .aggregate(Sum("nd", alias_name="nd"))
        .filter(expr=f"nd >= {min_docs}")
    )

    # per-doc totals: vectorized, block-local, zero exchange
    def _totals(t: pa.Table) -> pa.Table:
        n_tokens = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), TOKEN_RE
        ).cast(pa.int64())
        n_grams = pc.subtract(n_tokens, pa.scalar(ngram - 1, pa.int64()))
        out = pa.table(
            {"doc_id": t.column("doc_id"), "n_grams": n_grams}
        )
        return out.filter(
            pc.greater_equal(n_tokens, pa.scalar(ngram, pa.int64()))
        )

    totals = text_ds.map_batches(_totals, batch_format="pyarrow")

    # materialize ONCE; the broadcast branch take_all()s directly —
    # compact_nonempty's extra repartition+materialize is only needed
    # when the frequent set feeds the fallback join
    freq_m = freq.materialize()
    n_freq = freq_m.count()

    def _zero_fill(t: pa.Table) -> pa.Table:
        boiler = t.column("n_boiler") if "n_boiler" in t.column_names else (
            pa.nulls(t.num_rows, pa.int64())
        )
        n_boiler = pc.fill_null(boiler, pa.scalar(0, pa.int64()))
        frac = round_like_duckdb(
            n_boiler.to_numpy(zero_copy_only=False)
            / t.column("n_grams").to_numpy(zero_copy_only=False),
            4,
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": t.column("n_grams"),
                "n_boiler": n_boiler,
                "boiler_frac": pa.array(frac, pa.float64()),
            }
        )

    if n_freq == 0:
        return totals.map_batches(_zero_fill, batch_format="pyarrow")

    # frequent sets are usually heavy-hitter-sized: broadcast them (one
    # ray.put) and FUSE the whole per-doc side into a single tokenize
    # pass — no per-gram exchange, no doc-keyed groupby, no totals
    # join (collapses 3 executions to 1; the profiled q110 sf0.1 wall
    # was execution-count-bound, not compute-bound). The distributed
    # join stays as the unbounded fallback, same measured-gate pattern
    # as extraction.py's dedup 'auto'.
    if n_freq <= BROADCAST_FREQ_CAP:
        fset = frozenset(r["ngram"] for r in freq_m.take_all())
        fref = ray.put(fset)
        return text_ds.map_batches(
            _DocBoilerStats,
            fn_constructor_kwargs={"fset_ref": fref, "n": ngram},
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        )

    exploded = text_ds.map_batches(
        _DocNgramCounts,
        fn_constructor_kwargs={"n": ngram},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    ).materialize()  # consumed by the window join AND the top semi-join
    # df-window skew guard (the q148 df-upper-window discipline):
    # grams present in > FREQ_TOP_DF_CAP docs are provably few
    # (<= total (gram, doc) pairs / cap) — broadcast THEM and semi-join
    # block-locally instead of letting one hot boilerplate gram own a
    # join partition; only the bounded [min_docs, cap] df window rides
    # the distributed join.
    from barks_ocr_ray.functions.relational import broadcast_semi_join

    window_c, n_window = compact_nonempty(
        freq_m.filter(expr=f"nd <= {FREQ_TOP_DF_CAP}").select_columns(
            ["ngram"]
        ),
        8,
    )
    top_rows = (
        freq_m.filter(expr=f"nd > {FREQ_TOP_DF_CAP}")
        .select_columns(["ngram"])
        .take_all()
    )
    parts = []
    if top_rows:
        parts.append(
            broadcast_semi_join(
                exploded, {r["ngram"] for r in top_rows}, "ngram"
            )
        )
    if n_window:
        parts.append(
            exploded.join(
                window_c,
                join_type="inner",
                num_partitions=hash_partitions(16),
                on=("ngram",),
            )
        )
    matched = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    boiler = matched.groupby(
        "doc_id", num_partitions=hash_partitions(16)
    ).aggregate(Sum("n_occ", alias_name="n_boiler"))
    boiler_c, n_boiler = compact_nonempty(boiler, 16)
    if n_boiler == 0:
        return totals.map_batches(_zero_fill, batch_format="pyarrow")
    joined = totals.join(
        boiler_c,
        join_type="left_outer",
        num_partitions=hash_partitions(16),
        on=("doc_id",),
    )
    return joined.map_batches(_zero_fill, batch_format="pyarrow")


# --- Gopher repetition filters ---------------------------------------------


def repetition_stats(docs: Dataset) -> Dataset:
    """Per-doc repetition quality signals (Gopher rules 'fraction of
    duplicate tokens' / 'fraction of tokens in the most common 2-gram'):
    ``dup_token_frac`` = 1 - distinct/total tokens, ``top_bigram_frac``
    = occurrences of the doc's most frequent bigram / (n_tokens - 1).

    Fully vectorized per block: ONE Arrow split kernel tokenizes every
    doc, then numpy factorize + run-length math computes all per-doc
    stats at once (no per-row Python, no exchange — each doc is one
    row). Docs with < 2 tokens carry no bigram and are excluded (the
    oracle's WHERE len(toks) >= 2)."""

    def _stats(t: pa.Table) -> pa.Table:
        import pandas as _pd

        lower = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(
            lower, pattern="[^a-z0-9]+"
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        counts = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        values = lists.flatten()  # honors slices; drops null lists
        n_docs = t.num_rows
        docv = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        vlen = pc.utf8_length(values).to_numpy(zero_copy_only=False)
        keep = vlen > 0  # split artifacts: '' at string edges
        docv = docv[keep]
        codes = _pd.factorize(values.to_pandas()[keep])[0].astype(np.int64)

        n_tokens = np.bincount(docv, minlength=n_docs)

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "top_bigram_n": pa.array([], pa.int64()),
                "dup_token_frac": pa.array([], pa.float64()),
                "top_bigram_frac": pa.array([], pa.float64()),
            }
        )
        if docv.size == 0:
            return empty

        # distinct tokens per doc: runs of (doc, code) after a sort
        order = np.lexsort((codes, docv))
        sd, sc = docv[order], codes[order]
        new_run = np.empty(sd.size, dtype=bool)
        new_run[0] = True
        new_run[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
        n_distinct = np.bincount(sd[new_run], minlength=n_docs)

        # bigrams: adjacency in ORIGINAL order, within-doc only
        same = docv[1:] == docv[:-1]
        if not same.any():
            return empty
        vocab = int(codes.max()) + 1
        bkey = codes[:-1][same] * vocab + codes[1:][same]
        bdoc = docv[:-1][same]
        border = np.lexsort((bkey, bdoc))
        bd, bk = bdoc[border], bkey[border]
        bnew = np.empty(bd.size, dtype=bool)
        bnew[0] = True
        bnew[1:] = (bd[1:] != bd[:-1]) | (bk[1:] != bk[:-1])
        starts = np.flatnonzero(bnew)
        run_len = np.diff(np.append(starts, bd.size))
        run_doc = bd[starts]
        doc_first = np.flatnonzero(
            np.concatenate(([True], run_doc[1:] != run_doc[:-1]))
        )
        top_n = np.maximum.reduceat(run_len, doc_first)
        docs_with_bigrams = run_doc[doc_first]

        nt = n_tokens[docs_with_bigrams]
        nd = n_distinct[docs_with_bigrams]
        ids = (
            t.column("doc_id")
            .to_numpy(zero_copy_only=False)[docs_with_bigrams]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "top_bigram_n": pa.array(top_n, pa.int64()),
                "dup_token_frac": pa.array(
                    round_like_duckdb(1.0 - nd / nt.astype(np.float64), 4),
                    pa.float64(),
                ),
                "top_bigram_frac": pa.array(
                    round_like_duckdb(
                        top_n / (nt - 1).astype(np.float64), 4
                    ),
                    pa.float64(),
                ),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _stats, batch_format="pyarrow"
    )


# --- benchmark decontamination ---------------------------------------------


def decontaminate(
    docs: Dataset,
    *,
    holdout_frac: float = 0.1,
    window: int = 8,
    concurrency: int = 4,
    hash_method: str = "md5",
) -> Dataset:
    """Flag training docs sharing any exact ``window``-token span with
    the held-out (benchmark) split — the n-gram-overlap decontamination
    pass every pretraining corpus runs against its eval sets. The
    holdout is the md5-fraction slice u < ``holdout_frac`` (pure row
    function, SQL-replayable); output is (doc_id, n_hits) per
    contaminated TRAINING doc, n_hits = how many of its distinct
    windows appear in the holdout.

    Scale: both sides window-hash with the q53 ``WindowHasher`` (the
    ~1-row-per-token explode ships 16-byte hashes, never text); the
    holdout's hash set is deduped then hash-joined — one corpus-scale
    keyed exchange — and the per-doc rollup is doc-keyed. No broadcast
    of an unbounded set, no driver-side state."""
    from barks_ocr_ray.functions.dedupe import WindowHasher

    text_ds = docs.select_columns(["doc_id", "text"])

    def _side(keep_holdout: bool):
        def _filter(t: pa.Table) -> pa.Table:
            us = _id_fracs(t.column("doc_id"), hash_method)
            return t.filter(
                pa.array((us < holdout_frac) == keep_holdout, pa.bool_())
            )

        return text_ds.map_batches(
            _filter, batch_format="pyarrow"
        ).map_batches(
            WindowHasher,
            fn_constructor_kwargs={"window": window},
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        ).select_columns(["h", "doc_id"])

    hold_h = (
        _side(True)
        .groupby("h", num_partitions=hash_partitions(16))
        .aggregate(Count(alias_name="_nh"))
        .select_columns(["h"])
    )
    train_w = _side(False)

    hold_c, n_hold = compact_nonempty(hold_h, 16)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
    )
    if n_hold == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    train_c, n_train = compact_nonempty(train_w, 16)
    if n_train == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    hits = train_c.join(
        hold_c,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("h",),
    )
    return hits.groupby(
        "doc_id", num_partitions=hash_partitions(16)
    ).aggregate(Count(alias_name="n_hits"))


# --- deterministic train/val/test split ------------------------------------


def hash_split_stats(
    docs: Dataset,
    *,
    bounds: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.9),
        ("test", 1.0),
    ),
    strata_col: str = "lang",
    hash_method: str = "md5",
) -> Dataset:
    """Assign every doc a split from its id's unit fraction (first
    bound with u < cutoff — deterministic, partition-independent, no RNG)
    and aggregate per (split, stratum): doc count + char volume. The
    shuffle ships only (split x stratum)-keyed block partials."""
    names = [n for n, _ in bounds]
    cuts = np.asarray([c for _, c in bounds], np.float64)

    def _assign(t: pa.Table) -> pa.Table:
        us = _id_fracs(t.column("doc_id"), hash_method)
        # first bound with u < cut == index of first cut > u
        splits = np.asarray(names, object)[
            np.searchsorted(cuts, us, side="right")
        ]
        g = (
            pa.table(
                {
                    "split": pa.array(splits, pa.string()),
                    strata_col: t.column(strata_col),
                    "n_chars": t.column("n_chars"),
                }
            )
            .group_by(["split", strata_col])
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        )
        return g.rename_columns(["split", strata_col, "n_docs", "chars"])

    return (
        docs.select_columns(["doc_id", strata_col, "n_chars"])
        .map_batches(_assign, batch_format="pyarrow")
        .groupby(["split", strata_col], num_partitions=hash_partitions(4))
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("chars", alias_name="chars"),
        )
    )


# --- composed cleaning arc ---------------------------------------------------


def clean_corpus(
    docs: Dataset,
    *,
    holdout_frac: float = 0.1,
    window: int = 8,
    max_dup_token_frac: float = 0.7,
    max_top_bigram_frac: float = 0.1,
    hash_method: str = "md5",
) -> Dataset:
    """The composed training-split cleaning arc a pretraining corpus
    runs end to end: restrict to the training split (md5 fraction >=
    ``holdout_frac``), exact-dedup identical texts (min-doc_id winner),
    drop repetition outliers (Gopher gates on the ROUNDED fractions —
    the same values the oracle thresholds), and drop docs contaminated
    against the held-out slice. Output: kept (doc_id, lang, n_tokens).

    Exchange budget: text-hash dedup (one keyed agg), window-hash
    contamination join, and doc-keyed combine joins — every exchange is
    keyed, nothing is materialized driver-side."""
    from barks_ocr_ray.functions.dedupe import exact_dedup_docs

    def _train_filter(t: pa.Table) -> pa.Table:
        us = _id_fracs(t.column("doc_id"), hash_method)
        return t.filter(pa.array(us >= holdout_frac, pa.bool_()))

    train = docs.select_columns(["doc_id", "text", "lang"]).map_batches(
        _train_filter, batch_format="pyarrow"
    )

    rep_ok = (
        repetition_stats(train)
        .filter(
            expr=(
                f"dup_token_frac <= {max_dup_token_frac} and "
                f"top_bigram_frac <= {max_top_bigram_frac}"
            )
        )
        .select_columns(["doc_id", "n_tokens"])
    )
    winners = exact_dedup_docs(train).select_columns(["doc_id"])
    contaminated = decontaminate(
        docs, holdout_frac=holdout_frac, window=window,
        hash_method=hash_method,
    ).select_columns(["doc_id"])

    ids = docs.select_columns(["doc_id", "lang"])

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    # every join input below is downstream of a filter/aggregate and can
    # carry empty blocks -> schema-less through the shuffle (the
    # FieldRef join crash); compact each one (CLAUDE.md: mandatory)
    parts = hash_partitions(16)
    rep_c, n_rep = compact_nonempty(rep_ok, 16)
    win_c, n_win = compact_nonempty(winners, 16)
    if n_rep == 0 or n_win == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    kept = rep_c.join(
        win_c, join_type="inner", num_partitions=parts, on=("doc_id",)
    )
    kept, n_kept = compact_nonempty(kept, 16)
    if n_kept == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    contam_c, n_contam = compact_nonempty(contaminated, 16)
    if 0 < n_contam <= BROADCAST_CONTAM_CAP:
        # contamination hits are eval-overlap-sized, far below the
        # corpus: broadcast anti-join (one ray.put, vectorized is_in)
        # instead of a doc-keyed exchange + recompact
        from barks_ocr_ray.functions.relational import broadcast_semi_join

        cset = {r["doc_id"] for r in contam_c.take_all()}
        kept = broadcast_semi_join(kept, cset, "doc_id", anti=True)
        kept, n_kept = compact_nonempty(kept, 16)
        if n_kept == 0:
            import ray.data as _rd

            return _rd.from_arrow(empty)
    elif n_contam > 0:
        # unbounded fallback: anti join as left_outer + null-marker
        # filter (J9 shape)
        def _mark(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_c", pa.array([1] * t.num_rows, pa.int64())
            )

        kept = kept.join(
            contam_c.map_batches(_mark, batch_format="pyarrow"),
            join_type="left_outer",
            num_partitions=parts,
            on=("doc_id",),
        )

        def _drop_contam(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t.column("_c"))).drop_columns(
                ["_c"]
            )

        kept = kept.map_batches(_drop_contam, batch_format="pyarrow")
        kept, n_kept = compact_nonempty(kept, 16)
        if n_kept == 0:
            import ray.data as _rd

            return _rd.from_arrow(empty)
    return kept.join(
        ids, join_type="inner", num_partitions=parts, on=("doc_id",)
    ).select_columns(["doc_id", "lang", "n_tokens"])


# --- token-budget corpus assembly (distributed ordered prefix sum) ----------


def token_budget_sample(
    docs: Dataset,
    *,
    budget: int = 3000,
    strata_col: str = "lang",
    n_buckets: int = 64,
    hash_method: str = "md5",
) -> Dataset:
    """Per-stratum token-budget assembly: walk each stratum's docs in
    deterministic (md5-fraction, doc_id) order and keep docs while the
    stratum's running token total stays <= ``budget`` — the corpus-
    assembly step that fills a per-language token quota.

    This is a DISTRIBUTED ORDERED PREFIX SUM: the md5 fraction u is
    range-partitioned into ``n_buckets`` fixed buckets; pass 1
    aggregates per-(stratum, bucket) token sums (a strata x buckets
    table — bounded by the constants, never the corpus) from which the
    driver derives each bucket's EXCLUSIVE running offset; pass 2
    re-walks each (stratum, bucket) partition, sorts locally by
    (u, doc_id), cumsums, adds the bucket offset and keeps rows whose
    inclusive total fits. No global sort, no corpus-sized driver state;
    bucket granularity (not corpus size) bounds the per-group block,
    so n_buckets scales like a block-size knob at 100 TB."""

    def _annotate(t: pa.Table) -> pa.Table:
        us = _id_fracs(t.column("doc_id"), hash_method)
        n_tokens = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), TOKEN_RE
        ).cast(pa.int64())
        bucket = np.minimum(
            (us * n_buckets).astype(np.int64), n_buckets - 1
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                strata_col: t.column(strata_col),
                "n_tokens": n_tokens,
                "u": pa.array(us, pa.float64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    ann = docs.select_columns(["doc_id", strata_col, "text"]).map_batches(
        _annotate, batch_format="pyarrow"
    )

    # pass 1: (stratum, bucket) token sums -> exclusive offsets (tiny:
    # strata x n_buckets rows; the ONE driver-side table, constant-bounded)
    sums = (
        ann.groupby([strata_col, "bucket"], num_partitions=hash_partitions(4))
        .aggregate(Sum("n_tokens", alias_name="bucket_tokens"))
        .take_all()
    )
    offsets: dict[tuple, int] = {}
    running: dict[str, int] = {}
    for row in sorted(sums, key=lambda r: (r[strata_col], r["bucket"])):
        s = row[strata_col]
        offsets[(s, row["bucket"])] = running.get(s, 0)
        running[s] = running.get(s, 0) + row["bucket_tokens"]

    def _keep(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("u", "ascending"), ("doc_id", "ascending")]
        )
        t = t.take(idx)
        cum = np.cumsum(t.column("n_tokens").to_numpy(zero_copy_only=False))
        off = offsets[
            (t.column(strata_col)[0].as_py(), t.column("bucket")[0].as_py())
        ]
        keep = (off + cum) <= budget
        return t.filter(pa.array(keep, pa.bool_())).select(
            ["doc_id", strata_col, "n_tokens"]
        )

    return ann.groupby(
        [strata_col, "bucket"], num_partitions=hash_partitions(16)
    ).map_groups(_keep, batch_format="pyarrow")


class SnapshotDupHasher(Tokenizer):
    """One-pass content + window hasher for incremental_ingest_dedup:
    per doc, ONE 32-hex full-content md5 row (kind 0; null text
    skipped — md5(NULL) IS NULL on the oracle side) plus the q53
    WindowHasher contract's DISTINCT 16-hex window-hash rows (kind 1;
    docs under ``window`` tokens emit none). The two hash domains have
    different lengths and therefore cannot collide, so a single
    hash-keyed join downstream serves both duplicate flags — one
    tokenizing read per snapshot side instead of two."""

    def __init__(self, window: int = 10):
        super().__init__()
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        out_d: list[int] = []
        out_h: list[str] = []
        out_k: list[int] = []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            text = s.as_py()
            if text is None:
                continue
            out_d.append(doc_id)
            out_h.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            out_k.append(0)
            toks = self.tokens(text)
            if len(toks) < self.window:
                continue
            seen: set[str] = set()
            for i in range(len(toks) - self.window + 1):
                h = hashlib.md5(
                    " ".join(toks[i : i + self.window]).encode("utf-8")
                ).hexdigest()[:16]
                if h not in seen:
                    seen.add(h)
                    out_d.append(doc_id)
                    out_h.append(h)
                    out_k.append(1)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "h": pa.array(out_h, pa.string()),
                "kind": pa.array(out_k, pa.int64()),
            }
        )


def incremental_ingest_dedup(
    docs: Dataset,
    *,
    prior_mod: int = 10,
    prior_keep: int = 7,
    window: int = 10,
    concurrency: int = 4,
) -> Dataset:
    """Cross-snapshot (delta-ingest) dedup — the pass a recurring-crawl
    pipeline runs when a NEW snapshot lands against the corpus already
    ingested: each new doc is flagged ``dup_exact`` (byte-identical
    text already present in the prior snapshot, via content-hash
    semi-join) and ``dup_window`` (shares at least one exact
    ``window``-token span with the prior snapshot, via the q53/q112
    WindowHasher semi-join). The snapshots are the deterministic
    doc_id % ``prior_mod`` < ``prior_keep`` split (pure row function,
    SQL-replayable). Output: one row per NEW doc with BIGINT 0/1
    flags.

    Scale: the prior snapshot is never broadcast — both flag passes
    are distributed semi-joins on fixed-width hashes, and both ride
    ONE hash-keyed join: the content domain (32-hex md5) and the
    window domain (16-hex, the q53 contract) cannot collide (different
    lengths), so a side is hashed in a SINGLE tokenizing pass
    (SnapshotDupHasher) and the two flags separate again by `kind`
    after the join. The flag rollup is one doc-keyed max-aggregation
    over (doc_id, flag) partials (multiplicities are harmless under
    max, so no distinct pass is spent on the join output). Null-text
    docs never match (md5(NULL) IS NULL on the oracle side; skipped
    here). Exchanges: prior-hash distinct, the join, the rollup —
    three, for what is semantically TWO full dedup passes.
    """
    import ray.data as rd
    from ray.data.aggregate import Max

    # three consumers (prior filter, new-zeros, new-hashes) — pin the
    # narrow 2-column input once instead of re-running the read per
    # consumer (a lazy Dataset re-executes its plan PER CONSUMER)
    text_ds = docs.select_columns(["doc_id", "text"]).materialize()

    def _snapshot(keep_prior: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % prior_mod) < prior_keep
            return t.filter(pa.array(m == keep_prior, pa.bool_()))

        return text_ds.map_batches(_f, batch_format="pyarrow")

    def _hashes(ds: Dataset) -> Dataset:
        return ds.map_batches(
            SnapshotDupHasher,
            fn_constructor_kwargs={"window": window},
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        )

    prior_h = (
        _hashes(_snapshot(True))
        .select_columns(["h"])
        .groupby("h", num_partitions=hash_partitions(16))
        .aggregate(Count(alias_name="_n"))
        .select_columns(["h"])
    )
    new = _snapshot(False)

    def _zeros(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(
            {"doc_id": t.column("doc_id"), "dup_exact": z, "dup_window": z}
        )

    base = new.map_batches(_zeros, batch_format="pyarrow")

    prior_c, n_p = compact_nonempty(prior_h, 16)
    new_c, n_n = compact_nonempty(_hashes(new), 16)
    if n_p == 0 or n_n == 0:
        hits = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dup_exact": pa.array([], pa.int64()),
                    "dup_window": pa.array([], pa.int64()),
                }
            )
        )
    else:
        joined = new_c.join(
            prior_c,
            join_type="inner",
            num_partitions=hash_partitions(16),
            on=("h",),
        )

        def _flags(t: pa.Table) -> pa.Table:
            kind = t.column("kind")
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "dup_exact": pc.cast(
                        pc.equal(kind, pa.scalar(0, pa.int64())), pa.int64()
                    ),
                    "dup_window": pc.cast(
                        pc.equal(kind, pa.scalar(1, pa.int64())), pa.int64()
                    ),
                }
            )

        hits = joined.map_batches(_flags, batch_format="pyarrow")

    return (
        base.union(hits)
        .groupby("doc_id", num_partitions=hash_partitions(16))
        .aggregate(
            Max("dup_exact", alias_name="dup_exact"),
            Max("dup_window", alias_name="dup_window"),
        )
    )


# --- T5 span-corruption noising (q277) ---------------------------------------

#: span-start probability = SPAN_START_NUM / 100 per unmasked position;
#: span length uniform on 1..SPAN_MAX_LEN (mean 3 — T5's noise shape)
SPAN_START_NUM = 5
SPAN_MAX_LEN = 5
#: uint64 threshold for "start a span here" (5% of the hash space)
_SPAN_THRESH = np.uint64(int((SPAN_START_NUM / 100.0) * (1 << 64)))
#: second-mix constant decorrelating length draws from start draws
_SPAN_LEN_MIX = np.uint64(0xA5A5A5A5A5A5A5A5)


def span_plan(doc_id: int, n_tokens: int) -> tuple[int, int]:
    """Deterministic T5-style span-corruption plan for one doc: greedy
    left-to-right scan; at each unmasked position draw u =
    splitmix64(doc_salt + i) and start a span iff u < 5% of the hash
    space, with length 1..5 from a decorrelated second mix. Returns
    (n_spans, n_masked). A pure function of (doc_id, n_tokens) — no RNG
    state, identical under any partitioning, replayed verbatim by the
    golden (the greedy skip-inside-spans makes it sequential per doc,
    which is why the oracle is a golden, not SQL). NOTE: splitmix64
    must stay a module-level import — this runs inside worker UDFs
    (the no-PYTHONPATH trap; test_driver_contract guards it)."""
    if n_tokens <= 0:
        return (0, 0)
    salt = splitmix64(np.array([doc_id], dtype=np.int64))[0]
    u = splitmix64(
        (np.arange(n_tokens, dtype=np.int64).astype(np.uint64) + salt).astype(
            np.int64
        )
    )
    lengths = 1 + (splitmix64((u ^ _SPAN_LEN_MIX).astype(np.int64))
                   % np.uint64(SPAN_MAX_LEN)).astype(np.int64)
    start = u < _SPAN_THRESH
    i = spans = masked = 0
    while i < n_tokens:
        if start[i]:
            ln = min(int(lengths[i]), n_tokens - i)
            spans += 1
            masked += ln
            i += ln
        else:
            i += 1
    return (spans, masked)


def span_corruption_table(doc_ids, token_counts) -> pa.Table:
    """Per-doc span-corruption stats from (doc_id, n_tokens) pairs —
    the shared close of the distributed query and the golden replay:
    input_len = n - masked + spans (each span collapses to ONE sentinel
    in the encoder input), target_len = masked + spans (sentinel +
    original tokens on the decoder side)."""
    rows = [span_plan(int(d), int(n)) for d, n in zip(doc_ids, token_counts)]
    spans = np.array([r[0] for r in rows], dtype=np.int64)
    masked = np.array([r[1] for r in rows], dtype=np.int64)
    n = np.asarray(token_counts, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "n_tokens": pa.array(n, pa.int64()),
            "n_spans": pa.array(spans, pa.int64()),
            "n_masked": pa.array(masked, pa.int64()),
            "input_len": pa.array(n - masked + spans, pa.int64()),
            "target_len": pa.array(masked + spans, pa.int64()),
        }
    )
