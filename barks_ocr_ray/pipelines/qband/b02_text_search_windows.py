from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b01_relational_extraction import *  # noqa: F401,F403

SQL_Q72 = """
SELECT event_id, user_id, ts,
       sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS running_cents,
       CAST(row_number() OVER w AS BIGINT) AS event_seq,
       coalesce(date_diff('microsecond', lag(ts) OVER w, ts), 0) AS since_prev_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


#: q73 chunking geometry
Q73_CHUNK, Q73_OVERLAP = 64, 16


def q73_chunk_documents(sf_dir: str):
    """Sliding token-window chunking over the documents table (RAG /
    context-window prep): 64-token windows advancing by 48, last window
    clipped to the doc end. Pure per-block pass, zero exchanges, fully
    vectorized (see functions/text.chunk_documents)."""
    from barks_ocr_ray.functions.text import chunk_documents

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(
        docs, chunk_tokens=Q73_CHUNK, overlap=Q73_OVERLAP
    )


_Q73_STRIDE = Q73_CHUNK - Q73_OVERLAP
SQL_Q73 = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk,
         len(regexp_extract_all(text, '\\S+')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(s / {_Q73_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(tk[s + 1 : least(s + {Q73_CHUNK}, n)], ' ') AS chunk_text,
       least(s + {Q73_CHUNK}, n) - s AS n_tokens
FROM toks,
     LATERAL unnest(generate_series(0, greatest(n - {Q73_OVERLAP} - 1, 0), {_Q73_STRIDE})) AS g(s)
WHERE n > 0
"""


def q74_salted_skew_join(sf_dir: str):
    """Skew-safe dimension join: lineitem x part through a SALTED hash
    join — the dimension side replicated once per salt, fact rows
    round-robin salted, exchange keyed on (partkey, salt) so a hot part
    never lands on one join partition — then per-brand revenue in
    fixed-point cents (per-row round to int64, then an
    order-independent integer sum; the q72 rationale). Result is
    provably identical to the plain join (see salted_join docstring);
    the sibling equivalence is pinned by a unit test with a 90%-hot
    key."""
    from barks_ocr_ray.functions.relational import salted_join

    li = read_table(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    )
    pt = read_table(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = salted_join(
        li, pt, on=("l_partkey",), right_on=("p_partkey",), n_salts=8
    )

    def _cents(t: pa.Table) -> pa.Table:
        import numpy as np

        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = round_like_duckdb(ext * (1.0 - disc) * 100.0, 0).astype(
            np.int64
        )
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    # ~25 brands: 2 partitions keeps every finalize non-empty (q01 note)
    return (
        joined.map_batches(_cents, batch_format="pyarrow")
        .groupby("p_brand", num_partitions=2)
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )


SQL_Q74 = """
SELECT p_brand,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q75_semdedup(sf_dir: str):
    """SemDeDup semantic near-dedup over the embeddings table (k-means
    candidate bounding + within-cluster keep-lowest-id cosine rule).
    The quantizer is not SQL-replayable, so the value-exact oracle is
    the single-process golden (golden_dedup.golden_semdedup — shared
    _kmeans kernel); the exact sibling on the same cosine kernel is q44,
    and the n_clusters=1 reduction to the exact greedy rule is pinned by
    a unit test."""
    from barks_ocr_ray.functions.ann import semdedup

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(emb, threshold=0.95, n_clusters=16)


def q76_rollup(sf_dir: str):
    """Multi-level ROLLUP aggregation — (source, lang), (source) and
    grand-total counts/char-sums in one result, SQL `GROUP BY
    ROLLUP(source, lang)` semantics.

    Execution shape: ONE full-data aggregation produces the finest
    level; the coarser levels are derived FROM that (vocabulary-sized)
    aggregate with tiny exchanges — the corpus is scanned exactly once
    no matter how many rollup levels, which is the only shape that
    holds at 100 TB (re-scanning per level multiplies the read)."""
    docs = read_table(sf_dir, "documents", ["source", "lang", "n_chars"])
    # materialize the finest level: it is (sources x langs)-sized, and
    # the coarser levels + the union all branch from it — without this
    # the full corpus aggregation would execute once per branch
    base = (
        docs.groupby(["source", "lang"], num_partitions=2)
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
        .materialize()
    )

    def _null_lang(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "lang": pa.nulls(t.num_rows, pa.string()),
                "n_docs": t.column("n_docs"),
                "sum_chars": t.column("sum_chars"),
            }
        )

    lvl1 = (
        base.groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .map_batches(_null_lang, batch_format="pyarrow")
    )
    # grand total: two scalars off the (tiny) finest aggregate
    totals = base.aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
    )
    lvl0 = rd.from_arrow(
        pa.table(
            {
                "source": pa.nulls(1, pa.string()),
                "lang": pa.nulls(1, pa.string()),
                "n_docs": pa.array([totals["n_docs"]], pa.int64()),
                "sum_chars": pa.array([totals["sum_chars"]], pa.int64()),
            }
        )
    )
    return base.union(lvl1, lvl0)


SQL_Q76 = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY ROLLUP(source, lang)
"""

#: fixed event-type vocabulary of the corpus (pivot column contract)
Q77_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q77_pivot_events(sf_dir: str):
    """Pivot (crosstab): one row per user, one count column per event
    type. Execution shape: the pivot happens BEFORE the exchange — a
    vectorized one-hot pass per block turns each type into an int64
    column, so the groupby ships 5 small integer columns instead of a
    string column, and the wide aggregation is plain Sums (combiner
    partials). Column set is the declared type vocabulary (pivoting on
    an unbounded discovered domain is an anti-pattern at scale)."""
    ev = read_table(sf_dir, "events", ["user_id", "event_type"])

    def _onehot(t: pa.Table) -> pa.Table:
        cols = {"user_id": t.column("user_id")}
        et = t.column("event_type")
        for name in Q77_EVENT_TYPES:
            cols[f"n_{name}"] = pc.cast(
                pc.equal(et, pa.scalar(name)), pa.int64()
            )
        return pa.table(cols)

    return ev.map_batches(_onehot, batch_format="pyarrow").groupby(
        "user_id", num_partitions=hash_partitions(8)
    ).aggregate(
        *[Sum(f"n_{name}", alias_name=f"n_{name}") for name in Q77_EVENT_TYPES]
    )


SQL_Q77 = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


def q78_bloom_semi_join(sf_dir: str):
    """Runtime-filtered semi join: lineitems of URGENT orders via a
    distributed Bloom filter of the urgent orderkeys broadcast once —
    definitely-absent rows never enter the join exchange; survivors
    (matches + ~0.1% false positives) get the exact inner join, so the
    result is exactly `WHERE l_orderkey IN (...)`. Aggregated to
    per-returnflag counts + fixed-point revenue (q72 rationale)."""
    import pyarrow.dataset as _pds

    from barks_ocr_ray.functions.sketches import bloom_semi_join

    li = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"]
    )
    # the pushed predicate must be resolvable in the projected schema
    urgent = read_table(
        sf_dir,
        "orders",
        ["o_orderkey", "o_orderpriority"],
        predicate=_pds.field("o_orderpriority") == "1-URGENT",
    )
    matched = bloom_semi_join(
        li, urgent, on="l_orderkey", right_on="o_orderkey"
    )

    def _cents(t: pa.Table) -> pa.Table:
        import numpy as np

        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = round_like_duckdb(ext * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return (
        matched.map_batches(_cents, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=2)
        .aggregate(
            Count(alias_name="n"), Sum("cents", alias_name="revenue_cents")
        )
    )


SQL_Q78 = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""

_DAY_US = 86_400_000_000


def q79_cohort_retention(sf_dir: str):
    """Cohort retention: users grouped by their FIRST event's day, then
    distinct active users per (cohort_day, day offset) — the classic
    retention triangle. Execution shape: ONE keyed exchange on user_id
    co-locates each user's events; one vectorized pass per block
    computes first-ts per run, day offsets, and the DISTINCT
    (user, cohort, offset) triples (sort + shift-compare dedup — valid
    globally because a user lives in exactly one block); the final
    count per (cohort, offset) is a small aggregation over pre-deduped
    pairs, so `count(DISTINCT user)` never ships raw events."""
    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    # NOTE: a hash partition no user landed on (possible at tiny sf)
    # reaches the downstream aggregate as a schema-less empty — Ray 2.49
    # map_batches skips the UDF on ANY empty block, typed or not, so an
    # in-UDF typed-empty guard is unreachable (verified). Benign here:
    # the aggregate tolerates empties; at sf>=0.01 every partition is
    # populated and the executor's schema warning does not fire.
    def _cohort_block(t: pa.Table) -> pa.Table:
        import numpy as np

        idx = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        t = t.take(idx)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(users)
        pos = np.arange(n, dtype=np.int64)
        is_start = np.concatenate(([True], users[1:] != users[:-1]))
        run_start = np.maximum.accumulate(np.where(is_start, pos, 0))
        cohort_us = (ts_us[run_start] // _DAY_US) * _DAY_US
        offset = ts_us // _DAY_US - cohort_us // _DAY_US
        # distinct (user, cohort, offset): rows are sorted by (user, ts)
        # so equal triples are adjacent
        keep = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (offset[1:] != offset[:-1]))
        )
        return pa.table(
            {
                "cohort_day": pa.array(cohort_us[keep], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "offset_days": pa.array(offset[keep], pa.int64()),
            }
        )

    return (
        ev.repartition(16, keys=["user_id"])
        .map_batches(_cohort_block, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_day", "offset_days"], num_partitions=2)
        .aggregate(Count(alias_name="n_users"))
    )


SQL_Q79 = """
WITH f AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT cohort_day,
       date_diff('day', cohort_day, date_trunc('day', e.ts)) AS offset_days,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY cohort_day, offset_days
"""


GLOBAL_RANK_BANDS = 32
RANK_SAMPLE_CAP = 1024


def q80_global_rank(sf_dir: str):
    """Global row_number over a distributed order — the two-pass
    range-bucketed ranking pattern (Ray Data has no global window): a
    bounded deterministic sample (the IVF quantizer's md5-threshold
    rule) yields range boundaries, every row buckets locally, ONE tiny
    aggregation counts each band, the driver prefix-sums the band counts
    (GLOBAL_RANK_BANDS scalars — never rows), and a keyed exchange on
    band co-locates each band so rank = band_offset + local position.
    No global sort barrier: at 100 TB raise the band count well past the
    cluster width and the exchange stays balanced while the sample cap
    still bounds driver memory."""
    import hashlib as _hashlib

    import numpy as np

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        import numpy as np

        cents = round_like_duckdb(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    # two columns, reused by the sample pass, the count pass and the
    # rank pass — materialized once (key+id only, never the payload)
    ds = orders.map_batches(_cents, batch_format="pyarrow").materialize()
    n_rows = ds.count()
    frac = min(1.0, 4.0 * RANK_SAMPLE_CAP / max(1, n_rows))

    def _sample(t: pa.Table) -> pa.Table:
        keys = [
            _hashlib.md5(str(i).encode("utf-8")).hexdigest()
            for i in t.column("o_orderkey").to_pylist()
        ]
        keep = [int(k[:8], 16) / float(1 << 32) < frac for k in keys]
        return t.append_column("sample_key", pa.array(keys, pa.string())).filter(
            pa.array(keep, pa.bool_())
        )

    sample = (
        ds.map_batches(_sample, batch_format="pyarrow")
        .to_pandas()
        .sort_values("sample_key", kind="mergesort")
        .head(RANK_SAMPLE_CAP)
    )
    boundaries = np.unique(
        np.quantile(
            sample["cents"].to_numpy(),
            np.linspace(0, 1, GLOBAL_RANK_BANDS + 1)[1:-1],
            method="nearest",
        ).astype(np.int64)
    )

    def _bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t.column("cents").to_numpy(zero_copy_only=False)
        return t.append_column(
            "band",
            pa.array(np.searchsorted(boundaries, c, side="right"), pa.int64()),
        )

    banded = ds.map_batches(_bucket, batch_format="pyarrow")
    counts = banded.groupby("band", num_partitions=2).aggregate(
        Count(alias_name="n")
    ).to_pandas()
    # DESC ranking: a band's offset = total rows in HIGHER bands
    counts = counts.sort_values("band", ascending=False)
    offsets = dict(
        zip(counts["band"], counts["n"].cumsum().shift(fill_value=0))
    )

    def _rank_block(t: pa.Table) -> pa.Table:
        import numpy as np

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("band", "ascending"),
                ("cents", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        t = t.take(idx)
        band = t.column("band").to_numpy(zero_copy_only=False)
        n = len(band)
        pos = np.arange(n, dtype=np.int64)
        is_start = np.concatenate(([True], band[1:] != band[:-1]))
        run_start = np.maximum.accumulate(np.where(is_start, pos, 0))
        off = np.array([offsets[b] for b in band[is_start]], dtype=np.int64)
        off_full = np.repeat(off, np.diff(np.append(np.flatnonzero(is_start), n)))
        rank = off_full + (pos - run_start) + 1
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "global_rank": pa.array(rank, pa.int64()),
            }
        )

    return banded.repartition(8, keys=["band"]).map_batches(
        _rank_block, batch_format="pyarrow", batch_size=None
    )


SQL_Q80 = """
SELECT o_orderkey,
       CAST(row_number() OVER (
           ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC,
                    o_orderkey) AS BIGINT) AS global_rank
FROM orders
"""


def q81_corr_moments(sf_dir: str):
    """Distributed Pearson correlation / covariance via EXACT fixed-point
    moments: each block folds (n, Sx, Sy, Sxx, Syy, Sxy) over integer
    cents/units into ONE partial row, a single tiny aggregation sums
    them, and the driver evaluates the closed-form moments in one fixed
    float expression — so the result is bit-identical across any
    partitioning (float ops happen exactly once, on exact integer sums;
    the naive streaming-float corr is order-dependent). The oracle
    mirrors the same integer sums (HUGEINT) and the same final float
    expression. Units are whole DOLLARS so the int64 partial sums hold
    headroom (~1e4 price^2 rows per 1e18): the cross-block aggregate
    stays int64-safe past 1e9 rows of this table's magnitudes; beyond
    that, widen partials to two-limb int64 pairs (the exchange stays one
    row per block either way). The driver math runs in PYTHON ints —
    exact at any width — and floats enter exactly once."""
    import numpy as np

    li = read_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def _partials(t: pa.Table) -> pa.Table:
        import numpy as np

        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        dollars = round_like_duckdb(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(q)], pa.int64()),
                "sx": pa.array([int(q.sum())], pa.int64()),
                "sy": pa.array([int(dollars.sum())], pa.int64()),
                "sxx": pa.array([int((q * q).sum())], pa.int64()),
                "syy": pa.array([int((dollars * dollars).sum())], pa.int64()),
                "sxy": pa.array([int((q * dollars).sum())], pa.int64()),
            }
        )

    agg = li.map_batches(_partials, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
        Sum("sxy", alias_name="sxy"),
    )
    # Python ints: exact at any width (numpy int64 would wrap on n*syy)
    n, sx, sy = int(agg["n"]), int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    corr = float(num) / float(np.sqrt(float(d1) * float(d2)))
    covar_pop = float(num) / (float(n) * float(n))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "corr_qty_dollars": pa.array(
                round_like_duckdb(np.array([corr]), 9), pa.float64()
            ),
            "covar_pop_dollars": pa.array(
                round_like_duckdb(np.array([covar_pop]), 4), pa.float64()
            ),
        }
    )


SQL_Q81 = """
WITH m AS (
  SELECT count(*) AS n,
         sum(CAST(l_quantity AS HUGEINT)) AS sx,
         sum(CAST(round(l_extendedprice, 0) AS HUGEINT)) AS sy,
         sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx,
         sum(CAST(round(l_extendedprice, 0) AS HUGEINT)
             * CAST(round(l_extendedprice, 0) AS HUGEINT)) AS syy,
         sum(CAST(l_quantity AS HUGEINT)
             * CAST(round(l_extendedprice, 0) AS HUGEINT)) AS sxy
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 9)
           AS corr_qty_dollars,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4)
           AS covar_pop_dollars
FROM m
"""


class _VocabSideCombiner:
    """Per-block combiner for the distributed INTERSECT: one
    (word, in0, in1) partial per distinct word per block — the exchange
    carries vocabulary partials, never tokens (A1 discipline). Warm
    tokenizer state per actor (T3 pattern)."""

    def __init__(self):
        # Tokenizer is imported at MODULE level: __init__ runs on the
        # worker, where an in-body `from barks_ocr_ray ...` fails under
        # by-value pickling (CLAUDE.md corollary)
        self._tok = Tokenizer()

    def __call__(self, t: pa.Table) -> pa.Table:
        seen: dict[str, list[int]] = {}
        for s, src in zip(t.column("text"), t.column("source")):
            sv = src.as_py()
            if sv not in ("src0", "src1") or not s.is_valid:
                continue
            side = 0 if sv == "src0" else 1
            for w in self._tok.tokens(s.as_py()):
                seen.setdefault(w, [0, 0])[side] = 1
        return pa.table(
            {
                "word": pa.array(list(seen), pa.string()),
                "in0": pa.array([v[0] for v in seen.values()], pa.int64()),
                "in1": pa.array([v[1] for v in seen.values()], pa.int64()),
            }
        )


def q82_source_intersect(sf_dir: str):
    """Distributed INTERSECT (set semantics) — the vocabulary shared by
    src0 and src1 documents. Shape: per-block combiner dedups
    (word, side-flag) partials, ONE keyed aggregation ORs the flags, a
    vectorized filter keeps both-sides words. Set-difference sibling is
    q06 (anti join); a text-hash intersect is the same machinery with
    md5(text) as the key."""
    docs = read_table(sf_dir, "documents", ["text", "source"])

    both = (
        docs.map_batches(
            _VocabSideCombiner, batch_format="pyarrow", concurrency=(1, 4)
        )
        .groupby("word", num_partitions=2)
        .aggregate(Max("in0", alias_name="in0"), Max("in1", alias_name="in1"))
    )

    def _keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t.column("in0"), pa.scalar(1, pa.int64())),
            pc.equal(t.column("in1"), pa.scalar(1, pa.int64())),
        )
        return pa.table({"word": t.column("word").filter(mask)})

    res = both.map_batches(_keep, batch_format="pyarrow").materialize()
    if res.count() == 0:
        return pa.table({"word": pa.array([], pa.string())})
    return res


def _sql_q82() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
FROM documents WHERE source = 'src0'
INTERSECT
SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
FROM documents WHERE source = 'src1'
"""


def q83_cube(sf_dir: str):
    """GROUP BY CUBE(source, lang) — all four grouping sets from ONE
    full-data aggregation (q76 ROLLUP shape plus the lang-only level,
    also derived from the vocabulary-sized finest aggregate; the corpus
    is scanned exactly once regardless of grouping-set count)."""
    docs = read_table(sf_dir, "documents", ["source", "lang", "n_chars"])
    base = (
        docs.groupby(["source", "lang"], num_partitions=2)
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
        .materialize()
    )

    def _null_col(col: str):
        def _m(t: pa.Table) -> pa.Table:
            cols = {
                "source": t.column("source")
                if col != "source"
                else pa.nulls(t.num_rows, pa.string()),
                "lang": t.column("lang")
                if col != "lang"
                else pa.nulls(t.num_rows, pa.string()),
                "n_docs": t.column("n_docs"),
                "sum_chars": t.column("sum_chars"),
            }
            return pa.table(cols)

        return _m

    lvl_source = (
        base.groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .map_batches(_null_col("lang"), batch_format="pyarrow")
    )
    lvl_lang = (
        base.groupby("lang", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .map_batches(_null_col("source"), batch_format="pyarrow")
    )
    totals = base.aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
    )
    lvl0 = rd.from_arrow(
        pa.table(
            {
                "source": pa.nulls(1, pa.string()),
                "lang": pa.nulls(1, pa.string()),
                "n_docs": pa.array([totals["n_docs"]], pa.int64()),
                "sum_chars": pa.array([totals["sum_chars"]], pa.int64()),
            }
        )
    )
    return base.union(lvl_source, lvl_lang, lvl0)


SQL_Q83 = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE(source, lang)
"""


def q84_weighted_mean(sf_dir: str):
    """Grouped weighted mean on exact integer sums: quantity-weighted
    average price per returnflag. The partials (sum qty, sum qty*price
    in whole dollars) are exact int64; the division is the only float
    op, applied once per (tiny) group row — partitioning-invariant bits
    (q81 discipline, grouped)."""
    li = read_table(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def _partials(t: pa.Table) -> pa.Table:
        import numpy as np

        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        d = round_like_duckdb(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "w": pa.array(q, pa.int64()),
                "wx": pa.array(q * d, pa.int64()),
            }
        )

    agg = (
        li.map_batches(_partials, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=2)
        .aggregate(Sum("w", alias_name="w"), Sum("wx", alias_name="wx"))
    )

    def _mean(t: pa.Table) -> pa.Table:
        import numpy as np

        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        wx = t.column("wx").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "sum_qty": t.column("w"),
                "wavg_dollars": pa.array(
                    round_like_duckdb(wx / w, 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(_mean, batch_format="pyarrow")


SQL_Q84 = """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       round(CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(round(l_extendedprice, 0) AS BIGINT)) AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE), 6)
           AS wavg_dollars
FROM lineitem
GROUP BY l_returnflag
"""


def q85_cms_counts(sf_dir: str):
    """Count-Min sketch point-frequency estimates for a fixed probe
    word list (sketches.CMS_PROBES) over the documents token stream —
    the approximate-frequency sketch next to q67's HLL cardinality and
    q71's exact heavy hitters. Registers merge by addition (order
    independent), so the estimate is value-exact against the sequential
    golden fold (golden_dedup.golden_cms_counts)."""
    from barks_ocr_ray.functions.sketches import CMS_PROBES, cms_token_counts

    return cms_token_counts(
        read_table(sf_dir, "documents", ["text"]), "text", CMS_PROBES
    )


def q86_grouped_zscore(sf_dir: str):
    """Grouped z-score normalization of order prices (whole dollars)
    within each order priority — the canonical two-pass feature
    normalization: pass 1 folds exact int64 moment partials (n, S, SS)
    per group into ONE tiny aggregate; the driver derives mean/std per
    group with floats entering once (q81 discipline) and BROADCASTS the
    group table (5 rows) into pass 2's vectorized per-row standardize.
    The corpus is never exchanged — only moments move."""
    import numpy as np

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def _dollars(t: pa.Table) -> pa.Table:
        import numpy as np

        d = round_like_duckdb(
            t.column("o_totalprice").to_numpy(zero_copy_only=False), 0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "dollars": pa.array(d, pa.int64()),
            }
        )

    ds = orders.map_batches(_dollars, batch_format="pyarrow").materialize()

    def _moments(t: pa.Table) -> pa.Table:
        """Per-block moment partials via dictionary-encode + reduceat
        (the q120/q123 segment pattern) — one vectorized pass, no
        pandas hop, no per-group boolean masks."""
        import numpy as np

        d = t.column("dollars").to_numpy(zero_copy_only=False)
        enc = t.column("o_orderpriority").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cats = enc.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        codes_s, d_s = codes[order], d[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(codes_s)) + 1)
        )
        seg_n = np.diff(np.concatenate((starts, [len(codes_s)])))
        seg_s = np.add.reduceat(d_s, starts)
        seg_ss = np.add.reduceat(d_s * d_s, starts)
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [cats[c] for c in codes_s[starts]], pa.string()
                ),
                "n": pa.array(seg_n, pa.int64()),
                "s": pa.array(seg_s, pa.int64()),
                "ss": pa.array(seg_ss, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_moments, batch_format="pyarrow")
        .groupby("o_orderpriority", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .to_pandas()
    )
    stats: dict[str, tuple[float, float]] = {}
    for _, row in agg.iterrows():
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        mean = float(s) / float(n)
        std = float(
            np.sqrt(float(n * ss - s * s) / float(n * (n - 1)))
        )
        stats[row["o_orderpriority"]] = (mean, std)

    def _standardize(t: pa.Table) -> pa.Table:
        import numpy as np

        d = t.column("dollars").to_numpy(zero_copy_only=False).astype(np.float64)
        enc = t.column("o_orderpriority").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cats = enc.dictionary.to_pylist()
        mean = np.asarray([stats[c][0] for c in cats])[codes]
        std = np.asarray([stats[c][1] for c in cats])[codes]
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "zscore": pa.array(
                    round_like_duckdb((d - mean) / std, 6), pa.float64()
                ),
            }
        )

    return ds.map_batches(_standardize, batch_format="pyarrow")


SQL_Q86 = """
WITH m AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(CAST(round(o_totalprice, 0) AS HUGEINT)) AS s,
         sum(CAST(round(o_totalprice, 0) AS HUGEINT)
             * CAST(round(o_totalprice, 0) AS HUGEINT)) AS ss
  FROM orders GROUP BY o_orderpriority
),
st AS (
  SELECT o_orderpriority,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(CAST(n * ss - s * s AS DOUBLE)
              / CAST(n * (n - 1) AS DOUBLE)) AS std
  FROM m
)
SELECT o.o_orderkey, o.o_orderpriority,
       round((CAST(round(o.o_totalprice, 0) AS DOUBLE) - st.mean) / st.std, 6)
           AS zscore
FROM orders o JOIN st USING (o_orderpriority)
"""


def q87_bigram_logprob(sf_dir: str):
    """Per-doc mean negative log-prob under the corpus BIGRAM model
    (conditional MLE — the rung above q52's unigram perplexity filter);
    see text.bigram_logprob for the two-aggregation + two-join shape."""
    from barks_ocr_ray.functions.text import bigram_logprob

    return bigram_logprob(read_table(sf_dir, "documents", ["doc_id", "text"]))


def _sql_q87() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents),
idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, array_length(ws) - 1)) AS i
  FROM tok WHERE array_length(ws) >= 2),
bg AS (
  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
  FROM idx),
bf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
n12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS n12 FROM bf GROUP BY w1, w2),
n1 AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS n1 FROM bf GROUP BY w1)
SELECT doc_id,
       round(sum(tf * -ln(CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE)))
             / greatest(sum(tf), 1), 4) AS bigram_score
FROM bf JOIN n12 USING (w1, w2) JOIN n1 USING (w1)
GROUP BY doc_id
"""


Q88_CUT = 0.9


def q88_quantile_cut(sf_dir: str):
    """Quantile-cut corpus filter — keep documents at or above the p90
    length (the quality-threshold-selection shape: a cutoff derived FROM
    the distribution, not hardcoded). The threshold comes from the q66
    counting-quickselect exact quantile (driver holds one scalar) and is
    then a pushed vectorized filter; the corpus is never sorted."""
    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"]).materialize()
    thr = distributed_quantiles(
        docs, "n_chars", [Q88_CUT], pull_cap=200
    ).column("value")[0].as_py()

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("n_chars"), pa.scalar(int(thr), pa.int64()))
        )

    return docs.map_batches(_keep, batch_format="pyarrow")


SQL_Q88 = f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, {Q88_CUT}) FROM documents)
"""


def q89_local_supplier_volume(sf_dir: str):
    """TPC-H Q5-shaped multi-way join plan — revenue per nation where
    the ordering customer and the supplying supplier share a nation
    inside one region. Join plan by table scale (the whole point of the
    query): region x nation (25 rows) fold into ONE broadcast dict;
    customer and supplier SCALE with the corpus, so customer attaches to
    orders via a distributed hash join and supplier's nation attaches to
    lineitem via a second; the orders<->lineitem spine is the third
    (large x large); the same-nation predicate is a vectorized filter
    fused before the final vocabulary-sized aggregate. Exchanges: three
    keyed joins + one 25-key aggregate — nothing driver-side but the
    25-entry nation dict."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    asia = {
        int(nk): str(nn)
        for nk, nn, rk in zip(
            nation["n_nationkey"], nation["n_name"], nation["n_regionkey"]
        )
        if r2name[rk] == "ASIA"
    }

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_cust = orders.join(
        cust,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    supp = read_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li = read_table(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li_supp = li.join(
        supp,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )
    spine = li_supp.join(
        o_cust,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _local_revenue(t: pa.Table) -> pa.Table:
        import numpy as np

        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        in_asia = np.isin(cn, np.fromiter(asia, np.int64, len(asia)))
        keep = (cn == sn) & in_asia
        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        names = [asia[int(k)] for k in cn[keep]]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "rev": pa.array(ext * (1.0 - disc), pa.float64()),
            }
        )

    out = (
        spine.map_batches(_local_revenue, batch_format="pyarrow")
        .groupby("n_name", num_partitions=2)
        .aggregate(Count(alias_name="n_items"), Sum("rev", alias_name="revenue"))
    )
    return round_columns(out, {"revenue": 2})


SQL_Q89 = """
SELECT n_name, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q90_normalize_text(sf_dir: str):
    """Vectorized text canonicalization — the standard pre-dedup
    cleaning stage (NFC unicode normalize -> case fold -> whitespace
    collapse -> trim), all four as Arrow C kernels chained inside one
    map_batches; no Python touches a string. Null text passes through
    null (every kernel is null-propagating), matching the SQL."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _norm(t: pa.Table) -> pa.Table:
        s = t.column("text")
        s = pc.utf8_normalize(s, form="NFC")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": s,
                "n_chars_norm": pc.utf8_length(s).cast(pa.int64()),
            }
        )

    return docs.map_batches(_norm, batch_format="pyarrow")


SQL_Q90 = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
           AS norm_text,
       length(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')))
           AS n_chars_norm
FROM documents
"""


#: GPT-2-style pre-tokenizer regex, lookahead-free so the same RE2
#: pattern runs in both Arrow and DuckDB (the original's `\s+(?!\S)`
#: branch needs lookahead; dropping it only changes how trailing
#: whitespace runs split, identically on both engines)
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def q91_token_counts(sf_dir: str):
    """Per-doc token counts under two tokenizers — whitespace split and
    the BPE-ish GPT-2 pre-tokenizer regex — both as single
    count_substring_regex C kernel passes (the budget/pricing signal a
    training pipeline tracks per document; no Python per string)."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _count(t: pa.Table) -> pa.Table:
        s = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_ws_tokens": pc.count_substring_regex(s, r"\S+").cast(
                    pa.int64()
                ),
                "n_bpe_tokens": pc.count_substring_regex(
                    s, BPE_TOKEN_RE
                ).cast(pa.int64()),
            }
        )

    return docs.map_batches(_count, batch_format="pyarrow")


def _sql_q91() -> str:
    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(array_length(regexp_extract_all(text, '\\S+')) AS BIGINT)
           AS n_ws_tokens,
       CAST(array_length(regexp_extract_all(text, '{pat}')) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""


#: funnel pattern over per-user event-initial sequences: a click with a
#: later purchase and no purchase in between (the classic conversion
#: path); event initials are unique (signup/click/error/view/purchase)
EVENT_PATTERN = "c[^p]*p"


def q92_event_pattern(sf_dir: str):
    """Sequence-pattern mining over per-user event streams: users whose
    time-ordered event sequence matches EVENT_PATTERN (regex over the
    event-initial string — the sequence analog of a funnel). ONE keyed
    exchange on user co-locates each user's events; each block sorts
    once, folds per-user initial strings at run boundaries, and runs one
    compiled regex per user — a user's whole history is the unit of
    compute, so the op scales with users, not with pattern count."""
    import re as _re

    ev = read_table(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    pat = _re.compile(EVENT_PATTERN)

    def _match_block(t: pa.Table) -> pa.Table:
        import numpy as np

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = t.take(idx)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        initials = pc.utf8_slice_codeunits(
            t.column("event_type"), 0, 1
        ).to_pylist()
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1]))
        )
        bounds = np.append(starts, len(users))
        out = [
            int(users[s])
            for s, e in zip(bounds[:-1], bounds[1:])
            if pat.search("".join(initials[s:e]))
        ]
        return pa.table({"user_id": pa.array(out, pa.int64())})

    return ev.repartition(16, keys=["user_id"]).map_batches(
        _match_block, batch_format="pyarrow", batch_size=None
    )


SQL_Q92 = f"""
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id FROM s WHERE regexp_matches(seq, '{EVENT_PATTERN}')
"""


Q93_MIN_COUNT = 5
Q93_K = 20


def q93_pmi_collocations(sf_dir: str):
    """Collocation mining: top-k bigrams by pointwise mutual information
    (PMI = ln(N*n12 / (n1*n2)), min-count floored — the classic
    association measure for phrase discovery). Reuses the q87 bigram
    partials; all three count tables are vocabulary-sized, so the two
    attach joins and the final sort+limit exchange bounded state no
    matter the corpus size. Ties break on (w1, w2) for a total order."""
    import numpy as np
    from barks_ocr_ray.functions.text import DocBigramCounts, VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    bf = docs.map_batches(
        DocBigramCounts, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()
    n_total = int(bf.sum("tf") or 0)
    n12 = bf.groupby(["w1", "w2"], num_partitions=VOCAB_PARTITIONS).aggregate(
        Sum("tf", alias_name="n12")
    )

    def _floor(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("n12"), pa.scalar(Q93_MIN_COUNT, pa.int64()))
        )

    n12 = n12.map_batches(_floor, batch_format="pyarrow")
    n1 = bf.groupby("w1", num_partitions=VOCAB_PARTITIONS).aggregate(
        Sum("tf", alias_name="n1")
    )

    def _w2_rows(t: pa.Table) -> pa.Table:
        return pa.table({"w2": t.column("w2"), "tf": t.column("tf")})

    n2 = (
        bf.map_batches(_w2_rows, batch_format="pyarrow")
        .groupby("w2", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("tf", alias_name="n2"))
    )
    joined = n12.join(
        n1, join_type="inner", num_partitions=VOCAB_PARTITIONS, on=("w1",)
    ).join(n2, join_type="inner", num_partitions=VOCAB_PARTITIONS, on=("w2",))

    def _pmi(t: pa.Table) -> pa.Table:
        a = (
            float(n_total)
            * t.column("n12").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        b = t.column("n1").to_numpy(zero_copy_only=False).astype(
            np.float64
        ) * t.column("n2").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "n12": t.column("n12"),
                "pmi": pa.array(
                    round_like_duckdb(np.log(a / b), 6), pa.float64()
                ),
            }
        )

    return (
        joined.map_batches(_pmi, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(Q93_K)
    )


def _sql_q93() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents),
idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, array_length(ws) - 1)) AS i
  FROM tok WHERE array_length(ws) >= 2),
bg AS (
  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
  FROM idx),
bf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n FROM bf),
n12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS n12 FROM bf GROUP BY w1, w2
        HAVING sum(tf) >= {Q93_MIN_COUNT}),
n1 AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS n1 FROM bf GROUP BY w1),
n2 AS (SELECT w2, CAST(sum(tf) AS BIGINT) AS n2 FROM bf GROUP BY w2)
SELECT w1, w2, n12,
       round(ln((CAST(n AS DOUBLE) * CAST(n12 AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6) AS pmi
FROM n12 JOIN n1 USING (w1) JOIN n2 USING (w2) CROSS JOIN tot
ORDER BY pmi DESC, w1, w2 LIMIT {Q93_K}
"""


Q94_ITERS = 5
Q94_K = 20


def q94_pagerank(sf_dir: str):
    """Distributed PageRank over the customer<->supplier trade graph
    (edges = distinct (custkey, suppkey) pairs through orders x
    lineitem, symmetrized). The iterative join-propagate-aggregate loop
    lives in `functions/graph.py` (the same loop family as the
    reference's duplicate-chain resolution, ocr_check.py:521-538);
    fixed-point int64 micro-ranks make the distributed sum bit-exact
    against the oracle's serial replay under any partitioning."""
    from barks_ocr_ray.functions.graph import pagerank

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    od = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        od,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _pairs(t: pa.Table) -> pa.Table:
        cust = pc.binary_join_element_wise(
            pa.scalar("C"),
            pc.cast(t.column("o_custkey"), pa.string()),
            "",
        )
        supp = pc.binary_join_element_wise(
            pa.scalar("S"),
            pc.cast(t.column("l_suppkey"), pa.string()),
            "",
        )
        return pa.table({"src": cust, "dst": supp})

    pr = pagerank(
        joined.map_batches(_pairs, batch_format="pyarrow"),
        iterations=Q94_ITERS,
    )
    return pr.sort(["pr", "node"], descending=[True, False]).limit(Q94_K)


def _sql_q94() -> str:
    """Serial replay of the identical fixed-point recurrence, iterations
    unrolled as chained CTEs (DuckDB has no iterative operator; 5 rounds
    of join+group-sum are exactly what the engine's loop does)."""
    from barks_ocr_ray.functions.graph import DAMP_DEN, DAMP_NUM, SCALE

    ctes = [
        """e0 AS (
  SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                  'S' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (SELECT src, dst FROM e0
          UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (SELECT node, CAST({scale} // nn.n AS BIGINT) AS pr
       FROM deg CROSS JOIN nn)""".format(scale=SCALE)
    ]
    for k in range(1, Q94_ITERS + 1):
        ctes.append(
            """r{k} AS (
  SELECT deg.node AS node,
         CAST((15 * {scale}) // (100 * nn.n) + COALESCE(c.contrib, 0)
              AS BIGINT) AS pr
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(((r.pr // d2.outdeg) * {dn}) // {dd}) AS BIGINT)
             AS contrib
    FROM edges e
    JOIN r{prev} r ON e.src = r.node
    JOIN deg d2 ON d2.node = e.src
    GROUP BY e.dst) c ON c.node = deg.node)""".format(
                k=k, prev=k - 1, scale=SCALE, dn=DAMP_NUM, dd=DAMP_DEN
            )
        )
    return "WITH {ctes}\nSELECT node, pr FROM r{last}\nORDER BY pr DESC, node LIMIT {lim}".format(
        ctes=",\n".join(ctes), last=Q94_ITERS, lim=Q94_K
    )


Q95_TARGET_LANG = "en"
Q95_K = 100


def q95_importance_resample(sf_dir: str):
    """DSIR-style importance resampling (hashed-unigram log-ratio
    scoring against the lang='en' target subcorpus): two corpus passes,
    K-sized (64-bucket) aggregation state, zero doc-keyed exchange —
    see functions/importance.py for the scale notes."""
    from barks_ocr_ray.functions.importance import importance_resample

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    return importance_resample(docs, Q95_TARGET_LANG, Q95_K)


def _sql_q95() -> str:
    from barks_ocr_ray.functions.importance import N_BUCKETS
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
  FROM documents),
b AS (
  SELECT doc_id, lang,
         CAST(CAST(('0x' || substring(md5(w), 1, 8)) AS UBIGINT)
              % {N_BUCKETS} AS BIGINT) AS bucket
  FROM tok),
cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM b GROUP BY bucket),
ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM b
       WHERE lang = '{Q95_TARGET_LANG}' GROUP BY bucket),
tot AS (SELECT CAST(sum(cr.cr) AS BIGINT) AS tr,
               (SELECT CAST(coalesce(sum(ct.ct), 0) AS BIGINT) FROM ct) AS tt
        FROM cr),
wts AS (
  SELECT cr.bucket,
         CAST(round(ln(((COALESCE(ct.ct, 0) + 1.0)
                        * CAST(tot.tr + {N_BUCKETS} AS DOUBLE))
                       / ((cr.cr + 1.0)
                          * CAST(tot.tt + {N_BUCKETS} AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS w
  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tot)
SELECT b.doc_id, CAST(sum(wts.w) AS BIGINT) AS score_micro
FROM b JOIN wts ON b.bucket = wts.bucket
GROUP BY b.doc_id
ORDER BY score_micro DESC, b.doc_id
LIMIT {Q95_K}
"""


def q96_evolving_schema_union(sf_dir: str):
    """Schema-evolution read: two shard generations of the same corpus
    (gen A carries doc_id+lang, gen B carries doc_id+n_chars) are read
    as ONE dataset with the union-by-name schema, missing columns null
    — `functions/storage.read_evolving_parquet`. The shard dirs are
    materialized deterministically from the sf corpus on each call, so
    the operator under test is the read, not the fixture."""
    import shutil

    from barks_ocr_ray.functions.storage import read_evolving_parquet

    base = "/tmp/barks_q96_" + os.path.basename(sf_dir.rstrip("/"))
    shutil.rmtree(base, ignore_errors=True)
    read_table(sf_dir, "documents", ["doc_id", "lang"]).write_parquet(
        f"{base}/gen_a"
    )
    read_table(sf_dir, "documents", ["doc_id", "n_chars"]).write_parquet(
        f"{base}/gen_b"
    )
    unified = read_evolving_parquet([f"{base}/gen_a", f"{base}/gen_b"])

    # int64 nulls become NaN floats in the driver's pandas compare, and
    # NaN defeats its exact-equality check — project the evolution gaps
    # to sentinels for the oracle diff (the null semantics themselves
    # are pinned by tests/test_storage.py)
    def _fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang").fill_null(""),
                "n_chars": t.column("n_chars").fill_null(-1),
            }
        )

    return unified.map_batches(_fill, batch_format="pyarrow")


SQL_Q96 = """
SELECT doc_id, lang, CAST(-1 AS BIGINT) AS n_chars FROM documents
UNION ALL
SELECT doc_id, '' AS lang, n_chars FROM documents
"""

Q97_TARGET_ROWS = 2048


def q97_compaction(sf_dir: str):
    """Small-file compaction: the corpus is fragmented into 32 tiny
    parquet files, `storage.compact_parquet` rewrites them into
    ~Q97_TARGET_ROWS-row files (block-coalescing repartition, no key
    exchange), and the result aggregates per source FROM THE COMPACTED
    OUTPUT — so the oracle match proves compaction preserved every row.
    The file-count contract is pinned separately in tests/test_storage."""
    import shutil

    from barks_ocr_ray.functions.storage import compact_parquet

    base = "/tmp/barks_q97_" + os.path.basename(sf_dir.rstrip("/"))
    shutil.rmtree(base, ignore_errors=True)
    read_table(
        sf_dir, "documents", ["doc_id", "source", "n_chars"]
    ).repartition(32).write_parquet(f"{base}/small")
    compact_parquet(f"{base}/small", f"{base}/compacted", Q97_TARGET_ROWS)
    out = (
        rd.read_parquet(f"{base}/compacted")
        .map_batches(strip_schema_metadata, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Count(alias_name="rows"), Sum("n_chars", alias_name="chars")
        )
    )
    return out


SQL_Q97 = """
SELECT source, count(*) AS rows, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY source
"""


Q98_WINDOW = 3
Q98_DIST = 4
Q98_KEY_LEN = 24


def q98_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood (merge/purge) near-dup pairs: global key
    order without a global sort barrier via q80's range-bucket pattern;
    cross-band pairs come from a boundary table bounded by the band
    count. See dedupe.sorted_neighborhood_pairs for the scale notes."""
    from barks_ocr_ray.functions.dedupe import sorted_neighborhood_pairs

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return sorted_neighborhood_pairs(
        docs,
        window=Q98_WINDOW,
        max_dist=Q98_DIST,
        key_len=Q98_KEY_LEN,
        n_bands=6,
    )


SQL_Q98 = f"""
WITH s AS (
  SELECT doc_id,
         substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                   1, {Q98_KEY_LEN}) AS skey
  FROM documents WHERE text IS NOT NULL),
r AS (SELECT doc_id, skey,
             row_number() OVER (ORDER BY skey, doc_id) AS rk FROM s)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.skey, b.skey) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + {Q98_WINDOW}
WHERE levenshtein(a.skey, b.skey) <= {Q98_DIST}
"""


def q99_returned_item_revenue(sf_dir: str):
    """TPC-H Q10-shaped plan: revenue lost to returned items per
    customer, top 20. Plan by table scale: the returnflag predicate is
    PUSHED TO THE SCANNER (row groups without 'R' rows never leave
    storage), per-row cents are fixed-point so the distributed sum is
    order-independent, revenue pre-aggregates per customer BEFORE the
    customer join (the join's left side shrinks from lineitem-sized to
    customer-sized), and the 25-row nation table broadcasts."""
    import pyarrow.dataset as pads

    # the pushed filter binds against the pruned schema, so the
    # predicate column rides in the projection (q68 precedent)
    li = read_table(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        predicate=(pads.field("l_returnflag") == "R"),
    )

    def _cents(t: pa.Table) -> pa.Table:
        import numpy as np

        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = round_like_duckdb(ext * (1.0 - disc) * 100.0, 0).astype(
            np.int64
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    spine = li.map_batches(_cents, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = spine.groupby(
        "o_custkey", num_partitions=hash_partitions(16)
    ).aggregate(Sum("cents", alias_name="revenue_cents"))

    cust = read_table(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]
    )
    named = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    nation = read_table(sf_dir, "nation").to_pandas()
    named = broadcast_lookup_column(
        named,
        dict(zip(nation["n_nationkey"], nation["n_name"])),
        "c_nationkey",
        "n_name",
        pa.string(),
    )

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "n_name": t.column("n_name"),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return (
        named.map_batches(_proj, batch_format="pyarrow")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(20)
    )


SQL_Q99 = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def q100_readability(sf_dir: str):
    """Flesch reading-ease scoring (classic readability heuristic:
    vowel-group syllable proxy) — pure vectorized RE2 kernels per
    batch, no exchange at all; per-row float arithmetic is
    order-independent so the score is exact vs the SQL replay."""
    from barks_ocr_ray.functions.text import flesch_readability

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return flesch_readability(docs)


def _sql_q100() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(lower(text), '{TOKEN_RE}'))
              AS BIGINT) AS n_words,
         CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syllables
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
FROM t WHERE n_words > 0
"""


def q101_corpus_profile(sf_dir: str):
    """Shared-scan corpus profile: ONE corpus read answers doc count,
    token total, null-text count and the per-language histogram at once
    (text.corpus_profile) — the scan-amortization pattern a 100 TB user
    runs instead of N separate aggregation jobs."""
    from barks_ocr_ray.functions.text import corpus_profile

    docs = read_table(sf_dir, "documents", ["text", "lang"])
    return corpus_profile(docs)


def _sql_q101() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
SELECT 'n_docs' AS stat, CAST(count(*) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 'n_tokens',
       CAST(coalesce(sum(length(regexp_extract_all(lower(text),
                                                   '{TOKEN_RE}'))), 0)
            AS BIGINT)
FROM documents WHERE text IS NOT NULL
UNION ALL
SELECT 'null_text', CAST(count(*) AS BIGINT)
FROM documents WHERE text IS NULL
UNION ALL
SELECT 'lang:' || lang, CAST(count(*) AS BIGINT)
FROM documents GROUP BY lang
"""


def q102_hll_grouped(sf_dir: str):
    """Approximate distinct users per event type — mergeable HLL
    sketches BY KEY (sketches.hll_grouped_distinct): the exchange ships
    occupied (group, register) maxima, never raw user ids. Register
    max-merge is order-independent, so the estimate is bit-exact vs the
    sequential golden replay at any partitioning."""
    from barks_ocr_ray.functions.sketches import hll_grouped_distinct

    events = read_table(sf_dir, "events", ["event_type", "user_id"])
    return hll_grouped_distinct(events, "event_type", "user_id")


Q103_K = 30  # k-anonymity threshold over the (lang, source) quasi-id


def q103_k_anonymity(sf_dir: str):
    """k-anonymity suppression: docs whose (lang, source) quasi-
    identifier group has fewer than K members get both fields masked
    to '*'. The group-size table is quasi-identifier-sized (langs x
    sources, bounded), so it folds into ONE broadcast dict and the
    suppression is a vectorized per-block mask — no doc-keyed exchange
    at all (the privacy sibling of q61's PII redaction)."""
    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    sizes = (
        docs.groupby(["lang", "source"], num_partitions=2)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )  # quasi-identifier-sized, never corpus-sized
    small = {
        (l, s)
        for l, s, n in zip(sizes["lang"], sizes["source"], sizes["n"])
        if n < Q103_K
    }

    def _mask(t: pa.Table) -> pa.Table:
        import numpy as np

        langs = t.column("lang").to_numpy(zero_copy_only=False)
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        hit = np.fromiter(
            ((l, s) in small for l, s in zip(langs, srcs)),
            np.bool_,
            t.num_rows,
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_anon": pa.array(
                    np.where(hit, "*", langs), pa.string()
                ),
                "source_anon": pa.array(
                    np.where(hit, "*", srcs), pa.string()
                ),
            }
        )

    return docs.map_batches(_mask, batch_format="pyarrow")


SQL_Q103 = f"""
WITH g AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source)
SELECT doc_id,
       CASE WHEN g.n < {Q103_K} THEN '*' ELSE documents.lang END
         AS lang_anon,
       CASE WHEN g.n < {Q103_K} THEN '*' ELSE documents.source END
         AS source_anon
FROM documents
JOIN g ON documents.lang = g.lang AND documents.source = g.source
"""


Q104_LANGS = ("de", "en", "es", "fr", "zh")


def q104_expectations(sf_dir: str):
    """Data-quality expectations audit (great-expectations style): each
    rule is a vectorized per-block mask whose violation counts
    pre-aggregate inside the scan (one long-format partial row per rule
    per block); the uniqueness rule is the only keyed exchange and it
    ships (doc_id, count) partials. Output: (rule, violations)."""
    docs = read_table(
        sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"]
    )

    def _rule_partials(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_chars = t.column("n_chars")
        viol_null = t.num_rows - pc.sum(pc.is_valid(text)).as_py()
        lens = pc.utf8_length(text).cast(pa.int64())
        viol_len = pc.sum(
            pc.fill_null(pc.not_equal(lens, n_chars), True)
        ).as_py()
        viol_lang = t.num_rows - pc.sum(
            pc.is_in(t.column("lang"), value_set=pa.array(Q104_LANGS))
        ).as_py()
        return pa.table(
            {
                "rule": pa.array(
                    ["text_not_null", "n_chars_matches", "lang_known"],
                    pa.string(),
                ),
                "violations": pa.array(
                    [int(viol_null), int(viol_len), int(viol_lang)],
                    pa.int64(),
                ),
            }
        )

    rules = (
        docs.map_batches(_rule_partials, batch_format="pyarrow")
        .groupby("rule", num_partitions=2)
        .aggregate(Sum("violations", alias_name="violations"))
    )

    # uniqueness: rows whose doc_id occurs more than once
    def _dups_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(t.column("count()"), pa.scalar(1, pa.int64()))
        )

    dup_rows = (
        docs.groupby("doc_id", num_partitions=hash_partitions(16))
        .count()
        .map_batches(_dups_only, batch_format="pyarrow")
    )
    n_dup = int(dup_rows.sum("count()") or 0)
    uniq = rd.from_arrow(
        pa.table(
            {
                "rule": pa.array(["doc_id_unique"], pa.string()),
                "violations": pa.array([n_dup], pa.int64()),
            }
        )
    )
    return rules.union(uniq)


def _sql_q104() -> str:
    langs = ", ".join(f"'{l}'" for l in Q104_LANGS)
    return f"""
SELECT 'text_not_null' AS rule, CAST(count(*) AS BIGINT) AS violations
FROM documents WHERE text IS NULL
UNION ALL
SELECT 'n_chars_matches', CAST(count(*) AS BIGINT) FROM documents
WHERE text IS NULL OR length(text) != n_chars
UNION ALL
SELECT 'lang_known', CAST(count(*) AS BIGINT) FROM documents
WHERE lang NOT IN ({langs}) OR lang IS NULL
UNION ALL
SELECT 'doc_id_unique',
       CAST(coalesce(sum(c), 0) AS BIGINT)
FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id
      HAVING count(*) > 1)
"""


def q105_cdc_merge(sf_dir: str):
    """Change-data-capture upsert (lakehouse MERGE INTO): apply a
    deltas stream (insert / update / delete, sequence-ordered) to the
    base table — latest op per key wins, deletes drop the row. One
    keyed exchange on doc_id; the winner pick is a vectorized per-group
    argmax (the O4 argmax family applied to table maintenance). The
    deltas are synthesized deterministically from the sf corpus so the
    operator under test is the merge, not the fixture."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "op": pa.array(["base"] * n, pa.string()),
                "seq": pa.array([0] * n, pa.int64()),
            }
        )

    def _deltas(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        upd = ids % 7 == 0
        dele = ids % 11 == 0
        out_id, out_text, out_op, out_seq = [], [], [], []
        texts = t.column("text").to_pylist()
        for i, (d, u, x) in enumerate(zip(ids, upd, dele)):
            if u:
                out_id.append(int(d))
                out_text.append((texts[i] or "").upper())
                out_op.append("update")
                out_seq.append(1)
            if x:
                out_id.append(int(d))
                out_text.append(None)
                out_op.append("delete")
                out_seq.append(2)
            # inserts: a new row keyed past the base id space
            if d % 13 == 0:
                out_id.append(int(d) + 10_000_000)
                out_text.append(f"inserted {int(d)}")
                out_op.append("insert")
                out_seq.append(1)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "op": pa.array(out_op, pa.string()),
                "seq": pa.array(out_seq, pa.int64()),
            }
        )

    base = docs.map_batches(_base, batch_format="pyarrow")
    deltas = docs.map_batches(_deltas, batch_format="pyarrow")

    def _merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = (
            t.to_pandas()
            .sort_values(["doc_id", "seq"], kind="mergesort")
            .groupby("doc_id", sort=True)
            .tail(1)
        )
        df = df[df["op"] != "delete"]
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy(), pa.int64()
                ),
                "text": pa.array(df["text"].tolist(), pa.string()),
            }
        )

    merged = (
        base.union(deltas)
        .groupby("doc_id", num_partitions=hash_partitions(16))
        .map_groups(_merge, batch_format="pyarrow")
    )
    return merged


def _sql_q105() -> str:
    return """
WITH deltas AS (
  SELECT doc_id, upper(coalesce(text, '')) AS text,
         'update' AS op, 1 AS seq
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, NULL, 'delete', 2 FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 10000000, 'inserted ' || CAST(doc_id AS VARCHAR),
         'insert', 1
  FROM documents WHERE doc_id % 13 = 0),
unioned AS (
  SELECT doc_id, text, 'base' AS op, 0 AS seq FROM documents
  UNION ALL SELECT * FROM deltas),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC)
         AS rk
  FROM unioned)
SELECT doc_id, text FROM ranked WHERE rk = 1 AND op != 'delete'
"""


def q106_fk_audit(sf_dir: str):
    """Referential-integrity audit across tables (the cross-table rung
    of q104's expectations): count of orders whose customer is missing
    and of lineitems whose order is missing, each as a distributed
    left-outer join + vectorized null count pre-aggregated per block
    (q06's anti-join machinery, counting instead of emitting)."""

    def _orphans(left, right, on, right_on, rule):
        from barks_ocr_ray.functions.relational import compact_nonempty

        right_c, _ = compact_nonempty(right, 16)
        joined = left.join(
            right_c,
            join_type="left_outer",
            num_partitions=hash_partitions(16),
            on=(on,),
            right_on=(right_on,),
        )

        def _count_nulls(t: pa.Table) -> pa.Table:
            n = t.num_rows - pc.sum(
                pc.is_valid(t.column("_marker"))
            ).as_py()
            return pa.table(
                {
                    "rule": pa.array([rule], pa.string()),
                    "violations": pa.array([int(n)], pa.int64()),
                }
            )

        return joined.map_batches(
            _count_nulls, batch_format="pyarrow"
        ).groupby("rule", num_partitions=1).aggregate(
            Sum("violations", alias_name="violations")
        )

    def _marked(ds, key):
        def _m(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: t.column(key),
                    "_marker": pa.array([1] * t.num_rows, pa.int64()),
                }
            )

        return ds.map_batches(_m, batch_format="pyarrow")

    cust = _marked(read_table(sf_dir, "customer", ["c_custkey"]), "c_custkey")
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    a = _orphans(
        orders, cust, "o_custkey", "c_custkey", "orders_missing_customer"
    )
    okeys = _marked(
        read_table(sf_dir, "orders", ["o_orderkey"]), "o_orderkey"
    )
    li = read_table(sf_dir, "lineitem", ["l_orderkey"])
    b = _orphans(
        li, okeys, "l_orderkey", "o_orderkey", "lineitem_missing_order"
    )
    return a.union(b)


SQL_Q106 = """
SELECT 'orders_missing_customer' AS rule,
       CAST(count(*) AS BIGINT) AS violations
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL
UNION ALL
SELECT 'lineitem_missing_order', CAST(count(*) AS BIGINT)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey IS NULL
"""


def q107_pq_topk(sf_dir: str):
    """Product-quantization approximate top-k (ann.pq_topk): vectors
    compress to M uint8 codes (~32x smaller than float32 — the
    fit-in-object-store path at 100 TB), queries score through ADC
    lookup tables. Same bounded deterministic training sample as IVF;
    bit-exact vs the sequential golden replay."""
    from barks_ocr_ray.functions.ann import pq_topk

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_topk(emb, list(range(8)), k=10)


def q108_json_props(sf_dir: str):
    """Semi-structured extraction: pull the numeric property out of the
    JSON `props` column and aggregate per event type. The engine
    extracts with ONE vectorized RE2 kernel pass (pc.extract_regex) and
    pre-aggregates (n, sum, max) partials inside the scan; the oracle
    parses with DuckDB's real json_extract — two independent
    implementations of the same semantics."""
    ev = read_table(sf_dir, "events", ["event_type", "props"])

    def _partials(t: pa.Table) -> pa.Table:
        ks = pc.struct_field(
            pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)'),
            "k",
        )
        k = pc.cast(ks, pa.int64())
        g = (
            pa.table({"event_type": t.column("event_type"), "k": k})
            .group_by("event_type")
            .aggregate(
                [("k", "count"), ("k", "sum"), ("k", "max")]
            )
        )
        return g.rename_columns(["event_type", "n", "sum_k", "max_k"])

    return (
        ev.map_batches(_partials, batch_format="pyarrow")
        .groupby("event_type", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


SQL_Q108 = """
SELECT event_type, CAST(count(k) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


Q109_WATERMARK_MIN = 120  # late tolerance per user, in minutes


def q109_watermark_late_events(sf_dir: str):
    """Streaming-semantics watermark audit: per user, events whose ts
    falls more than WATERMARK behind the user's high-water mark
    (max ts seen) are 'late' and would be dropped by a streaming
    window. One keyed exchange on user; the per-group pass is a
    vectorized max + threshold. Output: late events per user."""
    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _late(t: pa.Table) -> pa.Table:
        import numpy as np

        ts = t.column("ts").to_numpy(zero_copy_only=False)
        hwm = ts.max()
        cutoff = hwm - np.timedelta64(Q109_WATERMARK_MIN * 60, "s")
        late = ts < cutoff
        return pa.table(
            {
                "user_id": t.column("user_id").slice(0, 1),
                "n_late": pa.array([int(late.sum())], pa.int64()),
                "n_events": pa.array([t.num_rows], pa.int64()),
            }
        )

    out = ev.groupby(
        "user_id", num_partitions=hash_partitions(16)
    ).map_groups(_late, batch_format="pyarrow")

    def _nonzero(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater(t.column("n_late"), pa.scalar(0, pa.int64()))
        )

    return out.map_batches(_nonzero, batch_format="pyarrow")


SQL_Q109 = f"""
WITH m AS (
  SELECT user_id, max(ts) AS hwm, count(*) AS n_events FROM events
  GROUP BY user_id)
SELECT events.user_id,
       CAST(count(*) AS BIGINT) AS n_late,
       CAST(any_value(m.n_events) AS BIGINT) AS n_events
FROM events JOIN m ON events.user_id = m.user_id
WHERE events.ts < m.hwm - INTERVAL {Q109_WATERMARK_MIN} MINUTE
GROUP BY events.user_id
"""


Q110_MIN_DOCS = 5  # n-grams in >= this many docs are boilerplate


def q110_boilerplate_ngrams(sf_dir: str):
    """C4/RefinedWeb-style boilerplate n-gram audit: per doc, the share
    of token-trigram occurrences whose trigram appears in >= MIN_DOCS
    distinct docs corpus-wide. Frequent set from block-level df
    partials; one corpus-scale ngram join; totals block-local.
    Token-n-gram-granularity sibling of q59's paragraph_dedup (which
    scrubs at line granularity and rewrites text); this one emits the
    per-doc boilerplate FRACTION the drop decision reads."""
    from barks_ocr_ray.functions.curation import boilerplate_ngram_stats

    return boilerplate_ngram_stats(
        read_table(sf_dir, "documents", ["doc_id", "text"]),
        min_docs=Q110_MIN_DOCS,
    )


def _sql_q110() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
g AS (
  SELECT doc_id, list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
  FROM t WHERE len(toks) >= 3),
e AS (SELECT doc_id, unnest(grams) AS ngram FROM g),
d AS (SELECT DISTINCT doc_id, ngram FROM e),
f AS (SELECT ngram
      FROM (SELECT ngram, count(*) AS nd FROM d GROUP BY 1)
      WHERE nd >= {Q110_MIN_DOCS}),
b AS (SELECT e.doc_id, count(*) AS n_boiler
      FROM e JOIN f USING (ngram) GROUP BY 1)
SELECT g.doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(coalesce(b.n_boiler, 0) AS BIGINT) AS n_boiler,
       round(coalesce(b.n_boiler, 0) / CAST(len(grams) AS DOUBLE), 4)
         AS boiler_frac
FROM g LEFT JOIN b USING (doc_id)
"""


def q111_repetition_filter(sf_dir: str):
    """Gopher repetition quality filters: per-doc duplicate-token
    fraction and most-frequent-bigram fraction, one vectorized Arrow
    split + numpy run-length pass per block (zero exchange). The
    vectorized upgrade of q57's per-row-Counter kernel, adding the
    duplicate-token gate q57 lacks (q57 keeps the top-3-gram gate)."""
    from barks_ocr_ray.functions.curation import repetition_stats

    return repetition_stats(
        read_table(sf_dir, "documents", ["doc_id", "text"])
    )


def _sql_q111() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
u AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams
  FROM t WHERE len(toks) >= 2),
bc AS (SELECT doc_id, bg, count(*) AS c
       FROM (SELECT doc_id, unnest(bigrams) AS bg FROM u) GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY 1)
SELECT u.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(top.top_bigram_n AS BIGINT) AS top_bigram_n,
       round(1.0 - n_distinct / CAST(n_tokens AS DOUBLE), 4)
         AS dup_token_frac,
       round(top.top_bigram_n / CAST(n_tokens - 1 AS DOUBLE), 4)
         AS top_bigram_frac
FROM u JOIN top USING (doc_id)
"""


Q112_HOLDOUT_FRAC = 0.1
Q112_WINDOW = 8


def q112_decontaminate(sf_dir: str):
    """Benchmark decontamination: training docs (md5 fraction >= 0.1)
    sharing any exact 8-token window with the held-out slice, with the
    count of contaminated windows — a distributed semi-join on window
    hashes (q53's explode, decontamination semantics). Scale sibling of
    q60: q60 broadcasts a benchmark-sized shingle set (zero exchange);
    this variant joins distributed hash tables, the shape needed when
    the holdout itself is too big to broadcast, and reports per-doc hit
    counts rather than a flag."""
    from barks_ocr_ray.functions.curation import decontaminate

    return decontaminate(
        read_table(sf_dir, "documents", ["doc_id", "text"]),
        holdout_frac=Q112_HOLDOUT_FRAC,
        window=Q112_WINDOW,
    )


def _sql_q112() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    w = Q112_WINDOW
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= {w}),
w AS (
  SELECT DISTINCT doc_id, u,
         substring(md5(array_to_string(toks[i:i+{w - 1}], ' ')), 1, 16) AS h
  FROM t, UNNEST(range(1, len(toks) - {w} + 2)) AS un(i)),
hold AS (SELECT DISTINCT h FROM w WHERE u < {Q112_HOLDOUT_FRAC})
SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM w JOIN hold USING (h)
WHERE w.u >= {Q112_HOLDOUT_FRAC}
GROUP BY 1
"""


Q113_BOUNDS = (("train", 0.8), ("val", 0.9), ("test", 1.0))


def q113_hash_split(sf_dir: str):
    """Deterministic train/val/test assignment from md5(doc_id)'s unit
    fraction (pure row function — reproducible under any partitioning,
    SQL-replayable) with per-(split, lang) doc/char stats."""
    from barks_ocr_ray.functions.curation import hash_split_stats

    return hash_split_stats(
        read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        bounds=Q113_BOUNDS,
    )


def _sql_q113() -> str:
    whens = " ".join(
        f"WHEN u < {cut} THEN '{name}'" for name, cut in Q113_BOUNDS[:-1]
    )
    return f"""
SELECT CASE {whens} ELSE '{Q113_BOUNDS[-1][0]}' END AS split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM (SELECT lang, n_chars,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 AS u
      FROM documents)
GROUP BY 1, 2
"""


Q114_MELT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q114_unpivot_lineitem(sf_dir: str):
    """UNPIVOT/melt reshape (inverse of the q77 pivot): lineitem's four
    numeric metrics into long (orderkey, linenumber, metric, value)
    rows — a pure block-local reshape, zero exchange."""
    from barks_ocr_ray.functions.relational import melt

    return melt(
        read_table(
            sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + Q114_MELT_COLS
        ),
        ["l_orderkey", "l_linenumber"],
        Q114_MELT_COLS,
    )


def _sql_q114() -> str:
    parts = [
        f"SELECT l_orderkey, l_linenumber, '{c}' AS metric, "
        f"CAST({c} AS DOUBLE) AS value FROM lineitem"
        for c in Q114_MELT_COLS
    ]
    return "\nUNION ALL\n".join(parts)


Q115_MAX_DUP_FRAC = 0.7
Q115_MAX_BIGRAM_FRAC = 0.1


def q115_clean_corpus(sf_dir: str):
    """The composed corpus-cleaning arc (training-split hygiene end to
    end): training split -> exact dedup -> Gopher repetition gates ->
    benchmark decontamination; kept (doc_id, lang, n_tokens)."""
    from barks_ocr_ray.functions.curation import clean_corpus

    return clean_corpus(
        read_table(sf_dir, "documents", ["doc_id", "text", "lang"]),
        holdout_frac=Q112_HOLDOUT_FRAC,
        window=Q112_WINDOW,
        max_dup_token_frac=Q115_MAX_DUP_FRAC,
        max_top_bigram_frac=Q115_MAX_BIGRAM_FRAC,
    )


def _sql_q115() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    w = Q112_WINDOW
    f = Q112_HOLDOUT_FRAC
    return f"""
WITH base AS (
  SELECT doc_id, lang, text,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u
  FROM documents),
train AS (SELECT * FROM base WHERE u >= {f}),
win AS (SELECT min(doc_id) AS doc_id FROM train GROUP BY md5(text)),
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
        FROM train),
r AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams
  FROM tok WHERE len(toks) >= 2),
bc AS (SELECT doc_id, bg, count(*) AS c
       FROM (SELECT doc_id, unnest(bigrams) AS bg FROM r) GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS top_n FROM bc GROUP BY 1),
rep_ok AS (
  SELECT r.doc_id, r.n_tokens FROM r JOIN top USING (doc_id)
  WHERE round(1.0 - n_distinct / CAST(n_tokens AS DOUBLE), 4)
          <= {Q115_MAX_DUP_FRAC}
    AND round(top_n / CAST(n_tokens - 1 AS DOUBLE), 4)
          <= {Q115_MAX_BIGRAM_FRAC}),
wtok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks, u
  FROM base
  WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= {w}),
wnd AS (
  SELECT DISTINCT doc_id, u,
         substring(md5(array_to_string(toks[i:i+{w - 1}], ' ')), 1, 16) AS h
  FROM wtok, UNNEST(range(1, len(toks) - {w} + 2)) AS un(i)),
hold AS (SELECT DISTINCT h FROM wnd WHERE u < {f}),
contam AS (SELECT DISTINCT wnd.doc_id FROM wnd JOIN hold USING (h)
           WHERE wnd.u >= {f})
SELECT rep_ok.doc_id, b.lang, CAST(rep_ok.n_tokens AS BIGINT) AS n_tokens
FROM rep_ok
JOIN win USING (doc_id)
JOIN base b ON b.doc_id = rep_ok.doc_id
WHERE rep_ok.doc_id NOT IN (SELECT doc_id FROM contam)
"""


Q116_BUDGET = 3000  # per-language token quota


def q116_token_budget(sf_dir: str):
    """Token-budget corpus assembly: per language, keep docs in
    deterministic (md5-fraction, doc_id) order while the running token
    total fits the quota — a distributed ordered prefix sum (range-
    bucketed offsets, no global sort)."""
    from barks_ocr_ray.functions.curation import token_budget_sample

    return token_budget_sample(
        read_table(sf_dir, "documents", ["doc_id", "lang", "text"]),
        budget=Q116_BUDGET,
    )


def _sql_q116() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
              AS BIGINT) AS n_tokens,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u
  FROM documents),
c AS (
  SELECT *, sum(n_tokens) OVER (
    PARTITION BY lang ORDER BY u, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= {Q116_BUDGET}
"""


Q117_QUOTA = 10  # docs kept per source


def q117_source_quota(sf_dir: str):
    """Per-domain quota (Common-Crawl curation: cap each domain's
    contribution): keep the top-K docs per source by length (ties ->
    lower doc_id), with the within-source rank — grouped top-k (one
    keyed repartition + vectorized rank, no global sort). QUALITY-ranked
    counterpart of q65's arrival-order host cap: q65 keeps the first N
    per host, this keeps the BEST K per source."""
    return grouped_topk(
        read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"]),
        "source",
        "n_chars",
        Q117_QUOTA,
        tie_col="doc_id",
    )


def _sql_q117() -> str:
    return f"""
SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank
FROM (SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents)
WHERE rank <= {Q117_QUOTA}
"""


def q118_numeric_profile(sf_dir: str):
    """Column-profiling 'ANALYZE' over lineitem's numeric metrics,
    composed from the q114 melt: wide->long reshape, then per-block
    partials -> one tiny metric-keyed aggregate per statistic (n,
    nulls, min, max, exact fixed-point sum — cents int64 so the
    distributed sum is order-independent and bit-equal to the SQL
    replay)."""
    import numpy as np

    from barks_ocr_ray.functions.relational import melt

    long = melt(
        read_table(
            sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + Q114_MELT_COLS
        ),
        ["l_orderkey", "l_linenumber"],
        Q114_MELT_COLS,
    )

    def _partials(t: pa.Table) -> pa.Table:
        v = t.column("value")
        cents = pa.array(
            np.round(
                v.to_numpy(zero_copy_only=False) * 100.0
            ).astype("int64"),
            pa.int64(),
        )
        g = (
            pa.table(
                {
                    "metric": t.column("metric"),
                    "value": v,
                    "cents": cents,
                    "is_null": pc.is_null(v).cast(pa.int64()),
                }
            )
            .group_by("metric")
            .aggregate(
                [
                    ("value", "count"),
                    ("is_null", "sum"),
                    ("value", "min"),
                    ("value", "max"),
                    ("cents", "sum"),
                ]
            )
        )
        return g.rename_columns(
            ["metric", "n", "n_null", "vmin", "vmax", "cents"]
        )

    agg = (
        long.map_batches(_partials, batch_format="pyarrow")
        .groupby("metric", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
            Sum("cents", alias_name="cents"),
        )
    )

    def _final(t: pa.Table) -> pa.Table:
        vsum = pc.divide(
            t.column("cents").cast(pa.float64()), pa.scalar(100.0)
        )
        return pa.table(
            {
                "metric": t.column("metric"),
                "n": t.column("n"),
                "n_null": t.column("n_null"),
                "vmin": t.column("vmin"),
                "vmax": t.column("vmax"),
                "vsum": vsum,
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def _sql_q118() -> str:
    parts = [
        f"SELECT '{c}' AS metric, CAST(count({c}) AS BIGINT) AS n, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
        f"min({c}) AS vmin, max({c}) AS vmax, "
        f"CAST(sum(CAST(round({c} * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
        f"AS vsum FROM lineitem"
        for c in Q114_MELT_COLS
    ]
    return "\nUNION ALL\n".join(parts)


def q119_jsonl_roundtrip(sf_dir: str):
    """The S7/S8 JSONL request/result round-trip as an oracle-gated
    query: documents (doc_id, lang) written to JSONL by the queue sink,
    read back with the JSONL source, and aggregated per lang — value
    parity pins the round-trip's fidelity, not just its row count."""
    import hashlib
    import shutil

    from barks_ocr_ray.functions.sinks import read_jsonl, write_jsonl

    # deterministic per-sf scratch dir, wiped before writing (write_json
    # appends files; a fresh mkdtemp per call would accumulate in /tmp)
    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:10]
    out_dir = f"/tmp/barks_q119_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    write_jsonl(
        read_table(sf_dir, "documents", ["doc_id", "lang"]), out_dir
    )
    back = read_jsonl(out_dir)
    return back.groupby("lang", num_partitions=2).aggregate(
        Count(alias_name="n_docs"), Sum("doc_id", alias_name="id_sum")
    )


SQL_Q119 = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents GROUP BY lang
"""


def q120_hourly_gap_audit(sf_dir: str):
    """Time-series continuity audit: per user, the span of hours between
    first and last activity, distinct active hours, and the gap count —
    the data-freshness/completeness check a streaming ingest runs.
    Per-block vectorized (user, hour) dedup partials (the exchange ships
    at most one row per user-hour per block, never one per event), then
    ONE user-keyed exchange with a vectorized distinct+minmax fold."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _partials(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hr = ts // 3_600_000_000  # epoch hours (us timestamps)
        pairs = np.unique(np.stack([us, hr], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "h": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def _fold(t: pa.Table) -> pa.Table:
        hs = np.unique(t.column("h").to_numpy(zero_copy_only=False))
        span = int(hs.max() - hs.min()) + 1
        return pa.table(
            {
                "user_id": t.column("user_id").slice(0, 1),
                "span_hours": pa.array([span], pa.int64()),
                "active_hours": pa.array([int(hs.size)], pa.int64()),
                "gap_hours": pa.array([span - int(hs.size)], pa.int64()),
            }
        )

    return (
        ev.map_batches(_partials, batch_format="pyarrow")
        .groupby("user_id", num_partitions=hash_partitions(16))
        .map_groups(_fold, batch_format="pyarrow")
    )


SQL_Q120 = """
WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h FROM events),
s AS (SELECT user_id,
             CAST(count(DISTINCT h) AS BIGINT) AS active_hours,
             CAST(date_diff('hour', min(h), max(h)) + 1 AS BIGINT)
               AS span_hours
      FROM e GROUP BY 1)
SELECT user_id, span_hours, active_hours,
       span_hours - active_hours AS gap_hours
FROM s
"""


def q121_except_all(sf_dir: str):
    """Bag-semantics EXCEPT ALL (multiset difference, the multiplicity
    rung above q06's set difference and q82's INTERSECT): order
    priorities of open orders minus those of custkey%3=0 orders, each
    surviving row emitted max(0, n_left - n_right) times. Distributed:
    per-side key counts (two small aggregations over block partials),
    one key join, vectorized np.repeat emission — multiplicities move
    as counts, never as rows, until the final emit."""
    import numpy as np

    orders = read_table(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_custkey"]
    )

    def _counts(flag: str):
        def _part(t: pa.Table) -> pa.Table:
            if flag == "left":
                mask = pc.equal(t.column("o_orderstatus"), pa.scalar("O"))
            else:
                k = t.column("o_custkey")
                mask = pc.equal(
                    pc.subtract(
                        k, pc.multiply(pc.divide(k, pa.scalar(3)), pa.scalar(3))
                    ),
                    pa.scalar(0),
                )
            g = (
                t.filter(mask)
                .select(["o_orderpriority"])
                .group_by("o_orderpriority")
                .aggregate([("o_orderpriority", "count")])
            )
            return g.rename_columns(["o_orderpriority", "n"])

        return orders.map_batches(_part, batch_format="pyarrow").groupby(
            "o_orderpriority", num_partitions=2
        ).aggregate(Sum("n", alias_name=f"n_{flag}"))

    from barks_ocr_ray.functions.relational import compact_nonempty

    left_c, n_l = compact_nonempty(_counts("left"), 4)
    right_c, n_r = compact_nonempty(_counts("right"), 4)
    empty = pa.table({"o_orderpriority": pa.array([], pa.string())})
    if n_l == 0:
        return rd.from_arrow(empty)
    if n_r == 0:
        joined = left_c.map_batches(
            lambda t: t.append_column(
                "n_right", pa.nulls(t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = left_c.join(
            right_c,
            join_type="left_outer",
            num_partitions=hash_partitions(4),
            on=("o_orderpriority",),
        )

    def _emit(t: pa.Table) -> pa.Table:
        nl = t.column("n_left").to_numpy(zero_copy_only=False)
        nr = pc.fill_null(t.column("n_right"), pa.scalar(0, pa.int64()))
        nr = nr.to_numpy(zero_copy_only=False)
        reps = np.maximum(nl - nr, 0)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        return t.select(["o_orderpriority"]).take(pa.array(idx, pa.int64()))

    return joined.map_batches(_emit, batch_format="pyarrow")


SQL_Q121 = """
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 0
"""


def q122_key_skew_profile(sf_dir: str):
    """Shuffle-planning skew diagnosis: the distribution of per-key row
    counts for a join/groupby key (l_partkey), bucketed by log2 — the
    profile a 100-TB pipeline reads BEFORE choosing salt factors for
    q54/q74-style skew handling. Two tiny keyed aggregations: per-key
    counts from block partials, then a log2-bucket histogram (the
    second exchange ships one row per occupied bucket per block)."""
    import numpy as np

    li = read_table(sf_dir, "lineitem", ["l_partkey"])

    def _key_partials(t: pa.Table) -> pa.Table:
        g = (
            t.group_by("l_partkey")
            .aggregate([("l_partkey", "count")])
        )
        return g.rename_columns(["l_partkey", "n"])

    per_key = (
        li.map_batches(_key_partials, batch_format="pyarrow")
        .groupby("l_partkey", num_partitions=hash_partitions(16))
        .aggregate(Sum("n", alias_name="n"))
    )

    def _bucketize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        b = np.floor(np.log2(n)).astype(np.int64)
        g = (
            pa.table(
                {"log2_bucket": pa.array(b, pa.int64()),
                 "rows": t.column("n")}
            )
            .group_by("log2_bucket")
            .aggregate([("rows", "count"), ("rows", "sum")])
        )
        return g.rename_columns(["log2_bucket", "n_keys", "n_rows"])

    return (
        per_key.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("log2_bucket", num_partitions=2)
        .aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


SQL_Q122 = """
WITH k AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1)
SELECT CAST(floor(log2(n)) AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows
FROM k GROUP BY 1
"""




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
