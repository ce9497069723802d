from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b03_dedup_quality_prep import *  # noqa: F401,F403

def q165_phrase_search(sf_dir: str):
    """Exact phrase search via a positional inverted index — the S12
    searcher family's phrase rung (reference word-index ancestor:
    /root/reference/experiments/make-word-index-from-gemini-ai-groups.py:174-194,
    postings without positions). One postings pass pruned to the query
    vocabulary, materialized once for all phrases; each phrase chains
    (doc_id, pos+k) joins — the classic positional-intersection plan.
    Oracle: DuckDB generate_subscripts self-joins (true positional
    semantics, so overlapping matches count)."""
    from barks_ocr_ray.functions.text import phrase_counts

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return phrase_counts(docs, Q165_PHRASES)


def _sql_q165() -> str:
    subqs = []
    for phrase in Q165_PHRASES:
        ws = phrase.split()
        joins, conds = [], [f"t0.w = '{ws[0]}'"]
        for k in range(1, len(ws)):
            joins.append(
                f"JOIN t t{k} ON t{k}.doc_id = t0.doc_id "
                f"AND t{k}.pos = t0.pos + {k}"
            )
            conds.append(f"t{k}.w = '{ws[k]}'")
        subqs.append(
            f"SELECT '{phrase}' AS phrase,\n"
            "       CAST(count(*) AS BIGINT) AS n_occurrences,\n"
            "       CAST(count(DISTINCT t0.doc_id) AS BIGINT) AS n_docs\n"
            "FROM t t0 " + " ".join(joins) + "\nWHERE " + " AND ".join(conds)
        )
    return (
        "WITH t AS (\n"
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS w,\n"
        "         generate_subscripts(string_split(text, ' '), 1) AS pos\n"
        "  FROM documents WHERE text IS NOT NULL AND length(text) > 0)\n"
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(subqs)
        + "\n) ORDER BY phrase"
    )


def q166_interval_overlap(sf_dir: str):
    """Temporal interval-overlap self-join: events span [ts, ts +
    max(value,0) minutes]; pairs of the same user's events whose spans
    overlap, rolled up to (earlier type, later type) counts. The
    interval-join rung of the join family (q38 = value-banded range
    join, q70 = as-of): one user-keyed exchange + a start-sorted
    vectorized sweep per block, pair emission output-bounded."""
    from barks_ocr_ray.functions.windows import interval_overlap_pairs

    ev = read_table(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
    )
    return interval_overlap_pairs(ev).sort(["type_a", "type_b"])


SQL_Q166 = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) AS s,
         epoch_us(ts)
           + greatest(CAST(round(value * 60, 0) AS BIGINT), 0) * 1000000
           AS en
  FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM e a JOIN e b ON a.user_id = b.user_id
WHERE (a.s < b.s OR (a.s = b.s AND a.event_id < b.event_id))
  AND b.s <= a.en
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q167_retention_matrix(sf_dir: str):
    """Weekly cohort retention matrix: users cohorted by first-event
    epoch week, distinct-user activity counts at each week offset —
    the time-keyed sibling of q143's adoption curve (which counts
    first events only). One user-keyed exchange emits at most one row
    per distinct (user, week); the (cohort, offset) rollup is
    weeks²-bounded."""
    from barks_ocr_ray.functions.windows import retention_matrix

    ev = read_table(sf_dir, "events", ["user_id", "ts"])
    return retention_matrix(ev).sort(["cohort_week", "week_offset"])


SQL_Q167 = """
WITH a AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk
  FROM events GROUP BY 1, 2),
c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY 1)
SELECT c.cohort_wk AS cohort_week,
       a.wk - c.cohort_wk AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM a JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q168_crawl_frontier(sf_dir: str):
    """Crawl-frontier discovery: outlink targets with no fetch row,
    per-host rollup (distinct uncrawled urls + total references) — the
    scheduler table a crawler consumes next; on this corpus the
    link-farm pages dominate it. Fully distributed anti-join (union +
    target-keyed flag merge — no broadcast of the crawled set). Oracle:
    single-process golden replay sharing the page_outlinks/url_host
    kernels."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.functions.links import frontier_by_host
    from barks_ocr_ray.oracle_data import Q24_N

    configure()
    pages = rd.from_arrow(pages_table(Q24_N)).select_columns(["url", "html"])
    return frontier_by_host(pages, k=30)


def _sql_q168() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, frontier_golden_path

    return (
        "SELECT host, n_uncrawled_urls, n_refs FROM "
        f"read_parquet('{frontier_golden_path(Q24_N)}')"
    )


def q169_source_divergence(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    LMs — the corpus-similarity MATRIX behind mixture design (which
    sources are interchangeable, which add diversity); complements
    q125's doc-overlap similarity (JS sees distributional drift even
    with zero shared docs) and q130/q134 (two-snapshot, not pairwise).
    ONE (source, word)-keyed exchange of block count partials (the
    vocab×sources-bounded q47/q52 aggregation); the pair matrix derives
    driver-side on that bounded table. Per-(pair, word) contributions
    round to int64 micro-nats before the sum (q134 ln() round-6
    discipline: every input to ln is the single expression
    2p/(p+q) of exact count ratios, bit-replayable in DuckDB)."""
    import re as _re
    from collections import Counter

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["source", "text"])
    token_re = _re.compile(r"[a-z0-9]+")

    def _partials(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for s, x in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            if x:
                for w in token_re.findall(x.lower()):
                    counts[(s, w)] += 1
        ks = sorted(counts)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "w": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    cnt = (
        docs.map_batches(_partials, batch_format="pyarrow")
        .groupby(["source", "w"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    if not cnt:
        return pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "js_micro": pa.array([], pa.int64()),
            }
        )
    sources = sorted({r["source"] for r in cnt})
    vocab = sorted({r["w"] for r in cnt})
    si = {s: i for i, s in enumerate(sources)}
    wi = {w: i for i, w in enumerate(vocab)}
    mat = np.zeros((len(sources), len(vocab)), dtype=np.float64)
    for r in cnt:
        mat[si[r["source"]], wi[r["w"]]] = r["n"]
    p = mat / mat.sum(axis=1, keepdims=True)
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            pi, pj = p[i], p[j]
            m2 = pi + pj  # 2*m
            term = np.zeros(len(vocab), dtype=np.float64)
            maski = pi > 0
            term[maski] += 0.5 * pi[maski] * np.log(2 * pi[maski] / m2[maski])
            maskj = pj > 0
            term[maskj] += 0.5 * pj[maskj] * np.log(2 * pj[maskj] / m2[maskj])
            micro = round_like_duckdb(term * 1e6, 0).astype(np.int64)
            rows.append((sources[i], sources[j], int(micro.sum())))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "js_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


SQL_Q169 = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
cnt AS (
  SELECT source, w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY 1),
p AS (
  SELECT cnt.source, w, c / n AS p FROM cnt JOIN tot USING (source)),
grid AS (
  SELECT ta.source AS sa, tb.source AS sb
  FROM tot ta JOIN tot tb ON ta.source < tb.source),
words AS (SELECT DISTINCT w FROM cnt),
terms AS (
  SELECT g.sa, g.sb,
         coalesce(pa.p, 0) AS p, coalesce(pb.p, 0) AS q
  FROM grid g
  CROSS JOIN words
  LEFT JOIN p pa ON pa.source = g.sa AND pa.w = words.w
  LEFT JOIN p pb ON pb.source = g.sb AND pb.w = words.w),
js AS (
  SELECT sa, sb,
         CAST(sum(CAST(round(
           (CASE WHEN p > 0 THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END
            + CASE WHEN q > 0 THEN 0.5 * q * ln(2 * q / (p + q)) ELSE 0 END)
           * 1000000, 0) AS BIGINT)) AS BIGINT) AS js_micro
  FROM terms GROUP BY 1, 2)
SELECT sa AS source_a, sb AS source_b, js_micro
FROM js ORDER BY 1, 2
"""


def q170_fk_orphan_audit(sf_dir: str):
    """Cross-table referential-integrity audit: for each declared FK
    edge, total child rows and orphans (non-null key with no parent) —
    the cross-TABLE data-quality rung beside q104's column
    expectations and q139's schema drift. Each edge runs the q168
    union-flag anti-join (child per-key block pre-counts UNION parent
    marker rows into one key-keyed merge; the parent key set is never
    broadcast), so an edge costs one keyed exchange at any scale."""
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ]
    names, n_rows_out, n_orph_out = [], [], []
    for name, child, ckey, parent, pkey in edges:
        child_ds = read_table(sf_dir, child, [ckey])
        parent_ds = read_table(sf_dir, parent, [pkey])
        n_rows = child_ds.count()

        def _child(t: pa.Table, ckey=ckey) -> pa.Table:
            col = t.column(ckey)
            t2 = pa.table({"k": col.cast(pa.int64())}).filter(pc.is_valid(col))
            g = (
                t2.group_by("k")
                .aggregate([([], "count_all")])
                .rename_columns(["k", "n"])
            )
            z = pa.array([0] * g.num_rows, pa.int64())
            return g.append_column("parent", z)

        def _parent(t: pa.Table, pkey=pkey) -> pa.Table:
            col = t.column(pkey)
            t2 = pa.table({"k": col.cast(pa.int64())}).filter(pc.is_valid(col))
            z = pa.array([0] * t2.num_rows, pa.int64())
            o = pa.array([1] * t2.num_rows, pa.int64())
            return pa.table(
                {"k": t2.column("k"), "n": z, "parent": o}
            )

        merged = (
            child_ds.map_batches(_child, batch_format="pyarrow")
            .union(parent_ds.map_batches(_parent, batch_format="pyarrow"))
            .groupby("k", num_partitions=hash_partitions(8))
            .aggregate(
                Sum("n", alias_name="n"),
                Max("parent", alias_name="parent"),
            )
        )

        def _orphan_partial(t: pa.Table) -> pa.Table:
            orph = t.filter(pc.equal(t.column("parent"), 0))
            return pa.table(
                {
                    "n_orphans": pa.array(
                        [
                            int(
                                pc.sum(orph.column("n")).as_py() or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            )

        orphans = (
            merged.map_batches(_orphan_partial, batch_format="pyarrow")
            .sum("n_orphans")
            or 0
        )
        names.append(name)
        n_rows_out.append(n_rows)
        n_orph_out.append(int(orphans))
    return pa.table(
        {
            "fk_edge": pa.array(names, pa.string()),
            "n_rows": pa.array(n_rows_out, pa.int64()),
            "n_orphans": pa.array(n_orph_out, pa.int64()),
        }
    )


SQL_Q170 = """
SELECT * FROM (
  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           LEFT JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL)
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
           WHERE l.l_suppkey IS NOT NULL AND s.s_suppkey IS NULL)
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         (SELECT CAST(count(*) AS BIGINT) FROM orders),
         (SELECT CAST(count(*) AS BIGINT) FROM orders o
           LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
) ORDER BY fk_edge
"""


#: q171 batching geometry: 8 length buckets, 256 docs per inference batch
Q171_BUCKETS = 8
Q171_BATCH = 256


def q171_length_bucketing(sf_dir: str):
    """Sequence-length bucketing for batched inference: docs bucket by
    token length (all-INTEGER equal-width buckets — (L-lo)*B //
    (hi-lo+1), no IEEE at all), sort by (length, doc_id) within each
    bucket, chunk into 256-doc batches, and account the exact padding
    waste (batch_max*size - sum_len) — the report that tells you what
    length-bucketing buys before you pay for it. Distributed shape:
    one bounded (bucket, length)-keyed count exchange builds the
    global below-offset table (length cardinality is corpus-bounded),
    then one (bucket, length)-keyed repartition ranks within ties by
    doc_id block-locally (the q146 global-rank-without-global-sort
    machinery), and the (bucket, batch) rollup is output-bounded."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _lens(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        ok = pc.and_(pc.is_valid(txt), pc.greater(pc.utf8_length(txt), 0))
        t = t.filter(ok)
        n_tok = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), r"[a-z0-9]+"
        ).cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "L": n_tok})

    lens = docs.map_batches(_lens, batch_format="pyarrow").materialize()
    empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_batches": pa.array([], pa.int64()),
            "padding_waste": pa.array([], pa.int64()),
        }
    )
    if lens.count() == 0:
        return empty
    stats = lens.aggregate(Min("L", alias_name="lo"), Max("L", alias_name="hi"))
    lo, hi = int(stats["lo"]), int(stats["hi"])
    span = hi - lo + 1

    def _bucketed(t: pa.Table) -> pa.Table:
        L = t.column("L").to_numpy(zero_copy_only=False)
        b = (L - lo) * Q171_BUCKETS // span
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "L": t.column("L"),
                "doc_id": t.column("doc_id"),
            }
        )

    bl = lens.map_batches(_bucketed, batch_format="pyarrow").materialize()
    # bounded (bucket, L) histogram -> global rank offsets below each key
    hist = (
        bl.groupby(["bucket", "L"], num_partitions=4)
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    hist.sort(key=lambda r: (r["bucket"], r["L"]))
    below: dict[tuple[int, int], int] = {}
    run_bucket, acc = None, 0
    for r in hist:
        if r["bucket"] != run_bucket:
            run_bucket, acc = r["bucket"], 0
        below[(r["bucket"], r["L"])] = acc
        acc += r["n"]

    def _batch_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "batch": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_len": pa.array([], pa.int64()),
                    "max_len": pa.array([], pa.int64()),
                }
            )
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        L = t.column("L").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, L, b))
        b, L, d = b[order], L[order], d[order]
        # within-(bucket, L) rank by doc_id: positional within segment
        seg = np.flatnonzero(
            np.r_[True, (b[1:] != b[:-1]) | (L[1:] != L[:-1])]
        )
        seg_of = np.repeat(np.arange(len(seg)), np.diff(np.r_[seg, len(b)]))
        within = np.arange(len(b)) - seg[seg_of]
        off = np.array(
            [below[(int(bb), int(ll))] for bb, ll in zip(b[seg], L[seg])],
            dtype=np.int64,
        )
        rank = off[seg_of] + within  # 0-based global rank within bucket
        batch = rank // Q171_BATCH
        key = pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "batch": pa.array(batch, pa.int64()),
                "n": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "sum_len": pa.array(L, pa.int64()),
                "max_len": pa.array(L, pa.int64()),
            }
        )
        return (
            key.group_by(["bucket", "batch"])
            .aggregate([("n", "sum"), ("sum_len", "sum"), ("max_len", "max")])
            .rename_columns(["bucket", "batch", "n", "sum_len", "max_len"])
        )

    per_batch = (
        bl.repartition(8, keys=["bucket", "L"])
        .map_batches(_batch_partials, batch_format="pyarrow", batch_size=None)
        .groupby(["bucket", "batch"], num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_len", alias_name="sum_len"),
            Max("max_len", alias_name="max_len"),
        )
    )

    def _waste(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("sum_len").to_numpy(zero_copy_only=False)
        m = t.column("max_len").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": t.column("bucket"),
                "n_docs": t.column("n"),
                "n_batches": pa.array(np.ones(len(n), np.int64), pa.int64()),
                "padding_waste": pa.array(m * n - s, pa.int64()),
            }
        )

    return (
        per_batch.map_batches(_waste, batch_format="pyarrow")
        .groupby("bucket", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_batches", alias_name="n_batches"),
            Sum("padding_waste", alias_name="padding_waste"),
        )
        .sort("bucket")
    )


SQL_Q171 = """
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS L
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
s AS (SELECT min(L) AS lo, max(L) AS hi FROM d),
b AS (
  SELECT doc_id, L, (L - s.lo) * 8 // (s.hi - s.lo + 1) AS bucket
  FROM d, s),
r AS (
  SELECT bucket, L,
         (row_number() OVER (PARTITION BY bucket ORDER BY L, doc_id) - 1)
           // 256 AS batch
  FROM b),
pb AS (
  SELECT bucket, batch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(L) AS BIGINT) AS sum_len,
         CAST(max(L) AS BIGINT) AS max_len
  FROM r GROUP BY 1, 2)
SELECT bucket,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(max_len * n - sum_len) AS BIGINT) AS padding_waste
FROM pb GROUP BY 1 ORDER BY 1
"""


def q172_source_overlap(sf_dir: str):
    """Cross-source shingle-overlap matrix: for every source pair, the
    count of distinct token-trigrams both crawls contain and the
    trigram-set Jaccard — the 'which snapshots/crawls cover the same
    material' audit that drives mixture dedup budgets (q169 compares
    unigram DISTRIBUTIONS; this compares n-gram SETS, so verbatim
    template reuse shows up even when the word mix differs).
    Distributed shape: block partials emit DISTINCT (gram, source)
    rows (set-collapsed per block, the curation.py _BlockNgramDF
    discipline), ONE (gram, source)-keyed distinct exchange, then a
    gram-keyed repartition where each gram's source list emits
    pre-aggregated pair partials (<= sources^2 rows per block — the
    per-gram emission is bounded by the source-pair count, never the
    corpus); per-source totals and the pair grid are sources-bounded
    driver tables."""
    import re as _re
    from collections import Counter, defaultdict

    import numpy as np

    docs = read_table(sf_dir, "documents", ["source", "text"])
    token_re = _re.compile(r"[a-z0-9]+")
    G = 3

    def _gram_partials(t: pa.Table) -> pa.Table:
        seen: set = set()
        for s, x in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            if not x:
                continue
            toks = token_re.findall(x.lower())
            for i in range(max(len(toks) - G + 1, 0)):
                seen.add((s, " ".join(toks[i : i + G])))
        ks = sorted(seen)
        return pa.table(
            {
                "gram": pa.array([k[1] for k in ks], pa.string()),
                "source": pa.array([k[0] for k in ks], pa.string()),
            }
        )

    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_shared": pa.array([], pa.int64()),
            "jaccard_micro": pa.array([], pa.int64()),
        }
    )

    def _pair_partials(t: pa.Table) -> pa.Table:
        # colocated by gram: a block-local distinct IS the global
        # distinct, so the pair emission (INCLUDING the (s, s)
        # diagonal, which carries the per-source totals — no separate
        # totals exchange) is globally correct
        dg = t.group_by(["gram", "source"]).aggregate([([], "count_all")])
        by_gram: defaultdict = defaultdict(list)
        for g, s in zip(
            dg.column("gram").to_pylist(), dg.column("source").to_pylist()
        ):
            by_gram[g].append(s)
        cnt: Counter = Counter()
        for srcs in by_gram.values():
            srcs.sort()
            for i in range(len(srcs)):
                for j in range(i, len(srcs)):
                    cnt[(srcs[i], srcs[j])] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "source_a": pa.array([k[0] for k in ks], pa.string()),
                "source_b": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    inter = (
        docs.map_batches(_gram_partials, batch_format="pyarrow")
        .repartition(hash_partitions(4), keys=["gram"])
        .map_batches(
            _pair_partials, batch_format="pyarrow", batch_size=None
        )
        .groupby(["source_a", "source_b"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n_shared"))
        .take_all()
    )
    if not inter:
        return empty
    im = {(r["source_a"], r["source_b"]): int(r["n_shared"]) for r in inter}
    n_of = {a: n for (a, b), n in im.items() if a == b}
    srcs = sorted(n_of)
    a_col, b_col, sh_col, ja_col = [], [], [], []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            shared = im.get((a, b), 0)
            a_col.append(a)
            b_col.append(b)
            sh_col.append(shared)
            ja_col.append(
                (1e6 * shared) / (n_of[a] + n_of[b] - shared)
            )
    return pa.table(
        {
            "source_a": pa.array(a_col, pa.string()),
            "source_b": pa.array(b_col, pa.string()),
            "n_shared": pa.array(sh_col, pa.int64()),
            "jaccard_micro": pa.array(
                round_like_duckdb(np.array(ja_col, np.float64), 0).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        }
    )


def _sql_q172() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (SELECT source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
           FROM documents WHERE text IS NOT NULL),
g AS (SELECT DISTINCT source,
             unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS gram
      FROM t),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
p AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS inter
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source GROUP BY 1, 2),
grid AS (SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
         FROM sz a JOIN sz b ON a.source < b.source)
SELECT grid.sa AS source_a, grid.sb AS source_b,
       coalesce(p.inter, 0) AS n_shared,
       CAST(round(1e6 * coalesce(p.inter, 0)
                  / (grid.na + grid.nb - coalesce(p.inter, 0)), 0) AS BIGINT)
         AS jaccard_micro
FROM grid LEFT JOIN p ON p.sa = grid.sa AND p.sb = grid.sb
ORDER BY 1, 2
"""


#: q173 calibration geometry: decile bins over the score range
Q173_BINS = 10


def q173_calibration_report(sf_dir: str):
    """Calibration table for the q64 quality classifier against the
    corpus's English label: scores bin into deciles of the observed
    score range (the ALL-integer q171 bucket contract over basis-point
    scores — no IEEE in the bucket expression), and each bin reports
    doc count, positive count and the integer score mass — the
    reliability-diagram / ECE input that tells you whether the quality
    filter's confidence means anything before you act on it at corpus
    scale. One streamed actor-pool scoring pass (weights load once per
    actor), one Min/Max reduce, one bins-bounded aggregation — zero
    doc-keyed joins (lang rides along with the scoring pass)."""
    import numpy as np

    from barks_ocr_ray.functions.inference import QualityModel

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
    qm = QualityModel()

    def _score(t: pa.Table) -> pa.Table:
        s = qm(t)  # doc_id, quality_score, keep — over this batch
        bp = round_like_duckdb(
            s.column("quality_score").to_numpy(zero_copy_only=False)
            * 10000.0,
            0,
        ).astype(np.int64)
        lang = t.column("lang").combine_chunks().fill_null("")
        return pa.table(
            {
                "bp": pa.array(bp, pa.int64()),
                "en": pc.equal(lang, "en").cast(pa.int64()),
            }
        )

    scored = docs.map_batches(_score, batch_format="pyarrow").materialize()
    empty = pa.table(
        {
            "bin": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_en": pa.array([], pa.int64()),
            "sum_score_bp": pa.array([], pa.int64()),
        }
    )
    if scored.count() == 0:
        return empty
    stats = scored.aggregate(
        Min("bp", alias_name="lo"), Max("bp", alias_name="hi")
    )
    lo, hi = int(stats["lo"]), int(stats["hi"])
    span = hi - lo + 1

    def _binned(t: pa.Table) -> pa.Table:
        bp = t.column("bp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": pa.array((bp - lo) * Q173_BINS // span, pa.int64()),
                "n_docs": pa.array(np.ones(len(bp), np.int64), pa.int64()),
                "n_en": t.column("en"),
                "sum_score_bp": t.column("bp"),
            }
        )

    return (
        scored.map_batches(_binned, batch_format="pyarrow")
        .groupby("bin", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_en", alias_name="n_en"),
            Sum("sum_score_bp", alias_name="sum_score_bp"),
        )
        .sort("bin")
    )


def _sql_q173() -> str:
    return f"""
WITH sc AS (SELECT doc_id, quality_score FROM ({_sql_q64()})),
j AS (SELECT sc.doc_id, CAST(round(quality_score * 10000, 0) AS BIGINT) AS bp,
             (coalesce(d.lang, '') = 'en') AS is_en
      FROM sc JOIN documents d USING (doc_id)),
s AS (SELECT min(bp) AS lo, max(bp) AS hi FROM j),
b AS (SELECT (bp - s.lo) * {Q173_BINS} // (s.hi - s.lo + 1) AS bin, bp, is_en
      FROM j, s)
SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(sum(bp) AS BIGINT) AS sum_score_bp
FROM b GROUP BY 1 ORDER BY 1
"""


#: q174 fits the slope over the K most frequent words
Q174_TOP_K = 1000


def q174_zipf_slope(sf_dir: str):
    """Zipf's-law fit over the corpus word-frequency distribution: the
    least-squares slope of ln(count) vs ln(rank) across the top-K
    words — the one-number corpus-health diagnostic (natural text sits
    near -1; template farms and boilerplate-heavy crawls flatten or
    steepen it). ONE vocab-bounded word-count exchange (q47/q52
    machinery); rank, the milli-nat log grid and the regression sums
    are exact integers on the K-bounded driver table, so both engines
    sum the SAME int64 grid and the only float op is the final scalar
    slope ratio (round_like_duckdb parity). Requires >= 2 distinct
    frequency/rank points (guarded)."""
    import math as _math
    import re as _re
    from collections import Counter

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["text"])
    token_re = _re.compile(r"[a-z0-9]+")

    def _wc(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            if x:
                c.update(token_re.findall(x.lower()))
        ks = sorted(c)
        return pa.table(
            {
                "word": pa.array(ks, pa.string()),
                "n": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    cnt = (
        docs.map_batches(_wc, batch_format="pyarrow")
        .groupby("word", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    empty = pa.table(
        {
            "n_words": pa.array([], pa.int64()),
            "sx": pa.array([], pa.int64()),
            "sy": pa.array([], pa.int64()),
            "sxy": pa.array([], pa.int64()),
            "sxx": pa.array([], pa.int64()),
            "slope_micro": pa.array([], pa.int64()),
        }
    )
    if len(cnt) < 2:
        return empty
    cnt.sort(key=lambda r: (-r["n"], r["word"]))
    top = cnt[:Q174_TOP_K]
    k = len(top)
    sx = sy = sxy = sxx = 0
    for rk, r in enumerate(top, start=1):
        x = int(round_like_duckdb(_math.log(rk) * 1000.0, 0))
        y = int(round_like_duckdb(_math.log(int(r["n"])) * 1000.0, 0))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    den = k * sxx - sx * sx
    if den == 0:
        return empty
    slope = (1e6 * float(k * sxy - sx * sy)) / float(den)
    return pa.table(
        {
            "n_words": pa.array([k], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sy": pa.array([sy], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "sxx": pa.array([sxx], pa.int64()),
            "slope_micro": pa.array(
                [int(round_like_duckdb(slope, 0))], pa.int64()
            ),
        }
    )


def _sql_q174() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
           FROM documents WHERE text IS NOT NULL),
c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
r AS (SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rk
      FROM c QUALIFY rk <= {Q174_TOP_K}),
i AS (SELECT CAST(round(ln(rk) * 1000, 0) AS BIGINT) AS x,
             CAST(round(ln(n) * 1000, 0) AS BIGINT) AS y FROM r),
s AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM i)
SELECT k AS n_words, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
       CAST(round(1e6 * (k * sxy - sx * sy) / (k * sxx - sx * sx), 0)
            AS BIGINT) AS slope_micro
FROM s
"""


#: q175 keeps the top-K discriminative terms per source
Q175_TOP_K = 5


def q175_discriminative_terms(sf_dir: str):
    """Per-source discriminative vocabulary: the top-K terms by
    add-one-smoothed log-odds ratio of document frequency in the
    source vs the rest of the corpus (Monroe et al.'s 'Fightin'
    Words' shape; the c-TF-IDF cluster-labeling rung next to q47's
    corpus-global TF-IDF) — 'what is src7 actually full of' for
    mixture design and source triage. ONE (source, word)-keyed
    distinct-doc-frequency exchange (block partials collapse each doc
    to its distinct words, q169's bounded aggregation) plus one
    sources-bounded doc-count pass; scoring and ranking run on the
    vocab×sources driver table with micro-nat rounding (the ln
    argument is a single expression of exact counts — replayable)."""
    import math as _math
    import re as _re
    from collections import Counter

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["source", "text"])
    token_re = _re.compile(r"[a-z0-9]+")

    def _dw_partials(t: pa.Table) -> pa.Table:
        dfc: Counter = Counter()  # (source, word) -> docs in block
        nsc: Counter = Counter()  # source -> docs with >=1 token
        for s, x in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            if not x:
                continue
            ws = set(token_re.findall(x.lower()))
            if not ws:
                continue
            nsc[s] += 1
            for w in ws:
                dfc[(s, w)] += 1
        # doc-count partials ride the same exchange as marker rows
        # (word = '', never a token of TOKEN_RE-tokenized text)
        for s, n in nsc.items():
            dfc[(s, "")] = n
        ks = sorted(dfc)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "word": pa.array([k[1] for k in ks], pa.string()),
                "nd": pa.array([dfc[k] for k in ks], pa.int64()),
            }
        )

    rows = (
        docs.map_batches(_dw_partials, batch_format="pyarrow")
        .groupby(["source", "word"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("nd", alias_name="df"))
        .take_all()
    )
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "score_micro": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        }
    )
    if not rows:
        return empty
    ns = {r["source"]: int(r["df"]) for r in rows if r["word"] == ""}
    df = {
        (r["source"], r["word"]): int(r["df"])
        for r in rows
        if r["word"] != ""
    }
    nt = sum(ns.values())
    dft: Counter = Counter()
    for (_, w), d in df.items():
        dft[w] += d
    out = []
    for (s, w), d in df.items():
        n_s = ns[s]
        dfr = dft[w] - d
        score = 1e6 * (
            _math.log((d + 1.0) / (n_s - d + 1.0))
            - _math.log((dfr + 1.0) / (nt - n_s - dfr + 1.0))
        )
        out.append((s, int(round_like_duckdb(score, 0)), w))
    out.sort(key=lambda r: (r[0], -r[1], r[2]))
    keep, per_src = [], Counter()
    for s, sc, w in out:
        per_src[s] += 1
        if per_src[s] <= Q175_TOP_K:
            keep.append((s, w, sc, per_src[s]))
    return pa.table(
        {
            "source": pa.array([r[0] for r in keep], pa.string()),
            "word": pa.array([r[1] for r in keep], pa.string()),
            "score_micro": pa.array(
                np.array([r[2] for r in keep], np.int64), pa.int64()
            ),
            "rk": pa.array(
                np.array([r[3] for r in keep], np.int64), pa.int64()
            ),
        }
    )


def _sql_q175() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH dw AS (SELECT DISTINCT doc_id, source,
                   unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
            FROM documents WHERE text IS NOT NULL),
ns AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n
       FROM dw GROUP BY 1),
df AS (SELECT source, word, CAST(count(*) AS BIGINT) AS df
       FROM dw GROUP BY 1, 2),
tot AS (SELECT word, CAST(sum(df) AS BIGINT) AS dft FROM df GROUP BY 1),
nt AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ns),
sc AS (SELECT df.source, df.word,
              CAST(round(1e6 * (ln((df.df + 1.0) / (ns.n - df.df + 1.0))
                   - ln((tot.dft - df.df + 1.0)
                        / (nt.n - ns.n - (tot.dft - df.df) + 1.0))), 0)
                   AS BIGINT) AS score_micro
       FROM df JOIN ns USING (source) JOIN tot USING (word) CROSS JOIN nt),
r AS (SELECT source, word, score_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY score_micro DESC, word) AS rk
      FROM sc QUALIFY rk <= {Q175_TOP_K})
SELECT source, word, score_micro, CAST(rk AS BIGINT) AS rk
FROM r ORDER BY source, rk
"""


#: q176 hybrid-retrieval geometry: per-leg candidate pool, RRF constant
#: (Cormack et al.'s k=60), final cut, and the query point (vec_id ==
#: doc_id by the fixture's construction — one embedding per document)
Q176_QUERY_VEC = 7
Q176_POOL_K = 50
Q176_RRF_K = 60
Q176_OUT_K = 20


def q176_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval with reciprocal-rank fusion: the BM25 lexical
    leg (q55 kernel, streamed corpus scoring) and the exact-cosine
    vector leg (q16 kernel, broadcast query + per-block top-k merge)
    each produce a top-50 candidate pool; RRF fuses them with integer
    micro-scores (round(1e6/(60+rank)) per leg — absent legs contribute
    0) and emits the top-20. The modern two-tower + keyword search
    stack in one op: both legs are corpus-streaming, both pools are
    k-bounded, and the fusion runs on <= 2k driver rows. Rank ties
    break by id on both legs and on the fused cut (replayable)."""
    from barks_ocr_ray.functions.ann import brute_force_topk

    vec_rows = brute_force_topk(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        [Q176_QUERY_VEC],
        k=Q176_POOL_K,
    ).take_all()
    vec_rows.sort(key=lambda r: (-r["cosine"], r["neighbor_id"]))
    vrank = {
        int(r["neighbor_id"]): i + 1 for i, r in enumerate(vec_rows)
    }

    bm = q55_bm25_rank(sf_dir)

    def _block_top(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t,
            sort_keys=[("bm25", "descending"), ("doc_id", "ascending")],
        )
        return t.take(order[: min(Q176_POOL_K, t.num_rows)])

    lex_pool = bm.map_batches(_block_top, batch_format="pyarrow").take_all()
    lex_pool.sort(key=lambda r: (-r["bm25"], r["doc_id"]))
    lrank = {
        int(r["doc_id"]): i + 1
        for i, r in enumerate(lex_pool[:Q176_POOL_K])
    }

    fused = []
    for did in set(lrank) | set(vrank):
        lr, vr = lrank.get(did, 0), vrank.get(did, 0)
        s = 0
        if lr:
            s += int(round_like_duckdb(1e6 / (Q176_RRF_K + lr), 0))
        if vr:
            s += int(round_like_duckdb(1e6 / (Q176_RRF_K + vr), 0))
        fused.append((did, lr, vr, s))
    fused.sort(key=lambda r: (-r[3], r[0]))
    fused = fused[:Q176_OUT_K]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in fused], pa.int64()),
            "lex_rank": pa.array([r[1] for r in fused], pa.int64()),
            "vec_rank": pa.array([r[2] for r in fused], pa.int64()),
            "rrf_micro": pa.array([r[3] for r in fused], pa.int64()),
            "final_rank": pa.array(
                list(range(1, len(fused) + 1)), pa.int64()
            ),
        }
    )


def _sql_q176() -> str:
    return f"""
WITH lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM ({_sql_q55()}) QUALIFY r <= {Q176_POOL_K}),
vc AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6)
           AS cosine
  FROM embeddings q, embeddings e
  WHERE q.vec_id = {Q176_QUERY_VEC} AND e.vec_id != {Q176_QUERY_VEC}),
vec AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
  FROM vc QUALIFY r <= {Q176_POOL_K}),
f AS (
  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         coalesce(lex.r, 0) AS lex_rank,
         coalesce(vec.r, 0) AS vec_rank,
         (CASE WHEN lex.r IS NULL THEN 0
               ELSE CAST(round(1e6 / ({Q176_RRF_K} + lex.r), 0) AS BIGINT) END
          + CASE WHEN vec.r IS NULL THEN 0
                 ELSE CAST(round(1e6 / ({Q176_RRF_K} + vec.r), 0) AS BIGINT) END)
           AS rrf_micro
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank, rrf_micro,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
         AS final_rank
FROM f QUALIFY final_rank <= {Q176_OUT_K} ORDER BY final_rank
"""


Q177_ITERS = 5
Q177_K = 30


def q177_personalized_pagerank(sf_dir: str):
    """Personalized PageRank over the q94 customer<->supplier trade
    graph with the teleport vector restricted to the CUSTOMER side
    ('which suppliers are most central to the customer population' —
    Haveliwala's topic-sensitive PageRank; the recommender/influence
    rung above q94's global centrality and q163's HITS). Same exact
    int64 fixed-point BSP loop (`functions/graph.py`), same
    per-scale costs; the seed set is a node-id PREFIX predicate so it
    ships as zero state (a vectorized starts_with per block, a LIKE in
    the oracle — never a membership broadcast). Output: top suppliers
    by personalized rank."""
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
        iterations=Q177_ITERS,
        seed_prefix="C",
    )

    def _suppliers(t: pa.Table) -> pa.Table:
        return t.filter(pc.starts_with(t.column("node"), "S"))

    return (
        pr.map_batches(_suppliers, batch_format="pyarrow")
        .sort(["pr", "node"], descending=[True, False])
        .limit(Q177_K)
    )


def _sql_q177() -> str:
    """Serial replay of the personalized recurrence — q94's unrolled
    CTE with the teleport terms gated on the seed LIKE."""
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
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg
       WHERE node LIKE 'C%'),
r0 AS (SELECT node,
              CAST(CASE WHEN node LIKE 'C%' THEN {scale} // nn.n
                        ELSE 0 END AS BIGINT) AS pr
       FROM deg CROSS JOIN nn)""".format(scale=SCALE)
    ]
    for k in range(1, Q177_ITERS + 1):
        ctes.append(
            """r{k} AS (
  SELECT deg.node AS node,
         CAST(CASE WHEN deg.node LIKE 'C%'
                   THEN (15 * {scale}) // (100 * nn.n) ELSE 0 END
              + COALESCE(c.contrib, 0) AS BIGINT) AS pr
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
    return (
        "WITH {ctes}\nSELECT node, pr FROM r{last}\n"
        "WHERE node LIKE 'S%'\n"
        "ORDER BY pr DESC, node LIMIT {lim}".format(
            ctes=",\n".join(ctes), last=Q177_ITERS, lim=Q177_K
        )
    )


def q178_length_percentile(sf_dir: str):
    """Per-source percentile-rank normalization of document token
    length — the cross-source score-normalization primitive (raw
    lengths aren't comparable across crawls with different page
    shapes; their within-source percentile is). Global per-source
    percent_rank WITHOUT a global sort: one bounded (source, L)
    histogram exchange yields each (source, L)'s below-count and the
    source totals; the doc-level attach is a broadcast lookup
    (ray.put once, vectorized index_in per block — never a doc-keyed
    join). percent_rank = below/(n-1), the SQL window definition,
    micro-rounded identically."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "source", "text"])

    def _lens(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        ok = pc.and_(pc.is_valid(txt), pc.greater(pc.utf8_length(txt), 0))
        t = t.filter(ok)
        L = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), r"[a-z0-9]+"
        ).cast(pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "L": L,
            }
        )

    lens = docs.map_batches(_lens, batch_format="pyarrow").materialize()
    hist = (
        lens.groupby(["source", "L"], num_partitions=4)
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    hist.sort(key=lambda r: (r["source"], r["L"]))
    totals: dict = {}
    for r in hist:
        totals[r["source"]] = totals.get(r["source"], 0) + int(r["n"])
    pct: dict = {}
    run_src, below = None, 0
    for r in hist:
        if r["source"] != run_src:
            run_src, below = r["source"], 0
        n = totals[r["source"]]
        v = 0 if n == 1 else int(round_like_duckdb(1e6 * (below / (n - 1)), 0))
        pct[f"{r['source']}|{r['L']}"] = v
        below += int(r["n"])

    def _with_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("source").cast(pa.string()),
            pc.cast(t.column("L"), pa.string()),
            "|",
        )
        return t.append_column("sl_key", key)

    keyed = lens.map_batches(_with_key, batch_format="pyarrow")
    out = broadcast_lookup_column(
        keyed, pct, "sl_key", "pct_micro", pa.int64()
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "source", "L", "pct_micro"]),
        batch_format="pyarrow",
    )


def _sql_q178() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH d AS (SELECT doc_id, source,
                  CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                       AS BIGINT) AS L
           FROM documents WHERE text IS NOT NULL AND length(text) > 0)
SELECT doc_id, source, L,
       CAST(round(1e6 * percent_rank() OVER (PARTITION BY source ORDER BY L),
                  0) AS BIGINT) AS pct_micro
FROM d
"""


#: q179 vocabulary-growth grid: 10 equal-width doc-id checkpoints
Q179_CHECKPOINTS = 10


def q179_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary-growth curve: cumulative token count and
    distinct-vocabulary size at 10 doc-id checkpoints — the corpus
    diagnostic that says whether more crawl keeps buying new
    vocabulary (natural corpora grow ~N^beta; a template farm
    plateaus; pairs with q174's Zipf slope). No ordered scan and no
    global sort: each word's FIRST doc id is one vocab-bounded Min
    exchange, per-doc token counts are one streamed pass, and both
    reduce into checkpoint-bucket partials (10-key aggregations);
    the cumulative curve is a driver-side cumsum over 10 rows."""
    import re as _re
    from collections import Counter

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    token_re = _re.compile(r"[a-z0-9]+")

    def _tok(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        ok = pc.and_(pc.is_valid(txt), pc.greater(pc.utf8_length(txt), 0))
        t = t.filter(ok)
        n = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), r"[a-z0-9]+"
        ).cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n": n})

    tok = docs.map_batches(_tok, batch_format="pyarrow").materialize()
    empty = pa.table(
        {
            "checkpoint": pa.array([], pa.int64()),
            "doc_lt": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
            "vocab_size": pa.array([], pa.int64()),
        }
    )
    if tok.count() == 0:
        return empty
    m = int(tok.max("doc_id")) + 1
    cps = np.array(
        [(m * k) // Q179_CHECKPOINTS for k in range(1, Q179_CHECKPOINTS + 1)],
        np.int64,
    )

    def _tok_buckets(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        # bucket b: doc contributes from the first checkpoint > doc_id
        b = np.searchsorted(cps, d, side="right")
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "n": t.column("n"),
            }
        )

    tok_hist = (
        tok.map_batches(_tok_buckets, batch_format="pyarrow")
        .groupby("b", num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )

    def _first_seen(t: pa.Table) -> pa.Table:
        first: dict = {}
        for d, x in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if not x:
                continue
            for w in token_re.findall(x.lower()):
                if w not in first or d < first[w]:
                    first[w] = d
        ks = sorted(first)
        return pa.table(
            {
                "word": pa.array(ks, pa.string()),
                "fd": pa.array([first[k] for k in ks], pa.int64()),
            }
        )

    def _word_buckets(t: pa.Table) -> pa.Table:
        fd = t.column("fd").to_numpy(zero_copy_only=False)
        b = np.searchsorted(cps, fd, side="right")
        return pa.table(
            {
                "b": pa.array(b, pa.int64()),
                "v": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    vocab_hist = (
        docs.map_batches(_first_seen, batch_format="pyarrow")
        .groupby("word", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Min("fd", alias_name="fd"))
        .map_batches(_word_buckets, batch_format="pyarrow")
        .groupby("b", num_partitions=2)
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )
    tok_by_b = Counter({int(r["b"]): int(r["n"]) for r in tok_hist})
    voc_by_b = Counter({int(r["b"]): int(r["v"]) for r in vocab_hist})
    cum_t = cum_v = 0
    rows = []
    for i, cp in enumerate(cps):
        cum_t += tok_by_b.get(i, 0)
        cum_v += voc_by_b.get(i, 0)
        rows.append((i + 1, int(cp), cum_t, cum_v))
    return pa.table(
        {
            "checkpoint": pa.array([r[0] for r in rows], pa.int64()),
            "doc_lt": pa.array([r[1] for r in rows], pa.int64()),
            "cum_tokens": pa.array([r[2] for r in rows], pa.int64()),
            "vocab_size": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_q179() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH f AS (SELECT doc_id, lower(text) AS lt FROM documents
           WHERE text IS NOT NULL AND length(text) > 0),
mx AS (SELECT max(doc_id) + 1 AS m FROM f),
cp AS (SELECT CAST(k AS BIGINT) AS k, (mx.m * k) // {Q179_CHECKPOINTS} AS cp
       FROM range(1, {Q179_CHECKPOINTS + 1}) t(k) CROSS JOIN mx),
u AS (SELECT doc_id, unnest(regexp_extract_all(lt, '{TOKEN_RE}')) AS word
      FROM f),
w AS (SELECT word, min(doc_id) AS fd FROM u GROUP BY 1),
t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1)
SELECT cp.k AS checkpoint, cp.cp AS doc_lt,
       (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM t
        WHERE t.doc_id < cp.cp) AS cum_tokens,
       (SELECT CAST(count(*) AS BIGINT) FROM w
        WHERE w.fd < cp.cp) AS vocab_size
FROM cp ORDER BY 1
"""


def q180_posting_compression(sf_dir: str):
    """Delta-varint compression audit of the inverted index: per term,
    posting count, exact varint byte cost of the doc-id GAP encoding,
    and the raw int64 cost — the storage planner's answer to 'what
    does the index actually cost on disk' (gap+varint is how every
    real posting list ships; Lucene/PISA practice, public). One
    (word, doc_id) distinct exchange (q27 shape), then ONE word-keyed
    repartition where each term's sorted gap stream reduces
    block-locally (terms never straddle blocks) — the per-term stats
    emit directly, no second aggregation. All-integer (the varint
    size ladder replays as a CASE)."""
    import re as _re

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    token_re = _re.compile(r"[a-z0-9]+")

    def _postings(t: pa.Table) -> pa.Table:
        out_w, out_d = [], []
        for d, x in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if not x:
                continue
            for w in sorted(set(token_re.findall(x.lower()))):
                out_w.append(w)
                out_d.append(d)
        return pa.table(
            {
                "word": pa.array(out_w, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    post = (
        docs.map_batches(_postings, batch_format="pyarrow")
        .groupby(["word", "doc_id"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Count(alias_name="_c"))
    )

    def _term_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "n_postings": pa.array([], pa.int64()),
                    "bytes_delta": pa.array([], pa.int64()),
                    "bytes_raw": pa.array([], pa.int64()),
                }
            )
        w = np.asarray(t.column("word").to_pylist())
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        seg = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        prev = np.r_[np.int64(-1), d[:-1]]
        prev[seg] = -1  # first posting's gap is doc_id - (-1)
        gap = d - prev
        nb = (
            1
            + (gap >= 128).astype(np.int64)
            + (gap >= 16384).astype(np.int64)
            + (gap >= 2097152).astype(np.int64)
            + (gap >= 268435456).astype(np.int64)
        )
        counts = np.diff(np.r_[seg, len(w)])
        sums = np.add.reduceat(nb, seg)
        return pa.table(
            {
                "word": pa.array(w[seg], pa.string()),
                "n_postings": pa.array(counts, pa.int64()),
                "bytes_delta": pa.array(sums, pa.int64()),
                "bytes_raw": pa.array(8 * counts, pa.int64()),
            }
        )

    return (
        post.repartition(VOCAB_PARTITIONS, keys=["word"])
        .map_batches(_term_stats, batch_format="pyarrow", batch_size=None)
        .sort("word")
    )


def _sql_q180() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH u AS (SELECT DISTINCT doc_id,
                  unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS word
           FROM documents WHERE text IS NOT NULL),
g AS (SELECT word,
             doc_id - lag(doc_id, 1, CAST(-1 AS BIGINT)) OVER
               (PARTITION BY word ORDER BY doc_id) AS gap
      FROM u),
b AS (SELECT word,
             CASE WHEN gap < 128 THEN 1
                  WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3
                  WHEN gap < 268435456 THEN 4
                  ELSE 5 END AS nb
      FROM g)
SELECT word, CAST(count(*) AS BIGINT) AS n_postings,
       CAST(sum(nb) AS BIGINT) AS bytes_delta,
       CAST(8 * count(*) AS BIGINT) AS bytes_raw
FROM b GROUP BY 1 ORDER BY 1
"""


def q181_market_basket(sf_dir: str):
    """Market-basket lift over the event stream: for each pair of
    event types co-occurring in a user's history, the co-occurrence
    count and the lift n_ab·N / (n_a·n_b) — the association strength
    behind 'users who X also Y' (Agrawal-style association rules,
    baskets = users). One (user, type)-keyed distinct exchange, one
    user-keyed repartition emitting per-block PRE-AGGREGATED pair
    partials (<= types² rows per block — a user's basket never
    exceeds the type alphabet) with the user-count partial riding as
    a marker row; singles/pairs/lift finish on types-bounded
    tables."""
    from collections import Counter, defaultdict

    ev = read_table(sf_dir, "events", ["user_id", "event_type"])
    ut = (
        ev.groupby(["user_id", "event_type"], num_partitions=hash_partitions(4))
        .aggregate(Count(alias_name="_c"))
        .materialize()
    )
    singles = (
        ut.groupby("event_type", num_partitions=2)
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "lift_micro": pa.array([], pa.int64()),
        }
    )
    if not singles:
        return empty
    n_of = {r["event_type"]: int(r["n"]) for r in singles}

    def _pair_partials(t: pa.Table) -> pa.Table:
        by_user: defaultdict = defaultdict(list)
        for u, ty in zip(
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
        ):
            by_user[u].append(ty)
        cnt: Counter = Counter()
        for tys in by_user.values():
            tys.sort()
            for i in range(len(tys)):
                for j in range(i + 1, len(tys)):
                    cnt[(tys[i], tys[j])] += 1
        rows = sorted(cnt)
        # user-count partial rides as a marker row ('' sorts first and
        # is never an event type)
        return pa.table(
            {
                "type_a": pa.array([""] + [r[0] for r in rows], pa.string()),
                "type_b": pa.array([""] + [r[1] for r in rows], pa.string()),
                "n": pa.array(
                    [len(by_user)] + [cnt[r] for r in rows], pa.int64()
                ),
            }
        )

    merged = (
        ut.repartition(hash_partitions(4), keys=["user_id"])
        .map_batches(
            _pair_partials, batch_format="pyarrow", batch_size=None
        )
        .groupby(["type_a", "type_b"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    n_users = 0
    pairs = []
    for r in merged:
        if r["type_a"] == "":
            n_users = int(r["n"])
        else:
            pairs.append((r["type_a"], r["type_b"], int(r["n"])))
    pairs.sort()
    a_c, b_c, ab_c, na_c, nb_c, lift_c = [], [], [], [], [], []
    for a, b, n_ab in pairs:
        n_a, n_b = n_of[a], n_of[b]
        a_c.append(a)
        b_c.append(b)
        ab_c.append(n_ab)
        na_c.append(n_a)
        nb_c.append(n_b)
        lift_c.append(
            int(
                round_like_duckdb(
                    (1e6 * (n_ab * n_users)) / (n_a * n_b), 0
                )
            )
        )
    return pa.table(
        {
            "type_a": pa.array(a_c, pa.string()),
            "type_b": pa.array(b_c, pa.string()),
            "n_ab": pa.array(ab_c, pa.int64()),
            "n_a": pa.array(na_c, pa.int64()),
            "n_b": pa.array(nb_c, pa.int64()),
            "lift_micro": pa.array(lift_c, pa.int64()),
        }
    )


def q182_mmr_diversified(sf_dir: str):
    """Maximal-marginal-relevance diversified retrieval over the
    embedding column (Carbonell & Goldstein's MMR — what dense
    retrieval ships when near-duplicate neighbors would crowd out the
    result page, and the retrieval-side sibling of q75's SemDeDup):
    the exact top-25 candidate pool per query comes from the
    distributed brute-force kernel (q16 machinery), the greedy
    diversification re-rank runs on the (queries x 25)-bounded driver
    pool with round-6 similarity determinism. Golden oracle — the
    greedy is not SQL-replayable (golden_dedup.golden_mmr_topk shares
    the mmr_greedy kernel, full-scan pool)."""
    from barks_ocr_ray.functions.ann import mmr_topk

    return mmr_topk(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        ANN_QUERY_IDS,
    )


SQL_Q181 = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM ut),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_ab, sa.n AS n_a, sb.n AS n_b,
       CAST(round(1e6 * (p.n_ab * nu.n) / (sa.n * sb.n), 0) AS BIGINT)
         AS lift_micro
FROM p JOIN s sa ON sa.event_type = p.type_a
       JOIN s sb ON sb.event_type = p.type_b
       CROSS JOIN nu
ORDER BY 1, 2
"""


def q183_join_skew_audit(sf_dir: str):
    """Join-key skew audit over orders.o_custkey: exact Gini
    coefficient of the per-key row distribution plus max / p99 key
    sizes — the pre-flight report that says whether a key needs
    salting (q54/q74) before it melts a shuffle partition. Shape: ONE
    keyed count exchange, then a count-of-counts aggregation whose
    cardinality is bounded by the LARGEST key size (not the key
    count); the Gini closes in exact integer arithmetic on that
    bounded table via the run-sum identity
    sum_i (2i-n-1)c_i = sum_runs c(2(m*lo + m(m-1)/2) - m(n+1))."""
    import math as _math

    orders = read_table(sf_dir, "orders", ["o_custkey"])
    per_key = orders.groupby("o_custkey", num_partitions=hash_partitions(4)).aggregate(
        Count(alias_name="c")
    )
    cofc = (
        per_key.groupby("c", num_partitions=2)
        .aggregate(Count(alias_name="m"))
        .take_all()
    )
    empty = pa.table(
        {
            "n_keys": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "max_key_rows": pa.array([], pa.int64()),
            "p99_key_rows": pa.array([], pa.int64()),
            "gini_micro": pa.array([], pa.int64()),
        }
    )
    if not cofc:
        return empty
    cofc.sort(key=lambda r: r["c"])
    n = sum(int(r["m"]) for r in cofc)
    tot = sum(int(r["c"]) * int(r["m"]) for r in cofc)
    g = 0
    cum = 0
    p99_rank = int(_math.ceil(0.99 * n))
    p99 = None
    for r in cofc:
        c, m = int(r["c"]), int(r["m"])
        lo = cum + 1
        g += c * (2 * (m * lo + m * (m - 1) // 2) - m * (n + 1))
        cum += m
        if p99 is None and cum >= p99_rank:
            p99 = c
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "n_rows": pa.array([tot], pa.int64()),
            "max_key_rows": pa.array([int(cofc[-1]["c"])], pa.int64()),
            "p99_key_rows": pa.array([p99], pa.int64()),
            "gini_micro": pa.array(
                [int(round_like_duckdb((1e6 * g) / (n * tot), 0))],
                pa.int64(),
            ),
        }
    )


SQL_Q183 = """
WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
r AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM k GROUP BY 1),
s AS (SELECT CAST(sum(m) AS BIGINT) AS n,
             CAST(sum(c * m) AS BIGINT) AS tot FROM r),
w AS (SELECT c, m,
             CAST(coalesce(sum(m) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before,
             CAST(sum(m) OVER (ORDER BY c) AS BIGINT) AS cum
      FROM r),
num AS (SELECT CAST(sum(c * (2 * (m * (cum_before + 1) + m * (m - 1) // 2)
                            - m * (s.n + 1))) AS BIGINT) AS g
        FROM w CROSS JOIN s)
SELECT s.n AS n_keys, s.tot AS n_rows,
       (SELECT max(c) FROM r) AS max_key_rows,
       (SELECT min(c) FROM w
        WHERE cum >= CAST(ceil(0.99 * s.n) AS BIGINT)) AS p99_key_rows,
       CAST(round(1e6 * num.g / (s.n * s.tot), 0) AS BIGINT) AS gini_micro
FROM s CROSS JOIN num
"""


def q184_minhash_error_audit(sf_dir: str):
    """Approximation-quality harness for the MinHash family: every q19
    candidate pair's ESTIMATED Jaccard (128-perm signature agreement)
    against the EXACT token-trigram Jaccard of the two texts —
    n_pairs, total/max absolute error and the overestimate count, the
    numbers that justify (or indict) the sketch parameters before a
    100 TB dedup run acts on them. Distributed shape: the q19 pair
    stream joins the corpus twice on compacted inputs (pairs never
    materialize on the driver); the exact-Jaccard kernel runs per
    pair-row (pair-bounded, the q21 gram definition verbatim) and the
    errors reduce through one single-row aggregation. Oracle: golden
    q19 pairs re-scored exactly by DuckDB list algebra."""
    from barks_ocr_ray.functions.dedupe import minhash_near_dups
    from barks_ocr_ray.functions.relational import compact_nonempty
    from barks_ocr_ray.functions.text import Tokenizer

    np_ = hash_partitions(4)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"]).materialize()
    pairs = minhash_near_dups(docs, threshold=0.4).materialize()
    one_zero = pa.table(
        {
            "n_pairs": pa.array([0], pa.int64()),
            "sum_abs_err_micro": pa.array([0], pa.int64()),
            "max_abs_err_micro": pa.array([0], pa.int64()),
            "n_over": pa.array([0], pa.int64()),
        }
    )
    pairs_c, n_pairs = compact_nonempty(pairs, np_)
    if n_pairs == 0:
        return one_zero
    docs_c, _ = compact_nonempty(docs, np_)

    def _as(col_id: str, col_txt: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table(
                {col_id: t.column("doc_id"), col_txt: t.column("text")}
            )

        return _f

    ta = docs_c.map_batches(_as("doc_a", "text_a"), batch_format="pyarrow")
    tb = docs_c.map_batches(_as("doc_b", "text_b"), batch_format="pyarrow")
    ta_c, _ = compact_nonempty(ta, np_)
    tb_c, _ = compact_nonempty(tb, np_)
    j = pairs_c.join(
        ta_c, join_type="inner", num_partitions=np_, on=("doc_a",)
    )
    j_c, _ = compact_nonempty(j, np_)
    j2 = j_c.join(
        tb_c, join_type="inner", num_partitions=np_, on=("doc_b",)
    )
    tok = Tokenizer()

    def _grams(txt: str) -> set:
        ts = tok.tokens(txt or "")
        return {
            " ".join(ts[i : i + 3]) for i in range(max(1, len(ts) - 2))
        }

    def _err_partial(t: pa.Table) -> pa.Table:
        n = s = mx = over = 0
        for est, xa, xb in zip(
            t.column("est_jaccard").to_pylist(),
            t.column("text_a").to_pylist(),
            t.column("text_b").to_pylist(),
        ):
            ga, gb = _grams(xa), _grams(xb)
            inter = len(ga & gb)
            union = max(len(ga | gb), 1)
            exact_micro = int(round_like_duckdb((1e6 * inter) / union, 0))
            est_micro = int(round_like_duckdb(est * 1e6, 0))
            e = abs(est_micro - exact_micro)
            n += 1
            s += e
            mx = max(mx, e)
            over += 1 if est_micro > exact_micro else 0
        return pa.table(
            {
                "n_pairs": pa.array([n], pa.int64()),
                "sum_abs_err_micro": pa.array([s], pa.int64()),
                "max_abs_err_micro": pa.array([mx], pa.int64()),
                "n_over": pa.array([over], pa.int64()),
            }
        )

    stats = j2.map_batches(_err_partial, batch_format="pyarrow").aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("sum_abs_err_micro", alias_name="sum_abs_err_micro"),
        Max("max_abs_err_micro", alias_name="max_abs_err_micro"),
        Sum("n_over", alias_name="n_over"),
    )
    return pa.table(
        {
            "n_pairs": pa.array([int(stats["n_pairs"] or 0)], pa.int64()),
            "sum_abs_err_micro": pa.array(
                [int(stats["sum_abs_err_micro"] or 0)], pa.int64()
            ),
            "max_abs_err_micro": pa.array(
                [int(stats["max_abs_err_micro"] or 0)], pa.int64()
            ),
            "n_over": pa.array([int(stats["n_over"] or 0)], pa.int64()),
        }
    )


def _sql_q184() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    return f"""
WITH p AS (SELECT doc_a, doc_b, est_jaccard
           FROM read_parquet('{neardup_golden_path("minhash_pairs")}')
           WHERE corpus_tag = {corpus_tag_sql("documents")}),
g AS (SELECT doc_id,
             list_distinct(list_transform(
                 range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_RE}')
                     AS toks
            FROM documents) t),
e AS (SELECT
        CAST(round(p.est_jaccard * 1e6, 0) AS BIGINT) AS est_micro,
        CAST(round(1e6 * CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / greatest(len(list_distinct(list_concat(a.grams, b.grams))),
                              1), 0) AS BIGINT) AS exact_micro
      FROM p JOIN g a ON a.doc_id = p.doc_a
             JOIN g b ON b.doc_id = p.doc_b)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(abs(est_micro - exact_micro)), 0) AS BIGINT)
         AS sum_abs_err_micro,
       CAST(coalesce(max(abs(est_micro - exact_micro)), 0) AS BIGINT)
         AS max_abs_err_micro,
       CAST(coalesce(sum(CASE WHEN est_micro > exact_micro THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_over
FROM e
"""


Q185_K = 3
Q185_ROUNDS = 8


def q185_kcore(sf_dir: str):
    """k-core decomposition (membership at k=3) of the
    customer<->supplier trade graph — the subgraph-density screen
    that separates the engaged core from one-shot pendants (Matula &
    Beck peeling; the density rung next to q94 centrality, q138
    triangles, q163 HITS). Fixed-round synchronous peeling in
    `graph.kcore_membership`: BSP task waves over coded edge blocks
    under the node-count gate, two membership semi-joins + one grouped
    count per round above it; converged rounds are idempotent, so the
    early-stopping engine and the fully-unrolled oracle agree."""
    from barks_ocr_ray.functions.graph import kcore_membership

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
            pa.scalar("C"), pc.cast(t.column("o_custkey"), pa.string()), ""
        )
        supp = pc.binary_join_element_wise(
            pa.scalar("S"), pc.cast(t.column("l_suppkey"), pa.string()), ""
        )
        return pa.table({"src": cust, "dst": supp})

    return kcore_membership(
        joined.map_batches(_pairs, batch_format="pyarrow"),
        k=Q185_K,
        rounds=Q185_ROUNDS,
    ).sort("node")


def _sql_q185() -> str:
    ctes = [
        """e0 AS (
  SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                  'S' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (SELECT src, dst FROM e0
          UNION ALL SELECT dst AS src, src AS dst FROM e0),
s0 AS (SELECT DISTINCT src AS node FROM edges)"""
    ]
    for r in range(1, Q185_ROUNDS + 1):
        ctes.append(
            """s{r} AS (
  SELECT e.src AS node FROM edges e
  JOIN s{p} a ON e.src = a.node
  JOIN s{p} b ON e.dst = b.node
  GROUP BY e.src HAVING count(*) >= {k})""".format(
                r=r, p=r - 1, k=Q185_K
            )
        )
    return "WITH {ctes}\nSELECT node FROM s{last} ORDER BY node".format(
        ctes=",\n".join(ctes), last=Q185_ROUNDS
    )


def q186_ivf_recall_audit(sf_dir: str):
    """Approximation-quality harness for the ANN family: per query,
    how many of the IVF index's top-10 (q48) are in the EXACT
    brute-force top-10 (q16) — the recall@k table that justifies the
    quantizer parameters before an index serves production traffic
    (the vector sibling of q184's MinHash error audit). Both legs run
    distributed (broadcast query matrix + per-block top-k merges; IVF
    probes n_probe lists); the intersection closes on the
    (queries x k)-bounded driver pools."""
    from barks_ocr_ray.functions.ann import brute_force_topk, ivf_topk

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    exact = brute_force_topk(emb, ANN_QUERY_IDS, k=10).take_all()
    approx = ivf_topk(emb, ANN_QUERY_IDS, k=10).take_all()
    ex_by_q: dict = {}
    for r in exact:
        ex_by_q.setdefault(int(r["query_id"]), set()).add(
            int(r["neighbor_id"])
        )
    ap_by_q: dict = {}
    for r in approx:
        ap_by_q.setdefault(int(r["query_id"]), set()).add(
            int(r["neighbor_id"])
        )
    qids = sorted(ap_by_q)
    hits = [len(ap_by_q[q] & ex_by_q.get(q, set())) for q in qids]
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "recall_micro": pa.array(
                [
                    int(round_like_duckdb((1e6 * h) / 10, 0))
                    for h in hits
                ],
                pa.int64(),
            ),
        }
    )


def _sql_q186() -> str:
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    return f"""
WITH ex AS ({SQL_Q16}),
ap AS (SELECT query_id, neighbor_id
       FROM read_parquet('{neardup_golden_path("ivf_topk")}')
       WHERE corpus_tag = {corpus_tag_sql("embeddings")}),
h AS (SELECT ap.query_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM ap JOIN ex ON ex.query_id = ap.query_id
                     AND ex.neighbor_id = ap.neighbor_id
      GROUP BY 1)
SELECT q.query_id, coalesce(h.n_hits, 0) AS n_hits,
       CAST(round(1e6 * coalesce(h.n_hits, 0) / 10, 0) AS BIGINT)
         AS recall_micro
FROM (SELECT DISTINCT query_id FROM ap) q
LEFT JOIN h USING (query_id) ORDER BY 1
"""


def q187_attrition_report(sf_dir: str):
    """Per-source attrition funnel through the q115 cleaning arc —
    'where did my data go', the observability table every pretraining
    curation run publishes: docs per source surviving each successive
    gate (training split -> exact-dedup winner -> Gopher repetition ->
    decontamination). Reuses the exact stage kernels (so the funnel
    IS the pipeline, not a parallel estimate); the per-doc gate flags
    merge through ONE doc-keyed union-Max exchange + one compacted
    doc-keyed join to attach source, and the report reduces to a
    sources-bounded grouped sum of conjunction counters."""
    import numpy as np

    from barks_ocr_ray.functions.curation import (
        _id_fracs,
        decontaminate,
        repetition_stats,
    )
    from barks_ocr_ray.functions.dedupe import exact_dedup_docs
    from barks_ocr_ray.functions.relational import compact_nonempty

    f, w = Q112_HOLDOUT_FRAC, Q112_WINDOW
    np_ = hash_partitions(4)
    docs = read_table(
        sf_dir, "documents", ["doc_id", "text", "source"]
    ).materialize()

    def _base(t: pa.Table) -> pa.Table:
        us = _id_fracs(t.column("doc_id"), "md5")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "in_train": pa.array((us >= f).astype(np.int64), pa.int64()),
            }
        )

    base = docs.map_batches(_base, batch_format="pyarrow")

    def _train_filter(t: pa.Table) -> pa.Table:
        us = _id_fracs(t.column("doc_id"), "md5")
        return t.filter(pa.array(us >= f, pa.bool_()))

    train = docs.map_batches(_train_filter, batch_format="pyarrow")

    def _flag(col: str):
        def _f(t: pa.Table) -> pa.Table:
            one = pa.array(np.ones(t.num_rows, np.int64), pa.int64())
            zero = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "fw": one if col == "fw" else zero,
                    "fr": one if col == "fr" else zero,
                    "fc": one if col == "fc" else zero,
                }
            )

        return _f

    winners = exact_dedup_docs(train).map_batches(
        _flag("fw"), batch_format="pyarrow"
    )
    rep = (
        repetition_stats(train)
        .filter(
            expr=(
                f"dup_token_frac <= {Q115_MAX_DUP_FRAC} and "
                f"top_bigram_frac <= {Q115_MAX_BIGRAM_FRAC}"
            )
        )
        .map_batches(_flag("fr"), batch_format="pyarrow")
    )
    contam = decontaminate(docs, holdout_frac=f, window=w).map_batches(
        _flag("fc"), batch_format="pyarrow"
    )
    flags = (
        winners.union(rep)
        .union(contam)
        .groupby("doc_id", num_partitions=np_)
        .aggregate(
            Max("fw", alias_name="fw"),
            Max("fr", alias_name="fr"),
            Max("fc", alias_name="fc"),
        )
    )
    base_c, _ = compact_nonempty(base, np_)
    flags_c, n_flags = compact_nonempty(flags, np_)
    if n_flags == 0:
        merged = base_c.map_batches(
            lambda t: t.append_column(
                "fw", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            )
            .append_column(
                "fr", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            )
            .append_column(
                "fc", pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        merged = base_c.join(
            flags_c,
            join_type="left_outer",
            num_partitions=np_,
            on=("doc_id",),
        )

    def _partials(t: pa.Table) -> pa.Table:
        it = t.column("in_train").to_numpy(zero_copy_only=False)
        fw = pc.fill_null(t.column("fw"), 0).to_numpy(zero_copy_only=False)
        fr = pc.fill_null(t.column("fr"), 0).to_numpy(zero_copy_only=False)
        fc = pc.fill_null(t.column("fc"), 0).to_numpy(zero_copy_only=False)
        n_train = it
        n_dedup = it * fw
        n_rep_ok = n_dedup * fr
        n_clean = n_rep_ok * (1 - fc)
        k = pa.table(
            {
                "source": t.column("source"),
                "n_total": pa.array(np.ones(len(it), np.int64), pa.int64()),
                "n_train": pa.array(n_train, pa.int64()),
                "n_dedup": pa.array(n_dedup, pa.int64()),
                "n_rep_ok": pa.array(n_rep_ok, pa.int64()),
                "n_clean": pa.array(n_clean, pa.int64()),
            }
        )
        return (
            k.group_by("source")
            .aggregate(
                [
                    ("n_total", "sum"),
                    ("n_train", "sum"),
                    ("n_dedup", "sum"),
                    ("n_rep_ok", "sum"),
                    ("n_clean", "sum"),
                ]
            )
            .rename_columns(
                ["source", "n_total", "n_train", "n_dedup", "n_rep_ok",
                 "n_clean"]
            )
        )

    return (
        merged.map_batches(_partials, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_train", alias_name="n_train"),
            Sum("n_dedup", alias_name="n_dedup"),
            Sum("n_rep_ok", alias_name="n_rep_ok"),
            Sum("n_clean", alias_name="n_clean"),
        )
        .sort("source")
    )


def _sql_q187() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    w = Q112_WINDOW
    f = Q112_HOLDOUT_FRAC
    return f"""
WITH base AS (
  SELECT doc_id, source, text,
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
  SELECT r.doc_id FROM r JOIN top USING (doc_id)
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
           WHERE wnd.u >= {f}),
flags AS (
  SELECT b.doc_id, b.source,
         (b.u >= {f}) AS in_train,
         (win.doc_id IS NOT NULL) AS is_w,
         (rep_ok.doc_id IS NOT NULL) AS is_r,
         (contam.doc_id IS NOT NULL) AS is_c
  FROM base b
  LEFT JOIN win ON win.doc_id = b.doc_id
  LEFT JOIN rep_ok ON rep_ok.doc_id = b.doc_id
  LEFT JOIN contam ON contam.doc_id = b.doc_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN in_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN in_train AND is_w THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dedup,
       CAST(sum(CASE WHEN in_train AND is_w AND is_r THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rep_ok,
       CAST(sum(CASE WHEN in_train AND is_w AND is_r AND NOT is_c
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM flags GROUP BY 1 ORDER BY 1
"""


#: q188 burst window width (event-time, exact)
Q188_WINDOW_US = 3_600_000_000


def q188_burst_windows(sf_dir: str):
    """Per-user peak event rate: the maximum number of events inside
    any trailing 1-hour event-time window — the burst/rate-limit
    signal (crawler politeness, abuse detection) that tumbling buckets
    (q12) blur across boundaries. Exact sliding semantics with NO
    per-event self-join: one user-keyed exchange, then per block each
    user's sorted timestamp array answers every window with two
    vectorized searchsorted sweeps (count in [ts-1h, ts], equal-ts
    peers included — the SQL RANGE frame's peer rule)."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _bursts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "max_burst": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        out_u, out_m = [], []
        for i, s in enumerate(seg):
            e = seg[i + 1] if i + 1 < len(seg) else len(u)
            a = ts[s:e]
            hi = np.searchsorted(a, a, side="right")
            lo = np.searchsorted(a, a - Q188_WINDOW_US, side="left")
            out_u.append(int(u[s]))
            out_m.append(int((hi - lo).max()))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "max_burst": pa.array(out_m, pa.int64()),
            }
        )

    return (
        ev.repartition(hash_partitions(4), keys=["user_id"])
        .map_batches(_bursts, batch_format="pyarrow", batch_size=None)
        .sort("user_id")
    )


SQL_Q188 = """
WITH b AS (
  SELECT user_id,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
              AS BIGINT) AS w
  FROM events)
SELECT user_id, max(w) AS max_burst FROM b GROUP BY 1 ORDER BY 1
"""


def q189_two_hop_reach(sf_dir: str):
    """Two-hop neighborhood size per node over the trade graph (the
    friends-of-friends reach that prices influence/recommendation
    fan-out; completes the graph-analytics shelf next to q94 PageRank,
    q138 triangles, q163 HITS, q185 k-core). Distributed shape: one
    mid-node wedge join (sum(deg²)-sized — unlike triangles, two-hop
    reach is charged to the endpoint, so the degree-ordering trick
    that makes triangle_counts hub-safe does not apply; degree-cap or
    salt hub nodes before calling this on a skewed graph), then (node,
    reach) DISTINCT via one composite-keyed exchange and a node-keyed
    count. Self is excluded; direct neighbors count (distance 1 or
    2)."""
    from barks_ocr_ray.functions.graph import _distinct_edges, symmetrize
    from barks_ocr_ray.functions.relational import compact_nonempty

    np_ = hash_partitions(8)
    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    od = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        od,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # nodes are INT-coded through the wedge machinery (cust -> 2k,
    # supp -> 2k+1): the sum(deg²)-sized wedge stream ships int64
    # pairs, not strings (measured 40x on the sf0.01 graph's 25M
    # wedges); the string ids reappear only on the node-sized output
    def _pairs(t: pa.Table) -> pa.Table:
        cust = pc.multiply(
            t.column("o_custkey").cast(pa.int64()), pa.scalar(2, pa.int64())
        )
        supp = pc.add(
            pc.multiply(
                t.column("l_suppkey").cast(pa.int64()),
                pa.scalar(2, pa.int64()),
            ),
            pa.scalar(1, pa.int64()),
        )
        return pa.table({"src": cust, "dst": supp})

    edges = symmetrize(
        _distinct_edges(
            joined.map_batches(_pairs, batch_format="pyarrow"), np_
        )
    ).materialize()
    edges_c, n_edges = compact_nonempty(edges, np_)
    empty = pa.table(
        {
            "node": pa.array([], pa.string()),
            "n_reach": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return empty

    left = edges_c.map_batches(
        lambda t: pa.table(
            {"node": t.column("src"), "mid": t.column("dst")}
        ),
        batch_format="pyarrow",
    )
    right = edges_c.map_batches(
        lambda t: pa.table(
            {"mid": t.column("src"), "reach": t.column("dst")}
        ),
        batch_format="pyarrow",
    )
    left_c, _ = compact_nonempty(left, np_)
    right_c, _ = compact_nonempty(right, np_)
    wedges = left_c.join(
        right_c, join_type="inner", num_partitions=np_, on=("mid",)
    )

    def _hop2(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("reach"), t.column("node")))
        t = t.filter(keep)
        # block-level distinct combiner: the exchange ships at most
        # (distinct pairs per block), never the raw wedge multiplicity
        return (
            pa.table(
                {"node": t.column("node"), "reach": t.column("reach")}
            )
            .group_by(["node", "reach"])
            .aggregate([])
        )

    direct = edges_c.map_batches(
        lambda t: pa.table(
            {"node": t.column("src"), "reach": t.column("dst")}
        ),
        batch_format="pyarrow",
    )

    def _decode(t: pa.Table) -> pa.Table:
        code = t.column("node")
        is_supp = pc.equal(
            pc.bit_wise_and(code, pa.scalar(1, pa.int64())),
            pa.scalar(1, pa.int64()),
        )
        key = pc.divide(code, pa.scalar(2, pa.int64())).cast(pa.string())
        node = pc.binary_join_element_wise(
            pc.if_else(is_supp, pa.scalar("S"), pa.scalar("C")), key, ""
        )
        return pa.table({"node": node, "n_reach": t.column("n_reach")})

    def _per_node_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n_reach": pa.array([], pa.int64()),
                }
            )
        # node-keyed repartition colocates each node's rows, so the
        # block-local distinct IS the global distinct — one Arrow
        # hash pass replaces a Ray hash-aggregate over the pair
        # stream (measured 196 s -> <2 s on the 12.8M-row sf0.01
        # stream; Ray's HashAggregate pays per-row key overhead the
        # Arrow kernel doesn't)
        d = t.group_by(["node", "reach"]).aggregate([])
        return (
            d.group_by(["node"])
            .aggregate([("reach", "count")])
            .rename_columns(["node", "n_reach"])
        )

    counted = (
        # batch_size=None everywhere below: combiners must see whole
        # partitions, not 1k-row slices (the CLAUDE.md keyed-block trap)
        wedges.map_batches(_hop2, batch_format="pyarrow", batch_size=None)
        .union(direct)
        .repartition(np_, keys=["node"])
        .map_batches(
            _per_node_counts, batch_format="pyarrow", batch_size=None
        )
    )
    counted_c, _ = compact_nonempty(counted, np_)
    return counted_c.map_batches(_decode, batch_format="pyarrow").sort(
        "node"
    )


def _sql_q189() -> str:
    return """
WITH e0 AS (SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                   'S' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
two AS (SELECT DISTINCT a.src AS node, b.dst AS reach
        FROM edges a JOIN edges b ON a.dst = b.src
        WHERE b.dst != a.src
        UNION SELECT DISTINCT src AS node, dst AS reach FROM edges)
SELECT node, CAST(count(*) AS BIGINT) AS n_reach
FROM two GROUP BY 1 ORDER BY 1
"""


#: q190/q191 resharding geometry: old and new shard counts
Q190_SHARDS_OLD = 8
Q190_SHARDS_NEW = 9


def _rendezvous_rows(t: pa.Table) -> "tuple":
    """Per-key modulo and rendezvous (HRW) shard assignments at the old
    and new shard counts (Thaler & Ravishankar's highest-random-weight
    hashing). md5 hex strings compare lexicographically == numerically
    (fixed-width lowercase hex), so the DuckDB list_max/array_position
    replay picks the identical winner; first-max tie rule on both
    sides. md5 here is the oracle-replayable path — the
    functions/hashing.py splitmix64 discipline applies verbatim for a
    production fast path."""
    import hashlib

    ids = t.column("doc_id").to_pylist()
    m8, m9, r8, r9 = [], [], [], []
    for d in ids:
        hs = [
            hashlib.md5(f"{d}|{s}".encode()).hexdigest()
            for s in range(Q190_SHARDS_NEW)
        ]
        old = hs[: Q190_SHARDS_OLD]
        r8.append(old.index(max(old)))
        r9.append(hs.index(max(hs)))
        m8.append(d % Q190_SHARDS_OLD)
        m9.append(d % Q190_SHARDS_NEW)
    return ids, m8, m9, r8, r9


def q190_reshard_churn(sf_dir: str):
    """Resharding-churn audit: when the partition count grows 8 -> 9,
    how many keys MOVE under modulo placement vs rendezvous/HRW
    hashing — the number that decides whether a 100 TB re-partition
    rewrites ~8/9 of every shard (modulo) or ~1/9 (consistent
    placement), i.e. whether resumable partitioned output (SURVEY's
    'failed run skips finished partitions') survives a topology
    change. One streamed pass (per-key hashing, md5 oracle path),
    single-row integer rollup."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _partial(t: pa.Table) -> pa.Table:
        _, m8, m9, r8, r9 = _rendezvous_rows(t)
        m8a, m9a = np.array(m8), np.array(m9)
        r8a, r9a = np.array(r8), np.array(r9)
        return pa.table(
            {
                "n_keys": pa.array([len(m8)], pa.int64()),
                "moved_modulo": pa.array(
                    [int((m8a != m9a).sum())], pa.int64()
                ),
                "moved_rendezvous": pa.array(
                    [int((r8a != r9a).sum())], pa.int64()
                ),
            }
        )

    s = docs.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("n_keys", alias_name="n_keys"),
        Sum("moved_modulo", alias_name="moved_modulo"),
        Sum("moved_rendezvous", alias_name="moved_rendezvous"),
    )
    return pa.table(
        {
            "n_keys": pa.array([int(s["n_keys"] or 0)], pa.int64()),
            "moved_modulo": pa.array(
                [int(s["moved_modulo"] or 0)], pa.int64()
            ),
            "moved_rendezvous": pa.array(
                [int(s["moved_rendezvous"] or 0)], pa.int64()
            ),
        }
    )


def _sql_q190() -> str:
    n, o = Q190_SHARDS_NEW, Q190_SHARDS_OLD
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(0, {n}),
             s -> md5(CAST(doc_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)))
           AS hs
  FROM documents),
a AS (
  SELECT doc_id,
         array_position(hs[1:{o}], list_max(hs[1:{o}])) - 1 AS r_old,
         array_position(hs, list_max(hs)) - 1 AS r_new,
         doc_id % {o} AS m_old, doc_id % {n} AS m_new
  FROM h)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN m_old != m_new THEN 1 ELSE 0 END) AS BIGINT)
         AS moved_modulo,
       CAST(sum(CASE WHEN r_old != r_new THEN 1 ELSE 0 END) AS BIGINT)
         AS moved_rendezvous
FROM a
"""


def q191_shard_balance(sf_dir: str):
    """Shard-balance histogram under rendezvous placement at the new
    topology (q190's companion): keys per shard — the skew report that
    says whether consistent placement also stays BALANCED (HRW is
    uniform in expectation; this measures the draw). Streamed per-key
    hashing into shards-bounded count partials."""
    from collections import Counter

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def _partial(t: pa.Table) -> pa.Table:
        _, _, _, _, r9 = _rendezvous_rows(t)
        c = Counter(r9)
        ks = sorted(c)
        return pa.table(
            {
                "shard": pa.array(ks, pa.int64()),
                "n_keys": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("shard", num_partitions=2)
        .aggregate(Sum("n_keys", alias_name="n_keys"))
        .sort("shard")
    )


def _sql_q191() -> str:
    n = Q190_SHARDS_NEW
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(0, {n}),
             s -> md5(CAST(doc_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)))
           AS hs
  FROM documents)
SELECT array_position(hs, list_max(hs)) - 1 AS shard,
       CAST(count(*) AS BIGINT) AS n_keys
FROM h GROUP BY 1 ORDER BY 1
"""


def q192_last_touch_attribution(sf_dir: str):
    """Last-touch revenue attribution: each purchase's value credits
    the user's most recent preceding click (ties on timestamp break by
    event_id — the SQL ROWS-frame rule, mirrored exactly) — the
    marketing-analytics join-free attribution scan next to q144's path
    mining and q151's funnel. One user-keyed exchange; each user's
    sorted event stream resolves every purchase in one vectorized-scan
    pass per block; output is user-bounded."""
    import numpy as np

    ev = read_table(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
    )

    def _scan(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_purchases": pa.array([], pa.int64()),
                "n_attributed": pa.array([], pa.int64()),
                "attributed_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist())
        cents = round_like_duckdb(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, et, cents = u[order], et[order], cents[order]
        is_click = et == "click"
        is_purch = et == "purchase"
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        out_u, out_p, out_a, out_c = [], [], [], []
        for i, s in enumerate(seg):
            e = seg[i + 1] if i + 1 < len(seg) else len(u)
            click_seen = np.maximum.accumulate(is_click[s:e])
            p = is_purch[s:e]
            if not p.any():
                continue
            attr = p & click_seen
            out_u.append(int(u[s]))
            out_p.append(int(p.sum()))
            out_a.append(int(attr.sum()))
            out_c.append(int(cents[s:e][attr].sum()))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_purchases": pa.array(out_p, pa.int64()),
                "n_attributed": pa.array(out_a, pa.int64()),
                "attributed_cents": pa.array(out_c, pa.int64()),
            }
        )

    return (
        ev.repartition(hash_partitions(4), keys=["user_id"])
        .map_batches(_scan, batch_format="pyarrow", batch_size=None)
        .sort("user_id")
    )


SQL_Q192 = """
WITH e AS (SELECT event_id, user_id, ts, event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS cents
           FROM events),
m AS (SELECT *,
         max(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      FROM e),
p AS (SELECT user_id, cents, (last_click IS NOT NULL) AS attributed
      FROM m WHERE event_type = 'purchase')
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(sum(CASE WHEN attributed THEN cents ELSE 0 END) AS BIGINT)
         AS attributed_cents
FROM p GROUP BY 1 ORDER BY 1
"""


#: q193 autocorrelation lag (hours): daily periodicity
Q193_LAG = 24


def q193_daily_periodicity(sf_dir: str):
    """Daily-periodicity diagnostic on the event stream: exact Pearson
    autocorrelation of the DENSE hourly count series at lag 24 (zero
    hours count as zero — missing-hour handling is where naive
    implementations silently shift the lag). Distributed shape: one
    hour-keyed count aggregation (q12 machinery); the dense spine,
    integer regression sums and the single IEEE scalar close on the
    hours-bounded driver series."""
    import math as _math

    import numpy as np

    ev = read_table(sf_dir, "events", ["ts"])

    def _hours(t: pa.Table) -> pa.Table:
        h = pc.divide(
            t.column("ts").cast(pa.int64()),
            pa.scalar(3_600_000_000, pa.int64()),
        )
        k = pa.table({"hour_id": h})
        return (
            k.group_by("hour_id")
            .aggregate([("hour_id", "count")])
            .rename_columns(["hour_id", "n"])
        )

    hourly = (
        ev.map_batches(_hours, batch_format="pyarrow")
        .groupby("hour_id", num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    empty = pa.table(
        {
            "n_hours": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "autocorr_micro": pa.array([], pa.int64()),
        }
    )
    if not hourly:
        return empty
    by_h = {int(r["hour_id"]): int(r["n"]) for r in hourly}
    lo, hi = min(by_h), max(by_h)
    x = np.array(
        [by_h.get(h, 0) for h in range(lo, hi + 1)], dtype=object
    )
    n_hours = len(x)
    if n_hours <= Q193_LAG:
        return empty
    a, b = x[Q193_LAG:], x[: -Q193_LAG]
    n_p = len(a)
    sa, sb = int(sum(a)), int(sum(b))
    sab = int(sum(int(i) * int(j) for i, j in zip(a, b)))
    saa = int(sum(int(i) * int(i) for i in a))
    sbb = int(sum(int(i) * int(i) for i in b))
    den = _math.sqrt(float((n_p * saa - sa * sa) * (n_p * sbb - sb * sb)))
    if den == 0.0:
        return empty
    r = (1e6 * float(n_p * sab - sa * sb)) / den
    return pa.table(
        {
            "n_hours": pa.array([n_hours], pa.int64()),
            "n_pairs": pa.array([n_p], pa.int64()),
            "autocorr_micro": pa.array(
                [int(round_like_duckdb(r, 0))], pa.int64()
            ),
        }
    )




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
