from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b02_text_search_windows import *  # noqa: F401,F403

def q123_label_centroids(sf_dir: str):
    """Grouped embedding centroids (class prototypes — the building
    block of SemDeDup clustering, nearest-class-mean classification and
    prototype-based ANN init): per (label, dim), the mean embedding
    value. Float sums are order-DEPENDENT distributed; the exchange
    therefore ships int64 micro-sums (round(v * 1e6), the q81/q94
    fixed-point discipline, DuckDB-bit-identical via round_like_duckdb)
    so the distributed total is exact under any partitioning; floats
    re-enter once, at the final divide. Per-block partials are one
    vectorized reshape + reduceat per block — (labels x dims)-sized,
    never row-sized, across the exchange."""
    import numpy as np

    emb = read_table(sf_dir, "embeddings", ["label", "embedding"])

    def _partials(t: pa.Table) -> pa.Table:
        labels = t.column("label").to_numpy(zero_copy_only=False)
        la = t.column("embedding")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False)
        n = t.num_rows
        dims = flat.size // n
        mat = flat.astype(np.float64).reshape(n, dims)
        micro = round_like_duckdb(mat * 1_000_000.0, 0).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        sl = labels[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sl[1:] != sl[:-1]))
        )
        sums = np.add.reduceat(micro[order], starts, axis=0)
        counts = np.diff(np.append(starts, n))
        uniq = sl[starts]
        k = uniq.size
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(uniq.astype(np.int64), dims), pa.int64()
                ),
                "dim": pa.array(
                    np.tile(np.arange(1, dims + 1, dtype=np.int64), k),
                    pa.int64(),
                ),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(
                    np.repeat(counts.astype(np.int64), dims), pa.int64()
                ),
            }
        )

    agg = (
        emb.map_batches(_partials, batch_format="pyarrow")
        .groupby(["label", "dim"], num_partitions=hash_partitions(4))
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def _final(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c = round_like_duckdb(s / (n * 1_000_000.0), 6)
        return pa.table(
            {
                "label": t.column("label"),
                "dim": t.column("dim"),
                "n": t.column("n"),
                "centroid": pa.array(c, pa.float64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


SQL_Q123 = """
WITH e AS (
  SELECT label, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS s
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i))
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(s) AS DOUBLE) / (count(*) * 1000000.0), 6)
         AS centroid
FROM e GROUP BY 1, 2
"""


def q124_nearest_centroid(sf_dir: str):
    """Nearest-class-mean classification over the embeddings (composes
    q123's centroids): every vector is assigned to its nearest label
    centroid by squared L2, reported as a (label, assigned) confusion
    matrix. ALL distance arithmetic is int64 micro-space on BOTH
    engines (vectors and centroids quantized at 1e-6; diffs <= ~1e6,
    64-dim squared sums <= ~6.4e13 << 2^63) so argmin has no float-tie
    hazard anywhere; ties break on label asc. The centroid table is
    (labels x dims)-sized — broadcast once via ray.put, scored per
    block as one (n, k, d) numpy reduction; the exchange ships
    confusion-cell partials."""
    import numpy as np

    cent_rows = q123_label_centroids(sf_dir).take_all()
    labels = sorted({r["label"] for r in cent_rows})
    dims = max(r["dim"] for r in cent_rows)
    cmat = np.zeros((len(labels), dims), dtype=np.int64)
    lidx = {l: i for i, l in enumerate(labels)}
    for r in cent_rows:
        cmat[lidx[r["label"]], r["dim"] - 1] = np.int64(
            round_like_duckdb(
                np.array([r["centroid"] * 1_000_000.0]), 0
            )[0]
        )
    import ray as _ray

    cref = _ray.put(cmat)
    larr = np.asarray(labels, dtype=np.int64)

    emb = read_table(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def _assign(t: pa.Table) -> pa.Table:
        import ray as _ray2

        C = _ray2.get(cref)
        la = t.column("embedding")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False)
        n = t.num_rows
        E = round_like_duckdb(
            flat.astype(np.float64).reshape(n, -1) * 1_000_000.0, 0
        ).astype(np.int64)
        diff = E[:, None, :] - C[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        assigned = larr[np.argmin(dist, axis=1)]  # first min = label asc
        g = (
            pa.table(
                {
                    "label": t.column("label").cast(pa.int64()),
                    "assigned": pa.array(assigned, pa.int64()),
                }
            )
            .group_by(["label", "assigned"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["label", "assigned", "n"])

    return (
        emb.map_batches(_assign, batch_format="pyarrow")
        .groupby(["label", "assigned"], num_partitions=hash_partitions(4))
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_Q124 = """
WITH ev AS (
  SELECT vec_id, label,
         list_transform(range(1, len(embedding) + 1),
           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                     AS BIGINT)) AS e
  FROM embeddings),
s AS (
  SELECT label, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS m
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
cd AS (
  SELECT label AS clabel, dim,
         CAST(round(round(CAST(sum(m) AS DOUBLE)
                          / (count(*) * 1000000.0), 6) * 1000000)
              AS BIGINT) AS cm
  FROM s GROUP BY 1, 2),
cent AS (SELECT clabel, list(cm ORDER BY dim) AS c FROM cd GROUP BY 1),
d AS (
  SELECT ev.vec_id, ev.label, cent.clabel,
         list_sum(list_transform(range(1, len(e) + 1),
                  i -> (e[i] - c[i]) * (e[i] - c[i]))) AS dist
  FROM ev CROSS JOIN cent),
a AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, clabel) AS rk
  FROM d)
SELECT CAST(label AS BIGINT) AS label,
       CAST(clabel AS BIGINT) AS assigned,
       CAST(count(*) AS BIGINT) AS n
FROM a WHERE rk = 1 GROUP BY 1, 2
"""


def q125_source_similarity(sf_dir: str):
    """Domain-mirror detection (crawl curation: find sources hosting
    near-identical content): exact trigram-set Jaccard between SOURCES
    (not docs). Source-distinct trigrams via one keyed dedup (the
    exchange is bounded by sources x trigram-vocab, never the corpus);
    intersections via per-ngram pair emission (<= C(n_sources, 2) pairs
    per ngram — source count bounds the fanout, the q21/q53 blocking
    argument at domain granularity); sizes broadcast as a
    source-count dict."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    class _SourceNgrams(Tokenizer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            pairs = set()
            for src, s in zip(
                batch.column("source").to_pylist(), batch.column("text")
            ):
                toks = self.tokens(s.as_py() or "")
                for i in range(len(toks) - 2):
                    pairs.add((src, " ".join(toks[i : i + 3])))
            return pa.table(
                {
                    "source": pa.array([p[0] for p in pairs], pa.string()),
                    "ngram": pa.array([p[1] for p in pairs], pa.string()),
                }
            )

    from barks_ocr_ray.functions.relational import exact_dedup

    def _key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "sk",
            pc.binary_join_element_wise(
                t.column("source"), t.column("ngram"), "\x1f"
            ),
        )

    distinct = exact_dedup(
        docs.map_batches(
            _SourceNgrams, batch_format="pyarrow", concurrency=(1, 4)
        ).map_batches(_key, batch_format="pyarrow"),
        "sk",
        num_partitions=hash_partitions(8),
    ).drop_columns(["sk"])
    sizes = {
        r["source"]: r["n"]
        for r in distinct.groupby("source", num_partitions=2)
        .aggregate(Count(alias_name="n"))
        .take_all()
    }  # sources-sized: the one driver table, bounded by the domain count

    def _pairs(t: pa.Table) -> pa.Table:
        srcs = sorted(t.column("source").to_pylist())
        ia, ib = np.triu_indices(len(srcs), k=1)
        return pa.table(
            {
                "source_a": pa.array([srcs[i] for i in ia], pa.string()),
                "source_b": pa.array([srcs[i] for i in ib], pa.string()),
            }
        )

    inter = (
        distinct.groupby("ngram", num_partitions=hash_partitions(8))
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["source_a", "source_b"], num_partitions=2)
        .aggregate(Count(alias_name="n_shared"))
    )

    def _jaccard(t: pa.Table) -> pa.Table:
        sa = t.column("source_a").to_pylist()
        sb = t.column("source_b").to_pylist()
        ns = t.column("n_shared").to_numpy(zero_copy_only=False)
        union = np.array(
            [sizes[a] + sizes[b] for a, b in zip(sa, sb)], np.float64
        ) - ns
        jac = round_like_duckdb(ns / union, 4)
        return t.append_column("jaccard", pa.array(jac, pa.float64()))

    return inter.map_batches(_jaccard, batch_format="pyarrow")


def _sql_q125() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
g AS (
  SELECT source, list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
  FROM t WHERE len(toks) >= 3),
e AS (SELECT DISTINCT source, unnest(grams) AS ngram FROM g),
sz AS (SELECT source, count(*) AS n FROM e GROUP BY 1),
i AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM e a JOIN e b ON a.ngram = b.ngram AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
       round(n_shared / CAST(za.n + zb.n - n_shared AS DOUBLE), 4)
         AS jaccard
FROM i
JOIN sz za ON za.source = i.source_a
JOIN sz zb ON zb.source = i.source_b
"""


def q126_distributed_kmeans(sf_dir: str):
    """Full-corpus distributed k-means (Lloyd's, 5 rounds, k=8) — the
    iterative-ML sibling of q94's PageRank: every round broadcasts the
    k x d micro-int centroid table, blocks ship (cluster, dim, sum, n)
    partials, ONE tiny keyed aggregation updates centroids. All
    arithmetic int64 micro-space -> bit-identical under any
    partitioning and to the sequential golden replay
    (golden_dedup.golden_kmeans)."""
    from barks_ocr_ray.functions.ann import distributed_kmeans

    return distributed_kmeans(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=8,
        rounds=5,
    )


def q127_sketch_quantiles(sf_dir: str):
    """ONE-pass mergeable quantile sketch (fixed-grid histogram) — the
    approximate scale path beside q66's exact multi-round quickselect:
    p1..p99 of l_extendedprice from a min/max/count aggregate plus a
    single histogram pass whose integer bucket partials merge in any
    order (t-digest/KLL merges are order-dependent and therefore
    unreplayable under Ray partitioning; the fixed grid is not).
    Estimate error is bounded by one bucket width; bucket assignment is
    the single IEEE expression floor((x-lo)/w) on both engines, so the
    oracle replays it bit-exactly."""
    from barks_ocr_ray.functions.quantiles import histogram_quantiles

    return histogram_quantiles(
        read_table(sf_dir, "lineitem", ["l_extendedprice"]),
        "l_extendedprice",
        [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
        n_buckets=1024,
    )


SQL_Q127 = """
WITH s AS (
  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         count(*) AS n,
         (max(l_extendedprice) - min(l_extendedprice))
           / CAST(1024 AS DOUBLE) AS w
  FROM lineitem),
b AS (
  SELECT CAST(least(floor((l_extendedprice - s.lo) / s.w), 1023) AS BIGINT)
           AS idx,
         count(*) AS c
  FROM lineitem, s GROUP BY 1),
c AS (SELECT idx, sum(c) OVER (ORDER BY idx) AS cum FROM b),
qs AS (SELECT unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q),
sel AS (
  SELECT qs.q, min(c.idx) AS idx
  FROM qs, c, s
  WHERE c.cum >= greatest(1, CAST(ceil(qs.q * s.n) AS BIGINT))
  GROUP BY qs.q)
SELECT q, round(s.lo + (sel.idx + 1) * s.w, 6) AS value_est
FROM sel, s ORDER BY q
"""


def q128_scd2_history(sf_dir: str):
    """Slowly-changing-dimension (SCD type 2) history build: collapse
    each user's event stream into state-validity intervals — one row
    per run of consecutive identical event_types, valid_from = first
    event of the run, valid_to = the next run's start (null while
    current). The table-maintenance sibling of q105's CDC merge (which
    keeps only the latest state; this keeps the full history a
    temporal join needs). ONE keyed exchange co-locates a user's
    events, then one vectorized pass per block handles every user in
    the block together (q72's segment discipline): sort by (user, ts,
    event_id), mask run starts, shift-compare for valid_to — no
    per-user loop, no per-row Python."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    # 9999-12-31T00:00:00 in epoch microseconds (the SCD2 "open" sentinel)
    SCD2_OPEN_US = 253_402_214_400_000_000

    def _intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "state": pa.array([], pa.string()),
                    "valid_from": pa.array([], pa.timestamp("us")),
                    "valid_to": pa.array([], pa.timestamp("us")),
                }
            )
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        st = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, us))
        us, ts, st = us[order], ts[order], st[order]
        new_user = np.empty(n, np.bool_)
        new_user[0] = True
        new_user[1:] = us[1:] != us[:-1]
        start = new_user | np.concatenate(([True], st[1:] != st[:-1]))
        s_idx = np.flatnonzero(start)
        # valid_to of run i = valid_from of run i+1 when same user
        nxt_ts = np.empty(len(s_idx), np.int64)
        nxt_ts[:-1] = ts[s_idx[1:]]
        nxt_ts[-1] = 0
        same_user = np.zeros(len(s_idx), np.bool_)
        same_user[:-1] = us[s_idx[:-1]] == us[s_idx[1:]]
        return pa.table(
            {
                "user_id": pa.array(us[s_idx], pa.int64()),
                "state": pa.array(st[s_idx], pa.string()),
                "valid_from": pa.array(ts[s_idx], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                # open (current) intervals close at the standard SCD2
                # sentinel high date rather than NULL — NaT compares
                # unequal to itself under numpy, destabilizing value
                # comparison on both the driver and oracle_check paths
                "valid_to": pa.array(
                    np.where(same_user, nxt_ts, SCD2_OPEN_US), pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )

    return ev.repartition(hash_partitions(16), keys=["user_id"]).map_batches(
        _intervals, batch_format="pyarrow", batch_size=None
    )


SQL_Q128 = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
st AS (
  SELECT user_id, ts, event_id, event_type
  FROM o WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS state, ts AS valid_from,
       coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                TIMESTAMP '9999-12-31 00:00:00') AS valid_to
FROM st
"""


def q129_incremental_dedup(sf_dir: str):
    """Cross-snapshot delta-ingest dedup (the recurring-crawl pass: a
    NEW snapshot lands against the prior corpus): every new doc flagged
    dup_exact (content-hash semi-join vs prior) and dup_window (shares
    a 10-token window with prior, the q53/q112 hashing contract). The
    prior snapshot is never broadcast; flags roll up in ONE doc-keyed
    aggregation over (doc_id, flag) partials."""
    from barks_ocr_ray.functions.curation import incremental_ingest_dedup

    return incremental_ingest_dedup(
        read_table(sf_dir, "documents", ["doc_id", "text"]), window=10
    )


def _sql_q129(window: int = 10) -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH prior AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 7),
new AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 7),
pe AS (SELECT DISTINCT md5(text) AS h FROM prior WHERE text IS NOT NULL),
ne AS (SELECT doc_id, md5(text) AS h FROM new WHERE text IS NOT NULL),
ex AS (SELECT DISTINCT ne.doc_id FROM ne JOIN pe USING (h)),
pt AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM prior
  WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= {window}),
pw AS (
  SELECT DISTINCT
         substring(md5(array_to_string(toks[i:i+{window - 1}], ' ')), 1, 16)
           AS h
  FROM pt, UNNEST(range(1, len(toks) - {window} + 2)) AS u(i)),
nt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM new
  WHERE len(regexp_extract_all(lower(text), '{TOKEN_RE}')) >= {window}),
nw AS (
  SELECT DISTINCT doc_id,
         substring(md5(array_to_string(toks[i:i+{window - 1}], ' ')), 1, 16)
           AS h
  FROM nt, UNNEST(range(1, len(toks) - {window} + 2)) AS u(i)),
wd AS (SELECT DISTINCT nw.doc_id FROM nw JOIN pw USING (h))
SELECT n.doc_id,
       CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS dup_exact,
       CAST(CASE WHEN wd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS dup_window
FROM new n
LEFT JOIN ex ON ex.doc_id = n.doc_id
LEFT JOIN wd ON wd.doc_id = n.doc_id
"""


def q130_snapshot_drift(sf_dir: str):
    """Snapshot-over-snapshot distribution-drift report (the data-
    quality gate a recurring crawl runs before training on a new
    snapshot): per lang, counts and shares in the prior vs new
    snapshot (q129's doc_id split) and the total-variation
    contribution |p - q| / 2 — sum of the column = TV distance. ONE
    corpus pass ships (lang, n_prior, n_new) block partials into a
    lang-sized aggregation; shares derive driver-side on the bounded
    result."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def _partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pri = ((ids % 10) < 7).astype(np.int64)
        g = (
            pa.table({"lang": t.column("lang"), "pri": pa.array(pri, pa.int64())})
            .group_by("lang")
            .aggregate([("pri", "sum"), ("pri", "count")])
        )
        n_prior = g.column("pri_sum")
        n_new = pc.subtract(g.column("pri_count").cast(pa.int64()), n_prior)
        return pa.table(
            {"lang": g.column("lang"), "n_prior": n_prior, "n_new": n_new}
        )

    agg = (
        docs.map_batches(_partials, batch_format="pyarrow")
        .groupby("lang", num_partitions=2)
        .aggregate(
            Sum("n_prior", alias_name="n_prior"),
            Sum("n_new", alias_name="n_new"),
        )
        .take_all()
    )
    agg.sort(key=lambda r: r["lang"])
    np_arr = np.array([r["n_prior"] for r in agg], np.int64)
    nn_arr = np.array([r["n_new"] for r in agg], np.int64)
    tp, tn = float(np_arr.sum()), float(nn_arr.sum())
    sp = np_arr / tp
    sn = nn_arr / tn
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in agg], pa.string()),
            "n_prior": pa.array(np_arr, pa.int64()),
            "n_new": pa.array(nn_arr, pa.int64()),
            "share_prior": pa.array(round_like_duckdb(sp, 6), pa.float64()),
            "share_new": pa.array(round_like_duckdb(sn, 6), pa.float64()),
            "tv_contrib": pa.array(
                round_like_duckdb(np.abs(sp - sn) / 2.0, 6), pa.float64()
            ),
        }
    )


SQL_Q130 = """
WITH d AS (
  SELECT lang, CASE WHEN doc_id % 10 < 7 THEN 1 ELSE 0 END AS pri
  FROM documents),
g AS (
  SELECT lang, CAST(sum(pri) AS BIGINT) AS n_prior,
         CAST(sum(1 - pri) AS BIGINT) AS n_new
  FROM d GROUP BY 1),
t AS (SELECT sum(n_prior) AS tp, sum(n_new) AS tn FROM g)
SELECT lang, n_prior, n_new,
       round(n_prior / CAST(tp AS DOUBLE), 6) AS share_prior,
       round(n_new / CAST(tn AS DOUBLE), 6) AS share_new,
       round(abs(n_prior / CAST(tp AS DOUBLE)
                 - n_new / CAST(tn AS DOUBLE)) / 2, 6) AS tv_contrib
FROM g, t
"""


def q131_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich merge learning, 12
    merges) — pass 1 is the corpus's only exchange (word-count combiner
    partials); rounds run as BSP raw-task waves over the vocabulary-
    scaled word table (q94/q126 pattern) with an alphabet²-bounded
    driver merge and a total-order argmax, bit-identical to the
    sequential golden (golden_dedup.golden_bpe_merges)."""
    from barks_ocr_ray.functions.bpe import bpe_train

    return bpe_train(
        read_table(sf_dir, "documents", ["doc_id", "text"]), n_merges=12
    )


def q132_bpe_encode(sf_dir: str):
    """Corpus tokenization under the q131-learned merge table (the
    corpus-scale half of tokenizer construction): per-doc word and
    subword counts from one warm-encoder actor-pool pass — the R-row
    merge table ships once per actor, the word->length memo makes
    repeated web vocabulary a cache hit, zero exchanges."""
    from barks_ocr_ray.functions.bpe import bpe_encode_stats, bpe_train

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    g = bpe_train(docs, n_merges=12).to_pandas()
    merges = list(zip(g["lhs"], g["rhs"]))
    return bpe_encode_stats(docs, merges)


def q133_grouped_sketch_quantiles(sf_dir: str):
    """Per-group one-pass quantile sketch (q127's grouped sibling,
    completing the quantile family: q66 exact global / q68 exact
    grouped / q127 sketch global / this): p50/p90/p99 of event value
    per event_type, each group on its OWN 256-bucket grid fixed by a
    group-sized stats aggregate. Pass 1 ships (group, bucket, c)
    integer partials; selection runs in a bucket-sized map_groups."""
    from barks_ocr_ray.functions.quantiles import grouped_histogram_quantiles

    return grouped_histogram_quantiles(
        read_table(sf_dir, "events", ["event_type", "value"]),
        "event_type",
        "value",
        [0.5, 0.9, 0.99],
        n_buckets=256,
    )


SQL_Q133 = """
WITH s AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(*) AS n,
         (max(value) - min(value)) / CAST(256 AS DOUBLE) AS w
  FROM events GROUP BY 1),
b AS (
  SELECT e.event_type,
         CAST(least(floor((e.value - s.lo) / s.w), 255) AS BIGINT) AS idx,
         count(*) AS c
  FROM events e JOIN s USING (event_type)
  GROUP BY 1, 2),
c AS (
  SELECT event_type, idx,
         sum(c) OVER (PARTITION BY event_type ORDER BY idx) AS cum
  FROM b),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
sel AS (
  SELECT c.event_type, qs.q, min(c.idx) AS idx
  FROM qs, c JOIN s USING (event_type)
  WHERE c.cum >= greatest(1, CAST(ceil(qs.q * s.n) AS BIGINT))
  GROUP BY 1, 2)
SELECT sel.event_type, q, round(s.lo + (sel.idx + 1) * s.w, 6) AS value_est
FROM sel JOIN s USING (event_type)
"""


def q134_psi_drift(sf_dir: str):
    """Population-stability-index (PSI) numeric drift — q130's sibling
    for numeric columns (the standard model-monitoring metric): bucket
    o_totalprice on a 10-bucket grid fixed by the PRIOR snapshot's
    min/max (bin edges always come from the baseline side), clamp the
    new snapshot into it, and report per-bucket counts + the smoothed
    PSI contribution (p - q) * ln(p / q); the column sums to the PSI.
    One stats aggregate over the prior + ONE corpus pass shipping
    (bucket, side) integer partials; additive +0.5 smoothing keeps
    empty buckets finite and the arithmetic SQL-replayable."""
    import numpy as np

    B = 10
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _prior_only(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((k % 10) < 7, pa.bool_()))

    stats = orders.map_batches(_prior_only, batch_format="pyarrow").aggregate(
        Min("o_totalprice", alias_name="lo"),
        Max("o_totalprice", alias_name="hi"),
    )
    lo, hi = float(stats["lo"]), float(stats["hi"])
    w = (hi - lo) / float(B)

    def _partials(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        pri = (k % 10) < 7
        idx = np.minimum(
            np.maximum(np.floor((x - lo) / w), 0.0), float(B - 1)
        ).astype(np.int64)
        out = {"bucket": [], "n_prior": [], "n_new": []}
        for side, mask in (("p", pri), ("n", ~pri)):
            u, c = np.unique(idx[mask], return_counts=True)
            out["bucket"].extend(u.tolist())
            out["n_prior"].extend((c if side == "p" else c * 0).tolist())
            out["n_new"].extend((c if side == "n" else c * 0).tolist())
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "n_prior": pa.array(out["n_prior"], pa.int64()),
                "n_new": pa.array(out["n_new"], pa.int64()),
            }
        )

    agg = (
        orders.map_batches(_partials, batch_format="pyarrow")
        .groupby("bucket", num_partitions=2)
        .aggregate(
            Sum("n_prior", alias_name="n_prior"),
            Sum("n_new", alias_name="n_new"),
        )
        .take_all()
    )
    npr = np.zeros(B, np.int64)
    nnw = np.zeros(B, np.int64)
    for r in agg:
        npr[r["bucket"]] = r["n_prior"]
        nnw[r["bucket"]] = r["n_new"]
    tp, tn = float(npr.sum()), float(nnw.sum())
    p = (npr + 0.5) / (tp + 0.5 * B)
    q = (nnw + 0.5) / (tn + 0.5 * B)
    contrib = round_like_duckdb((p - q) * np.log(p / q), 6)
    return pa.table(
        {
            "bucket": pa.array(np.arange(B, dtype=np.int64), pa.int64()),
            "n_prior": pa.array(npr, pa.int64()),
            "n_new": pa.array(nnw, pa.int64()),
            "psi_contrib": pa.array(contrib, pa.float64()),
        }
    )


SQL_Q134 = """
WITH pr AS (
  SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 10 < 7),
nw AS (
  SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 10 >= 7),
s AS (SELECT min(v) AS lo, max(v) AS hi,
             (max(v) - min(v)) / CAST(10 AS DOUBLE) AS w
      FROM pr),
tp AS (SELECT count(*) AS n FROM pr),
tn AS (SELECT count(*) AS n FROM nw),
bp AS (SELECT CAST(least(greatest(floor((v - s.lo) / s.w), 0), 9) AS BIGINT)
         AS bucket, count(*) AS c
       FROM pr, s GROUP BY 1),
bn AS (SELECT CAST(least(greatest(floor((v - s.lo) / s.w), 0), 9) AS BIGINT)
         AS bucket, count(*) AS c
       FROM nw, s GROUP BY 1),
g AS (SELECT u.bucket, coalesce(bp.c, 0) AS n_prior,
             coalesce(bn.c, 0) AS n_new
      FROM (SELECT unnest(range(0, 10)) AS bucket) u
      LEFT JOIN bp USING (bucket) LEFT JOIN bn USING (bucket))
SELECT bucket, CAST(n_prior AS BIGINT) AS n_prior,
       CAST(n_new AS BIGINT) AS n_new,
       round(((n_prior + 0.5) / (tp.n + 5.0)
              - (n_new + 0.5) / (tn.n + 5.0))
             * ln(((n_prior + 0.5) / (tp.n + 5.0))
                  / ((n_new + 0.5) / (tn.n + 5.0))), 6) AS psi_contrib
FROM g, tp, tn
"""


#: q135 temperature-mixing constants: alpha < 1 upweights small sources
#: (the multilingual/multi-source smoothing rule), budget = docs to draw
MIX_ALPHA = 0.5
MIX_BUDGET = 10_000


def q135_temperature_mix(sf_dir: str):
    """Temperature-based corpus mixing allocation (the alpha-smoothing
    rule multi-source pretraining uses to keep small sources from
    vanishing): per source, sampling probability n^alpha / sum(n^alpha)
    and the allocated doc count for a fixed budget. ONE grouped count
    (block partials); the weight normalization runs on the source-sized
    result with integer micro-weights (round(sqrt(n) * 1e6)) so the
    normalizing SUM is order-independent and bit-replayable — a float
    sum over sources would depend on DuckDB's vs the driver's add
    order."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["source"])

    def _partials(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("source", "count")])
        return g.rename_columns(["source", "n"])

    agg = (
        docs.map_batches(_partials, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(Sum("n", alias_name="n_docs"))
        .take_all()
    )
    agg.sort(key=lambda r: r["source"])
    n = np.array([r["n_docs"] for r in agg], np.float64)
    w_micro = round_like_duckdb(n ** MIX_ALPHA * 1e6, 0).astype(np.int64)
    s = float(w_micro.sum())  # exact: int64 sum
    p = w_micro / s
    alloc = round_like_duckdb(p * MIX_BUDGET, 0).astype(np.int64)
    return pa.table(
        {
            "source": pa.array([r["source"] for r in agg], pa.string()),
            "n_docs": pa.array(
                np.array([r["n_docs"] for r in agg], np.int64), pa.int64()
            ),
            "p_sample": pa.array(round_like_duckdb(p, 6), pa.float64()),
            "alloc_docs": pa.array(alloc, pa.int64()),
        }
    )


SQL_Q135 = f"""
WITH g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY 1),
w AS (
  SELECT source, n_docs,
         CAST(round(pow(n_docs, {MIX_ALPHA}) * 1000000, 0) AS BIGINT)
           AS w_micro
  FROM g),
s AS (SELECT CAST(sum(w_micro) AS DOUBLE) AS tot FROM w)
SELECT source, n_docs,
       round(w_micro / s.tot, 6) AS p_sample,
       CAST(round(w_micro / s.tot * {MIX_BUDGET}, 0) AS BIGINT)
         AS alloc_docs
FROM w, s
"""


def q136_incremental_minhash(sf_dir: str):
    """Near-dup rung of delta ingestion (q129's MinHash sibling): new-
    snapshot docs whose estimated Jaccard vs any prior-snapshot doc
    reaches 0.4, each with its best prior match — q19's banded-LSH
    pair machinery filtered to cross-snapshot pairs plus ONE doc-keyed
    argmax (max est, tie smallest prior id)."""
    from barks_ocr_ray.functions.dedupe import incremental_minhash_dedup

    return incremental_minhash_dedup(
        read_table(sf_dir, "documents", ["doc_id", "text"]), threshold=0.4
    )


def q137_content_drift(sf_dir: str):
    """Content drift of the NEW snapshot under the PRIOR snapshot's
    unigram LM (the text sibling of q130 categorical / q134 numeric
    drift — CCNet-style perplexity with the reference model frozen on
    the prior crawl): per new doc, mean negative log-prob with add-one
    smoothing p(t) = (n_prior(t) + 1) / (N_prior + V_prior + 1), so
    OOV tokens score the uniform floor instead of vanishing. Exchanges:
    prior unigram aggregation (vocab-sized), one term-keyed LEFT join,
    one doc-keyed reduce. Per-term contributions are rounded to int64
    MICRO-nats before the per-doc sum (q81/q123 fixed-point
    discipline) so the distributed float sum is order-independent and
    the oracle replays it bit-exactly."""
    import numpy as np

    from barks_ocr_ray.functions.relational import compact_nonempty
    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, DocTermCounts

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    tf_rows = docs.map_batches(
        DocTermCounts, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()  # reused: prior unigrams + new-side scoring

    def _side(keep_prior: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 10) < 7
            return t.filter(pa.array(m == keep_prior, pa.bool_()))

        return tf_rows.map_batches(_f, batch_format="pyarrow")

    unigrams = _side(True).groupby(
        "term", num_partitions=VOCAB_PARTITIONS
    ).aggregate(Sum("tf", alias_name="n"))
    uni_c, n_vocab = compact_nonempty(unigrams, VOCAB_PARTITIONS)
    n_prior = int(uni_c.sum("n") or 0) if n_vocab else 0
    denom = float(n_prior + n_vocab + 1)

    new_tf, n_new = compact_nonempty(_side(False), 8)
    if n_new == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "xent_score": pa.array([], pa.float64()),
            }
        )
    if n_vocab == 0:
        joined = new_tf.map_batches(
            lambda t: t.append_column("n", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    else:
        joined = new_tf.join(
            uni_c,
            join_type="left_outer",
            num_partitions=VOCAB_PARTITIONS,
            on=("term",),
        )

    def _contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        n = pc.fill_null(t.column("n"), pa.scalar(0, pa.int64()))
        n = n.to_numpy(zero_copy_only=False).astype(np.float64)
        nll = tf * -np.log((n + 1.0) / denom)
        micro = round_like_duckdb(nll * 1e6, 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "nll_micro": pa.array(micro, pa.int64()),
                "tf": t.column("tf"),
            }
        )

    agg = (
        joined.map_batches(_contrib, batch_format="pyarrow")
        .groupby("doc_id", num_partitions=8)
        .aggregate(
            Sum("nll_micro", alias_name="sum_micro"),
            Sum("tf", alias_name="n_tokens"),
        )
    )

    def _score(t: pa.Table) -> pa.Table:
        s = t.column("sum_micro").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        score = round_like_duckdb(s / 1_000_000.0 / n, 4)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "xent_score": pa.array(score, pa.float64()),
            }
        )

    return agg.map_batches(_score, batch_format="pyarrow")


def _sql_q137() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}'))
           AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
pu AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf
  WHERE doc_id % 10 < 7 GROUP BY 1),
s AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE)
             + CAST(count(*) AS DOUBLE) + 1.0 AS denom
      FROM pu),
nw AS (SELECT doc_id, term, tf FROM tf WHERE doc_id % 10 >= 7),
c AS (
  SELECT nw.doc_id,
         CAST(round(nw.tf * -ln((coalesce(pu.n, 0) + 1.0) / s.denom)
                    * 1000000, 0) AS BIGINT) AS nll_micro,
         nw.tf
  FROM nw LEFT JOIN pu USING (term), s)
SELECT doc_id,
       round(sum(nll_micro) / 1000000.0 / sum(tf), 4) AS xent_score
FROM c GROUP BY 1
"""


def q138_triangle_counts(sf_dir: str):
    """Per-supplier triangle counts over the co-purchase graph
    (suppliers sharing an order are connected): the classic graph-
    analytics kernel beside q94 PageRank and q39 connected components.
    Edges build in one order-keyed map_groups (orders are small
    groups); triangles close with two distributed joins (orientation
    trick, see graph.triangle_counts)."""
    import numpy as np

    from barks_ocr_ray.functions.graph import triangle_counts

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def _pairs(t: pa.Table) -> pa.Table:
        s = np.unique(t.column("l_suppkey").to_numpy(zero_copy_only=False))
        if s.size < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(s.size, k=1)
        return pa.table(
            {"a": pa.array(s[ii], pa.int64()), "b": pa.array(s[jj], pa.int64())}
        )

    edges = (
        li.groupby("l_orderkey", num_partitions=hash_partitions(8))
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["a", "b"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )
    out = triangle_counts(edges)

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["s_suppkey", "n_triangles"])

    return out.map_batches(_rename, batch_format="pyarrow")


SQL_Q138 = """
WITH e AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM lineitem x JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
t AS (
  SELECT w.a, w.b, w.c
  FROM (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a) w
  JOIN e e3 ON e3.a = w.a AND e3.b = w.c),
n AS (
  SELECT a AS node FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t)
SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM n GROUP BY 1
"""


#: q139 audited columns (documents table, the snapshot-split surface)
Q139_COLS = ("lang", "source", "text")


def q139_schema_drift(sf_dir: str):
    """Schema-profile drift audit — the per-COLUMN data-quality gate
    between crawl snapshots (q130/q134/q137 watch one column each;
    this watches the table): for every audited column, row counts,
    null counts and exact distinct counts on both sides of the q129
    snapshot split. Row/null counts are zero-exchange block partials
    (long format, one row per column per block); distinct counts ship
    block-level (column, value)-deduped partials into ONE keyed
    exchange — the q120 dedup-partial discipline, so the exchange
    carries at most one row per distinct value per block, never one
    per row."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", *Q139_COLS])

    def _counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pri = (ids % 10) < 7
        cols, npr, nnw, nup, nun = [], [], [], [], []
        for c in Q139_COLS:
            null = pc.is_null(t.column(c)).to_numpy(zero_copy_only=False)
            cols.append(c)
            npr.append(int(pri.sum()))
            nnw.append(int((~pri).sum()))
            nup.append(int(null[pri].sum()))
            nun.append(int(null[~pri].sum()))
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "n_prior": pa.array(npr, pa.int64()),
                "n_new": pa.array(nnw, pa.int64()),
                "nulls_prior": pa.array(nup, pa.int64()),
                "nulls_new": pa.array(nun, pa.int64()),
            }
        )

    counts = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby("column", num_partitions=2)
        .aggregate(
            Sum("n_prior", alias_name="n_prior"),
            Sum("n_new", alias_name="n_new"),
            Sum("nulls_prior", alias_name="nulls_prior"),
            Sum("nulls_new", alias_name="nulls_new"),
        )
    )

    def _distinct_partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pri = (ids % 10) < 7
        cols, sides, vals = [], [], []
        for c in Q139_COLS:
            v = t.column(c).cast(pa.string()).to_numpy(zero_copy_only=False)
            ok = pc.is_valid(t.column(c)).to_numpy(zero_copy_only=False)
            for side, m in (("p", pri & ok), ("n", (~pri) & ok)):
                u = np.unique(v[m])
                cols.extend([c] * len(u))
                sides.extend([side] * len(u))
                vals.extend(u.tolist())
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "side": pa.array(sides, pa.string()),
                "value": pa.array(vals, pa.string()),
            }
        )

    uniq = (
        docs.map_batches(_distinct_partials, batch_format="pyarrow")
        .groupby(["column", "side", "value"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_n"))
    )

    def _fold(t: pa.Table) -> pa.Table:
        g = (
            t.select(["column", "side"])
            .group_by(["column", "side"])
            .aggregate([("side", "count")])
        )
        return g.rename_columns(["column", "side", "n_distinct"])

    dist = (
        uniq.map_batches(_fold, batch_format="pyarrow")
        .groupby(["column", "side"], num_partitions=2)
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .take_all()
    )
    dmap = {(r["column"], r["side"]): r["n_distinct"] for r in dist}
    rows = counts.take_all()
    rows.sort(key=lambda r: r["column"])
    return pa.table(
        {
            "column": pa.array([r["column"] for r in rows], pa.string()),
            "n_prior": pa.array([r["n_prior"] for r in rows], pa.int64()),
            "n_new": pa.array([r["n_new"] for r in rows], pa.int64()),
            "nulls_prior": pa.array(
                [r["nulls_prior"] for r in rows], pa.int64()
            ),
            "nulls_new": pa.array([r["nulls_new"] for r in rows], pa.int64()),
            "distinct_prior": pa.array(
                [dmap.get((r["column"], "p"), 0) for r in rows], pa.int64()
            ),
            "distinct_new": pa.array(
                [dmap.get((r["column"], "n"), 0) for r in rows], pa.int64()
            ),
        }
    )


def _sql_q139() -> str:
    parts = []
    for c in Q139_COLS:
        parts.append(f"""
SELECT '{c}' AS "column",
       CAST(sum(CASE WHEN doc_id % 10 < 7 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_prior,
       CAST(sum(CASE WHEN doc_id % 10 >= 7 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN doc_id % 10 < 7 AND {c} IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS nulls_prior,
       CAST(sum(CASE WHEN doc_id % 10 >= 7 AND {c} IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS nulls_new,
       CAST(count(DISTINCT CASE WHEN doc_id % 10 < 7
                 THEN CAST({c} AS VARCHAR) END) AS BIGINT)
         AS distinct_prior,
       CAST(count(DISTINCT CASE WHEN doc_id % 10 >= 7
                 THEN CAST({c} AS VARCHAR) END) AS BIGINT)
         AS distinct_new
FROM documents""")
    return "\nUNION ALL\n".join(parts)


def q140_weighted_quantiles(sf_dir: str):
    """Exact WEIGHTED quantiles of line price, weighted by quantity
    (the 'where does the q-th unit of volume sit' question — e.g. the
    token-weighted length median a packing planner needs, which the
    unweighted q66 cannot answer): the q66 counting-quickselect with
    integer weight prefix-sums replacing row counts — O(pivots) driver
    state, no global sort."""
    from barks_ocr_ray.functions.quantiles import weighted_quantiles

    ds = read_table(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def _int_weights(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("l_extendedprice"),
                "wt": t.column("l_quantity").cast(pa.int64()),
            }
        )

    return weighted_quantiles(
        ds.map_batches(_int_weights, batch_format="pyarrow"),
        "v",
        "wt",
        [0.25, 0.5, 0.75, 0.95],
    )


SQL_Q140 = """
WITH w AS (
  SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem),
t AS (SELECT CAST(sum(wt) AS BIGINT) AS W FROM w),
c AS (SELECT v, sum(wt) OVER (ORDER BY v) AS cum FROM w),
qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q),
sel AS (
  SELECT qs.q, min(c.v) AS value
  FROM qs, c, t
  WHERE c.cum >= greatest(1, CAST(ceil(qs.q * t.W) AS BIGINT))
  GROUP BY qs.q)
SELECT q, value FROM sel ORDER BY q
"""


def q141_zorder_layout(sf_dir: str):
    """Z-order (Morton-curve) layout diagnostic — the data-layout
    planning pass behind OPTIMIZE ZORDER in lakehouse table formats
    (public Delta/Iceberg lineage): quantize (o_custkey, o_orderdate)
    to 8 bits each on their own min/max grids (the q127 IEEE bucket
    contract), interleave to a 16-bit Morton key, and report per
    coarse z-bucket (top 8 bits) the row count and DISTINCT customer
    count — the locality measure that predicts file-skipping
    effectiveness if the table were rewritten in z-order. One stats
    aggregate + ONE corpus pass of (bucket, cust) dedup partials (the
    q120 discipline: at most one row per distinct pair per block
    crosses the exchange)."""
    import numpy as np

    B = 256
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    stats = orders.map_batches(
        lambda t: pa.table(
            {
                "ck": t.column("o_custkey"),
                "od": t.column("o_orderdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).aggregate(
        Min("ck", alias_name="ck_lo"),
        Max("ck", alias_name="ck_hi"),
        Min("od", alias_name="od_lo"),
        Max("od", alias_name="od_hi"),
    )
    ck_lo, ck_hi = float(stats["ck_lo"]), float(stats["ck_hi"])
    od_lo, od_hi = float(stats["od_lo"]), float(stats["od_hi"])
    w_ck = (ck_hi - ck_lo) / float(B)
    w_od = (od_hi - od_lo) / float(B)

    def _partials(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        od = (
            t.column("o_orderdate")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        xq = np.minimum(
            np.floor((ck.astype(np.float64) - ck_lo) / w_ck), float(B - 1)
        ).astype(np.int64)
        yq = np.minimum(
            np.floor((od.astype(np.float64) - od_lo) / w_od), float(B - 1)
        ).astype(np.int64)
        z = np.zeros(len(xq), np.int64)
        for i in range(8):
            z |= ((xq >> i) & 1) << (2 * i)
            z |= ((yq >> i) & 1) << (2 * i + 1)
        zb = z >> 8
        pairs = np.unique(np.stack([zb, ck], axis=1), axis=0)
        counts = (
            pa.table({"zbucket": pa.array(zb, pa.int64())})
            .group_by("zbucket")
            .aggregate([("zbucket", "count")])
            .rename_columns(["zbucket", "n_rows"])
        )
        return pa.table(
            {
                "zbucket": pa.concat_arrays(
                    [
                        counts.column("zbucket").combine_chunks(),
                        pa.array(pairs[:, 0], pa.int64()),
                    ]
                ),
                "n_rows": pa.concat_arrays(
                    [
                        counts.column("n_rows").cast(pa.int64()).combine_chunks(),
                        pa.array(np.zeros(len(pairs), np.int64), pa.int64()),
                    ]
                ),
                "cust": pa.concat_arrays(
                    [
                        pa.nulls(counts.num_rows, pa.int64()),
                        pa.array(pairs[:, 1], pa.int64()),
                    ]
                ),
            }
        )

    long = orders.map_batches(_partials, batch_format="pyarrow")

    # distinct custs per bucket: dedup the (bucket, cust) partials
    dist = (
        long.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("cust"))),
            batch_format="pyarrow",
        )
        .groupby(["zbucket", "cust"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_n"))
    )

    def _one(t: pa.Table) -> pa.Table:
        g = (
            t.select(["zbucket"])
            .group_by("zbucket")
            .aggregate([("zbucket", "count")])
        )
        return g.rename_columns(["zbucket", "n_custkeys"])

    n_cust = (
        dist.map_batches(_one, batch_format="pyarrow")
        .groupby("zbucket", num_partitions=2)
        .aggregate(Sum("n_custkeys", alias_name="n_custkeys"))
        .take_all()
    )
    rows = (
        long.groupby("zbucket", num_partitions=2)
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .take_all()
    )
    cmap = {r["zbucket"]: r["n_custkeys"] for r in n_cust}
    rmap = {r["zbucket"]: r["n_rows"] for r in rows if r["n_rows"] > 0}
    zs = sorted(rmap)
    return pa.table(
        {
            "zbucket": pa.array(zs, pa.int64()),
            "n_rows": pa.array([rmap[z] for z in zs], pa.int64()),
            "n_custkeys": pa.array([cmap.get(z, 0) for z in zs], pa.int64()),
        }
    )


def _sql_q141() -> str:
    xbits = " + ".join(
        f"(((xq >> {i}) & 1) << {2 * i}) + (((yq >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
WITH s AS (
  SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
         min(epoch_us(o_orderdate)) AS od_lo,
         max(epoch_us(o_orderdate)) AS od_hi,
         (max(o_custkey) - min(o_custkey)) / CAST(256 AS DOUBLE) AS w_ck,
         (max(epoch_us(o_orderdate)) - min(epoch_us(o_orderdate)))
           / CAST(256 AS DOUBLE) AS w_od
  FROM orders),
q AS (
  SELECT o_custkey AS ck,
         CAST(least(floor((o_custkey - s.ck_lo) / s.w_ck), 255) AS BIGINT)
           AS xq,
         CAST(least(floor((epoch_us(o_orderdate) - s.od_lo) / s.w_od), 255)
              AS BIGINT) AS yq
  FROM orders, s),
z AS (SELECT ck, ({xbits}) >> 8 AS zbucket FROM q)
SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT ck) AS BIGINT) AS n_custkeys
FROM z GROUP BY 1
"""


def q142_group_ksample(sf_dir: str):
    """Uniform fixed-k sample PER GROUP (the eval-set builder's 'give
    me 5 random docs per language, reproducibly'): rank docs within
    each lang by md5(doc_id) — a deterministic total order that is
    uniform over insertion order — and keep rank <= 5. Distinct from
    q46 (fractional per-stratum keep RATE) and q117 (best-K by size).
    ONE lang-keyed exchange, vectorized per-block sort+rank (all of a
    lang's rows co-locate); md5 is the oracle-replayable hash-family
    default (hashing.py splitmix64 is the production fast path)."""
    import hashlib

    import numpy as np

    K = 5
    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def _rank(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        hs = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        )
        order = np.lexsort((ids, hs, langs))
        langs_s, ids_s = langs[order], ids[order]
        new_grp = np.empty(len(order), np.bool_)
        new_grp[0] = True
        new_grp[1:] = langs_s[1:] != langs_s[:-1]
        starts = np.flatnonzero(new_grp)
        rk = np.arange(len(order), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(order)))
        ) + 1
        keep = rk <= K
        return pa.table(
            {
                "doc_id": pa.array(ids_s[keep], pa.int64()),
                "lang": pa.array(langs_s[keep], pa.string()),
                "rk": pa.array(rk[keep], pa.int64()),
            }
        )

    return docs.repartition(hash_partitions(8), keys=["lang"]).map_batches(
        _rank, batch_format="pyarrow", batch_size=None
    )


SQL_Q142 = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT doc_id, lang, rk FROM r WHERE rk <= 5
"""


def q143_adoption_curve(sf_dir: str):
    """Cumulative user-adoption curve: per day, users whose FIRST-ever
    event lands that day, and the running total (the activation time
    series every growth dashboard draws). First-event day per user is
    one keyed aggregation over (user, min-ts) block partials; the day
    histogram is day-bounded, so the cumulative sum folds driver-side
    on a constant-sized table."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _first_partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "ts": t.column("ts").cast(pa.int64()),
                }
            )
            .group_by("user_id")
            .aggregate([("ts", "min")])
        )
        return g.rename_columns(["user_id", "first_ts"])

    firsts = (
        ev.map_batches(_first_partials, batch_format="pyarrow")
        .groupby("user_id", num_partitions=hash_partitions(8))
        .aggregate(Min("first_ts", alias_name="first_ts"))
    )

    def _day_partials(t: pa.Table) -> pa.Table:
        us = t.column("first_ts").to_numpy(zero_copy_only=False)
        day = (us // 86_400_000_000) * 86_400_000_000
        u, c = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "n_new": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        firsts.map_batches(_day_partials, batch_format="pyarrow")
        .groupby("day", num_partitions=2)
        .aggregate(Sum("n_new", alias_name="n_new"))
        .take_all()
    )
    rows.sort(key=lambda r: r["day"])
    n_new = np.array([r["n_new"] for r in rows], np.int64)
    return pa.table(
        {
            "day": pa.array([r["day"] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_new": pa.array(n_new, pa.int64()),
            "cum_users": pa.array(np.cumsum(n_new), pa.int64()),
        }
    )


SQL_Q143 = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
d AS (SELECT date_trunc('day', first_ts) AS day,
             CAST(count(*) AS BIGINT) AS n_new
      FROM f GROUP BY 1)
SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT)
         AS cum_users
FROM d
"""


def q144_event_path_bigrams(sf_dir: str):
    """Event-path mining: counts of consecutive event-type transitions
    (step_a -> step_b) over every user's time-ordered stream — the
    Markov-transition table funnels and next-action models start from.
    ONE user-keyed exchange, then per-block: lexsort, adjacent pairs
    masked at user boundaries, block-local pair counts; the exchange
    above the final aggregation ships at most |event_types|^2 rows per
    block."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        st = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, us))
        us, st = us[order], st[order]
        same = us[1:] == us[:-1]
        a, b = st[:-1][same], st[1:][same]
        g = (
            pa.table(
                {
                    "step_a": pa.array(a.tolist(), pa.string()),
                    "step_b": pa.array(b.tolist(), pa.string()),
                }
            )
            .group_by(["step_a", "step_b"])
            .aggregate([("step_a", "count")])
        )
        return g.rename_columns(["step_a", "step_b", "n"])

    return (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["step_a", "step_b"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_Q144 = """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS step_a, nxt AS step_b, CAST(count(*) AS BIGINT) AS n
FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


def q145_robust_outliers(sf_dir: str):
    """Grouped ROBUST outlier audit — median, MAD, and the 3-MAD
    outlier count per event type: the monitoring report that survives
    heavy tails where mean/stddev z-scores (q86) drown. Built on
    quantiles.grouped_distributed_quantiles, the primitive q68's
    docstring pointed at: ALL groups advance through SHARED counting
    passes, so the whole report costs O(log32 n) corpus passes no
    matter how many groups exist. Median and MAD are exact data values
    (DuckDB quantile_disc rank rule); the outlier test
    |v - med| > 3*mad is single-expression IEEE, so the oracle replays
    it bit-identically."""
    from barks_ocr_ray.functions.quantiles import (
        grouped_distributed_quantiles,
    )

    ev = read_table(sf_dir, "events", ["event_type", "value"])
    # pull_cap bounds the exact-pull at groups x cap values of driver
    # memory (5 types x 100k x 8B = 4 MB) and cuts the shared counting
    # rounds to ~1 at any sf (each round is a full Dataset execution —
    # the measured cost at sf0.1 was round-count, not bytes)
    med_t = grouped_distributed_quantiles(
        ev, "event_type", "value", [0.5], pull_cap=100_000
    )
    groups = med_t.column("grp").to_pylist()
    meds = med_t.column("value").to_pylist()
    med_of = dict(zip(groups, meds))
    key_arr = pa.array(groups, pa.string())
    med_arr = pa.array(meds, pa.float64())

    def _resid(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), key_arr)
        r = pc.abs(pc.subtract(t.column("value"), pc.take(med_arr, idx)))
        return pa.table({"event_type": t.column("event_type"), "r": r})

    res = ev.map_batches(_resid, batch_format="pyarrow")
    mad_t = grouped_distributed_quantiles(
        res, "event_type", "r", [0.5], pull_cap=100_000
    )
    mad_of = dict(
        zip(mad_t.column("grp").to_pylist(), mad_t.column("value").to_pylist())
    )
    thr_arr = pa.array([3.0 * mad_of[g] for g in groups], pa.float64())

    def _count_out(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), key_arr)
        r = pc.abs(pc.subtract(t.column("value"), pc.take(med_arr, idx)))
        out = pc.fill_null(pc.greater(r, pc.take(thr_arr, idx)), False)
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "o": out.cast(pa.int64()),
                }
            )
            .group_by("event_type")
            .aggregate([("o", "sum")])
        )
        return g.rename_columns(["event_type", "n_out"])

    agg = (
        ev.map_batches(_count_out, batch_format="pyarrow")
        .groupby("event_type", num_partitions=2)
        .aggregate(Sum("n_out", alias_name="n_out"))
        .take_all()
    )
    n_of = {r["event_type"]: r["n_out"] for r in agg}
    order = sorted(groups)
    return pa.table(
        {
            "event_type": pa.array(order, pa.string()),
            "med": pa.array([med_of[g] for g in order], pa.float64()),
            "mad": pa.array([mad_of[g] for g in order], pa.float64()),
            "n_outliers": pa.array(
                [int(n_of.get(g, 0)) for g in order], pa.int64()
            ),
        }
    )


SQL_Q145 = """
WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS med
           FROM events GROUP BY 1),
s AS (SELECT e.event_type, quantile_disc(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN m USING (event_type) GROUP BY 1),
j AS (SELECT e.event_type, m.med, s.mad,
             CASE WHEN abs(e.value - m.med) > 3.0 * s.mad
                  THEN 1 ELSE 0 END AS o
      FROM events e JOIN m USING (event_type) JOIN s USING (event_type))
SELECT event_type, med, mad, CAST(sum(o) AS BIGINT) AS n_outliers
FROM j GROUP BY 1, 2, 3
"""


def q146_global_ntile(sf_dir: str):
    """Global percentile bucketing — ntile(100) over (n_chars, doc_id)
    — WITHOUT a global sort: n_chars has bounded cardinality (document
    lengths, a few hundred distinct values), so ONE value-histogram
    aggregation yields exact below-counts per value (the driver holds
    only the cardinality-bounded offset table), and one keyed exchange
    ranks within each value by doc_id; global rank = below[value] +
    within-rank. DuckDB's ntile fill rule (first n%k buckets get one
    extra row) is applied vectorized from (rank, n). Unbounded value
    spaces should quantile-cut to a bounded grid first (q88) — the
    offset table must stay driver-sized."""
    import numpy as np

    K = 100
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _hist(t: pa.Table) -> pa.Table:
        v = t.column("n_chars").to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "n_chars": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        docs.map_batches(_hist, batch_format="pyarrow")
        .groupby("n_chars", num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    hist.sort(key=lambda r: r["n_chars"])
    vals = np.array([r["n_chars"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    n = int(cnts.sum())
    size, big = n // K, n % K
    cutoff = big * (size + 1)

    def _rank(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, nch))
        ids_s, nch_s = ids[order], nch[order]
        new = np.empty(len(order), np.bool_)
        new[0] = True
        new[1:] = nch_s[1:] != nch_s[:-1]
        starts = np.flatnonzero(new)
        within = (
            np.arange(len(order), dtype=np.int64)
            - np.repeat(starts, np.diff(np.append(starts, len(order))))
            + 1
        )
        r = below[np.searchsorted(vals, nch_s)] + within
        if size > 0:
            bucket = (
                np.where(
                    r <= cutoff,
                    (r - 1) // (size + 1),
                    big + (r - cutoff - 1) // size,
                )
                + 1
            )
        else:  # n < K: every row its own bucket
            bucket = r
        return pa.table(
            {
                "doc_id": pa.array(ids_s, pa.int64()),
                "n_chars": pa.array(nch_s, pa.int64()),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    return docs.repartition(hash_partitions(8), keys=["n_chars"]).map_batches(
        _rank, batch_format="pyarrow", batch_size=None
    )


SQL_Q146 = """
SELECT doc_id, n_chars,
       ntile(100) OVER (ORDER BY n_chars, doc_id) AS bucket
FROM documents
"""


def q147_recency_score(sf_dir: str):
    """Recency-weighted engagement: per user, sum of value * 2^-age
    (age = whole days before the corpus' newest event), top 20. Each
    contribution converts to INTEGER micros BEFORE the grouped sum
    (the q137 micro-unit pattern), so the sum is order-independent
    under any partitioning; 2^-d is a power of two, exactly
    representable, so pow(0.5, d) is bit-stable in both engines and
    the only rounding goes through round_like_duckdb."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "value"])
    mx_us = int(
        pa.scalar(ev.max("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    )

    def _micros(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        d = (mx_us - ts) // 86_400_000_000
        micros = round_like_duckdb(v * np.power(0.5, d) * 1e6, 0).astype(
            np.int64
        )
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "micros": pa.array(micros, pa.int64()),
                }
            )
            .group_by("user_id")
            .aggregate([("micros", "sum")])
        )
        return g.rename_columns(["user_id", "score_micros"])

    return (
        ev.map_batches(_micros, batch_format="pyarrow")
        .groupby("user_id", num_partitions=hash_partitions(8))
        .aggregate(Sum("score_micros", alias_name="score_micros"))
        .sort(["score_micros", "user_id"], descending=[True, False])
        .limit(20)
    )


SQL_Q147 = """
WITH mx AS (SELECT max(ts) AS m FROM events),
c AS (SELECT user_id,
             CAST(round(value
                        * pow(0.5, (epoch_us(m) - epoch_us(ts))
                                   // 86400000000)
                        * 1000000) AS BIGINT) AS micros
      FROM events, mx)
SELECT user_id, CAST(sum(micros) AS BIGINT) AS score_micros
FROM c GROUP BY 1
ORDER BY score_micros DESC, user_id LIMIT 20
"""


def q148_ngram_containment(sf_dir: str):
    """Directed 5-gram containment (sub-document duplication): doc A is
    flagged inside doc B when >= 50% of A's distinct 5-grams appear in
    B — the asymmetric near-dup symmetric Jaccard (q21) dilutes away.
    Inverted-index equi-join on the gram with a document-frequency
    window [2, 20] (part of the metric, replayed by the oracle) — no
    quadratic blocking; see dedupe.ngram_containment_pairs."""
    from barks_ocr_ray.functions.dedupe import ngram_containment_pairs

    return ngram_containment_pairs(
        read_table(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.5,
        ngram=5,
        df_cap=20,
    )


def _sql_q148(threshold: float = 0.5, df_cap: int = 20) -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 1) + 1),
           i -> array_to_string(toks[i:i+4], ' ')))) AS gram
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
        FROM documents WHERE text IS NOT NULL) t),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
df AS (SELECT gram FROM g GROUP BY gram
       HAVING count(*) BETWEEN 2 AND {df_cap}),
k AS (SELECT g.doc_id, g.gram FROM g JOIN df USING (gram)),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       round(CAST(p.inter AS DOUBLE) / sz.n_grams, 4) AS containment
FROM p JOIN sz ON sz.doc_id = p.doc_a
WHERE CAST(p.inter AS DOUBLE) / sz.n_grams >= {threshold}
"""


def q149_proportional_sample(sf_dir: str):
    """Largest-remainder (Hamilton) proportional allocation of a fixed
    100-doc budget across languages, then the deterministic md5-rank
    k-sample per language at the allocated k — 'exactly N docs,
    proportional by language, reproducibly' (the eval-set builder's
    counterpart to q46's per-stratum RATE and q142's fixed k). The
    allocation runs on the language histogram (driver-side,
    lang-bounded); the sample is ONE lang-keyed exchange with the q142
    rank kernel. Quota arithmetic (100.0*n/tot, floor, remainder
    ordering) is single-expression IEEE, replayed by the oracle."""
    import hashlib

    import numpy as np

    N = 100
    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])
    hist = (
        docs.groupby("lang", num_partitions=2)
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    hist.sort(key=lambda r: r["lang"])
    langs = [r["lang"] for r in hist]
    ns = np.array([r["n"] for r in hist], np.float64)
    quota = (100.0 * ns) / ns.sum()
    base = np.floor(quota)
    rem = quota - base
    leftover = int(N - base.sum())
    order = np.lexsort((np.array(langs), -rem))
    alloc = base.astype(np.int64)
    if leftover > 0:
        alloc[order[:leftover]] += 1
    alloc_of = {g: int(a) for g, a in zip(langs, alloc)}

    def _rank(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lgs = t.column("lang").to_numpy(zero_copy_only=False)
        hs = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        )
        srt = np.lexsort((ids, hs, lgs))
        lgs_s, ids_s = lgs[srt], ids[srt]
        new = np.empty(len(srt), np.bool_)
        new[0] = True
        new[1:] = lgs_s[1:] != lgs_s[:-1]
        starts = np.flatnonzero(new)
        rk = (
            np.arange(len(srt), dtype=np.int64)
            - np.repeat(starts, np.diff(np.append(starts, len(srt))))
            + 1
        )
        caps = np.array([alloc_of.get(g, 0) for g in lgs_s], np.int64)
        keep = rk <= caps
        return pa.table(
            {
                "doc_id": pa.array(ids_s[keep], pa.int64()),
                "lang": pa.array(lgs_s[keep], pa.string()),
                "alloc": pa.array(caps[keep], pa.int64()),
            }
        )

    return docs.repartition(hash_partitions(8), keys=["lang"]).map_batches(
        _rank, batch_format="pyarrow", batch_size=None
    )


SQL_Q149 = """
WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM s),
b AS (SELECT lang, 100.0 * n / tot AS quota FROM s, t),
l AS (SELECT CAST(100 - sum(floor(quota)) AS BIGINT) AS leftover FROM b),
a AS (SELECT lang,
             CAST(floor(quota) AS BIGINT)
             + CASE WHEN row_number() OVER (
                      ORDER BY quota - floor(quota) DESC, lang) <= leftover
                    THEN 1 ELSE 0 END AS alloc
      FROM b, l),
r AS (SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
SELECT r.doc_id, r.lang, a.alloc
FROM r JOIN a USING (lang) WHERE r.rk <= a.alloc
"""


def q150_grouped_heavy_terms(sf_dir: str):
    """Top-5 terms per language — grouped heavy hitters over the token
    explode (the per-corpus vocabulary screen behind stopword tuning
    and boilerplate review). Block-local (lang, token) Counter partials
    (vocabulary-sized, sum-mergeable) into ONE keyed aggregation, then
    relational.grouped_topk's lang-keyed vectorized rank — no global
    sort; distinct from q71 (global phi-frequent keys) and q08 (global
    word index)."""
    from collections import Counter

    from barks_ocr_ray.functions.relational import grouped_topk

    tok = Tokenizer()
    docs = read_table(sf_dir, "documents", ["lang", "text"])

    def _counts(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        langs = t.column("lang").to_pylist()
        texts = t.column("text").to_pylist()
        for lg, txt in zip(langs, texts):
            if txt is None:
                continue
            for w in tok.tokens(txt):
                c[(lg, w)] += 1
        ks = list(c.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "word": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    wc = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["lang", "word"], num_partitions=hash_partitions(8))
        .aggregate(Sum("n", alias_name="n"))
    )
    return grouped_topk(wc, "lang", "n", 5, tie_col="word", rank_col="rank")


SQL_Q150 = """
WITH wc AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents) t
  GROUP BY 1, 2),
r AS (SELECT lang, word, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, word) AS rank
      FROM wc)
SELECT lang, word, n, rank FROM r WHERE rank <= 5
"""


def q151_funnel_steps(sf_dir: str):
    """Strictly-ORDERED funnel (view -> click -> purchase): a user
    converts to step k only via an event strictly after their step-k-1
    time — the sequencing every 'funnel' dashboard actually means and a
    plain per-step count-distinct gets wrong. ONE user-keyed exchange;
    per block a user's rows are contiguous, so each step is one
    np.minimum.reduceat over segments (step-k candidate rows gate on
    the repeated step-k-1 time) — no per-user Python. Counts leave each
    block as a 3-int partial."""
    import numpy as np

    STEPS = ["view", "click", "purchase"]
    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])

    def _funnel(t: pa.Table) -> pa.Table:
        INF = np.iinfo(np.int64).max
        counts = [0, 0, 0]
        if t.num_rows:
            us = t.column("user_id").to_numpy(zero_copy_only=False)
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = t.column("event_type").to_numpy(zero_copy_only=False)
            order = np.argsort(us, kind="mergesort")
            us, ts, et = us[order], ts[order], et[order]
            new = np.empty(len(us), np.bool_)
            new[0] = True
            new[1:] = us[1:] != us[:-1]
            starts = np.flatnonzero(new)
            lens = np.diff(np.append(starts, len(us)))
            prev = np.full(len(us), -np.iinfo(np.int64).max, np.int64)
            for i, step in enumerate(STEPS):
                cand = np.where((et == step) & (ts > prev), ts, INF)
                t_step = np.minimum.reduceat(cand, starts)
                counts[i] = int((t_step < INF).sum())
                prev = np.repeat(t_step, lens)
        return pa.table(
            {
                "step_idx": pa.array([1, 2, 3], pa.int64()),
                "n_part": pa.array(counts, pa.int64()),
            }
        )

    agg = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_funnel, batch_format="pyarrow", batch_size=None)
        .groupby("step_idx", num_partitions=2)
        .aggregate(Sum("n_part", alias_name="n_users"))
        .take_all()
    )
    n_of = {r["step_idx"]: r["n_users"] for r in agg}
    return pa.table(
        {
            "step_idx": pa.array([1, 2, 3], pa.int64()),
            "step": pa.array(STEPS, pa.string()),
            "n_users": pa.array(
                [int(n_of.get(i, 0)) for i in (1, 2, 3)], pa.int64()
            ),
        }
    )


SQL_Q151 = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
SELECT * FROM (
  SELECT 1 AS step_idx, 'view' AS step,
         (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM c)
  UNION ALL
  SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM p)) t
ORDER BY step_idx
"""


def q152_rollup_quantity(sf_dir: str):
    """ROLLUP aggregation — (returnflag, linestatus) with per-flag
    subtotals and a grand total in one result, NULL marking the
    rolled-up levels (the OLAP report shape). The corpus pays ONE
    finest-grain aggregation (combiner partials); the coarser levels
    re-aggregate the 6-row finest result driver-side. l_quantity is
    integral, so every re-sum is exact (a float re-sum would drift vs
    DuckDB's direct per-level sums)."""
    import numpy as np

    li = read_table(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"]
    )

    def _partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "l_linestatus": t.column("l_linestatus"),
                    "qty": t.column("l_quantity").cast(pa.int64()),
                    "one": pa.array(
                        np.ones(t.num_rows, np.int64), pa.int64()
                    ),
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("one", "sum")])
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
        )

    finest = (
        li.map_batches(_partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=2)
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .take_all()
    )
    rows = [
        (r["l_returnflag"], r["l_linestatus"], int(r["sum_qty"]), int(r["n_rows"]))
        for r in finest
    ]
    by_flag: dict = {}
    for f, _s, q, n in rows:
        acc = by_flag.setdefault(f, [0, 0])
        acc[0] += q
        acc[1] += n
    rows += [(f, None, q, n) for f, (q, n) in by_flag.items()]
    rows.append(
        (
            None,
            None,
            sum(q for _f, (q, _n) in by_flag.items()),
            sum(n for _f, (_q, n) in by_flag.items()),
        )
    )
    rows.sort(
        key=lambda r: ((r[0] is None, r[0] or ""), (r[1] is None, r[1] or ""))
    )
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
            "sum_qty": pa.array([int(r[2]) for r in rows], pa.int64()),
            "n_rows": pa.array([int(r[3]) for r in rows], pa.int64()),
        }
    )


SQL_Q152 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q153_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each doc draws priority ln(u)/w from a deterministic
    md5-uniform u and weight w = n_chars; the top-50 priorities ARE the
    weighted sample — fully distributed (block-local top-50 partials,
    one bounded merge), no corpus sort, and replayable because u is an
    exact dyadic rational and ln() round-6 parity is pinned (q134
    precedent). md5 is the oracle-replayable hash-family default
    (hashing.py splitmix64 is the production fast path)."""
    import hashlib

    import numpy as np

    K = 50
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _block_topk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        h = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                for i in ids
            ],
            np.float64,
        )
        u = (h + 0.5) / 4294967296.0
        pri = round_like_duckdb(np.log(u) / w, 6)
        order = np.lexsort((ids, -pri))[:K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(
                    t.column("n_chars").to_numpy(zero_copy_only=False)[
                        order
                    ],
                    pa.int64(),
                ),
                "priority": pa.array(pri[order], pa.float64()),
            }
        )

    parts = docs.map_batches(
        _block_topk, batch_format="pyarrow"
    ).take_all()  # blocks x K rows — bounded, never corpus-scale
    ids = np.array([r["doc_id"] for r in parts], np.int64)
    nch = np.array([r["n_chars"] for r in parts], np.int64)
    pri = np.array([r["priority"] for r in parts], np.float64)
    order = np.lexsort((ids, -pri))[:K]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(nch[order], pa.int64()),
            "priority": pa.array(pri[order], pa.float64()),
        }
    )


SQL_Q153 = """
WITH p AS (
  SELECT doc_id, n_chars,
         round(ln((CAST(concat('0x',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) + 0.5) / 4294967296.0)
               / n_chars, 6) AS priority
  FROM documents)
SELECT doc_id, n_chars, priority FROM p
ORDER BY priority DESC, doc_id LIMIT 50
"""


def q154_grouped_correlation(sf_dir: str):
    """Exact Pearson correlation per event type between value and
    hour-of-day — distributed moments done RIGHT: value quantizes to
    integer cents (part of the metric), so the five sufficient
    statistics (sums, squares, cross) are exact int64 block partials
    whose keyed sum is order-independent; the final correlation is one
    shared IEEE expression over the exact integers, replayed
    bit-identically by the oracle (a float running sum, or DuckDB's
    own corr(), would diverge by accumulation order)."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def _moments(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        x = round_like_duckdb(v * 100.0, 0).astype(np.int64)
        y = (ts // 3_600_000_000) % 24
        order = np.argsort(et, kind="mergesort")
        et, x, y = et[order], x[order], y[order]
        new = np.empty(len(et), np.bool_)
        if len(et):
            new[0] = True
            new[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "event_type": pa.array(
                    [str(g) for g in et[starts]], pa.string()
                ),
                "n": pa.array(
                    np.diff(np.append(starts, len(et))).astype(np.int64),
                    pa.int64(),
                ),
                "sx": pa.array(np.add.reduceat(x, starts), pa.int64()),
                "sy": pa.array(np.add.reduceat(y, starts), pa.int64()),
                "sxy": pa.array(np.add.reduceat(x * y, starts), pa.int64()),
                "sxx": pa.array(np.add.reduceat(x * x, starts), pa.int64()),
                "syy": pa.array(np.add.reduceat(y * y, starts), pa.int64()),
            }
        )

    agg = (
        ev.map_batches(_moments, batch_format="pyarrow")
        .groupby("event_type", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
        .take_all()
    )
    agg.sort(key=lambda r: r["event_type"])
    out_g, out_n, out_c = [], [], []
    for r in agg:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            continue
        corr = float(n * sxy - sx * sy) / (
            np.sqrt(float(vx)) * np.sqrt(float(vy))
        )
        out_g.append(r["event_type"])
        out_n.append(n)
        out_c.append(corr)
    return pa.table(
        {
            "event_type": pa.array(out_g, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "corr": pa.array(
                round_like_duckdb(np.asarray(out_c, np.float64), 6),
                pa.float64(),
            ),
        }
    )


SQL_Q154 = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sx,
         sum(hour(ts)) AS sy,
         sum(CAST(round(value * 100.0) AS BIGINT) * hour(ts)) AS sxy,
         sum(CAST(round(value * 100.0) AS BIGINT)
             * CAST(round(value * 100.0) AS BIGINT)) AS sxx,
         sum(hour(ts) * hour(ts)) AS syy
  FROM events GROUP BY 1)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
FROM m
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY event_type
"""


def q155_daily_trailing_average(sf_dir: str):
    """Gap-filled daily event series with a trailing 7-day average —
    the dense date spine a forecasting/monitoring feature needs (a
    plain GROUP BY day silently drops zero-traffic days, corrupting
    every window that follows). ONE day-keyed aggregation (day-bounded
    result); the spine fill and rolling window fold driver-side on the
    bounded table. Counts are integers, so the window sum is exact and
    the average is a single division — no accumulation-order hazard."""
    import numpy as np

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", ["ts"])

    def _day_partials(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique((ts // DAY) * DAY, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(_day_partials, batch_format="pyarrow")
        .groupby("day", num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    have = {r["day"]: r["n"] for r in rows}
    days = np.arange(min(have), max(have) + DAY, DAY, dtype=np.int64)
    n = np.array([have.get(int(d), 0) for d in days], np.int64)
    csum = np.concatenate(([0], np.cumsum(n)))
    win = np.minimum(np.arange(len(n)) + 1, 7)
    wsum = csum[1:] - csum[np.maximum(np.arange(len(n)) - 6, 0)]
    avg7 = round_like_duckdb(wsum.astype(np.float64) / win, 4)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()).cast(pa.timestamp("us")),
            "n": pa.array(n, pa.int64()),
            "avg7": pa.array(avg7, pa.float64()),
        }
    )


SQL_Q155 = """
WITH d AS (SELECT date_trunc('day', ts) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
s AS (SELECT unnest(generate_series((SELECT min(day) FROM d),
                                    (SELECT max(day) FROM d),
                                    INTERVAL '1 day')) AS day),
f AS (SELECT s.day, coalesce(d.n, 0) AS n FROM s LEFT JOIN d USING (day))
SELECT day, n,
       round(avg(CAST(n AS DOUBLE)) OVER (
         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7
FROM f
"""


def q156_gap_quantiles(sf_dir: str):
    """Inter-event gap distribution (seconds between a user's
    consecutive events) — exact p25/p50/p90 WITHOUT a global sort: ONE
    user-keyed exchange derives the gaps vectorized (lexsort, adjacent
    diff masked at user boundaries), then the counting quickselect
    (distributed_quantiles) resolves the quantiles over the derived
    stream. Composes the two primitives end-to-end: keyed window
    derivation feeding rank selection."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id"])

    def _gaps(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, us))
        us, ts = us[order], ts[order]
        same = us[1:] == us[:-1]
        gaps = (ts[1:] - ts[:-1])[same].astype(np.float64) / 1e6
        return pa.table({"gap_s": pa.array(gaps, pa.float64())})

    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    gaps = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_gaps, batch_format="pyarrow", batch_size=None)
        .materialize()  # the quickselect reads it once per counting pass
    )
    t = distributed_quantiles(gaps, "gap_s", [0.25, 0.5, 0.9], pull_cap=2000)
    return pa.table(
        {
            "q": t.column("q"),
            "gap_s": pa.array(
                round_like_duckdb(
                    t.column("value").to_numpy(zero_copy_only=False), 6
                ),
                pa.float64(),
            ),
        }
    )


SQL_Q156 = """
WITH g AS (
  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0
         AS gap_s
  FROM events),
v AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL)
SELECT q, gap_s FROM (
  SELECT CAST(0.25 AS DOUBLE) AS q,
         round(quantile_disc(gap_s, 0.25), 6) AS gap_s FROM v
  UNION ALL
  SELECT CAST(0.5 AS DOUBLE), round(quantile_disc(gap_s, 0.5), 6) FROM v
  UNION ALL
  SELECT CAST(0.9 AS DOUBLE), round(quantile_disc(gap_s, 0.9), 6) FROM v) t
ORDER BY q
"""


def q157_rfm_segments(sf_dir: str):
    """RFM customer segmentation — recency / frequency / monetary
    quartile scores and the composed 3-digit segment code, the
    classic marketing-analytics operator. Everything stays INTEGER
    (days, counts, cents), so there is no float hazard anywhere: one
    customer-keyed aggregation builds the metrics, the counting
    quickselect finds the three quartile thresholds per metric over
    the AGGREGATED (customer-level) dataset — materialized once, it
    feeds three quantile runs and the scoring pass — and scores are
    strict-greater threshold counts replayed exactly by the oracle."""
    import numpy as np

    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    DAY = 86_400_000_000
    orders = read_table(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def _derive(t: pa.Table) -> pa.Table:
        cents = round_like_duckdb(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "date_us": t.column("o_orderdate").cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    per_cust = (
        orders.map_batches(_derive, batch_format="pyarrow")
        .groupby("o_custkey", num_partitions=hash_partitions(8))
        .aggregate(
            Max("date_us", alias_name="mymax"),
            Sum("one", alias_name="freq"),
            Sum("cents", alias_name="mon"),
        )
        .materialize()  # read by 4 consumers: gmax, 3 quantile runs, scoring
    )
    gmax = int(per_cust.max("mymax"))

    def _metrics(t: pa.Table) -> pa.Table:
        rec = (
            gmax - t.column("mymax").to_numpy(zero_copy_only=False)
        ) // DAY
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "rec": pa.array(rec.astype(np.int64), pa.int64()),
                "freq": t.column("freq"),
                "mon": t.column("mon"),
            }
        )

    metrics = per_cust.map_batches(
        _metrics, batch_format="pyarrow"
    ).materialize()
    thr = {
        col: distributed_quantiles(
            metrics, col, [0.25, 0.5, 0.75], pull_cap=2000
        )
        .column("value")
        .to_pylist()
        for col in ("rec", "freq", "mon")
    }

    def _score(t: pa.Table) -> pa.Table:
        out = {"o_custkey": t.column("o_custkey")}
        scores = {}
        for col in ("rec", "freq", "mon"):
            v = t.column(col).to_numpy(zero_copy_only=False)
            s = np.ones(len(v), np.int64)
            for tv in thr[col]:
                s += (v > tv).astype(np.int64)
            scores[col] = s
        out["r_score"] = pa.array(scores["rec"], pa.int64())
        out["f_score"] = pa.array(scores["freq"], pa.int64())
        out["m_score"] = pa.array(scores["mon"], pa.int64())
        out["rfm"] = pa.array(
            scores["rec"] * 100 + scores["freq"] * 10 + scores["mon"],
            pa.int64(),
        )
        return pa.table(out)

    return metrics.map_batches(_score, batch_format="pyarrow")


SQL_Q157 = """
WITH a AS (SELECT o_custkey,
                  epoch_us(max(o_orderdate)) AS mymax,
                  CAST(count(*) AS BIGINT) AS freq,
                  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                       AS BIGINT) AS mon
           FROM orders GROUP BY 1),
b AS (SELECT o_custkey,
             ((SELECT max(mymax) FROM a) - mymax) // 86400000000 AS rec,
             freq, mon
      FROM a),
t AS (SELECT quantile_disc(rec, 0.25) AS r1, quantile_disc(rec, 0.5) AS r2,
             quantile_disc(rec, 0.75) AS r3,
             quantile_disc(freq, 0.25) AS f1, quantile_disc(freq, 0.5) AS f2,
             quantile_disc(freq, 0.75) AS f3,
             quantile_disc(mon, 0.25) AS m1, quantile_disc(mon, 0.5) AS m2,
             quantile_disc(mon, 0.75) AS m3
      FROM b),
s AS (SELECT o_custkey,
             1 + CAST(rec > r1 AS BIGINT) + CAST(rec > r2 AS BIGINT)
               + CAST(rec > r3 AS BIGINT) AS r_score,
             1 + CAST(freq > f1 AS BIGINT) + CAST(freq > f2 AS BIGINT)
               + CAST(freq > f3 AS BIGINT) AS f_score,
             1 + CAST(mon > m1 AS BIGINT) + CAST(mon > m2 AS BIGINT)
               + CAST(mon > m3 AS BIGINT) AS m_score
      FROM b, t)
SELECT o_custkey, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM s
"""


def q158_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster size histogram — how many exact-duplicate
    clusters exist at each size (the dedup-rate report that tells you
    whether duplication is a few mega-clusters or a long tail, which
    picks the dedup strategy). One content-hash-keyed aggregation
    (the exact-dedup exchange), then a size histogram whose partials
    are cluster-size-bounded. md5 is the oracle-replayable hash; null
    text forms no cluster, matching the SQL."""
    import numpy as np

    from barks_ocr_ray.functions.dedupe import md5_hex

    docs = read_table(sf_dir, "documents", ["text"])

    def _hash_partials(t: pa.Table) -> pa.Table:
        txts = t.column("text").to_pylist()
        hs = [md5_hex(x) for x in txts if x is not None]
        u, c = np.unique(np.array(hs, dtype=object), return_counts=True)
        return pa.table(
            {
                "h": pa.array(u.tolist(), pa.string()),
                "sz": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    clusters = (
        docs.map_batches(_hash_partials, batch_format="pyarrow")
        .groupby("h", num_partitions=hash_partitions(8))
        .aggregate(Sum("sz", alias_name="sz"))
    )

    def _size_partials(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t.column("sz").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "sz": pa.array(u, pa.int64()),
                "n_clusters": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return (
        clusters.map_batches(_size_partials, batch_format="pyarrow")
        .groupby("sz", num_partitions=2)
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )


SQL_Q158 = """
WITH c AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
           FROM documents WHERE text IS NOT NULL GROUP BY 1)
SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
FROM c GROUP BY 1
"""


def q159_compression_ratio(sf_dir: str):
    """Compression-ratio quality gate (Dolma/RedPajama-style): per
    source, how many documents fall in the repetitive (<25% of raw
    size) and random-like (>90%) zlib gates, plus the exact integer
    sum of ratio basis points. zlib runs at C speed inside the block
    pass — it IS the signal's compute — and the single exchange
    carries source-keyed int64 partials. Oracle: single-process golden
    (zlib is not SQL-replayable), golden_dedup.golden_compression_stats."""
    from barks_ocr_ray.functions.cleaning import compression_ratio_stats

    return compression_ratio_stats(
        read_table(sf_dir, "documents", ["source", "text"])
    )


def q160_char_entropy(sf_dir: str):
    """Per-document character-entropy quality signal, aggregated per
    source: shannon entropy over codepoint frequencies, each
    (doc, char) term rounded to int64 MICRO-nats before the per-doc
    sum (q137 fixed-point discipline — integer sums are
    order-independent, so the distributed result replays bit-exactly
    in DuckDB). Everything up to the final source-keyed Sum is
    block-local: a document's chars live in its own row, so per-doc
    entropy needs NO exchange — one utf-32 decode per batch, one
    np.unique over (doc_idx, codepoint) keys, one reduceat."""
    import numpy as np

    LOW_MICRO = 1_500_000  # < 1.5 nats => near-constant text

    docs = read_table(sf_dir, "documents", ["source", "text"])

    def _partials(t: pa.Table) -> pa.Table:
        txts = t.column("text").to_pylist()
        srcs = t.column("source").to_pylist()
        keep_src, lens, parts = [], [], []
        for s, x in zip(srcs, txts):
            if x:
                keep_src.append(s)
                lens.append(len(x))
                parts.append(x)
        if not parts:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_low_entropy": pa.array([], pa.int64()),
                    "sum_entropy_micro": pa.array([], pa.int64()),
                }
            )
        codes = np.frombuffer(
            "".join(parts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        lens_arr = np.array(lens, np.int64)
        doc_idx = np.repeat(np.arange(len(parts), dtype=np.int64), lens_arr)
        # one key per (doc, codepoint); codepoints < 2^21
        keys, counts = np.unique(doc_idx * (1 << 21) + codes, return_counts=True)
        term_doc = keys >> 21
        n = lens_arr[term_doc].astype(np.float64)
        p = counts.astype(np.float64) / n
        micro = round_like_duckdb(-p * np.log(p) * 1e6, 0).astype(np.int64)
        # per-doc integer sum: term_doc is sorted (np.unique), reduceat
        starts = np.flatnonzero(
            np.r_[True, term_doc[1:] != term_doc[:-1]]
        )
        doc_micro = np.add.reduceat(micro, starts)
        doc_of = term_doc[starts]
        src_arr = np.array(keep_src, dtype=object)[doc_of]
        u_src = np.unique(src_arr)
        rows = []
        for s in u_src:
            m = src_arr == s
            dm = doc_micro[m]
            rows.append(
                (s, int(m.sum()), int((dm < LOW_MICRO).sum()), int(dm.sum()))
            )
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "n_docs": pa.array([r[1] for r in rows], pa.int64()),
                "n_low_entropy": pa.array([r[2] for r in rows], pa.int64()),
                "sum_entropy_micro": pa.array(
                    [r[3] for r in rows], pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(_partials, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_low_entropy", alias_name="n_low_entropy"),
            Sum("sum_entropy_micro", alias_name="sum_entropy_micro"),
        )
    )


SQL_Q160 = """
WITH d AS (
  SELECT doc_id, source, text, CAST(length(text) AS DOUBLE) AS n
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
cnt AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM d)
  GROUP BY 1, 2),
terms AS (
  SELECT cnt.doc_id,
         CAST(round(-(c / d.n) * ln(c / d.n) * 1000000, 0) AS BIGINT)
           AS micro
  FROM cnt JOIN d USING (doc_id)),
docs AS (
  SELECT doc_id, CAST(sum(micro) AS BIGINT) AS doc_micro
  FROM terms GROUP BY 1)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_micro < 1500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_entropy,
       CAST(sum(doc_micro) AS BIGINT) AS sum_entropy_micro
FROM docs JOIN d USING (doc_id)
GROUP BY 1
"""


def q161_link_graph(sf_dir: str):
    """Outlink graph over the synthesized pages corpus: per link target,
    total reference count + exact distinct source pages, top-20. The
    href parse/resolve is block-local (a page's links live in its own
    row); exchanges are the (target, src) distinct and the target
    rollup, both edge-bounded. Oracle: single-process golden replay
    (oracle_data.ensure_link_graph_golden) — fixed-size corpus, valid at
    any sf_dir."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.functions.links import link_graph_topk
    from barks_ocr_ray.oracle_data import Q24_N

    configure()
    pages = rd.from_arrow(pages_table(Q24_N)).select_columns(["url", "html"])
    return link_graph_topk(pages, k=20)


def _sql_q161() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, link_graph_golden_path

    return (
        "SELECT target, n_refs, n_src_pages FROM "
        f"read_parquet('{link_graph_golden_path(Q24_N)}')"
    )


def q162_anchor_terms(sf_dir: str):
    """Anchor-text inverted index over the pages corpus: token ->
    (n_links, n_distinct_targets), top-30 — the web-search sibling of
    the q08 body-text index. Same two-level keyed aggregation as q161,
    keyed by (term, target)."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.functions.links import anchor_term_index
    from barks_ocr_ray.oracle_data import Q24_N

    configure()
    pages = rd.from_arrow(pages_table(Q24_N)).select_columns(["url", "html"])
    return anchor_term_index(pages, k=30)


def _sql_q162() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, anchor_terms_golden_path

    return (
        "SELECT term, n_links, n_targets FROM "
        f"read_parquet('{anchor_terms_golden_path(Q24_N)}')"
    )


def q163_hits_authorities(sf_dir: str):
    """HITS hubs & authorities over the pages outlink graph — the
    web-graph ranking sibling of q94 PageRank (damped mass) and q161
    (raw in-reference counts). Exact fixed-point recurrence (integer
    gather-sums + scalar L1 renorm, graph.py HITS_SCALE rationale), so
    the distributed result is bit-exact vs the sequential golden under
    any partitioning; top-25 by authority. Reference iterative-loop
    ancestor: /root/reference/src/barks_ocr/tools/ocr_check.py:521-538."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.functions.graph import hits
    from barks_ocr_ray.functions.links import outlink_edges
    from barks_ocr_ray.oracle_data import Q24_N

    configure()
    pages = rd.from_arrow(pages_table(Q24_N)).select_columns(["url", "html"])

    def _as_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"), "dst": t.column("target")})

    pairs = outlink_edges(pages).map_batches(_as_pairs, batch_format="pyarrow")
    return (
        hits(pairs, iterations=5)
        .sort(["auth", "node"], descending=[True, False])
        .limit(25)
    )


def _sql_q163() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, hits_golden_path

    return (
        "SELECT node, hub, auth FROM "
        f"read_parquet('{hits_golden_path(Q24_N)}')"
    )


def q164_canonical_dedup(sf_dir: str):
    """Canonical-URL dedup over the alias-decorated crawl: every
    physical fetch's url re-spelled by a deterministic alias class
    (case/fragment/tracking-param/port/www — datagen.url_variant),
    collapsed by links.canonical_url, keeping the latest fetch per
    canonical form. The crawl-side sibling of the extraction arc's
    content-keyed winner pick (same url, newer warc_ts — compare
    pipelines/extraction.py _keep_winner_per_url). Exchange carries one
    row per distinct SPELLING, not per fetch (per-block pre-count).
    Oracle: single-process golden replay sharing both kernels."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.datagen import pages_table, url_variant
    from barks_ocr_ray.functions.links import canonical_url_dedup
    from barks_ocr_ray.oracle_data import Q24_N

    configure()
    tbl = pages_table(Q24_N).select(["url", "warc_ts"])
    raw = pa.table(
        {
            "url": pa.array(
                [
                    url_variant(u, i)
                    for i, u in enumerate(tbl.column("url").to_pylist())
                ],
                pa.string(),
            ),
            "warc_ts": tbl.column("warc_ts"),
        }
    )
    return canonical_url_dedup(rd.from_arrow(raw)).sort("canonical_url")


def _sql_q164() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, canonical_dedup_golden_path

    return (
        "SELECT canonical_url, kept_url, n_fetches, n_raw_urls FROM "
        f"read_parquet('{canonical_dedup_golden_path(Q24_N)}')"
    )


#: fixed phrase-query workload for q165 — includes a repeated-word
#: bigram ("the the") because overlapping occurrences are exactly what
#: distinguishes positional semantics from substring replace-counting
Q165_PHRASES = ["big order scan", "row column sort", "slow hash batch", "the the"]




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
