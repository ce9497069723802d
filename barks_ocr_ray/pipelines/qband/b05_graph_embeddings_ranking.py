from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b04_curation_splits_sketches import *  # noqa: F401,F403

def _sql_q193() -> str:
    return f"""
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour_id,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
bounds AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM h),
spine AS (SELECT unnest(generate_series(bounds.lo, bounds.hi)) AS hour_id
          FROM bounds),
d AS (SELECT spine.hour_id, coalesce(h.n, 0) AS x
      FROM spine LEFT JOIN h USING (hour_id)),
l AS (SELECT x, lag(x, {Q193_LAG}) OVER (ORDER BY hour_id) AS y FROM d),
s AS (SELECT CAST(count(*) AS BIGINT) AS np, sum(x) AS sa, sum(y) AS sb,
             sum(x * y) AS sab, sum(x * x) AS saa, sum(y * y) AS sbb
      FROM l WHERE y IS NOT NULL),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_hours FROM d)
SELECT n.n_hours, s.np AS n_pairs,
       CAST(round(1e6 * (s.np * s.sab - s.sa * s.sb)
            / sqrt((s.np * s.saa - s.sa * s.sa)
                   * (s.np * s.sbb - s.sb * s.sb)), 0) AS BIGINT)
         AS autocorr_micro
FROM s CROSS JOIN n
"""


def q194_quality_dedup(sf_dir: str):
    """Quality-winner near-dup resolution: inside each q35 duplicate
    cluster keep the member the q64 classifier scores HIGHEST (ties ->
    smallest doc_id), and report the quality gain over the naive
    min-id policy — the 'keep the best copy, not the first copy'
    dedup every pretraining corpus wants once it has a quality model.
    Composition: q19 pair machinery -> q35 min-label components ->
    streamed q64 scoring -> one cluster-keyed grouped-argmax
    (grouped_topk, no global sort) + one cluster-bounded join for
    sizes/min-id scores. Golden-backed oracle: cluster membership
    replays from the q35 golden; scoring and argmax replay in SQL."""
    from barks_ocr_ray.functions.dedupe import dup_clusters, minhash_near_dups
    from barks_ocr_ray.functions.inference import quality_model_score
    from barks_ocr_ray.functions.relational import compact_nonempty

    np_ = hash_partitions(4)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"]).materialize()
    clusters = dup_clusters(
        minhash_near_dups(docs, threshold=0.4)
    ).materialize()
    empty = pa.table(
        {
            "cluster": pa.array([], pa.int64()),
            "kept_doc": pa.array([], pa.int64()),
            "kept_score": pa.array([], pa.float64()),
            "n_members": pa.array([], pa.int64()),
            "score_gain_bp": pa.array([], pa.int64()),
        }
    )
    cl_c, n_cl = compact_nonempty(clusters, np_)
    if n_cl == 0:
        return empty
    scores = quality_model_score(docs).map_batches(
        lambda t: t.select(["doc_id", "quality_score"]),
        batch_format="pyarrow",
    )
    sc_c, _ = compact_nonempty(scores, np_)
    joined = cl_c.join(
        sc_c, join_type="inner", num_partitions=np_, on=("doc_id",)
    )

    def _resolve(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return empty
        c = t.column("cluster").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("quality_score").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s, c))
        c, d, s = c[order], d[order], s[order]
        seg = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sizes = np.diff(np.r_[seg, len(c)])
        kept_doc, kept_score = d[seg], s[seg]
        # min-id policy score: within each cluster the row with the
        # smallest doc_id
        co, do_, so = (
            t.column("cluster").to_numpy(zero_copy_only=False),
            t.column("doc_id").to_numpy(zero_copy_only=False),
            t.column("quality_score").to_numpy(zero_copy_only=False),
        )
        o2 = np.lexsort((do_, co))
        co, do_, so = co[o2], do_[o2], so[o2]
        seg2 = np.flatnonzero(np.r_[True, co[1:] != co[:-1]])
        minid_score = so[seg2]  # clusters sorted ascending both times
        gain = round_like_duckdb(
            (kept_score - minid_score) * 10000.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(c[seg], pa.int64()),
                "kept_doc": pa.array(kept_doc, pa.int64()),
                "kept_score": pa.array(kept_score, pa.float64()),
                "n_members": pa.array(sizes, pa.int64()),
                "score_gain_bp": pa.array(gain, pa.int64()),
            }
        )

    return (
        joined.repartition(np_, keys=["cluster"])
        .map_batches(_resolve, batch_format="pyarrow", batch_size=None)
        .sort("cluster")
    )


def _sql_q194() -> str:
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    return f"""
WITH cl AS (SELECT doc_id, cluster
            FROM read_parquet('{neardup_golden_path("dup_clusters")}')
            WHERE corpus_tag = {corpus_tag_sql("documents")}),
sc AS (SELECT doc_id, quality_score FROM ({_sql_q64()})),
j AS (SELECT cl.cluster, cl.doc_id, sc.quality_score
      FROM cl JOIN sc USING (doc_id)),
w AS (SELECT cluster, doc_id, quality_score,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY quality_score DESC, doc_id) AS rk,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY doc_id) AS rk_minid
      FROM j),
best AS (SELECT cluster, doc_id AS kept_doc, quality_score AS kept_score
         FROM w WHERE rk = 1),
naive AS (SELECT cluster, quality_score AS minid_score
          FROM w WHERE rk_minid = 1),
n AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
      FROM cl GROUP BY 1)
SELECT best.cluster, best.kept_doc, best.kept_score, n.n_members,
       CAST(round((best.kept_score - naive.minid_score) * 10000, 0)
            AS BIGINT) AS score_gain_bp
FROM best JOIN naive USING (cluster) JOIN n USING (cluster)
ORDER BY cluster
"""


#: q195 rerank model (frozen linear cross-scorer — the replayable
#: stand-in for a cross-encoder; q64's deterministic-weights pattern)
Q195_W_COS = 2.0
Q195_W_BM25 = 0.1
Q195_W_LEN = -0.0005
Q195_OUT_K = 10


def q195_rerank(sf_dir: str):
    """Retrieval rerank stage — retrieve (q16 vector leg + q55 BM25
    leg, both distributed, top-50 pools) then re-score every candidate
    with a cross-features model (cosine, bm25, doc length; frozen
    linear weights so the oracle replays bit-exact — a real
    cross-encoder swaps into the same scoring stage with the q64
    actor-pool pattern) and emit the top-10. Completes the
    retrieve -> fuse (q176) -> rerank stack. Candidate features close
    on the (2 x pool)-bounded driver set; the doc-length fetch is one
    broadcast is_in filter, never a corpus join."""
    from barks_ocr_ray.functions.ann import brute_force_topk
    from barks_ocr_ray.functions.relational import broadcast_semi_join

    vec_rows = brute_force_topk(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        [Q176_QUERY_VEC],
        k=Q176_POOL_K,
    ).take_all()
    cos_of = {int(r["neighbor_id"]): float(r["cosine"]) for r in vec_rows}

    bm = q55_bm25_rank(sf_dir)

    def _block_top(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t,
            sort_keys=[("bm25", "descending"), ("doc_id", "ascending")],
        )
        return t.take(order[: min(Q176_POOL_K, t.num_rows)])

    lex_pool = bm.map_batches(_block_top, batch_format="pyarrow").take_all()
    lex_pool.sort(key=lambda r: (-r["bm25"], r["doc_id"]))
    bm_of = {
        int(r["doc_id"]): float(r["bm25"])
        for r in lex_pool[:Q176_POOL_K]
    }

    cand = sorted(set(cos_of) | set(bm_of))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    lens_rows = (
        broadcast_semi_join(docs, set(cand), "doc_id")
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_tokens": pc.count_substring_regex(
                        pc.utf8_lower(
                            t.column("text").combine_chunks().fill_null("")
                        ),
                        r"[a-z0-9]+",
                    ).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    len_of = {int(r["doc_id"]): int(r["n_tokens"]) for r in lens_rows}

    scored = []
    for did in cand:
        s = (
            Q195_W_COS * cos_of.get(did, 0.0)
            + Q195_W_BM25 * bm_of.get(did, 0.0)
            + Q195_W_LEN * float(len_of.get(did, 0))
        )
        scored.append((did, float(round_like_duckdb(s, 6))))
    scored.sort(key=lambda r: (-r[1], r[0]))
    scored = scored[:Q195_OUT_K]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in scored], pa.int64()),
            "rerank_score": pa.array(
                [r[1] for r in scored], pa.float64()
            ),
            "final_rank": pa.array(
                list(range(1, len(scored) + 1)), pa.int64()
            ),
        }
    )


def _sql_q195() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH lex AS (
  SELECT doc_id, bm25,
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
  SELECT doc_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
  FROM vc QUALIFY r <= {Q176_POOL_K}),
cand AS (
  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         coalesce(vec.cosine, 0) AS cosine,
         coalesce(lex.bm25, 0) AS bm25
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
feat AS (
  SELECT cand.doc_id, cosine, bm25,
         CAST(len(regexp_extract_all(lower(coalesce(d.text, '')),
                                     '{TOKEN_RE}')) AS DOUBLE) AS n_tokens
  FROM cand JOIN documents d ON d.doc_id = cand.doc_id)
SELECT doc_id,
       round({Q195_W_COS} * cosine + {Q195_W_BM25} * bm25
             + {Q195_W_LEN} * n_tokens, 6) AS rerank_score,
       CAST(row_number() OVER (
         ORDER BY round({Q195_W_COS} * cosine + {Q195_W_BM25} * bm25
                        + {Q195_W_LEN} * n_tokens, 6) DESC, doc_id)
         AS BIGINT) AS final_rank
FROM feat QUALIFY final_rank <= {Q195_OUT_K} ORDER BY final_rank
"""


#: q196 keeps docs at or above this within-source quality percentile
Q196_PCT_MICRO = 700_000


def q196_quality_percentile_gate(sf_dir: str):
    """Per-source quality quota: keep each source's top-30% documents
    by classifier score (within-source percent-rank gate — an absolute
    score threshold over-prunes clean sources and under-prunes spam
    farms; the percentile gate equalizes selectivity). One streamed
    q64 scoring pass (basis-point integer scores), one source-keyed
    exchange, per-block exact percent_rank over each colocated source
    (ties by doc_id — the SQL window's row rule), sources-bounded
    rollup. Partitioning assumption: one source's docs fit a block
    (q65/q117's documented per-source grouping bound)."""
    import numpy as np

    from barks_ocr_ray.functions.inference import QualityModel

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    qm = QualityModel()

    def _score(t: pa.Table) -> pa.Table:
        s = qm(t)
        bp = round_like_duckdb(
            s.column("quality_score").to_numpy(zero_copy_only=False)
            * 10000.0,
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "bp": pa.array(bp, pa.int64()),
            }
        )

    def _gate(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "kept_score_bp": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        src = np.asarray(t.column("source").to_pylist())
        bp = t.column("bp").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bp, src))
        src, bp = src[order], bp[order]
        seg = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        out_s, out_n, out_k, out_b = [], [], [], []
        for i, s0 in enumerate(seg):
            e = seg[i + 1] if i + 1 < len(seg) else len(src)
            n = e - s0
            if n == 1:
                pct = np.array([0.0])
            else:
                pct = round_like_duckdb(
                    1e6 * (np.arange(n, dtype=np.float64) / (n - 1)), 0
                )
            keep = pct >= Q196_PCT_MICRO
            out_s.append(str(src[s0]))
            out_n.append(n)
            out_k.append(int(keep.sum()))
            out_b.append(int(bp[s0:e][keep].sum()))
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "n_kept": pa.array(out_k, pa.int64()),
                "kept_score_bp": pa.array(out_b, pa.int64()),
            }
        )

    return (
        docs.map_batches(_score, batch_format="pyarrow")
        .repartition(hash_partitions(4), keys=["source"])
        .map_batches(_gate, batch_format="pyarrow", batch_size=None)
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_score_bp", alias_name="kept_score_bp"),
        )
        .sort("source")
    )


def _sql_q196() -> str:
    return f"""
WITH sc AS (SELECT doc_id, quality_score FROM ({_sql_q64()})),
j AS (SELECT d.source, sc.doc_id,
             CAST(round(quality_score * 10000, 0) AS BIGINT) AS bp
      FROM sc JOIN documents d USING (doc_id)),
r AS (SELECT source, doc_id, bp,
             round(1e6 * percent_rank() OVER (
               PARTITION BY source ORDER BY bp, doc_id), 0) AS pct
      FROM j)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN pct >= {Q196_PCT_MICRO} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN pct >= {Q196_PCT_MICRO} THEN bp ELSE 0 END)
            AS BIGINT) AS kept_score_bp
FROM r GROUP BY 1 ORDER BY 1
"""


def q197_dataset_card(sf_dir: str):
    """The dataset card: one-row corpus summary (docs, tokens,
    vocabulary, sources, languages, exact-dup count, quality mass and
    keep count) — the release-notes rollup every published corpus
    ships, composed from the engine's own kernels (word-count
    exchange, exact-dedup groupby, q64 scoring) so the card IS the
    pipeline's accounting. Every exchange is vocab-/sources-/bounded;
    the corpus streams twice (tokens+quality fuse into one pass,
    dedup hashing is the second)."""
    import numpy as np

    from barks_ocr_ray.functions.dedupe import exact_dedup_docs
    from barks_ocr_ray.functions.inference import QualityModel
    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    docs = read_table(
        sf_dir, "documents", ["doc_id", "text", "source", "lang"]
    ).materialize()
    n_docs = docs.count()
    empty = pa.table(
        {
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "vocab_size": pa.array([], pa.int64()),
            "n_sources": pa.array([], pa.int64()),
            "n_langs": pa.array([], pa.int64()),
            "n_exact_dups": pa.array([], pa.int64()),
            "sum_quality_bp": pa.array([], pa.int64()),
            "n_quality_keep": pa.array([], pa.int64()),
        }
    )
    if n_docs == 0:
        return empty
    qm = QualityModel()
    import re as _re
    from collections import Counter

    token_re = _re.compile(r"[a-z0-9]+")

    def _fused(t: pa.Table) -> pa.Table:
        """ONE pass: word-count partials ride as (word, n) rows; the
        per-block quality partials ride as a marker row (word '' —
        never a TOKEN_RE token; NULL keys must not carry partials,
        Ray's hash aggregate does not unify them)."""
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            if x:
                c.update(token_re.findall(x.lower()))
        s = qm(t)
        bp = round_like_duckdb(
            s.column("quality_score").to_numpy(zero_copy_only=False)
            * 10000.0,
            0,
        ).astype(np.int64)
        keep = (
            s.column("keep").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ks = sorted(c)
        words = [""] + ks
        ns = [int(bp.sum())] + [c[k] for k in ks]
        keeps = [int(keep.sum())] + [0] * len(ks)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "k": pa.array(keeps, pa.int64()),
            }
        )

    rows = (
        docs.map_batches(_fused, batch_format="pyarrow")
        .groupby("word", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .take_all()
    )
    n_tokens = vocab = sum_bp = n_keep = 0
    for r in rows:
        if r["word"] == "":
            sum_bp += int(r["n"])
            n_keep += int(r["k"])
        else:
            vocab += 1
            n_tokens += int(r["n"])
    dims = (
        docs.groupby(["source", "lang"], num_partitions=2)
        .aggregate(Count(alias_name="_c"))
        .take_all()
    )
    n_sources = len({r["source"] for r in dims})
    n_langs = len({r["lang"] for r in dims})
    n_distinct = exact_dedup_docs(docs).count()
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "vocab_size": pa.array([vocab], pa.int64()),
            "n_sources": pa.array([n_sources], pa.int64()),
            "n_langs": pa.array([n_langs], pa.int64()),
            "n_exact_dups": pa.array([n_docs - n_distinct], pa.int64()),
            "sum_quality_bp": pa.array([sum_bp], pa.int64()),
            "n_quality_keep": pa.array([n_keep], pa.int64()),
        }
    )


def _sql_q197() -> str:
    from barks_ocr_ray.functions.inference import QUALITY_KEEP_THRESHOLD
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (SELECT doc_id, source, lang, text FROM documents),
words AS (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '{TOKEN_RE}')) AS w
          FROM t),
sc AS (SELECT doc_id, quality_score FROM ({_sql_q64()}))
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM words) AS BIGINT) AS n_tokens,
       CAST((SELECT count(DISTINCT w) FROM words) AS BIGINT) AS vocab_size,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT coalesce(md5(text), '<null>'))
            AS BIGINT) AS n_exact_dups,
       CAST((SELECT sum(CAST(round(quality_score * 10000, 0) AS BIGINT))
             FROM sc) AS BIGINT) AS sum_quality_bp,
       CAST((SELECT sum(CASE WHEN quality_score > {QUALITY_KEEP_THRESHOLD}
                        THEN 1 ELSE 0 END) FROM sc) AS BIGINT)
         AS n_quality_keep
FROM t
"""


def q198_hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining over the embedding corpus: for
    each anchor vector the best same-label neighbor (positive), the
    best other-label neighbor (the hard negative — the near-miss that
    actually teaches) and the round-6 margin between them. Anchor
    matrix + labels broadcast once; each block is one matmul emitting
    <= 2 rows per anchor; one tiny per-anchor merge."""
    from barks_ocr_ray.functions.ann import hard_negative_pairs

    return hard_negative_pairs(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"]),
        ANN_QUERY_IDS,
    )


def _sql_q198() -> str:
    ids = ",".join(str(i) for i in ANN_QUERY_IDS)
    return f"""
WITH a AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id IN ({ids})),
s AS (SELECT a.vec_id AS query_id, e.vec_id AS cand_id,
             CASE WHEN e.label = a.label THEN 1 ELSE 0 END AS is_pos,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])),
                   6) AS c
      FROM a, embeddings e WHERE e.vec_id != a.vec_id),
pos AS (SELECT query_id, cand_id AS pos_id, c AS pos_cosine FROM s
        WHERE is_pos = 1
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY c DESC, cand_id) = 1),
neg AS (SELECT query_id, cand_id AS neg_id, c AS neg_cosine FROM s
        WHERE is_pos = 0
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY c DESC, cand_id) = 1)
SELECT query_id, pos_id, pos_cosine, neg_id, neg_cosine,
       round(pos_cosine - neg_cosine, 6) AS margin
FROM pos JOIN neg USING (query_id) ORDER BY query_id
"""


#: q199 data-parallel shard count (per-worker batch formation — scales
#: with cluster width at 100 TB; a GLOBAL length sort is exactly what
#: length-grouped batching exists to avoid)
Q199_SHARDS = 8
#: q199 training micro-batch size (rows per batch)
Q199_BATCH = 16


def q199_padding_waste(sf_dir: str, hash_method: str = "md5"):
    """Length-grouped batching audit: the padding a training run wastes
    when sequences batch in arrival order vs length-sorted WITHIN each
    data-parallel shard (batch cost = rows_in_batch * max_tokens —
    every shorter sequence pads up to the batch max). One token-count
    pass assigns the deterministic shard (md5 oracle path / splitmix64
    production path — functions/hashing.py), ONE shard-keyed exchange,
    per-shard vectorized reduceat audit of both strategies, then a
    strategies-bounded rollup. useful_tokens is shard-invariant; only
    padded_tokens depends on the batching policy."""
    import numpy as np

    from barks_ocr_ray.functions.hashing import hash64

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _toks(t: pa.Table) -> pa.Table:
        n = pc.coalesce(
            pc.count_substring_regex(t.column("text"), r"\S+"),
            pa.scalar(0, pa.int32()),
        ).cast(pa.int64())
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        shard = (
            hash64(ids, method=hash_method) % np.uint64(Q199_SHARDS)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": pa.array(shard, pa.int64()),
                "toks": n,
            }
        )

    def _audit(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "strategy": pa.array([], pa.string()),
                "n_batches": pa.array([], pa.int64()),
                "useful_tokens": pa.array([], pa.int64()),
                "padded_tokens": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        shard = t.column("shard").to_numpy(zero_copy_only=False)
        toks = t.column("toks").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        acc = {"arrival": [0, 0, 0], "sorted": [0, 0, 0]}
        for s in np.unique(shard):
            m = shard == s
            tk, dd = toks[m], did[m]
            for strat, order in (
                ("arrival", np.lexsort((dd,))),
                ("sorted", np.lexsort((dd, tk))),
            ):
                tt = tk[order]
                n = len(tt)
                starts = np.arange(0, n, Q199_BATCH)
                counts = np.diff(np.concatenate((starts, [n])))
                maxes = np.maximum.reduceat(tt, starts)
                a = acc[strat]
                a[0] += len(starts)
                a[1] += int(tt.sum())
                a[2] += int((counts * maxes).sum() - tt.sum())
        return pa.table(
            {
                "strategy": pa.array(sorted(acc), pa.string()),
                "n_batches": pa.array(
                    [acc[k][0] for k in sorted(acc)], pa.int64()
                ),
                "useful_tokens": pa.array(
                    [acc[k][1] for k in sorted(acc)], pa.int64()
                ),
                "padded_tokens": pa.array(
                    [acc[k][2] for k in sorted(acc)], pa.int64()
                ),
            }
        )

    def _finish(t: pa.Table) -> pa.Table:
        import numpy as np

        u = t.column("useful_tokens").to_numpy(zero_copy_only=False)
        p = t.column("padded_tokens").to_numpy(zero_copy_only=False)
        denom = (u + p).astype(np.float64)
        bp = np.where(
            denom > 0,
            round_like_duckdb(
                1e4 * p.astype(np.float64) / np.where(denom > 0, denom, 1.0),
                0,
            ),
            0.0,
        ).astype(np.int64)
        return t.append_column("waste_bp", pa.array(bp, pa.int64()))

    return (
        docs.map_batches(_toks, batch_format="pyarrow")
        .repartition(hash_partitions(4), keys=["shard"])
        .map_batches(_audit, batch_format="pyarrow", batch_size=None)
        .groupby("strategy", num_partitions=2)
        .aggregate(
            Sum("n_batches", alias_name="n_batches"),
            Sum("useful_tokens", alias_name="useful_tokens"),
            Sum("padded_tokens", alias_name="padded_tokens"),
        )
        .map_batches(_finish, batch_format="pyarrow")
        .sort("strategy")
    )


def _sql_q199() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(coalesce(array_length(regexp_extract_all(text, '\\S+')), 0)
              AS BIGINT) AS toks,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                   AS UBIGINT) % {Q199_SHARDS} AS BIGINT) AS shard
  FROM documents),
b AS (
  SELECT 'arrival' AS strategy, shard, toks,
         (row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1)
           // {Q199_BATCH} AS b
  FROM t
  UNION ALL
  SELECT 'sorted' AS strategy, shard, toks,
         (row_number() OVER (PARTITION BY shard ORDER BY toks, doc_id) - 1)
           // {Q199_BATCH} AS b
  FROM t),
per_batch AS (
  SELECT strategy, shard, b, count(*) AS cnt, max(toks) AS mx,
         sum(toks) AS s
  FROM b GROUP BY 1, 2, 3)
SELECT strategy,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(sum(s) AS BIGINT) AS useful_tokens,
       CAST(sum(cnt * mx - s) AS BIGINT) AS padded_tokens,
       CAST(CASE WHEN sum(s) + sum(cnt * mx - s) = 0 THEN 0
            ELSE round(1e4 * sum(cnt * mx - s)
                       / (sum(s) + sum(cnt * mx - s)), 0) END
            AS BIGINT) AS waste_bp
FROM per_batch GROUP BY 1 ORDER BY 1
"""


def q200_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public):
    score every doc's mean cross-entropy under the corpus's OWN unigram
    LM (add-one smoothing — q137's kernel with the model self-trained
    instead of prior-crawl-frozen), split the corpus at the exact
    per-token-xent TERTILES into head/middle/tail, and report each
    bucket's doc/token mass and mean xent. The canonical LM-based
    quality partition: 'head' is the third of the corpus the model
    finds most predictable.

    Exchanges: one vocab-sized unigram aggregation, one term-keyed
    join, one doc-keyed reduce, then the counting-quickselect tertile
    passes (O(log) scans of the DOC-level table, no sort) and a
    buckets-bounded rollup. Per-term contributions round to int64
    micro-nats before any distributed sum (order-independent, oracle
    bit-exact); the per-doc score is an int64 micro-nat rate so the
    tertile thresholds are exact integers on both engines. Docs with
    zero tokens carry no LM evidence and drop (inner-join semantics,
    mirrored by the oracle)."""
    import numpy as np

    from barks_ocr_ray.functions.quantiles import distributed_quantiles
    from barks_ocr_ray.functions.relational import compact_nonempty
    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, DocTermCounts

    empty = pa.table(
        {
            "bucket": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "avg_xent": pa.array([], pa.float64()),
        }
    )
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    tf_rows = docs.map_batches(
        DocTermCounts, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()  # two consumers: LM aggregation + the scoring join

    unigrams = tf_rows.groupby("term", num_partitions=VOCAB_PARTITIONS).aggregate(
        Sum("tf", alias_name="n")
    )
    uni_c, n_vocab = compact_nonempty(unigrams, VOCAB_PARTITIONS)
    if n_vocab == 0:
        return empty
    n_total = int(uni_c.sum("n") or 0)
    denom = float(n_total + n_vocab + 1)

    broadcast_lm = n_vocab <= 2_000_000
    if broadcast_lm:
        # vocabulary-sized small side: broadcast the LM once (ray.put)
        # instead of shuffling the corpus-scale doc-term table through
        # a term-keyed join (the q110/q112 gate discipline; the join
        # below is the above-cap fallback). The broadcast path is
        # map-only over tf_rows AS EMITTED (no compact_nonempty — block
        # compaction would SPLIT a doc's term rows across blocks and
        # break the block-local per-doc reduce), so every doc's rows
        # stay inside its block and no doc exchange is needed.
        from barks_ocr_ray.functions.relational import (
            broadcast_lookup_column,
        )

        lm = {r["term"]: int(r["n"]) for r in uni_c.take_all()}
        joined = broadcast_lookup_column(
            tf_rows, lm, "term", "n", pa.int64()
        )
    else:
        tf_c, n_tf = compact_nonempty(tf_rows, 8)
        if n_tf == 0:
            return empty
        joined = tf_c.join(
            uni_c,
            join_type="inner",
            num_partitions=VOCAB_PARTITIONS,
            on=("term",),
        )

    def _contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        nll = tf * -np.log((n + 1.0) / denom)
        micro = round_like_duckdb(nll * 1e6, 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "nll_micro": pa.array(micro, pa.int64()),
                "tf": t.column("tf"),
            }
        )

    def _doc_score(t: pa.Table) -> pa.Table:
        s = t.column("sum_micro").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        x = round_like_duckdb(s / n, 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "x": pa.array(x, pa.int64()),
                "toks": t.column("n_tokens"),
            }
        )

    if broadcast_lm:

        def _doc_scores_block(t: pa.Table) -> pa.Table:
            c = _contrib(t)
            g = c.group_by("doc_id").aggregate(
                [("nll_micro", "sum"), ("tf", "sum")]
            )
            g = g.rename_columns(["doc_id", "sum_micro", "n_tokens"])
            return _doc_score(g)

        per_doc = joined.map_batches(
            _doc_scores_block, batch_format="pyarrow"
        ).materialize()  # consumers: tertile counting passes + bucket pass
    else:
        per_doc = (
            joined.map_batches(_contrib, batch_format="pyarrow")
            .groupby("doc_id", num_partitions=8)
            .aggregate(
                Sum("nll_micro", alias_name="sum_micro"),
                Sum("tf", alias_name="n_tokens"),
            )
            .map_batches(_doc_score, batch_format="pyarrow")
            .materialize()
        )
    th = distributed_quantiles(per_doc, "x", [1 / 3, 2 / 3])
    t1, t2 = (v.as_py() for v in th.column("value"))

    def _bucket_partial(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        toks = t.column("toks").to_numpy(zero_copy_only=False)
        b = np.where(x <= t1, 0, np.where(x <= t2, 1, 2))
        names = np.array(["head", "middle", "tail"])
        out_b, out_d, out_t, out_x = [], [], [], []
        for k in np.unique(b):
            m = b == k
            out_b.append(names[k])
            out_d.append(int(m.sum()))
            out_t.append(int(toks[m].sum()))
            out_x.append(int(x[m].sum()))
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.string()),
                "n_docs": pa.array(out_d, pa.int64()),
                "n_tokens": pa.array(out_t, pa.int64()),
                "sum_x": pa.array(out_x, pa.int64()),
            }
        )

    def _finish(t: pa.Table) -> pa.Table:
        sx = t.column("sum_x").to_numpy(zero_copy_only=False)
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        avg = round_like_duckdb(sx / nd / 1e6, 4)
        return pa.table(
            {
                "bucket": t.column("bucket"),
                "n_docs": t.column("n_docs"),
                "n_tokens": t.column("n_tokens"),
                "avg_xent": pa.array(avg, pa.float64()),
            }
        )

    return (
        per_doc.map_batches(_bucket_partial, batch_format="pyarrow")
        .groupby("bucket", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_x", alias_name="sum_x"),
        )
        .map_batches(_finish, batch_format="pyarrow")
        .sort("bucket")
    )


def _sql_q200() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}'))
           AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
u AS (SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
s AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE)
             + CAST(count(*) AS DOUBLE) + 1.0 AS denom
      FROM u),
c AS (
  SELECT tf.doc_id,
         CAST(round(tf.tf * -ln((u.n + 1.0) / s.denom)
                    * 1000000, 0) AS BIGINT) AS nll_micro,
         tf.tf
  FROM tf JOIN u USING (term), s),
d AS (SELECT doc_id,
             CAST(round(CAST(sum(nll_micro) AS DOUBLE) / sum(tf), 0)
                  AS BIGINT) AS x,
             CAST(sum(tf) AS BIGINT) AS toks
      FROM c GROUP BY 1),
th AS (SELECT quantile_disc(x, 1.0/3) AS t1, quantile_disc(x, 2.0/3) AS t2
       FROM d),
b AS (SELECT CASE WHEN d.x <= th.t1 THEN 'head'
                  WHEN d.x <= th.t2 THEN 'middle' ELSE 'tail' END AS bucket,
             d.x, d.toks
      FROM d, th)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       round(CAST(sum(x) AS DOUBLE) / count(*) / 1000000.0, 4) AS avg_xent
FROM b GROUP BY 1 ORDER BY 1
"""


def q201_lexical_diversity(sf_dir: str):
    """Per-source lexical diversity (distinct-n): the fraction of
    unigram and bigram occurrences that are distinct — the standard
    repetitiveness/diversity audit of a generated-or-scraped corpus
    (low distinct-2 = template farm or decoding loop; cf. Li et al.
    2016 distinct-n, public). Distinct from q179 (vocab GROWTH curve),
    q150 (which terms) and q111 (within-doc repetition): this is
    cross-doc type/token mass per source.

    Execution: one tokenize pass emits block-local (source, kind,
    gram) COUNT partials (combiner discipline — one row per distinct
    gram per block, never per occurrence), ONE gram-keyed exchange
    merges them, then distinct = row count and total = sum(c) fold as
    block partials into a (sources x 2)-bounded aggregation. The
    gram-keyed exchange is the only corpus-scale shuffle."""
    import re as _re
    from collections import Counter as _Counter

    import numpy as np

    from barks_ocr_ray.functions.text import TOKEN_RE, VOCAB_PARTITIONS

    rex = _re.compile(TOKEN_RE)
    docs = read_table(sf_dir, "documents", ["text", "source"])

    def _grams(t: pa.Table) -> pa.Table:
        acc: dict = {}
        for src, s in zip(t.column("source").to_pylist(), t.column("text")):
            ws = rex.findall((s.as_py() or "").lower())
            if not ws:
                continue
            acc.setdefault((src, 1), _Counter()).update(ws)
            if len(ws) >= 2:
                acc.setdefault((src, 2), _Counter()).update(
                    f"{a} {b}" for a, b in zip(ws, ws[1:])
                )
        out_s, out_k, out_g, out_c = [], [], [], []
        for (src, k), cnt in acc.items():
            out_s.extend([src] * len(cnt))
            out_k.extend([k] * len(cnt))
            out_g.extend(cnt.keys())
            out_c.extend(cnt.values())
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "kind": pa.array(out_k, pa.int64()),
                "gram": pa.array(out_g, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    def _fold(t: pa.Table) -> pa.Table:
        # block partial over the merged (source, kind, gram, c) rows:
        # rows ARE distinct grams here, so distinct = row count
        agg: dict = {}
        src = t.column("source").to_pylist()
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        for i in range(t.num_rows):
            d = agg.setdefault((src[i], int(kind[i])), [0, 0])
            d[0] += 1
            d[1] += int(c[i])
        keys = sorted(agg)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "kind": pa.array([k[1] for k in keys], pa.int64()),
                "n_distinct": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_total": pa.array([agg[k][1] for k in keys], pa.int64()),
            }
        )

    stats = (
        docs.map_batches(_grams, batch_format="pyarrow")
        .groupby(["source", "kind", "gram"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(_fold, batch_format="pyarrow")
        .groupby(["source", "kind"], num_partitions=2)
        .aggregate(
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("n_total", alias_name="n_total"),
        )
        .to_pandas()  # bounded: sources x 2 rows
    )
    rows: dict = {}
    for r in stats.itertuples():
        e = rows.setdefault(r.source, {1: (0, 0), 2: (0, 0)})
        e[int(r.kind)] = (int(r.n_distinct), int(r.n_total))
    srcs = sorted(rows)
    d1 = np.array([rows[s][1][0] for s in srcs], np.int64)
    t1 = np.array([rows[s][1][1] for s in srcs], np.int64)
    d2 = np.array([rows[s][2][0] for s in srcs], np.int64)
    t2 = np.array([rows[s][2][1] for s in srcs], np.int64)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "unigrams": pa.array(t1, pa.int64()),
            "distinct_unigrams": pa.array(d1, pa.int64()),
            "bigrams": pa.array(t2, pa.int64()),
            "distinct_bigrams": pa.array(d2, pa.int64()),
            "distinct1": pa.array(
                round_like_duckdb(d1 / np.maximum(t1, 1), 4), pa.float64()
            ),
            "distinct2": pa.array(
                round_like_duckdb(d2 / np.maximum(t2, 1), 4), pa.float64()
            ),
        }
    )


def _sql_q201() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ws
  FROM documents),
uni AS (SELECT source, unnest(ws) AS g FROM tok),
idx AS (
  SELECT source, ws,
         unnest(generate_series(1, array_length(ws) - 1)) AS i
  FROM tok WHERE array_length(ws) >= 2),
bi AS (
  SELECT source, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS g
  FROM idx),
s1 AS (SELECT source, CAST(count(*) AS BIGINT) AS unigrams,
              CAST(count(DISTINCT g) AS BIGINT) AS distinct_unigrams
       FROM uni GROUP BY 1),
s2 AS (SELECT source, CAST(count(*) AS BIGINT) AS bigrams,
              CAST(count(DISTINCT g) AS BIGINT) AS distinct_bigrams
       FROM bi GROUP BY 1)
SELECT s1.source, unigrams, distinct_unigrams,
       coalesce(bigrams, 0) AS bigrams,
       coalesce(distinct_bigrams, 0) AS distinct_bigrams,
       round(CAST(distinct_unigrams AS DOUBLE) / greatest(unigrams, 1), 4)
         AS distinct1,
       round(CAST(coalesce(distinct_bigrams, 0) AS DOUBLE)
             / greatest(coalesce(bigrams, 0), 1), 4) AS distinct2
FROM s1 LEFT JOIN s2 USING (source) ORDER BY source
"""


def q202_syndication_matrix(sf_dir: str):
    """Cross-source exact-duplication matrix ('who syndicates whom'):
    for every pair of sources, the number of identical-content doc
    pairs they share, plus the within-source diagonal — the provenance
    audit that tells a corpus builder which feeds are mirrors of each
    other BEFORE near-dup thresholds enter the picture (q172 measures
    trigram SIMILARITY between sources; this counts exact copies).

    Scale shape: no pair ever materializes per doc — docs reduce to
    (content_hash, source, n) via one keyed aggregation, a second
    hash-keyed repartition colocates each content group, and a
    block-local fold emits (source_a, source_b, n_a*n_b) partials
    (within-source: n*(n-1)/2), closed by a sources^2-bounded sum. A
    hash shared by s sources with millions of copies each still emits
    only s^2 rows. Null-text docs form their own content group
    (dedupe._NULL_TEXT_KEY), matching the oracle's coalesce key."""
    import numpy as np

    from barks_ocr_ray.functions.dedupe import _NULL_TEXT_KEY, md5_hex

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def _hash(t: pa.Table) -> pa.Table:
        hs = [
            _NULL_TEXT_KEY if s.as_py() is None else md5_hex(s.as_py())
            for s in t.column("text")
        ]
        return pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "source": t.column("source"),
            }
        )

    def _pairs(t: pa.Table) -> pa.Table:
        # complete content groups are colocated by the keyed repartition
        out_a, out_b, out_n = [], [], []
        if t.num_rows:
            order = pc.sort_indices(
                t, sort_keys=[("h", "ascending"), ("source", "ascending")]
            )
            t = t.take(order)
            hs = np.asarray(t.column("h").to_pylist())
            srcs = t.column("source").to_pylist()
            ns = t.column("n").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(
                np.concatenate(([True], hs[1:] != hs[:-1]))
            )
            bounds = np.concatenate((starts, [len(hs)]))
            for gi in range(len(starts)):
                lo, hi = bounds[gi], bounds[gi + 1]
                for i in range(lo, hi):
                    d = int(ns[i]) * (int(ns[i]) - 1) // 2
                    if d > 0:
                        out_a.append(srcs[i])
                        out_b.append(srcs[i])
                        out_n.append(d)
                    for j in range(i + 1, hi):
                        out_a.append(srcs[i])
                        out_b.append(srcs[j])
                        out_n.append(int(ns[i]) * int(ns[j]))
        return pa.table(
            {
                "source_a": pa.array(out_a, pa.string()),
                "source_b": pa.array(out_b, pa.string()),
                "n_dup_pairs": pa.array(out_n, pa.int64()),
            }
        )

    out = (
        docs.map_batches(_hash, batch_format="pyarrow")
        .groupby(["h", "source"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="n"))
        .repartition(hash_partitions(4), keys=["h"])
        .map_batches(_pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["source_a", "source_b"], num_partitions=2)
        .aggregate(Sum("n_dup_pairs", alias_name="n_dup_pairs"))
        .to_pandas()  # sources^2-bounded
    )
    # a dup-free corpus yields 0 rows — to_pandas drops the schema, so
    # rebuild the typed table and sort driver-side (bounded result)
    out = out.sort_values(["source_a", "source_b"]) if len(out) else out
    return pa.table(
        {
            "source_a": pa.array(
                out["source_a"].tolist() if len(out) else [], pa.string()
            ),
            "source_b": pa.array(
                out["source_b"].tolist() if len(out) else [], pa.string()
            ),
            "n_dup_pairs": pa.array(
                out["n_dup_pairs"].tolist() if len(out) else [], pa.int64()
            ),
        }
    )


def _sql_q202() -> str:
    return """
WITH h AS (
  SELECT coalesce(md5(text), '__null_text__') AS h, source
  FROM documents),
g AS (SELECT h, source, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1, 2),
x AS (
  SELECT g1.source AS source_a, g2.source AS source_b,
         CAST(sum(g1.n * g2.n) AS BIGINT) AS n_dup_pairs
  FROM g g1 JOIN g g2 ON g1.h = g2.h AND g1.source < g2.source
  GROUP BY 1, 2
  UNION ALL
  SELECT source, source, CAST(sum(n * (n - 1) // 2) AS BIGINT)
  FROM g GROUP BY 1, 2 HAVING sum(n * (n - 1) // 2) > 0
)
SELECT source_a, source_b, n_dup_pairs FROM x ORDER BY source_a, source_b
"""


def q203_hll_error_audit(sf_dir: str):
    """Approximation-quality harness for HLL (the q184/q186 pattern
    applied to cardinality sketches): per event type, the EXACT
    distinct-user count beside the q102 HLL estimate and the signed
    relative error in micro-units — the table that justifies the
    register width before a 100 TB count-distinct trusts the sketch.

    Both legs run distributed: the exact leg ships block-local
    distinct (event_type, user_id) partials into ONE keyed dedup
    aggregation then group-bounded count partials (q120 discipline —
    never raw rows); the estimate leg is the q102 kernel verbatim
    (bit-exact vs its golden under any partitioning). The join closes
    on the event-types-bounded driver table. Oracle: SQL
    count(DISTINCT) joined against the committed q102 golden parquet."""
    import numpy as np

    from barks_ocr_ray.functions.sketches import hll_grouped_distinct

    events = read_table(sf_dir, "events", ["event_type", "user_id"])

    def _dedup_block(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("event_type")),
                pc.is_valid(t.column("user_id")),
            )
        )
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def _count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "c": g.column("user_id_count").cast(pa.int64()),
            }
        )

    exact = (
        events.map_batches(_dedup_block, batch_format="pyarrow")
        .groupby(["event_type", "user_id"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_n"))
        .map_batches(_count_partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=2)
        .aggregate(Sum("c", alias_name="n_exact"))
        .to_pandas()  # event-types-bounded
    )
    est = hll_grouped_distinct(events, "event_type", "user_id").to_pandas()
    m = exact.merge(est, on="event_type", how="inner").sort_values(
        "event_type"
    )
    n = m["n_exact"].to_numpy().astype(np.float64)
    e = m["n_distinct_est"].to_numpy()
    rel = round_like_duckdb(1e6 * (e - n) / n, 0).astype(np.int64)
    return pa.table(
        {
            "event_type": pa.array(m["event_type"].tolist(), pa.string()),
            "n_exact": pa.array(m["n_exact"].tolist(), pa.int64()),
            "n_distinct_est": pa.array(e, pa.float64()),
            "rel_err_micro": pa.array(rel, pa.int64()),
        }
    )


def _sql_q203() -> str:
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    return f"""
WITH ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
ap AS (
  SELECT event_type, n_distinct_est
  FROM read_parquet('{neardup_golden_path("hll_grouped")}')
  WHERE corpus_tag = {corpus_tag_sql("events")})
SELECT ex.event_type, ex.n_exact, ap.n_distinct_est,
       CAST(round(1e6 * (ap.n_distinct_est - ex.n_exact) / ex.n_exact, 0)
            AS BIGINT) AS rel_err_micro
FROM ex JOIN ap USING (event_type) ORDER BY event_type
"""


def q204_max_coverage(sf_dir: str):
    """Greedy max-coverage coreset selection: the 10 documents that
    together cover the most distinct terms (submodular (1-1/e) greedy —
    the lexical-coverage subset builder beside q75 SemDeDup's
    redundancy REMOVER). BSP raw-task rounds over blocks coded once
    into the object store (q94/q126 pattern); the driver holds only
    the covered-fingerprint set and each round's block champions. See
    functions/selection.py for the scale contract."""
    from barks_ocr_ray.functions.selection import max_coverage_select

    return max_coverage_select(
        read_table(sf_dir, "documents", ["doc_id", "text"]), k=10
    )


def q205_ks_drift(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the prior
    and new snapshots' doc-length distributions (the q130/q134 split
    convention) — the drift-family completion: q130 is categorical TV,
    q134 is binned PSI, this is the exact continuous-CDF sup-distance,
    no binning error. One corpus pass ships (value, side) count
    partials into a values-bounded keyed aggregation; the CDF walk
    runs driver-side on that bounded table with INTEGER cross-products
    |a0*n1 - a1*n0| (exact max — a float cumsum would make the argmax
    order-dependent), one IEEE division at the end."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        v = t.column("n_chars").to_numpy(zero_copy_only=False)
        new_side = (ids % 10) >= 7
        uv = np.unique(v)
        c0 = np.zeros(uv.size, np.int64)
        c1 = np.zeros(uv.size, np.int64)
        idx = np.searchsorted(uv, v)
        np.add.at(c0, idx[~new_side], 1)
        np.add.at(c1, idx[new_side], 1)
        return pa.table(
            {
                "v": pa.array(uv, pa.int64()),
                "c0": pa.array(c0, pa.int64()),
                "c1": pa.array(c1, pa.int64()),
            }
        )

    g = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("v", num_partitions=4)
        .aggregate(
            Sum("c0", alias_name="c0"), Sum("c1", alias_name="c1")
        )
        .to_pandas()  # bounded by distinct length values
        .sort_values("v")
    )
    c0 = g["c0"].to_numpy().astype(np.int64)
    c1 = g["c1"].to_numpy().astype(np.int64)
    n0, n1 = int(c0.sum()), int(c1.sum())
    if n0 == 0 or n1 == 0:
        md, ks = 0, 0.0
    else:
        a0 = np.cumsum(c0)
        a1 = np.cumsum(c1)
        md = int(np.abs(a0 * n1 - a1 * n0).max())
        ks = float(round_like_duckdb(np.array([1e6 * md / (n0 * n1)]), 0)[0])
    return pa.table(
        {
            "n_prior": pa.array([n0], pa.int64()),
            "n_new": pa.array([n1], pa.int64()),
            "n_values": pa.array([len(g)], pa.int64()),
            "ks_micro": pa.array([int(ks)], pa.int64()),
        }
    )


def _sql_q205() -> str:
    return """
WITH t AS (
  SELECT n_chars AS v,
         CASE WHEN doc_id % 10 < 7 THEN 0 ELSE 1 END AS side
  FROM documents),
g AS (SELECT v,
             CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM t GROUP BY 1),
n AS (SELECT CAST(coalesce(sum(c0), 0) AS BIGINT) AS n0,
             CAST(coalesce(sum(c1), 0) AS BIGINT) AS n1,
             CAST(count(*) AS BIGINT) AS nv
      FROM g),
c AS (SELECT CAST(sum(c0) OVER (ORDER BY v) AS BIGINT) AS a0,
             CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS a1
      FROM g),
d AS (SELECT CAST(coalesce(max(abs(a0 * n.n1 - a1 * n.n0)), 0) AS BIGINT)
               AS md
      FROM c, n)
SELECT n.n0 AS n_prior, n.n1 AS n_new, n.nv AS n_values,
       CASE WHEN n.n0 = 0 OR n.n1 = 0 THEN 0
            ELSE CAST(round(1e6 * d.md / (n.n0 * n.n1), 0) AS BIGINT)
       END AS ks_micro
FROM d, n
"""


def q206_lang_source_mi(sf_dir: str):
    """Mutual information between language and source (plus both
    marginal entropies) in micro-nats — the corpus-composition audit
    that says whether sources are language-specialized (high MI: lang
    is predictable from source -> per-source lang filters are worth
    it) or uniformly mixed (MI ~ 0). One (lang, source) count
    aggregation (cells bounded by langs x sources); every per-cell
    term rounds to int64 micro-nats BEFORE summing (q137 fixed-point
    discipline) so the bounded driver fold replays exactly in SQL."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["lang", "source"])
    cells = (
        docs.groupby(["lang", "source"], num_partitions=2)
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # langs x sources bounded
    )
    c = cells["c"].to_numpy().astype(np.int64)
    n = int(c.sum())
    lang_tot = cells.groupby("lang")["c"].transform("sum").to_numpy()
    src_tot = cells.groupby("source")["c"].transform("sum").to_numpy()
    mi_terms = round_like_duckdb(
        1e6 * (c / n) * np.log((c.astype(np.float64) * n) / (lang_tot * src_tot)),
        0,
    ).astype(np.int64)
    lmarg = cells.groupby("lang")["c"].sum().to_numpy().astype(np.int64)
    smarg = cells.groupby("source")["c"].sum().to_numpy().astype(np.int64)
    h = lambda m: int(
        round_like_duckdb(1e6 * (m / n) * -np.log(m / n), 0)
        .astype(np.int64)
        .sum()
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "mi_micro": pa.array([int(mi_terms.sum())], pa.int64()),
            "h_lang_micro": pa.array([h(lmarg)], pa.int64()),
            "h_source_micro": pa.array([h(smarg)], pa.int64()),
        }
    )


def _sql_q206() -> str:
    return """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
lm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cells GROUP BY 1),
sm AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY 1),
mi AS (
  SELECT CAST(sum(CAST(round(
           1e6 * (cells.c / n.n)
               * ln((CAST(cells.c AS DOUBLE) * n.n) / (lm.cl * sm.cs)), 0)
         AS BIGINT)) AS BIGINT) AS mi_micro,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cells JOIN lm USING (lang) JOIN sm USING (source), n),
hl AS (SELECT CAST(sum(CAST(round(
           1e6 * (cl / n.n) * -ln(cl / n.n), 0) AS BIGINT)) AS BIGINT) AS h
       FROM lm, n),
hs AS (SELECT CAST(sum(CAST(round(
           1e6 * (cs / n.n) * -ln(cs / n.n), 0) AS BIGINT)) AS BIGINT) AS h
       FROM sm, n)
SELECT n.n AS n_docs, mi.n_cells, mi.mi_micro,
       hl.h AS h_lang_micro, hs.h AS h_source_micro
FROM n, mi, hl, hs
"""


#: q207 band edges (rank thresholds; scaled to the fixture vocab — at
#: production scale these are 1e3/1e5 and the machinery is unchanged)
Q207_B1, Q207_B2 = 10, 1000


def q207_vocab_band_coverage(sf_dir: str):
    """Vocabulary band coverage: how much of the corpus's token mass
    the top-B1 / top-B2 / tail vocabulary bands carry (the Zipf-mass
    audit behind every 'cap the tokenizer vocab at N' decision; q174
    fits the slope, this measures the actual head mass). Ranking is
    (count desc, term asc) — but NO global sort runs: the band
    boundary resolves from a count-of-counts table (bounded by
    distinct count VALUES) plus one lexicographic cutoff pulled from
    the terms AT the boundary count only (bounded pull, the q146
    offset-table discipline applied to ranks); band assignment is then
    a vectorized per-block compare and the rollup is bands-bounded."""
    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, WordCountCombiner

    docs = read_table(sf_dir, "documents", ["text"])
    voc = (
        docs.map_batches(
            WordCountCombiner, batch_format="pyarrow", concurrency=(1, 4)
        )
        .groupby("word", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # consumers: count-of-counts, boundary pulls, band pass
    )

    def _coc(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        uv, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "n": pa.array(uv, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    coc = (
        voc.map_batches(_coc, batch_format="pyarrow")
        .groupby("n", num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("n", ascending=False)
    )
    counts_desc = coc["n"].to_numpy().astype(np.int64)
    terms_at = coc["c"].to_numpy().astype(np.int64)
    cum = np.cumsum(terms_at)
    n_vocab = int(cum[-1]) if len(cum) else 0

    def _cutoff(k: int):
        """(boundary_count, cutoff_term) for rank k, or None if the
        whole vocab fits inside the band."""
        if n_vocab <= k:
            return None
        i = int(np.searchsorted(cum, k))  # first row where cum >= k
        nb = int(counts_desc[i])
        before = int(cum[i - 1]) if i else 0
        slots = k - before
        # bounded pull: ONLY the terms at the boundary count
        at = voc.filter(expr=f"n == {nb}").to_pandas()["word"]
        cut = sorted(at.tolist())[slots - 1]
        return nb, cut

    b1, b2 = _cutoff(Q207_B1), _cutoff(Q207_B2)

    def _band(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        w = np.asarray(t.column("word").to_pylist())

        def _in(b):
            if b is None:
                return np.ones(len(n), bool)
            nb, cut = b
            return (n > nb) | ((n == nb) & (w <= cut))

        in1, in2 = _in(b1), _in(b2)
        band = np.where(in1, "a_top", np.where(in2, "b_mid", "c_tail"))
        out_b, out_t, out_n = [], [], []
        for bn in np.unique(band):
            m = band == bn
            out_b.append(str(bn))
            out_t.append(int(m.sum()))
            out_n.append(int(n[m].sum()))
        return pa.table(
            {
                "band": pa.array(out_b, pa.string()),
                "n_terms": pa.array(out_t, pa.int64()),
                "tokens": pa.array(out_n, pa.int64()),
            }
        )

    rolled = (
        voc.map_batches(_band, batch_format="pyarrow")
        .groupby("band", num_partitions=2)
        .aggregate(
            Sum("n_terms", alias_name="n_terms"),
            Sum("tokens", alias_name="tokens"),
        )
        .to_pandas()  # bands-bounded
        .sort_values("band")
    )
    total = int(rolled["tokens"].sum()) if len(rolled) else 0
    share = (
        round_like_duckdb(
            1e4 * rolled["tokens"].to_numpy() / max(total, 1), 0
        ).astype(np.int64)
        if len(rolled)
        else np.array([], np.int64)
    )
    return pa.table(
        {
            "band": pa.array(rolled["band"].tolist(), pa.string()),
            "n_terms": pa.array(rolled["n_terms"].tolist(), pa.int64()),
            "tokens": pa.array(rolled["tokens"].tolist(), pa.int64()),
            "share_bp": pa.array(share, pa.int64()),
        }
    )


def _sql_q207() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
v AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS rk FROM v),
b AS (SELECT CASE WHEN rk <= {Q207_B1} THEN 'a_top'
                  WHEN rk <= {Q207_B2} THEN 'b_mid'
                  ELSE 'c_tail' END AS band, n
      FROM r),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM v)
SELECT band, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n) AS BIGINT) AS tokens,
       CAST(round(1e4 * sum(n) / greatest(t.total, 1), 0) AS BIGINT)
         AS share_bp
FROM b, t GROUP BY band, t.total ORDER BY band
"""


def q208_embedding_isotropy(sf_dir: str):
    """Embedding-space isotropy audit: mean vector norm and the mean
    pairwise cosine of the whole corpus — the anisotropy number
    (Ethayarajh 2019, public) that says whether an embedding column is
    usable for cosine retrieval (a high mean pairwise cosine means a
    dominant common direction and q16/q48 rankings degenerate).

    The O(n^2) pairwise mean NEVER runs pairwise: with per-row unit
    vectors in micro-int space, sum_{i!=j} cos(i,j) = ||S||^2 - q where
    S = sum of unit vectors and q = sum of per-row self-dots — one
    corpus pass of (dim, s) int64 partials ((dims+3)-bounded per
    block), exact integer algebra driver-side (Python ints for the
    hugeint squares), ONE IEEE division at the end. Unit vectors round
    to 1e6 fixed point BEFORE any sum, so every engine-side reduce is
    order-independent and the SQL replays it."""
    import numpy as np

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        v = np.stack(
            [np.asarray(x, np.float64) for x in t.column("embedding").to_pylist()]
        )
        nm = np.sqrt((v * v).sum(axis=1))
        um = round_like_duckdb(1e6 * v / nm[:, None], 0).astype(np.int64)
        nmm = round_like_duckdb(1e6 * nm, 0).astype(np.int64)
        dims = um.shape[1]
        kinds = ["S"] * dims + ["n", "nrm", "q"]
        keys = list(range(dims)) + [0, 0, 0]
        vals = list(um.sum(axis=0)) + [
            len(nm),
            int(nmm.sum()),
            int((um * um).sum()),  # <= rows x dims x 1e12, int64-safe
        ]
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "key": pa.array(keys, pa.int64()),
                "val": pa.array([int(x) for x in vals], pa.int64()),
            }
        )

    agg = (
        emb.map_batches(_partial, batch_format="pyarrow")
        .groupby(["kind", "key"], num_partitions=2)
        .aggregate(Sum("val", alias_name="val"))
        .to_pandas()  # (dims + 3)-bounded
    )
    by = {(r.kind, r.key): int(r.val) for r in agg.itertuples()}
    n = by[("n", 0)]
    q = by[("q", 0)]
    ssq = sum(
        v * v for (k, _), v in by.items() if k == "S"
    )  # exact Python ints (hugeint-sized)
    avg_norm = int(
        round_like_duckdb(np.array([by[("nrm", 0)] / n]), 0)[0]
    )
    if n > 1:
        cos = int(
            round_like_duckdb(
                np.array([1e6 * float(ssq - q) / (n * (n - 1)) / 1e12]), 0
            )[0]
        )
    else:
        cos = 0
    return pa.table(
        {
            "n_vectors": pa.array([n], pa.int64()),
            "avg_norm_micro": pa.array([avg_norm], pa.int64()),
            "avg_pairwise_cos_micro": pa.array([cos], pa.int64()),
        }
    )


def _sql_q208() -> str:
    return """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nrm AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nm
  FROM e),
u AS (
  SELECT vec_id, nm, unnest(v) AS x,
         generate_subscripts(v, 1) AS d
  FROM nrm),
um AS (
  SELECT vec_id, d, CAST(round(1e6 * x / nm, 0) AS BIGINT) AS um
  FROM u),
sdim AS (SELECT d, CAST(sum(um) AS BIGINT) AS s FROM um GROUP BY 1),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM nrm) AS n,
         (SELECT CAST(sum(CAST(round(1e6 * nm, 0) AS BIGINT)) AS BIGINT)
          FROM nrm) AS nrm_sum,
         (SELECT sum(CAST(um AS HUGEINT) * um) FROM um) AS q,
         (SELECT sum(CAST(s AS HUGEINT) * s) FROM sdim) AS ssq)
SELECT n AS n_vectors,
       CAST(round(CAST(nrm_sum AS DOUBLE) / n, 0) AS BIGINT)
         AS avg_norm_micro,
       CASE WHEN n <= 1 THEN 0
            ELSE CAST(round(1e6 * (ssq - q) / (n * (n - 1)) / 1e12, 0)
                      AS BIGINT)
       END AS avg_pairwise_cos_micro
FROM stats
"""


#: q209 sliding-window width in hours
Q209_W = 24


def q209_sliding_distinct_users(sf_dir: str):
    """EXACT trailing-24h distinct users per event hour — the sliding
    dashboard number (DAU at hourly resolution). Distinct-over-
    overlapping-windows does not merge like sums (q155's trailing
    average) or registers (q102's HLL — the cheap approximate sibling
    of this query), so the exact path pays a bounded x24 fan-out and
    is honest about it: (hour, user) pairs dedup through ONE keyed
    exchange, each surviving pair replicates to the <= 24 PRESENT
    window-ends that contain it (window list broadcast, hours-
    bounded), a second (window, user) keyed dedup closes global
    uniqueness, and per-window counts fold from block partials.
    Exchange volume is distinct-pairs x 24, never raw events."""
    import numpy as np

    events = read_table(sf_dir, "events", ["ts", "user_id"])

    def _hour_pairs(t: pa.Table) -> pa.Table:
        h = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        out = pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "user_id": t.column("user_id"),
            }
        )
        return out.group_by(["h", "user_id"]).aggregate([])

    pairs = (
        events.map_batches(_hour_pairs, batch_format="pyarrow")
        .groupby(["h", "user_id"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_n"))
        .materialize()  # consumers: hour spine + window explode
    )

    def _hours(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pa.array(
                    np.unique(t.column("h").to_numpy(zero_copy_only=False)),
                    pa.int64(),
                )
            }
        )

    hrs = np.unique(
        pairs.map_batches(_hours, batch_format="pyarrow")
        .to_pandas()["h"]
        .to_numpy()
        .astype(np.int64)
    )  # hours-bounded driver spine (block partials are already unique)

    def _explode(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(hrs, h)  # first window-end >= h
        hi = np.searchsorted(hrs, h + Q209_W, side="left")  # end < h+W
        reps = (hi - lo).astype(np.int64)
        w_idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi)]
        ) if len(h) else np.empty(0, np.int64)
        return pa.table(
            {
                "wend": pa.array(hrs[w_idx], pa.int64()),
                "user_id": pa.array(np.repeat(u, reps), pa.int64()),
            }
        )

    def _count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["wend"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "wend": g.column("wend"),
                "c": g.column("user_id_count").cast(pa.int64()),
            }
        )

    out = (
        pairs.map_batches(_explode, batch_format="pyarrow")
        .groupby(["wend", "user_id"], num_partitions=hash_partitions(8))
        .aggregate(Count(alias_name="_m"))
        .map_batches(_count_partial, batch_format="pyarrow")
        .groupby("wend", num_partitions=2)
        .aggregate(Sum("c", alias_name="n_users"))
        .to_pandas()  # hours-bounded
    )
    out = out.sort_values("wend") if len(out) else out
    return pa.table(
        {
            "wend": pa.array(
                out["wend"].tolist() if len(out) else [], pa.int64()
            ),
            "n_users": pa.array(
                out["n_users"].tolist() if len(out) else [], pa.int64()
            ),
        }
    )


def _sql_q209() -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h, user_id
  FROM events),
hrs AS (SELECT DISTINCT h FROM e),
x AS (
  SELECT DISTINCT w.h AS wend, e.user_id
  FROM e JOIN hrs w ON e.h <= w.h AND e.h > w.h - {Q209_W})
SELECT wend, CAST(count(*) AS BIGINT) AS n_users
FROM x GROUP BY 1 ORDER BY 1
"""


#: q210 audit quantiles (q127's grid)
Q210_QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q210_quantile_sketch_error(sf_dir: str):
    """Approximation-quality harness for the quantile sketch — the
    fourth row of the sketch-audit family (q184 MinHash, q186 IVF
    recall, q203 HLL): every q127 fixed-grid estimate beside the q66
    exact counting-quickselect value, with the absolute error and the
    sketch's own one-bucket-width guarantee checked per quantile. Both
    legs run distributed over ONE materialized read; the join closes
    on the quantiles-bounded driver table."""
    import numpy as np

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    from barks_ocr_ray.functions.quantiles import (
        distributed_quantiles,
        histogram_quantiles,
    )

    li = read_table(sf_dir, "lineitem", ["l_extendedprice"]).materialize()
    exact = distributed_quantiles(
        li, "l_extendedprice", Q210_QS, pull_cap=2000
    ).to_pandas()
    approx = histogram_quantiles(
        li, "l_extendedprice", Q210_QS, n_buckets=1024
    ).to_pandas()
    stats = li.aggregate(
        _Min("l_extendedprice", alias_name="lo"),
        _Max("l_extendedprice", alias_name="hi"),
    )
    w = (float(stats["hi"]) - float(stats["lo"])) / 1024.0
    m = exact.merge(approx, on="q").sort_values("q")
    err = round_like_duckdb(
        np.abs(m["value_est"].to_numpy() - m["value"].to_numpy()), 6
    )
    bound = float(round_like_duckdb(np.array([w]), 6)[0])
    return pa.table(
        {
            "q": pa.array(m["q"].tolist(), pa.float64()),
            "value": pa.array(m["value"].tolist(), pa.float64()),
            "value_est": pa.array(m["value_est"].tolist(), pa.float64()),
            "abs_err": pa.array(err, pa.float64()),
            "bound": pa.array([bound] * len(m), pa.float64()),
            "within_bound": pa.array(
                (err <= bound).astype(np.int64), pa.int64()
            ),
        }
    )


def _sql_q210() -> str:
    parts = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(l_extendedprice, {q}) AS value "
        "FROM lineitem"
        for q in Q210_QS
    )
    return f"""
WITH exact AS ({parts}),
appr AS ({SQL_Q127.replace("ORDER BY q", "")}),
s AS (SELECT round((max(l_extendedprice) - min(l_extendedprice))
              / CAST(1024 AS DOUBLE), 6) AS bound
      FROM lineitem)
SELECT exact.q, exact.value, appr.value_est,
       round(abs(appr.value_est - exact.value), 6) AS abs_err,
       s.bound,
       CASE WHEN round(abs(appr.value_est - exact.value), 6) <= s.bound
            THEN 1 ELSE 0 END AS within_bound
FROM exact JOIN appr USING (q), s ORDER BY exact.q
"""


def q211_source_quality_ci(sf_dir: str):
    """Per-source mean quality score with an exact-moment 95% normal
    confidence interval — the 'is source A actually better than B or
    is it noise' table a curation run reads before reweighting
    sources (q196 gates WITHIN a source; this compares ACROSS them).
    One streamed q64 scoring pass emits (source, n, sum, sumsq)
    integer block partials (basis-point scores — exact int64 sums,
    order-independent); the sources-bounded aggregation closes and the
    mean/std/CI are single shared IEEE expressions over exact integers
    (the q154 explicit-moments discipline — an engine-native stddev
    would diverge by accumulation order)."""
    import numpy as np

    from barks_ocr_ray.functions.inference import QualityModel

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    qm = QualityModel()

    def _moments(t: pa.Table) -> pa.Table:
        s = qm(t)
        bp = round_like_duckdb(
            s.column("quality_score").to_numpy(zero_copy_only=False)
            * 10000.0,
            0,
        ).astype(np.int64)
        src = np.asarray(t.column("source").to_pylist())
        out_s, out_n, out_sum, out_sq = [], [], [], []
        for sv in np.unique(src):
            m = src == sv
            out_s.append(str(sv))
            out_n.append(int(m.sum()))
            out_sum.append(int(bp[m].sum()))
            out_sq.append(int((bp[m] * bp[m]).sum()))
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "s1": pa.array(out_sum, pa.int64()),
                "s2": pa.array(out_sq, pa.int64()),
            }
        )

    g = (
        docs.map_batches(_moments, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()  # sources-bounded
        .sort_values("source")
    )
    n = g["n"].to_numpy().astype(np.int64)
    s1 = g["s1"].to_numpy().astype(np.int64)
    s2 = g["s2"].to_numpy().astype(np.int64)
    mean = round_like_duckdb(s1.astype(np.float64) / n, 4)
    var = np.where(
        n > 1,
        np.maximum(
            (s2.astype(np.float64) - (s1 * s1).astype(np.float64) / n)
            / np.maximum(n - 1, 1),
            0.0,
        ),
        0.0,
    )
    ci = round_like_duckdb(1.96 * np.sqrt(var / n), 4)
    return pa.table(
        {
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n_docs": pa.array(n, pa.int64()),
            "mean_bp": pa.array(mean, pa.float64()),
            "ci95_bp": pa.array(ci, pa.float64()),
        }
    )


def _sql_q211() -> str:
    return f"""
WITH sc AS (SELECT doc_id, quality_score FROM ({_sql_q64()})),
j AS (SELECT d.source,
             CAST(round(quality_score * 10000, 0) AS BIGINT) AS bp
      FROM sc JOIN documents d USING (doc_id)),
m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bp) AS BIGINT) AS s1,
             CAST(sum(bp * bp) AS BIGINT) AS s2
      FROM j GROUP BY 1)
SELECT source, n AS n_docs,
       round(CAST(s1 AS DOUBLE) / n, 4) AS mean_bp,
       round(1.96 * sqrt(
         (CASE WHEN n > 1 THEN greatest(
            (CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / n)
              / greatest(n - 1, 1), 0.0)
          ELSE 0.0 END) / n), 4) AS ci95_bp
FROM m ORDER BY source
"""


def q212_neardup_provenance(sf_dir: str):
    """Near-dup provenance matrix: the q19 MinHash pair stream rolled
    up by (source_a, source_b) — q202 answers 'who copies whom
    EXACTLY'; this answers 'who paraphrases/templates whom' (the pairs
    exact hashing can't see). Distributed shape: the pair stream joins
    the (doc_id, source) projection twice on compacted inputs (pairs
    never land on the driver), the source pair normalizes to
    (min, max) vectorized, and the rollup is sources^2-bounded.
    Oracle: the committed q19 golden pairs re-labeled by SQL joins."""
    import numpy as np

    from barks_ocr_ray.functions.dedupe import minhash_near_dups
    from barks_ocr_ray.functions.relational import compact_nonempty

    np_ = hash_partitions(4)
    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"]).materialize()
    pairs = minhash_near_dups(
        docs.select_columns(["doc_id", "text"]), threshold=0.4
    )
    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        }
    )
    pairs_c, n_pairs = compact_nonempty(pairs, np_)
    if n_pairs == 0:
        return empty
    src = docs.select_columns(["doc_id", "source"])
    src_c, _ = compact_nonempty(src, np_)

    def _as(cid: str, csrc: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({cid: t.column("doc_id"), csrc: t.column("source")})

        return _f

    j1 = pairs_c.join(
        src_c.map_batches(_as("doc_a", "src_a"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=np_,
        on=("doc_a",),
    )
    j1_c, n_j1 = compact_nonempty(j1, np_)  # joins need schema-ful blocks
    if n_j1 == 0:
        return empty
    j = j1_c.join(
        src_c.map_batches(_as("doc_b", "src_b"), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=np_,
        on=("doc_b",),
    )

    def _norm(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("src_a").to_pylist())
        b = np.asarray(t.column("src_b").to_pylist())
        swap = a > b  # np.minimum has no unicode loop; compare + where
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        out_a, out_b, out_n = [], [], []
        seen: dict = {}
        for x, y in zip(lo, hi):
            seen[(x, y)] = seen.get((x, y), 0) + 1
        for (x, y), c in sorted(seen.items()):
            out_a.append(x)
            out_b.append(y)
            out_n.append(c)
        return pa.table(
            {
                "source_a": pa.array(out_a, pa.string()),
                "source_b": pa.array(out_b, pa.string()),
                "n_pairs": pa.array(out_n, pa.int64()),
            }
        )

    out = (
        j.map_batches(_norm, batch_format="pyarrow")
        .groupby(["source_a", "source_b"], num_partitions=2)
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()  # sources^2-bounded
    )
    out = out.sort_values(["source_a", "source_b"]) if len(out) else out
    return pa.table(
        {
            "source_a": pa.array(
                out["source_a"].tolist() if len(out) else [], pa.string()
            ),
            "source_b": pa.array(
                out["source_b"].tolist() if len(out) else [], pa.string()
            ),
            "n_pairs": pa.array(
                out["n_pairs"].tolist() if len(out) else [], pa.int64()
            ),
        }
    )


def _sql_q212() -> str:
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    return f"""
WITH p AS (
  SELECT doc_a, doc_b
  FROM read_parquet('{neardup_golden_path("minhash_pairs")}')
  WHERE corpus_tag = {corpus_tag_sql("documents")}),
j AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM p JOIN documents da ON p.doc_a = da.doc_id
         JOIN documents db ON p.doc_b = db.doc_id)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


def q213_markov_backtest(sf_dir: str):
    """Next-event prediction backtest: train a first-order Markov
    predictor (argmax next-type per previous type, ties type-asc) on
    the TRAIN users' transitions and score top-1 accuracy on the TEST
    users', against the marginal most-common-next baseline — the
    model-eval shape (fit on one split, measure on the other, compare
    to a dumb baseline) applied to the q144 transition kernel.

    Execution: ONE user-keyed exchange colocates each user's events;
    a vectorized per-block pass (lexsort + boundary mask — q144)
    emits (side, prev, next) COUNT partials, so the only aggregation
    is event-types^2-bounded and the whole fit/score closes on the
    driver from that table. Unseen-prev test transitions score as
    wrong (the LEFT JOIN null rule)."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def _trans(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        st = np.asarray(t.column("event_type").to_pylist())
        order = np.lexsort((eid, ts, us))
        us, st = us[order], st[order]
        same = us[1:] == us[:-1]
        side = ((us[:-1][same] % 10) >= 7).astype(np.int64)
        a, b = st[:-1][same], st[1:][same]
        g = (
            pa.table(
                {
                    "side": pa.array(side, pa.int64()),
                    "prev": pa.array(a.tolist(), pa.string()),
                    "nxt": pa.array(b.tolist(), pa.string()),
                }
            )
            .group_by(["side", "prev", "nxt"])
            .aggregate([("side", "count")])
        )
        return g.rename_columns(["side", "prev", "nxt", "n"])

    tbl = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_trans, batch_format="pyarrow", batch_size=None)
        .groupby(["side", "prev", "nxt"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # event-types^2 x 2 bounded
    )
    train = tbl[tbl["side"] == 0]
    test = tbl[tbl["side"] == 1]
    # per-prev argmax (count desc, next asc) and the marginal argmax
    pred: dict = {}
    for prev, grp in train.groupby("prev"):
        best = grp.sort_values(["n", "nxt"], ascending=[False, True]).iloc[0]
        pred[prev] = best["nxt"]
    marg = None
    if len(train):
        mm = (
            train.groupby("nxt")["n"]
            .sum()
            .reset_index()
            .sort_values(["n", "nxt"], ascending=[False, True])
        )
        marg = mm.iloc[0]["nxt"]
    n_test = int(test["n"].sum()) if len(test) else 0
    n_markov = int(
        test[test.apply(lambda r: pred.get(r["prev"]) == r["nxt"], axis=1)][
            "n"
        ].sum()
    ) if len(test) else 0
    n_marg = int(test[test["nxt"] == marg]["n"].sum()) if len(test) else 0

    def _bp(c):
        if n_test == 0:
            return 0
        import numpy as np

        return int(round_like_duckdb(np.array([1e4 * c / n_test]), 0)[0])

    return pa.table(
        {
            "n_test": pa.array([n_test], pa.int64()),
            "n_correct_markov": pa.array([n_markov], pa.int64()),
            "n_correct_marginal": pa.array([n_marg], pa.int64()),
            "acc_markov_bp": pa.array([_bp(n_markov)], pa.int64()),
            "acc_marginal_bp": pa.array([_bp(n_marg)], pa.int64()),
        }
    )


def _sql_q213() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
         CASE WHEN user_id % 10 < 7 THEN 0 ELSE 1 END AS side
  FROM events),
tr AS (SELECT side, event_type AS prev, nxt FROM seq WHERE nxt IS NOT NULL),
train AS (SELECT prev, nxt, count(*) AS c FROM tr WHERE side = 0
          GROUP BY 1, 2),
pred AS (SELECT prev, nxt AS p FROM train
         QUALIFY row_number() OVER (
           PARTITION BY prev ORDER BY c DESC, nxt ASC) = 1),
marg AS (SELECT nxt AS p FROM (
           SELECT nxt, sum(c) AS c FROM train GROUP BY 1)
         QUALIFY row_number() OVER (ORDER BY c DESC, nxt ASC) = 1),
test AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c FROM tr
         WHERE side = 1 GROUP BY 1, 2),
agg AS (
  SELECT CAST(coalesce(sum(test.c), 0) AS BIGINT) AS n_test,
         CAST(coalesce(sum(CASE WHEN pred.p = test.nxt THEN test.c
                           ELSE 0 END), 0) AS BIGINT) AS n_correct_markov,
         CAST(coalesce(sum(CASE WHEN marg.p = test.nxt THEN test.c
                           ELSE 0 END), 0) AS BIGINT) AS n_correct_marginal
  FROM test LEFT JOIN pred USING (prev), marg)
SELECT n_test, n_correct_markov, n_correct_marginal,
       CASE WHEN n_test = 0 THEN 0
            ELSE CAST(round(1e4 * n_correct_markov / n_test, 0) AS BIGINT)
       END AS acc_markov_bp,
       CASE WHEN n_test = 0 THEN 0
            ELSE CAST(round(1e4 * n_correct_marginal / n_test, 0) AS BIGINT)
       END AS acc_marginal_bp
FROM agg
"""


def q214_entity_cooccurrence(sf_dir: str):
    """Entity co-occurrence mining: top-20 curated-entity pairs by
    document-level PMI — which entities travel together across the
    corpus (the knowledge-graph-edge-candidate stage above q11's
    per-doc tagging and q93's token-bigram PMI). Zero doc-keyed
    exchanges: the tagger's vectorized presence pass emits
    |E|^2-bounded (pair, count) and |E|-bounded marginal partials per
    block (a doc's entities never leave its block), one bounded
    aggregation closes, and PMI/top-20 resolve on the driver. PMI
    rounds to micro-nats (q137 discipline) so the oracle replays the
    ranking bit-exactly (ties pair-asc)."""
    import numpy as np

    from barks_ocr_ray.functions.tagging import CURATED_ENTITIES, EntityTagger

    names = sorted(CURATED_ENTITIES)
    tagger = EntityTagger()
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def _partial(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks().fill_null("")
        lower = pc.utf8_lower(text)
        present = np.stack(
            [
                pc.count_substring_regex(lower, tagger.patterns[nm])
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                > 0
                for nm in names
            ],
            axis=1,
        )  # (rows, |E|)
        out_a, out_b, out_c = [], [], []
        for i, a in enumerate(names):
            ca = int(present[:, i].sum())
            if ca:
                out_a.append(a)
                out_b.append("")  # marginal row
                out_c.append(ca)
            for jx in range(i + 1, len(names)):
                cab = int((present[:, i] & present[:, jx]).sum())
                if cab:
                    out_a.append(a)
                    out_b.append(names[jx])
                    out_c.append(cab)
        return pa.table(
            {
                "ea": pa.array(out_a, pa.string()),
                "eb": pa.array(out_b, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    agg = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby(["ea", "eb"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # |E|^2-bounded
    )
    marg = {
        r.ea: int(r.c) for r in agg[agg["eb"] == ""].itertuples()
    }
    pairs = agg[agg["eb"] != ""]
    rows = []
    for r in pairs.itertuples():
        pmi = int(
            round_like_duckdb(
                np.array(
                    [1e6 * np.log(float(r.c) * n_docs / (marg[r.ea] * marg[r.eb]))]
                ),
                0,
            )[0]
        )
        rows.append((r.ea, r.eb, int(r.c), pmi))
    rows.sort(key=lambda x: (-x[3], x[0], x[1]))
    rows = rows[:20]
    return pa.table(
        {
            "ea": pa.array([r[0] for r in rows], pa.string()),
            "eb": pa.array([r[1] for r in rows], pa.string()),
            "n_docs_both": pa.array([r[2] for r in rows], pa.int64()),
            "pmi_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_q214() -> str:
    from barks_ocr_ray.functions.tagging import CURATED_ENTITIES

    presence = "\nUNION ALL\n".join(
        f"""SELECT doc_id, '{nm}' AS name FROM documents
WHERE len(regexp_extract_all(lower(text), '\\b{nm}\\b')) > 0"""
        for nm in sorted(CURATED_ENTITIES)
    )
    return f"""
WITH e AS ({presence}),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
m AS (SELECT name, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1),
p AS (SELECT a.name AS ea, b.name AS eb, CAST(count(*) AS BIGINT) AS cab
      FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.name < b.name
      GROUP BY 1, 2),
s AS (SELECT ea, eb, cab,
             CAST(round(1e6 * ln(CAST(cab AS DOUBLE) * n.n
                                 / (ma.c * mb.c)), 0) AS BIGINT) AS pmi_micro
      FROM p JOIN m ma ON ma.name = p.ea JOIN m mb ON mb.name = p.eb, n)
SELECT ea, eb, cab AS n_docs_both, pmi_micro FROM s
QUALIFY row_number() OVER (ORDER BY pmi_micro DESC, ea, eb) <= 20
ORDER BY pmi_micro DESC, ea, eb
"""


def q215_split_leakage(sf_dir: str):
    """Train/test split leakage audit: how many TEST documents have a
    near-duplicate (q19 MinHash pair) in TRAIN — the eval-integrity
    number behind 'dedup across splits, not just within' (a hash split
    q113 randomizes WHICH side a doc lands on, but near-identical docs
    land independently, so paraphrase leakage survives unless it's
    measured and cleaned). Split membership is a pure function of
    doc_id (the q113 md5-fraction bounds), so the pair stream labels
    both sides IN BLOCK with zero joins; leaked test ids dedup through
    one bounded keyed aggregation. Oracle: the committed q19 golden
    pairs re-labeled by the same SQL fraction expressions."""
    import numpy as np

    from barks_ocr_ray.functions.dedupe import minhash_near_dups
    from barks_ocr_ray.functions.hashing import unit_fractions
    from barks_ocr_ray.functions.relational import compact_nonempty

    docs = read_table(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def _n_test(t: pa.Table) -> pa.Table:
        u = unit_fractions(t.column("doc_id").to_pylist(), method="md5")
        return pa.table(
            {"c": pa.array([int((u >= 0.9).sum())], pa.int64())}
        )

    n_test = int(
        docs.map_batches(_n_test, batch_format="pyarrow").sum("c") or 0
    )
    pairs = minhash_near_dups(docs, threshold=0.4)
    pairs_c, n_pairs = compact_nonempty(pairs, hash_partitions(4))
    n_leaked = 0
    if n_pairs:

        def _leaked(t: pa.Table) -> pa.Table:
            a = t.column("doc_a").to_numpy(zero_copy_only=False)
            b = t.column("doc_b").to_numpy(zero_copy_only=False)
            ua = unit_fractions(a.tolist(), method="md5")
            ub = unit_fractions(b.tolist(), method="md5")
            leak_a = (ua >= 0.9) & (ub < 0.8)  # a test, b train
            leak_b = (ub >= 0.9) & (ua < 0.8)
            ids = np.unique(np.concatenate((a[leak_a], b[leak_b])))
            return pa.table({"doc_id": pa.array(ids, pa.int64())})

        leaked = (
            pairs_c.map_batches(_leaked, batch_format="pyarrow")
            .groupby("doc_id", num_partitions=2)
            .aggregate(Count(alias_name="_n"))
        )
        n_leaked = leaked.count()
    bp = (
        int(round_like_duckdb(np.array([1e4 * n_leaked / n_test]), 0)[0])
        if n_test
        else 0
    )
    return pa.table(
        {
            "n_test": pa.array([n_test], pa.int64()),
            "n_leaked": pa.array([n_leaked], pa.int64()),
            "leak_bp": pa.array([bp], pa.int64()),
        }
    )


def _sql_q215() -> str:
    from barks_ocr_ray.oracle_data import corpus_tag_sql, neardup_golden_path

    u = (
        "CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 8)) "
        "AS UBIGINT) / 4294967296.0"
    )
    ua, ub, ud = (u.format(col=c) for c in ("doc_a", "doc_b", "doc_id"))
    return f"""
WITH p AS (
  SELECT doc_a, doc_b
  FROM read_parquet('{neardup_golden_path("minhash_pairs")}')
  WHERE corpus_tag = {corpus_tag_sql("documents")}),
lab AS (SELECT doc_a, doc_b, {ua} AS ua, {ub} AS ub FROM p),
leaked AS (
  SELECT doc_a AS doc_id FROM lab WHERE ua >= 0.9 AND ub < 0.8
  UNION
  SELECT doc_b FROM lab WHERE ub >= 0.9 AND ua < 0.8),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_test
      FROM documents WHERE {ud} >= 0.9),
l AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked FROM leaked)
SELECT t.n_test, l.n_leaked,
       CASE WHEN t.n_test = 0 THEN 0
            ELSE CAST(round(1e4 * l.n_leaked / t.n_test, 0) AS BIGINT)
       END AS leak_bp
FROM t, l
"""


def q216_term_drift(sf_dir: str):
    """Term-level drift: the 20 terms whose corpus frequency SHARE
    moved most between the prior and new snapshots (q130/q134/q137's
    split convention) — the 'what changed in the crawl' report at
    vocabulary resolution (q137 scores whole docs; this names the
    terms). One tokenize pass ships (term, side) count partials into a
    vocab-bounded aggregation; shares, micro-deltas and the top-20
    rank (|delta| desc, term asc) close on the driver from the
    vocab-sized table — at web scale the final rank runs the q71
    heavy-hitter pre-filter first (documented; the fixture vocab is
    rank-bounded as-is)."""
    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, Tokenizer

    tok = Tokenizer()
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _counts(t: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        sides: dict = {0: _Counter(), 1: _Counter()}
        for did, s in zip(
            t.column("doc_id").to_pylist(), t.column("text")
        ):
            sides[1 if (did % 10) >= 7 else 0].update(
                tok.tokens(s.as_py() or "")
            )
        out_t, out_s, out_c = [], [], []
        for side, cnt in sides.items():
            out_t.extend(cnt.keys())
            out_s.extend([side] * len(cnt))
            out_c.extend(cnt.values())
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "side": pa.array(out_s, pa.int64()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    g = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["term", "side"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # vocab-bounded
    )
    n0 = int(g.loc[g["side"] == 0, "c"].sum())
    n1 = int(g.loc[g["side"] == 1, "c"].sum())
    wide: dict = {}
    for r in g.itertuples():
        wide.setdefault(r.term, [0, 0])[int(r.side)] = int(r.c)
    rows = []
    for term, (c0, c1) in wide.items():
        s0 = c0 / n0 if n0 else 0.0
        s1 = c1 / n1 if n1 else 0.0
        d = int(round_like_duckdb(np.array([1e6 * (s1 - s0)]), 0)[0])
        rows.append((term, c0, c1, d))
    rows.sort(key=lambda x: (-abs(x[3]), x[0]))
    rows = rows[:20]
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "n_prior": pa.array([r[1] for r in rows], pa.int64()),
            "n_new": pa.array([r[2] for r in rows], pa.int64()),
            "delta_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_q216() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT CASE WHEN doc_id % 10 >= 7 THEN 1 ELSE 0 END AS side,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
g AS (SELECT term, side, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2),
n AS (SELECT CAST(coalesce(sum(CASE WHEN side = 0 THEN c END), 0) AS BIGINT)
               AS n0,
             CAST(coalesce(sum(CASE WHEN side = 1 THEN c END), 0) AS BIGINT)
               AS n1
      FROM g),
w AS (SELECT term,
             CAST(coalesce(sum(CASE WHEN side = 0 THEN c END), 0) AS BIGINT)
               AS c0,
             CAST(coalesce(sum(CASE WHEN side = 1 THEN c END), 0) AS BIGINT)
               AS c1
      FROM g GROUP BY 1),
d AS (SELECT term, c0 AS n_prior, c1 AS n_new,
             CAST(round(1e6 * (
               (CASE WHEN n.n1 = 0 THEN 0.0 ELSE c1 / n.n1 END)
               - (CASE WHEN n.n0 = 0 THEN 0.0 ELSE c0 / n.n0 END)), 0)
                  AS BIGINT) AS delta_micro
      FROM w, n)
SELECT term, n_prior, n_new, delta_micro FROM d
QUALIFY row_number() OVER (ORDER BY abs(delta_micro) DESC, term) <= 20
ORDER BY abs(delta_micro) DESC, term
"""


def q217_shuffle_quality(sf_dir: str):
    """Shuffle-quality audit of the dataset ORDER: how much more often
    do adjacent docs (doc_id rank order) share a source than an
    independent shuffle would predict?  clustering_micro > 1e6 means
    the corpus is still source-clustered — a training run streaming it
    in order sees correlated batches.  Distributed shape: one range
    sort on doc_id (the op IS an order audit, so the range exchange is
    inherent), then each batch emits O(1) partials (internal pair
    counts + its first/last endpoint rows) and the driver stitches the
    batches-bounded boundary pairs; the expected rate comes from a
    sources-bounded count aggregate.  No corpus-scale driver state."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "source"])

    def _pair_partials(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        src = t.column("source").to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="mergesort")  # already sorted; cheap
        did, src = did[order], src[order]
        n_same = int(np.sum(src[1:] == src[:-1])) if len(src) > 1 else 0
        return pa.table(
            {
                "n_pairs": pa.array([max(len(src) - 1, 0)], pa.int64()),
                "n_same": pa.array([n_same], pa.int64()),
                "first_id": pa.array([int(did[0])], pa.int64()),
                "last_id": pa.array([int(did[-1])], pa.int64()),
                "first_src": pa.array([str(src[0])], pa.string()),
                "last_src": pa.array([str(src[-1])], pa.string()),
            }
        )

    def _src_counts(t: pa.Table) -> pa.Table:
        return (
            pa.table({"source": t.column("source")})
            .group_by("source")
            .aggregate([("source", "count")])
            .rename_columns(["source", "c"])
        )

    parts = (
        docs.sort("doc_id")
        .map_batches(_pair_partials, batch_format="pyarrow")
        .take_all()  # batches-bounded
    )
    counts = (
        docs.map_batches(_src_counts, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # sources-bounded
    )
    empty = pa.table(
        {
            "n_docs": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "n_same": pa.array([], pa.int64()),
            "same_micro": pa.array([], pa.int64()),
            "exp_micro": pa.array([], pa.int64()),
            "clustering_micro": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    parts.sort(key=lambda r: r["first_id"])
    n_pairs = sum(int(r["n_pairs"]) for r in parts)
    n_same = sum(int(r["n_same"]) for r in parts)
    for a, b in zip(parts, parts[1:]):  # boundary pairs between batches
        n_pairs += 1
        n_same += int(a["last_src"] == b["first_src"])
    if n_pairs <= 0:
        return empty
    n_docs = sum(int(r["c"]) for r in counts)
    num = sum(int(r["c"]) * (int(r["c"]) - 1) for r in counts)  # exact
    den = n_docs * (n_docs - 1)
    same_micro = int(round_like_duckdb(1e6 * float(n_same) / float(n_pairs), 0))
    exp_micro = int(round_like_duckdb(1e6 * float(num) / float(den), 0))
    if num > 0:
        ratio = (1e6 * float(n_same * den)) / float(n_pairs * num)
        clustering = pa.array([int(round_like_duckdb(ratio, 0))], pa.int64())
    else:
        clustering = pa.nulls(1, pa.int64())
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_same": pa.array([n_same], pa.int64()),
            "same_micro": pa.array([same_micro], pa.int64()),
            "exp_micro": pa.array([exp_micro], pa.int64()),
            "clustering_micro": clustering,
        }
    )


SQL_Q217 = """
WITH o AS (SELECT doc_id, source,
                  lag(source) OVER (ORDER BY doc_id) AS prev
           FROM documents),
p AS (SELECT CAST(count(*) FILTER (WHERE prev IS NOT NULL) AS BIGINT)
               AS n_pairs,
             CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
                                     AND source = prev THEN 1 END), 0)
                  AS BIGINT) AS n_same
      FROM o),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
e AS (SELECT CAST(coalesce(sum(CAST(c AS HUGEINT) * (c - 1)), 0)
                  AS HUGEINT) AS num
      FROM (SELECT count(*) AS c FROM documents GROUP BY source))
SELECT s.n_docs, p.n_pairs, p.n_same,
       CAST(round(1e6 * p.n_same / p.n_pairs, 0) AS BIGINT) AS same_micro,
       CAST(round(1e6 * e.num / (s.n_docs * (s.n_docs - 1)), 0) AS BIGINT)
         AS exp_micro,
       CASE WHEN e.num > 0 THEN
         CAST(round(1e6 * (CAST(p.n_same AS HUGEINT)
                           * s.n_docs * (s.n_docs - 1))
                    / (CAST(p.n_pairs AS HUGEINT) * e.num), 0) AS BIGINT)
       ELSE NULL END AS clustering_micro
FROM s, p, e
WHERE p.n_pairs > 0
"""


Q218_BATCH = 100  #: docs per crawl batch (doc_id // Q218_BATCH)


def q218_novelty_curve(sf_dir: str):
    """N-gram novelty curve — the dedup-ROI report: per crawl batch
    (doc_id // Q218_BATCH), the fraction of its DISTINCT token trigrams
    never seen in any earlier batch (Lee et al.'s dedup-payoff framing
    at batch resolution: a flattening curve means new crawls add mostly
    known content).  Plan: block kernels emit locally-distinct
    (batch, ngram) pairs; ONE ngram-keyed exchange colocates each gram
    so first-batch + novelty are block-local vectorized kernels; what
    shuffles back is (batch, n_grams, n_novel) partials and the final
    table is batches-bounded (the report's own resolution)."""
    import numpy as np

    from barks_ocr_ray.functions.curation import _BlockNgramDF

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    B = Q218_BATCH  # closure-captured for the worker body

    class _BatchGramPairs(_BlockNgramDF):
        def __call__(self, batch: pa.Table) -> pa.Table:
            pairs = set()
            for did, s in zip(
                batch.column("doc_id").to_pylist(), batch.column("text")
            ):
                b = did // B
                for g in set(self._doc_grams(s.as_py())):
                    pairs.add((b, g))
            return pa.table(
                {
                    "batch_id": pa.array([p[0] for p in pairs], pa.int64()),
                    "ngram": pa.array([p[1] for p in pairs], pa.string()),
                }
            )

    def _first_batch_stats(t: pa.Table) -> pa.Table:
        """All rows of an ngram are colocated in this block (keyed
        repartition, whole-block batches): block-local min IS the
        global first batch."""
        enc = t.column("ngram").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("batch_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, codes))
        codes_s, b_s = codes[order], b[order]
        keep = np.ones(len(codes_s), np.bool_)  # distinct (code, batch)
        keep[1:] = (codes_s[1:] != codes_s[:-1]) | (b_s[1:] != b_s[:-1])
        codes_d, b_d = codes_s[keep], b_s[keep]
        new = np.ones(len(codes_d), np.bool_)
        new[1:] = codes_d[1:] != codes_d[:-1]
        grp = np.cumsum(new) - 1
        novel = (b_d == b_d[np.flatnonzero(new)][grp]).astype(np.int64)
        part = pa.table(
            {
                "batch_id": pa.array(b_d, pa.int64()),
                "novel": pa.array(novel, pa.int64()),
            }
        )
        return (
            part.group_by("batch_id")
            .aggregate([("novel", "sum"), ("batch_id", "count")])
            .rename_columns(["batch_id", "n_novel", "n_grams"])
        )

    stats = {
        int(r["batch_id"]): (int(r["n_grams"]), int(r["n_novel"]))
        for r in (
            docs.map_batches(
                _BatchGramPairs,
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .repartition(hash_partitions(8), keys=["ngram"])
            .map_batches(_first_batch_stats, batch_format="pyarrow")
            .groupby("batch_id", num_partitions=2)
            .aggregate(
                Sum("n_grams", alias_name="n_grams"),
                Sum("n_novel", alias_name="n_novel"),
            )
            .take_all()  # batches-bounded
        )
    }

    def _doc_counts(t: pa.Table) -> pa.Table:
        b = pc.divide(t.column("doc_id"), pa.scalar(Q218_BATCH, pa.int64()))
        k = pa.table({"batch_id": b})
        return (
            k.group_by("batch_id")
            .aggregate([("batch_id", "count")])
            .rename_columns(["batch_id", "n_docs"])
        )

    ndocs = (
        docs.map_batches(_doc_counts, batch_format="pyarrow")
        .groupby("batch_id", num_partitions=2)
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )
    ndocs.sort(key=lambda r: r["batch_id"])
    out_b, out_d, out_g, out_n, out_m = [], [], [], [], []
    for r in ndocs:
        b = int(r["batch_id"])
        n_grams, n_novel = stats.get(b, (0, 0))
        out_b.append(b)
        out_d.append(int(r["n_docs"]))
        out_g.append(n_grams)
        out_n.append(n_novel)
        out_m.append(
            int(round_like_duckdb(1e6 * float(n_novel) / float(n_grams), 0))
            if n_grams > 0
            else None
        )
    return pa.table(
        {
            "batch_id": pa.array(out_b, pa.int64()),
            "n_docs": pa.array(out_d, pa.int64()),
            "n_grams": pa.array(out_g, pa.int64()),
            "n_novel": pa.array(out_n, pa.int64()),
            "novel_micro": pa.array(out_m, pa.int64()),
        }
    )


def _sql_q218() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
g AS (
  SELECT doc_id, list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
  FROM t WHERE len(toks) >= 3),
e AS (SELECT CAST(doc_id // {Q218_BATCH} AS BIGINT) AS batch_id,
             unnest(grams) AS ngram
      FROM g),
d AS (SELECT DISTINCT batch_id, ngram FROM e),
f AS (SELECT ngram, min(batch_id) AS fb FROM d GROUP BY 1),
bg AS (SELECT d.batch_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN d.batch_id = f.fb THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_novel
       FROM d JOIN f USING (ngram) GROUP BY 1),
nb AS (SELECT CAST(doc_id // {Q218_BATCH} AS BIGINT) AS batch_id,
              CAST(count(*) AS BIGINT) AS n_docs
       FROM documents GROUP BY 1)
SELECT nb.batch_id, nb.n_docs,
       CAST(coalesce(bg.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(bg.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN coalesce(bg.n_grams, 0) > 0
         THEN CAST(round(1e6 * bg.n_novel / bg.n_grams, 0) AS BIGINT)
       ELSE NULL END AS novel_micro
FROM nb LEFT JOIN bg USING (batch_id)
ORDER BY nb.batch_id
"""


Q219_TTR_PCT = 65  #: type-token-ratio keep gate: 100*distinct >= PCT*total




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
