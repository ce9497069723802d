from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b06_sessions_stats_drift import *  # noqa: F401,F403

def q248_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup ratio — the STORAGE-level
    dedup report (how many bytes a chunk store would actually hold)
    that complements the document-level q07/q19 family: shift-resistant
    chunk boundaries find shared byte runs even when whole docs differ.
    Plan: one doc pass runs the shared cdc_chunks kernel and emits the
    (key, size) chunk stream; ONE chunk-key exchange colocates each
    fingerprint so block-local distinct + min-size IS global; the
    pre-dedup totals fold in the SAME post-shuffle pass (repartition
    preserves rows), so nothing is read twice and only O(1) partials
    per block return."""
    from barks_ocr_ray.functions.storage import cdc_chunks

    import numpy as np

    docs = read_table(sf_dir, "documents", ["text"])

    def _chunks(t: pa.Table) -> pa.Table:
        keys: list[int] = []
        sizes: list[int] = []
        for s in t.column("text"):
            v = s.as_py()
            if v is None:
                continue
            k, z = cdc_chunks(v.encode("utf-8"))
            keys.extend(k)
            sizes.extend(z)
        return pa.table(
            {
                "key": pa.array(
                    np.asarray(keys, np.uint64).astype(np.int64)
                ),
                "size": pa.array(sizes, pa.int64()),
            }
        )

    def _partials(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("size", "min")])
        sz = t.column("size")
        szu = g.column("size_min")
        return pa.table(
            {
                "n_chunks": pa.array([t.num_rows], pa.int64()),
                "total_bytes": pa.array(
                    [int(pc.sum(sz).as_py() or 0)], pa.int64()
                ),
                "n_unique_chunks": pa.array([g.num_rows], pa.int64()),
                "unique_bytes": pa.array(
                    [int(pc.sum(szu).as_py() or 0)], pa.int64()
                ),
            }
        )

    parts = (
        docs.map_batches(_chunks, batch_format="pyarrow")
        .repartition(hash_partitions(8), keys=["key"])
        .map_batches(_partials, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    total = sum(int(r["total_bytes"]) for r in parts)
    n_chunks = sum(int(r["n_chunks"]) for r in parts)
    n_uniq = sum(int(r["n_unique_chunks"]) for r in parts)
    ub = sum(int(r["unique_bytes"]) for r in parts)
    ratio = int(round_like_duckdb(1e6 * ub / total, 0)) if total > 0 else 0
    return pa.table(
        {
            "total_bytes": pa.array([total], pa.int64()),
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_unique_chunks": pa.array([n_uniq], pa.int64()),
            "unique_bytes": pa.array([ub], pa.int64()),
            "ratio_micro": pa.array([ratio], pa.int64()),
        }
    )


def q249_pca_top_component(sf_dir: str):
    """Distributed PCA top principal component of the embedding corpus
    — the spectrum-level geometry audit beside q208's isotropy scalar
    (which direction dominates, and by how much). Exactness discipline:
    vectors quantize to int64 fixed point (shared kernel), each block
    ships its EXACT integer scatter (n, column sums, X^T X as (i, j)
    triplets), one d²-bounded keyed aggregation merges them, and the
    power iteration runs once driver-side on the d x d matrix — so the
    distributed run and the sequential golden agree bit-for-bit no
    matter the partitioning."""
    import numpy as np

    from barks_ocr_ray.functions.ann import (
        _emb_matrix,
        pca_top_component,
        quantize_micro_matrix,
    )

    emb = read_table(sf_dir, "embeddings", ["embedding"])

    def _scatter(t: pa.Table) -> pa.Table:
        x = quantize_micro_matrix(_emb_matrix(t))
        d = x.shape[1]
        c = x.T @ x
        s = x.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        i = np.concatenate([ii.ravel(), np.arange(d), [-1]])
        j = np.concatenate([jj.ravel(), np.full(d, -1), [-1]])
        v = np.concatenate([c.ravel(), s, [x.shape[0]]])
        return pa.table(
            {
                "i": pa.array(i, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    # block partials are (d^2 + d + 1)-row tables of exact ints, so the
    # merge is pure integer addition wherever it runs. Skip the keyed
    # exchange: take_all the per-block partials and fold driver-side —
    # bounded by block_count x d^2 (d=64 -> ~33 KB/block), which holds
    # far past this corpus; a corpus whose block count made that matter
    # would reintroduce the d^2-keyed aggregation (the previous shape,
    # kept in git) as a tree-reduce. Measured: the 4098-key
    # HashAggregate spin-up dominated a 500-row input (7.4 s -> ~1.5 s).
    parts = emb.map_batches(_scatter, batch_format="pyarrow").take_all()
    d = max(int(r["i"]) for r in parts) + 1
    n = 0
    s = np.zeros(d, np.int64)
    c = np.zeros((d, d), np.int64)
    for r in parts:
        i, j, v = int(r["i"]), int(r["j"]), int(r["v"])
        if i == -1:
            n += v
        elif j == -1:
            s[i] += v
        else:
            c[i, j] += v
    vec, share = pca_top_component(n, s, c)
    share_micro = int(round_like_duckdb(1e6 * share, 0))
    load = round_like_duckdb(1e6 * vec, 0).astype(np.int64)
    return pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "loading_micro": pa.array(load, pa.int64()),
            "eig_share_micro": pa.array([share_micro] * d, pa.int64()),
        }
    )


def q250_new_returning_users(sf_dir: str):
    """Daily new vs returning active users — the growth-accounting
    report every event pipeline publishes (DAU split by first-ever-day).
    Plan: ONE user-keyed exchange colocates each user's history, so
    per-block distinct (user, day) pairs AND first-day flags are
    global facts; what shuffles onward is days-bounded (day, active,
    new) partials, and the derived returning column is a vectorized
    subtract on the bounded result."""
    import numpy as np

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _block(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        day = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY
        )
        order = np.lexsort((day, us))
        us, day = us[order], day[order]
        keep = np.ones(len(us), np.bool_)  # distinct (user, day)
        keep[1:] = (us[1:] != us[:-1]) | (day[1:] != day[:-1])
        us, day = us[keep], day[keep]
        first = np.ones(len(us), np.bool_)
        first[1:] = us[1:] != us[:-1]
        g = (
            pa.table(
                {
                    "day": pa.array(day, pa.int64()),
                    "new": pa.array(first.astype(np.int64)),
                }
            )
            .group_by("day")
            .aggregate([("new", "count"), ("new", "sum")])
        )
        return g.rename_columns(["day", "n_active", "n_new"])

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.multiply(
                    t.column("day"), pa.scalar(DAY, pa.int64())
                ).cast(pa.timestamp("us")),
                "n_active": t.column("n_active"),
                "n_new": t.column("n_new"),
                "n_returning": pc.subtract(
                    t.column("n_active"), t.column("n_new")
                ),
            }
        )

    return (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_block, batch_format="pyarrow", batch_size=None)
        .groupby("day", num_partitions=2)
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_new", alias_name="n_new"),
        )
        .map_batches(_finish, batch_format="pyarrow")
    )


SQL_Q250 = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
f AS (SELECT user_id, min(day) AS fday FROM ud GROUP BY 1)
SELECT ud.day AS day, CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN ud.day = f.fday THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(count(*)
            - sum(CASE WHEN ud.day = f.fday THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning
FROM ud JOIN f ON ud.user_id = f.user_id
GROUP BY 1 ORDER BY 1
"""


def q251_transition_entropy(sf_dir: str):
    """Conditional next-event entropy per preceding event type — the
    sequence-predictability audit beside q213's top-1 backtest (a
    high-entropy row means no model will predict that successor well;
    Shannon, nats). Plan: the q144 transition kernel (ONE user-keyed
    exchange, per-block lexsort + boundary-masked adjacent pairs) ships
    |types|^2-bounded count partials; the entropy closes on the driver
    table with per-cell micro rounding BEFORE the integer sum, so float
    accumulation order cannot leak in."""
    import math

    import numpy as np

    ev = read_table(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )

    def _pairs(t: pa.Table) -> pa.Table:
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
                    "prev": pa.array(a.tolist(), pa.string()),
                    "next": pa.array(b.tolist(), pa.string()),
                }
            )
            .group_by(["prev", "next"])
            .aggregate([("prev", "count")])
        )
        return g.rename_columns(["prev", "next", "c"])

    cells = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["prev", "next"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    by_prev: dict = {}
    for r in cells:
        by_prev.setdefault(r["prev"], []).append(int(r["c"]))
    out_p, out_n, out_h = [], [], []
    for prev in sorted(by_prev):
        cs = by_prev[prev]
        cp = sum(cs)
        h = sum(
            int(round_like_duckdb(1e6 * c / cp * math.log(cp * 1.0 / c), 0))
            for c in cs
        )
        out_p.append(prev)
        out_n.append(cp)
        out_h.append(h)
    return pa.table(
        {
            "prev": pa.array(out_p, pa.string()),
            "n_transitions": pa.array(out_n, pa.int64()),
            "h_micro": pa.array(out_h, pa.int64()),
        }
    )


SQL_Q251 = """
WITH o AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events),
c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS c
      FROM o WHERE next IS NOT NULL GROUP BY 1, 2),
p AS (SELECT prev, CAST(sum(c) AS BIGINT) AS cp FROM c GROUP BY 1)
SELECT c.prev, p.cp AS n_transitions,
       CAST(sum(CAST(round(1e6 * c.c / p.cp * ln(p.cp * 1.0 / c.c), 0)
                     AS BIGINT)) AS BIGINT) AS h_micro
FROM c JOIN p ON c.prev = p.prev
GROUP BY 1, 2 ORDER BY 1
"""


def q252_hill_tail_index(sf_dir: str):
    """Hill tail-index estimate of the doc-length distribution — the
    power-law heaviness gauge beside q174's Zipf slope (alpha near 1-2
    means giant docs dominate byte mass and packing/shard planning must
    assume a heavy tail). Tail = everything strictly above the
    k-th-largest value (k = max(n//20, 10), ties collapse into xmin).
    Plan: one (value, count) histogram aggregation (q241 bounds); the
    order-statistic walk and the per-VALUE micro-rounded log terms
    (integer-weighted, so the sum is exact) close on the driver
    histogram."""
    import math

    import numpy as np

    docs = read_table(sf_dir, "documents", ["n_chars"])

    def _hist(t: pa.Table) -> pa.Table:
        g = t.group_by("n_chars").aggregate([([], "count_all")])
        return g.rename_columns(["v", "c"])

    hist = (
        docs.map_batches(_hist, batch_format="pyarrow")
        .groupby("v", num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    empty = pa.table(
        {
            "n": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "xmin": pa.array([], pa.int64()),
            "alpha_micro": pa.array([], pa.int64()),
        }
    )
    if not hist:
        return empty
    vals = np.asarray([int(r["v"]) for r in hist], np.int64)
    cnts = np.asarray([int(r["c"]) for r in hist], np.int64)
    order = np.argsort(-vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    k_target = max(n // 20, 10)
    cum = np.cumsum(cnts)
    pos = int(np.searchsorted(cum, k_target))
    if pos >= len(vals):
        return empty
    xmin = int(vals[pos])
    k = int(cum[pos - 1]) if pos > 0 else 0
    if k == 0 or xmin <= 0:
        return empty
    sum_ln = int(
        sum(
            int(c) * int(round_like_duckdb(1e6 * math.log(v * 1.0 / xmin), 0))
            for v, c in zip(vals[:pos], cnts[:pos])
        )
    )
    if sum_ln <= 0:
        return empty
    alpha = int(round_like_duckdb(1e12 * k / sum_ln, 0))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "xmin": pa.array([xmin], pa.int64()),
            "alpha_micro": pa.array([alpha], pa.int64()),
        }
    )


SQL_Q252 = """
WITH h AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
kt AS (SELECT greatest(n // 20, 10) AS k_target, n FROM t),
r AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v DESC) AS BIGINT) AS cum
      FROM h),
x AS (SELECT max(r.v) AS xmin FROM r, kt WHERE r.cum >= kt.k_target),
tail AS (SELECT r.v, r.c, x.xmin FROM r, x WHERE r.v > x.xmin),
s AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS k,
             CAST(coalesce(sum(c * CAST(round(1e6 * ln(v * 1.0 / xmin), 0)
                                        AS BIGINT)), 0) AS BIGINT) AS sum_ln
      FROM tail)
SELECT kt.n AS n, s.k AS k, x.xmin AS xmin,
       CAST(round(1e12 * s.k / s.sum_ln, 0) AS BIGINT) AS alpha_micro
FROM s, x, kt WHERE s.k > 0 AND x.xmin > 0 AND s.sum_ln > 0
"""


#: A/B assignment salt (md5 unit fraction on user_id)
Q253_SALT = 3


def q253_ab_ztest(sf_dir: str):
    """Hash-randomized A/B exposure + pooled two-proportion z-test on a
    user-level conversion label (net-positive user: strictly more
    purchase than error events) — the experimentation primitive
    (deterministic md5 arm assignment = the q113 split convention, so
    the oracle replays every exposure). Plan: ONE user-keyed exchange,
    per-block per-user count folds + vectorized arm hashing, O(1)
    four-count partials per block; the z statistic is one mirrored IEEE
    expression over the four exact integers."""
    import math

    import numpy as np

    from barks_ocr_ray.functions.hashing import unit_fractions

    ev = read_table(sf_dir, "events", ["user_id", "event_type"])
    salt = Q253_SALT

    def _block(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        pur = (
            pc.equal(t.column("event_type"), pa.scalar("purchase"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        err = (
            pc.equal(t.column("event_type"), pa.scalar("error"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(us, kind="stable")
        us, pur, err = us[order], pur[order], err[order]
        starts = np.flatnonzero(
            np.concatenate(([True], us[1:] != us[:-1]))
        )
        uids = us[starts]
        cp = np.diff(np.concatenate(([0], np.cumsum(pur)))[
            np.append(starts, len(us))
        ])
        ce = np.diff(np.concatenate(([0], np.cumsum(err)))[
            np.append(starts, len(us))
        ])
        has_conv = (cp > ce).astype(np.int64)
        in_a = unit_fractions(uids.tolist(), method="md5", salt=salt) < 0.5
        return pa.table(
            {
                "n_a": pa.array([int(in_a.sum())], pa.int64()),
                "x_a": pa.array([int(has_conv[in_a].sum())], pa.int64()),
                "n_b": pa.array([int((~in_a).sum())], pa.int64()),
                "x_b": pa.array([int(has_conv[~in_a].sum())], pa.int64()),
            }
        )

    parts = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_block, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    n_a = sum(int(r["n_a"]) for r in parts)
    x_a = sum(int(r["x_a"]) for r in parts)
    n_b = sum(int(r["n_b"]) for r in parts)
    x_b = sum(int(r["x_b"]) for r in parts)
    empty = pa.table(
        {
            "n_a": pa.array([], pa.int64()),
            "x_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "x_b": pa.array([], pa.int64()),
            "lift_micro": pa.array([], pa.int64()),
            "z_micro": pa.array([], pa.int64()),
        }
    )
    if n_a == 0 or n_b == 0 or x_a + x_b == 0 or x_a + x_b == n_a + n_b:
        return empty
    lift = x_a * 1.0 / n_a - x_b * 1.0 / n_b
    p = (x_a + x_b) * 1.0 / (n_a + n_b)
    se = math.sqrt(p * (1 - p) * (1.0 / n_a + 1.0 / n_b))
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "x_a": pa.array([x_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "x_b": pa.array([x_b], pa.int64()),
            "lift_micro": pa.array(
                [int(round_like_duckdb(1e6 * lift, 0))], pa.int64()
            ),
            "z_micro": pa.array(
                [int(round_like_duckdb(1e6 * lift / se, 0))], pa.int64()
            ),
        }
    )


SQL_Q253 = f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN CAST(('0x' || substring(
                  md5('{Q253_SALT}:' || CAST(user_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) / 4294967296.0 < 0.5
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1, 2),
t AS (SELECT
  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
  CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS x_a,
  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
  CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS x_b
  FROM u)
SELECT n_a, x_a, n_b, x_b,
  CAST(round(1e6 * (x_a * 1.0 / n_a - x_b * 1.0 / n_b), 0) AS BIGINT)
      AS lift_micro,
  CAST(round(1e6 * (x_a * 1.0 / n_a - x_b * 1.0 / n_b)
             / sqrt((x_a + x_b) * 1.0 / (n_a + n_b)
                    * (1 - (x_a + x_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0) AS BIGINT) AS z_micro
FROM t
WHERE n_a > 0 AND n_b > 0 AND x_a + x_b > 0 AND x_a + x_b < n_a + n_b
"""


#: weighted-reservoir sample size
Q254_K = 50


def q254_weighted_reservoir(sf_dir: str):
    """Weighted reservoir sampling without replacement (Efraimidis &
    Spirakis 2006: keep the k largest u^(1/w) keys) — the one-pass
    distributed primitive for "sample docs proportional to length/
    quality" that q69's with-replacement sampler cannot provide.
    Deterministic md5 uniforms make the oracle replay every key; keys
    are ROUNDED to 9 decimals before ranking (the ann.py round-before-
    rank discipline) with doc_id tie-break, so a libm-pow last-ulp
    difference can never flip a rank. Plan: each block keeps its local
    top-k (vectorized argpartition), the driver merges blocks x k
    candidates — no global sort, no corpus-scale exchange."""
    import numpy as np

    from barks_ocr_ray.functions.hashing import unit_fractions

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    k = Q254_K

    def _local_topk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False)
        pos = w > 0
        ids, w = ids[pos], w[pos]
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "skey": pa.array([], pa.float64()),
                }
            )
        u = unit_fractions(ids.tolist(), method="md5")
        key = round_like_duckdb(u ** (1.0 / w), 9)
        if len(ids) > k:
            cut = np.argpartition(-key, k - 1)[:k]
            ids, key = ids[cut], key[cut]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "skey": pa.array(key, pa.float64()),
            }
        )

    cand = docs.map_batches(
        _local_topk, batch_format="pyarrow"
    ).take_all()
    if not cand:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "skey": pa.array([], pa.float64()),
            }
        )
    ids = np.asarray([r["doc_id"] for r in cand], np.int64)
    key = np.asarray([r["skey"] for r in cand], np.float64)
    order = np.lexsort((ids, -key))[:k]
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64)
            ),
            "doc_id": pa.array(ids[order], pa.int64()),
            "skey": pa.array(key[order], pa.float64()),
        }
    )


SQL_Q254 = f"""
WITH d AS (
  SELECT doc_id,
         round(pow(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS UBIGINT)
                   / 4294967296.0, 1.0 / n_chars), 9) AS skey
  FROM documents WHERE n_chars > 0)
SELECT CAST(row_number() OVER (ORDER BY skey DESC, doc_id) AS BIGINT)
           AS rank,
       doc_id, skey
FROM d ORDER BY skey DESC, doc_id LIMIT {Q254_K}
"""


def q255_interarrival_dispersion(sf_dir: str):
    """Inter-arrival dispersion audit per event type — coefficient of
    variation and index of dispersion of the gap series (CV ~ 1 means
    Poisson-like arrivals; >> 1 means bursts, the q188 detector's
    distribution-level summary). Gaps are truncated to integer
    milliseconds so the moment partials are EXACT int64 (q154
    discipline). Plan: ONE type-keyed exchange (types-bounded by
    construction, the q12 family's partitioning), per-block lexsort +
    boundary-masked diffs, O(1) moment partials per block, mirrored
    IEEE expressions on the driver's types-bounded table. Bound: the
    int64 block partial needs sum(g_ms^2) < 2^63 per (type, block) —
    holds while count x rms_gap_ms^2 < 9e18 (a century-long 1 Hz
    stream); the driver merge itself is arbitrary-precision."""
    import math

    import numpy as np

    ev = read_table(sf_dir, "events", ["event_type", "ts", "event_id"])

    def _moments(t: pa.Table) -> pa.Table:
        st = t.column("event_type").to_numpy(zero_copy_only=False)
        ms = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 1000
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ms, st))
        st, ms = st[order], ms[order]
        same = st[1:] == st[:-1]
        g = (ms[1:] - ms[:-1])[same]
        types = st[1:][same]
        rows = []
        for typ in np.unique(types):
            sel = types == typ
            gs = g[sel]
            rows.append(
                (
                    typ,
                    len(gs),
                    int(gs.sum()),
                    int((gs * gs).sum()),
                )
            )
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "sg": pa.array([r[2] for r in rows], pa.int64()),
                "sgg": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    parts = (
        ev.repartition(hash_partitions(8), keys=["event_type"])
        .map_batches(_moments, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    acc: dict = {}
    for r in parts:
        m = acc.setdefault(r["event_type"], [0, 0, 0])
        m[0] += int(r["n"])
        m[1] += int(r["sg"])
        m[2] += int(r["sgg"])
    out_t, out_n, out_cv, out_disp = [], [], [], []
    for typ in sorted(acc):
        n, sg, sgg = acc[typ]
        if n == 0 or sg <= 0:
            continue
        num = max(n * sgg - sg * sg, 0)  # exact Python int (no overflow)
        out_t.append(typ)
        out_n.append(n)
        out_cv.append(
            int(round_like_duckdb(1e6 * math.sqrt(num * 1.0) / sg, 0))
        )
        out_disp.append(
            int(round_like_duckdb(1e6 * num * 1.0 / n / sg, 0))
        )
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n_gaps": pa.array(out_n, pa.int64()),
            "cv_micro": pa.array(out_cv, pa.int64()),
            "dispersion_ms_micro": pa.array(out_disp, pa.int64()),
        }
    )


SQL_Q255 = """
WITH o AS (
  SELECT event_type,
         epoch_us(ts) // 1000
           - lag(epoch_us(ts) // 1000) OVER (
                 PARTITION BY event_type
                 ORDER BY epoch_us(ts) // 1000, event_id) AS g
  FROM events),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sgg
      FROM o WHERE g IS NOT NULL GROUP BY 1),
-- HUGEINT: n*sgg and sg*sg overflow BIGINT on long series
v AS (SELECT event_type, n, sg,
             greatest(CAST(n AS HUGEINT) * sgg
                      - CAST(sg AS HUGEINT) * sg, 0) AS num
      FROM m WHERE n > 0 AND sg > 0)
SELECT event_type, n AS n_gaps,
       CAST(round(1e6 * sqrt(num * 1.0) / sg, 0) AS BIGINT) AS cv_micro,
       CAST(round(1e6 * num * 1.0 / n / sg, 0) AS BIGINT)
           AS dispersion_ms_micro
FROM v ORDER BY event_type
"""


def q256_jl_distortion(sf_dir: str):
    """Johnson-Lindenstrauss sign-projection distortion audit — how
    faithfully a 4x dimensionality reduction (64 -> 16, Achlioptas
    +-1/sqrt(k) projection) preserves pairwise squared distances,
    reported per deterministic id pair (2i, 2i+1) as the projected/
    original ratio. The dimensionality-reduction twin of q247's code
    compression audit. Plan: the projection matrix is a pure function
    of (d, k) (no broadcast at all); ONE pair-keyed exchange colocates
    each pair, blocks run the shared jl_pair_ratios kernel, and the
    ratio stream never touches the driver."""
    import numpy as np

    from barks_ocr_ray.functions.ann import (
        _emb_matrix,
        jl_pair_ratios,
        jl_sign_matrix,
    )

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pair_key", pc.divide(t.column("vec_id"), pa.scalar(2))
        )

    def _ratios(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _emb_matrix(t)
        proj = jl_sign_matrix(mat.shape[1])
        pid, ratio = jl_pair_ratios(mat, ids.astype(np.int64), proj)
        return pa.table(
            {
                "pair_id": pa.array(pid, pa.int64()),
                "ratio_micro": pa.array(ratio, pa.int64()),
            }
        )

    return (
        emb.map_batches(_key, batch_format="pyarrow")
        .repartition(hash_partitions(8), keys=["pair_key"])
        .map_batches(_ratios, batch_format="pyarrow", batch_size=None)
    )


def q257_bounce_rate(sf_dir: str):
    """Per-entry-type session bounce rate — share of sessions that end
    after a single event, keyed by the session's FIRST event type (the
    landing-page quality signal; q13's session rule, 30-minute gap).
    Plan: ONE user-keyed exchange, per-block vectorized session fold
    (gap flags -> boundary diffs, no Python per event), types-bounded
    (entry, sessions, bounces) partials, ratio derived on the bounded
    close."""
    import numpy as np

    GAP_US = 1_800_000_000  # q13's 30-minute rule
    ev = read_table(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )

    def _sessions(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        st = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, us))
        us, ts, st = us[order], ts[order], st[order]
        start = np.ones(len(us), np.bool_)
        if len(us) > 1:
            start[1:] = (us[1:] != us[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        idx = np.flatnonzero(start)
        sizes = np.diff(np.append(idx, len(us)))
        entries = st[idx]
        g = (
            pa.table(
                {
                    "entry_type": pa.array(entries.tolist(), pa.string()),
                    "bounce": pa.array(
                        (sizes == 1).astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by("entry_type")
            .aggregate([("bounce", "count"), ("bounce", "sum")])
        )
        return g.rename_columns(["entry_type", "n_sessions", "n_bounce"])

    rows = (
        ev.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_sessions, batch_format="pyarrow", batch_size=None)
        .groupby("entry_type", num_partitions=2)
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_bounce", alias_name="n_bounce"),
        )
        .take_all()
    )
    rows.sort(key=lambda r: r["entry_type"])
    return pa.table(
        {
            "entry_type": pa.array(
                [r["entry_type"] for r in rows], pa.string()
            ),
            "n_sessions": pa.array(
                [int(r["n_sessions"]) for r in rows], pa.int64()
            ),
            "n_bounce": pa.array(
                [int(r["n_bounce"]) for r in rows], pa.int64()
            ),
            "bounce_micro": pa.array(
                [
                    int(
                        round_like_duckdb(
                            1e6 * int(r["n_bounce"]) / int(r["n_sessions"]),
                            0,
                        )
                    )
                    for r in rows
                ],
                pa.int64(),
            ),
        }
    )


SQL_Q257 = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS s_start
  FROM events),
s AS (SELECT user_id, ts, event_id, event_type,
             sum(s_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
g AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS sz,
             first(event_type ORDER BY ts, event_id) AS entry
      FROM s GROUP BY 1, 2),
m AS (SELECT entry AS entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounce
      FROM g GROUP BY 1)
SELECT entry_type, n_sessions, n_bounce,
       CAST(round(1e6 * n_bounce / n_sessions, 0) AS BIGINT)
           AS bounce_micro
FROM m ORDER BY entry_type
"""


#: Neyman target sample size
Q258_TARGET = 1000


def q258_neyman_allocation(sf_dir: str):
    """Neyman-optimal stratified sampling allocation + realized draw —
    allocate a fixed sample budget across sources proportional to
    N_h * S_h (strata with more variance earn more budget; the survey-
    sampling optimum), then draw with md5-replayable per-stratum rates.
    Since N_h * S_h = sqrt(N_h * sum(y^2) - sum(y)^2), the weight folds
    from EXACT integer moments; weights are micro-rounded BEFORE the
    integer total so the rate expression is a pure function of integers
    (no float accumulation across strata). Plan: one moment aggregation
    (sources-bounded), rates broadcast via closure, one counted
    sampling pass."""
    import math

    import numpy as np

    from barks_ocr_ray.functions.hashing import unit_fractions

    docs = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    docs = docs.materialize()  # moments pass + sampling pass

    def _moments(t: pa.Table) -> pa.Table:
        y = t.column("n_chars").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "y": pa.array(y, pa.int64()),
                    "yy": pa.array(y * y, pa.int64()),
                }
            )
            .group_by("source")
            .aggregate([("y", "count"), ("y", "sum"), ("yy", "sum")])
        )
        return g.rename_columns(["source", "n", "sy", "syy"])

    mom = (
        docs.map_batches(_moments, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sy", alias_name="sy"),
            Sum("syy", alias_name="syy"),
        )
        .take_all()
    )
    stats = {}
    for r in mom:
        n, sy, syy = int(r["n"]), int(r["sy"]), int(r["syy"])
        num = max(n * syy - sy * sy, 0)
        stats[r["source"]] = (
            n,
            int(round_like_duckdb(1e6 * math.sqrt(num * 1.0), 0)),
        )
    total_w = sum(w for _, w in stats.values())
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "n_pop": pa.array([], pa.int64()),
            "w_micro": pa.array([], pa.int64()),
            "rate_micro": pa.array([], pa.int64()),
            "n_sampled": pa.array([], pa.int64()),
        }
    )
    if total_w <= 0:
        return empty
    rates = {
        s: min(1.0, float(Q258_TARGET * w) / float(total_w) / n)
        for s, (n, w) in stats.items()
    }

    def _count_sampled(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist())
        u = unit_fractions(
            t.column("doc_id").to_pylist(), method="md5", salt=4
        )
        r = np.asarray([rates[s] for s in src])
        keep = u < r
        uniq, cnt = np.unique(src[keep], return_counts=True)
        return pa.table(
            {
                "source": pa.array(uniq.tolist(), pa.string()),
                "n_sampled": pa.array(cnt.astype(np.int64)),
            }
        )

    sampled = (
        docs.map_batches(_count_sampled, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(Sum("n_sampled", alias_name="n_sampled"))
        .take_all()
    )
    got = {r["source"]: int(r["n_sampled"]) for r in sampled}
    srcs = sorted(stats)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_pop": pa.array([stats[s][0] for s in srcs], pa.int64()),
            "w_micro": pa.array([stats[s][1] for s in srcs], pa.int64()),
            "rate_micro": pa.array(
                [
                    int(round_like_duckdb(1e6 * rates[s], 0))
                    for s in srcs
                ],
                pa.int64(),
            ),
            "n_sampled": pa.array(
                [got.get(s, 0) for s in srcs], pa.int64()
            ),
        }
    )


SQL_Q258 = f"""
WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS sy,
                  CAST(sum(n_chars * n_chars) AS BIGINT) AS syy
           FROM documents GROUP BY 1),
w AS (SELECT source, n,
             CAST(round(1e6 * sqrt(greatest(CAST(n AS HUGEINT) * syy
                                            - CAST(sy AS HUGEINT) * sy,
                                            0) * 1.0), 0) AS BIGINT)
                 AS w_micro
      FROM m),
t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS total_w FROM w),
r AS (SELECT source, n, w_micro,
             least(1.0, {Q258_TARGET} * w_micro / t.total_w / n) AS rate
      FROM w, t WHERE t.total_w > 0),
s AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled
      FROM documents d JOIN r ON d.source = r.source
      WHERE CAST(('0x' || substring(md5('4:' || CAST(d.doc_id AS VARCHAR)),
                                    1, 8)) AS UBIGINT) / 4294967296.0
            < r.rate
      GROUP BY 1)
SELECT r.source, r.n AS n_pop, r.w_micro,
       CAST(round(1e6 * r.rate, 0) AS BIGINT) AS rate_micro,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM r LEFT JOIN s ON r.source = s.source
ORDER BY r.source
"""


def q259_km_retention(sf_dir: str):
    """Kaplan-Meier retention survival over user lifetimes — S(d) =
    P(user still active d days after first touch), with users last seen
    on the corpus' final day treated as right-CENSORED (still alive),
    the estimator every retention report should use instead of naive
    ratios (naive treats censored users as churned). Duration = last
    day - first day; the product-limit recursion runs in INTEGER micro
    with per-step rounding, so the SQL recursive CTE replays it
    bit-exactly. Plan: scalar max-day reduce, ONE user-keyed exchange
    (per-user first/last day is block-local), durations-bounded
    (dur, churn, censor) histogram, driver product walk."""
    import numpy as np

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def _user_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.divide(
                    t.column("ts").cast(pa.int64()),
                    pa.scalar(DAY, pa.int64()),
                ),
            }
        )

    ud = ev.map_batches(_user_day, batch_format="pyarrow").materialize()
    dmax_rows = ud.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.max(t.column("day")).as_py()], pa.int64())}
        ),
        batch_format="pyarrow",
    ).take_all()
    empty = pa.table(
        {
            "dur": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_churn": pa.array([], pa.int64()),
            "n_censored": pa.array([], pa.int64()),
            "surv_micro": pa.array([], pa.int64()),
        }
    )
    if not dmax_rows:
        return empty
    dmax = max(int(r["m"]) for r in dmax_rows)

    def _durations(t: pa.Table) -> pa.Table:
        us = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, us))
        us, day = us[order], day[order]
        starts = np.flatnonzero(
            np.concatenate(([True], us[1:] != us[:-1]))
        )
        ends = np.append(starts[1:], len(us)) - 1
        f, last = day[starts], day[ends]
        churned = last < dmax
        dur = np.where(churned, last - f, dmax - f)
        g = (
            pa.table(
                {
                    "dur": pa.array(dur, pa.int64()),
                    "churn": pa.array(churned.astype(np.int64)),
                    "cens": pa.array((~churned).astype(np.int64)),
                }
            )
            .group_by("dur")
            .aggregate([("churn", "sum"), ("cens", "sum")])
        )
        return g.rename_columns(["dur", "n_churn", "n_cens"])

    hist = (
        ud.repartition(hash_partitions(8), keys=["user_id"])
        .map_batches(_durations, batch_format="pyarrow", batch_size=None)
        .groupby("dur", num_partitions=2)
        .aggregate(
            Sum("n_churn", alias_name="n_churn"),
            Sum("n_cens", alias_name="n_cens"),
        )
        .take_all()
    )
    churn = {int(r["dur"]): int(r["n_churn"]) for r in hist}
    cens = {int(r["dur"]): int(r["n_cens"]) for r in hist}
    n_risk = sum(churn.values()) + sum(cens.values())
    out = {k: [] for k in ("dur", "n_risk", "n_churn", "n_censored", "surv_micro")}
    s = 1_000_000
    for d in range(0, dmax + 1):
        if n_risk <= 0:
            break
        ch, ce = churn.get(d, 0), cens.get(d, 0)
        s = int(round_like_duckdb(s * (n_risk - ch) * 1.0 / n_risk, 0))
        out["dur"].append(d)
        out["n_risk"].append(n_risk)
        out["n_churn"].append(ch)
        out["n_censored"].append(ce)
        out["surv_micro"].append(s)
        n_risk -= ch + ce
    return pa.table(
        {k: pa.array(v, pa.int64() if k != "dur" else pa.int64()) for k, v in out.items()}
    )


SQL_Q259 = """
WITH RECURSIVE u AS (
  SELECT user_id,
         CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS f,
         CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS l
  FROM events GROUP BY 1),
b AS (SELECT max(l) AS dmax FROM u),
h AS (SELECT CASE WHEN u.l < b.dmax THEN u.l - u.f
                  ELSE b.dmax - u.f END AS dur,
             CASE WHEN u.l < b.dmax THEN 1 ELSE 0 END AS churned
      FROM u, b),
hist AS (SELECT dur, CAST(sum(churned) AS BIGINT) AS n_churn,
                CAST(sum(1 - churned) AS BIGINT) AS n_cens
         FROM h GROUP BY 1),
spine AS (SELECT gs.i AS dur FROM b, generate_series(0, 100000) gs(i)
          WHERE gs.i <= b.dmax),
dense AS (SELECT s.dur, coalesce(hist.n_churn, 0) AS n_churn,
                 coalesce(hist.n_cens, 0) AS n_cens
          FROM spine s LEFT JOIN hist ON s.dur = hist.dur),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
rec AS (
  SELECT d.dur, d.n_churn, d.n_cens, t.n_users AS n_risk,
         CAST(round(1000000 * (t.n_users - d.n_churn) * 1.0 / t.n_users,
                    0) AS BIGINT) AS surv
  FROM dense d, tot t WHERE d.dur = 0 AND t.n_users > 0
  UNION ALL
  SELECT d.dur, d.n_churn, d.n_cens,
         r.n_risk - r.n_churn - r.n_cens AS n_risk,
         CAST(round(r.surv * (r.n_risk - r.n_churn - r.n_cens - d.n_churn)
                    * 1.0 / (r.n_risk - r.n_churn - r.n_cens), 0)
              AS BIGINT) AS surv
  FROM rec r JOIN dense d ON d.dur = r.dur + 1
  WHERE r.n_risk - r.n_churn - r.n_cens > 0)
SELECT dur, n_risk, n_churn, n_cens AS n_censored, surv AS surv_micro
FROM rec ORDER BY dur
"""


#: winsorization tail fraction (clamp lowest/highest 5% by rank)
Q260_TRIM_PCT = 5


def q260_winsorized_mean(sf_dir: str):
    """Per-source winsorized mean of document length — the robust
    central-tendency report (clamp the lowest and highest 5% BY RANK to
    the boundary order statistics, then average; immune to the giant-doc
    outliers that wreck a plain mean). Rank picks are EXPLICIT
    (lo = value at rank ceil(n*p), hi = value at rank n+1-ceil(n*p) of
    the ascending multiset — no quantile interpolation to mismatch).
    Plan: one (source, value) histogram aggregation (q241 bounds);
    clamp arithmetic folds from cumulative counts in exact int64 on the
    driver histogram."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["source", "n_chars"])

    def _hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_chars", "cnt"])

    hist = (
        docs.map_batches(_hist, batch_format="pyarrow")
        .groupby(["source", "n_chars"], num_partitions=2)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    by_src: dict = {}
    for r in hist:
        by_src.setdefault(r["source"], []).append(
            (int(r["n_chars"]), int(r["cnt"]))
        )
    out_s, out_n, out_lo, out_hi, out_m = [], [], [], [], []
    for src in sorted(by_src):
        vc = sorted(by_src[src])
        vals = np.asarray([v for v, _ in vc], np.int64)
        cnts = np.asarray([c for _, c in vc], np.int64)
        n = int(cnts.sum())
        k = -(-n * Q260_TRIM_PCT // 100)  # ceil(n*p/100), exact integer
        if 2 * k > n:
            continue
        cum = np.cumsum(cnts)
        lo = int(vals[int(np.searchsorted(cum, k))])
        hi = int(vals[int(np.searchsorted(cum, n + 1 - k))])
        # clip-by-value IS the rank rule: every rank <= k has value <=
        # lo (clamps up to lo), every rank > n-k has value >= hi, and
        # boundary ties clamp to themselves
        clamped = np.clip(vals, lo, hi)
        total = int((clamped * cnts).sum())
        wmean_micro = int(round_like_duckdb(1e6 * total / n, 0))
        out_s.append(src)
        out_n.append(n)
        out_lo.append(lo)
        out_hi.append(hi)
        out_m.append(wmean_micro)
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "lo": pa.array(out_lo, pa.int64()),
            "hi": pa.array(out_hi, pa.int64()),
            "wmean_micro": pa.array(out_m, pa.int64()),
        }
    )


SQL_Q260 = f"""
WITH r AS (
  SELECT source, n_chars AS x,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
k AS (SELECT source, n, CAST(ceil(n * {Q260_TRIM_PCT} / 100.0) AS BIGINT)
             AS k
      FROM (SELECT DISTINCT source, n FROM r)),
b AS (SELECT r.source,
             max(CASE WHEN r.i = k.k THEN r.x END) AS lo,
             max(CASE WHEN r.i = k.n + 1 - k.k THEN r.x END) AS hi
      FROM r JOIN k ON r.source = k.source
      WHERE k.k * 2 <= k.n GROUP BY 1),
w AS (SELECT r.source, k.n,
             sum(least(greatest(r.x, b.lo), b.hi)) AS total
      FROM r JOIN b ON r.source = b.source
             JOIN k ON r.source = k.source
      GROUP BY 1, 2)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
       CAST(round(1e6 * total / n, 0) AS BIGINT) AS wmean_micro
FROM w JOIN b USING (source) ORDER BY source
"""


def q261_effective_sample_size(sf_dir: str):
    """Effective sample size of the length-weighted corpus per source —
    ESS = (sum w)^2 / sum w^2 (Kish), the importance-sampling
    diagnostic that says how many EQUAL documents the weighted corpus
    is worth (ESS << n means a few giants dominate; the actionable
    twin of q241's Gini). Exact integer moments, one mirrored
    division; O(1) partials per block, zero keyed exchanges."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["source", "n_chars"])

    def _moments(t: pa.Table) -> pa.Table:
        w = t.column("n_chars").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "source": t.column("source"),
                    "w": pa.array(w, pa.int64()),
                    "ww": pa.array(w * w, pa.int64()),
                }
            )
            .group_by("source")
            .aggregate([("w", "count"), ("w", "sum"), ("ww", "sum")])
        )
        return g.rename_columns(["source", "n", "sw", "sww"])

    rows = (
        docs.map_batches(_moments, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sw", alias_name="sw"),
            Sum("sww", alias_name="sww"),
        )
        .take_all()
    )
    out_s, out_n, out_e, out_r = [], [], [], []
    for r in sorted(rows, key=lambda r: r["source"]):
        n, sw, sww = int(r["n"]), int(r["sw"]), int(r["sww"])
        if sww <= 0:
            continue
        # mirror SQL association exactly: (1e6 * double(sw^2)) / sww / n
        out_s.append(r["source"])
        out_n.append(n)
        out_e.append(
            int(round_like_duckdb(1e6 * float(sw * sw) / float(sww), 0))
        )
        out_r.append(
            int(
                round_like_duckdb(
                    1e6 * float(sw * sw) / float(sww) / n, 0
                )
            )
        )
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "ess_micro": pa.array(out_e, pa.int64()),
            "ess_ratio_micro": pa.array(out_r, pa.int64()),
        }
    )


SQL_Q261 = """
WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS sw,
                  CAST(sum(n_chars * n_chars) AS BIGINT) AS sww
           FROM documents GROUP BY 1)
SELECT source, n AS n_docs,
       CAST(round(1e6 * (CAST(sw AS HUGEINT) * sw)
                  / sww, 0) AS BIGINT) AS ess_micro,
       CAST(round(1e6 * (CAST(sw AS HUGEINT) * sw)
                  / sww / n, 0) AS BIGINT) AS ess_ratio_micro
FROM m WHERE sww > 0 ORDER BY source
"""


def q262_charset_profile(sf_dir: str):
    """Per-language character-set profile — distinct codepoints, total
    characters and the ASCII share (char-weighted), the encoding/
    mojibake tripwire a multilingual curation pipeline watches per
    shard (a latin-only 'zh' slice or a sudden codepoint explosion is
    an ingestion bug). Plan: texts decode to uint32 codepoint arrays
    in C (utf-32 view, no Python per char), blocks emit (lang,
    codepoint, cnt) partials bounded by the alphabet, ONE
    alphabet-bounded aggregation, driver close."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["lang", "text"])

    def _chars(t: pa.Table) -> pa.Table:
        langs, cps, cnts = [], [], []
        for lang, s in zip(
            t.column("lang").to_pylist(), t.column("text")
        ):
            v = s.as_py()
            if not v:
                continue
            arr = np.frombuffer(v.encode("utf-32-le"), np.uint32)
            u, c = np.unique(arr, return_counts=True)
            langs.extend([lang] * len(u))
            cps.extend(u.astype(np.int64).tolist())
            cnts.extend(c.astype(np.int64).tolist())
        g = (
            pa.table(
                {
                    "lang": pa.array(langs, pa.string()),
                    "cp": pa.array(cps, pa.int64()),
                    "cnt": pa.array(cnts, pa.int64()),
                }
            )
            .group_by(["lang", "cp"])
            .aggregate([("cnt", "sum")])
        )
        return g.rename_columns(["lang", "cp", "cnt"])

    rows = (
        docs.map_batches(_chars, batch_format="pyarrow")
        .groupby(["lang", "cp"], num_partitions=2)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    acc: dict = {}
    for r in rows:
        m = acc.setdefault(r["lang"], [0, 0, 0])  # codepoints, chars, ascii
        m[0] += 1
        m[1] += int(r["cnt"])
        if int(r["cp"]) < 128:
            m[2] += int(r["cnt"])
    out_l, out_cp, out_ch, out_a = [], [], [], []
    for lang in sorted(acc):
        ncp, nch, na = acc[lang]
        if nch == 0:
            continue
        out_l.append(lang)
        out_cp.append(ncp)
        out_ch.append(nch)
        out_a.append(int(round_like_duckdb(1e6 * na / nch, 0)))
    return pa.table(
        {
            "lang": pa.array(out_l, pa.string()),
            "n_codepoints": pa.array(out_cp, pa.int64()),
            "n_chars_total": pa.array(out_ch, pa.int64()),
            "ascii_micro": pa.array(out_a, pa.int64()),
        }
    )


SQL_Q262 = """
WITH ch AS (
  SELECT lang, unnest(string_split_regex(text, '')) AS c
  FROM documents WHERE text IS NOT NULL AND text != ''),
f AS (SELECT lang, c FROM ch WHERE c != ''),
m AS (SELECT lang,
             CAST(count(DISTINCT c) AS BIGINT) AS n_codepoints,
             CAST(count(*) AS BIGINT) AS n_chars_total,
             CAST(sum(CASE WHEN unicode(c) < 128 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ascii
      FROM f GROUP BY 1)
SELECT lang, n_codepoints, n_chars_total,
       CAST(round(1e6 * n_ascii / n_chars_total, 0) AS BIGINT)
           AS ascii_micro
FROM m WHERE n_chars_total > 0 ORDER BY lang
"""


def q263_order_reconciliation(sf_dir: str):
    """Header/detail reconciliation audit — per-order line revenue
    (price x (1-disc) x (1+tax), EXACT cents per line) against the
    order header total, the cross-table integrity check every warehouse
    runs nightly (this corpus' headers drift, and the audit measures
    by how much). Plan: per-block combiner folds lines to (orderkey,
    cents) partials, ONE orderkey aggregation, one large x large LEFT
    join against headers (headers without lines must surface), O(1)
    audit partials per block after the join."""
    import numpy as np

    from barks_ocr_ray.functions.relational import compact_nonempty

    li = read_table(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _line_cents(t: pa.Table) -> pa.Table:
        cents = round_like_duckdb(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1 - t.column("l_discount").to_numpy(zero_copy_only=False))
            * (1 + t.column("l_tax").to_numpy(zero_copy_only=False))
            * 100,
            0,
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["l_orderkey", "line_cents"])

    lsum, _ = compact_nonempty(
        li.map_batches(_line_cents, batch_format="pyarrow")
        .groupby("l_orderkey", num_partitions=hash_partitions(8))
        .aggregate(Sum("line_cents", alias_name="line_cents"))
    )
    joined = orders.join(
        lsum,
        join_type="left_outer",
        num_partitions=hash_partitions(8),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def _audit(t: pa.Table) -> pa.Table:
        total = round_like_duckdb(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100,
            0,
        ).astype(np.int64)
        lc = t.column("line_cents")
        have = pc.is_valid(lc).to_numpy(zero_copy_only=False)
        lcv = lc.to_numpy(zero_copy_only=False)
        drift = np.abs(
            np.where(have, lcv, 0).astype(np.int64) - total
        )[have]
        return pa.table(
            {
                "n_orders": pa.array([t.num_rows], pa.int64()),
                "n_with_lines": pa.array([int(have.sum())], pa.int64()),
                "n_exact": pa.array([int((drift == 0).sum())], pa.int64()),
                "max_abs": pa.array(
                    [int(drift.max()) if len(drift) else 0], pa.int64()
                ),
                "sum_abs": pa.array([int(drift.sum())], pa.int64()),
            }
        )

    parts = joined.map_batches(_audit, batch_format="pyarrow").take_all()
    n_orders = sum(int(r["n_orders"]) for r in parts)
    n_with = sum(int(r["n_with_lines"]) for r in parts)
    n_exact = sum(int(r["n_exact"]) for r in parts)
    max_abs = max((int(r["max_abs"]) for r in parts), default=0)
    sum_abs = sum(int(r["sum_abs"]) for r in parts)
    if n_with == 0:
        return pa.table(
            {
                "n_orders": pa.array([], pa.int64()),
                "n_with_lines": pa.array([], pa.int64()),
                "n_exact": pa.array([], pa.int64()),
                "max_abs_drift_cents": pa.array([], pa.int64()),
                "mean_abs_drift_cents_micro": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "n_orders": pa.array([n_orders], pa.int64()),
            "n_with_lines": pa.array([n_with], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "max_abs_drift_cents": pa.array([max_abs], pa.int64()),
            "mean_abs_drift_cents_micro": pa.array(
                [int(round_like_duckdb(1e6 * sum_abs / n_with, 0))],
                pa.int64(),
            ),
        }
    )


SQL_Q263 = """
WITH l AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax) * 100, 0) AS BIGINT))
              AS BIGINT) AS line_cents
  FROM lineitem GROUP BY 1),
j AS (SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS total_cents,
             l.line_cents
      FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN line_cents IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_with_lines,
             CAST(coalesce(sum(CASE WHEN line_cents = total_cents
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_exact,
             CAST(coalesce(max(abs(line_cents - total_cents)), 0)
                  AS BIGINT) AS max_abs_drift_cents,
             CAST(coalesce(sum(abs(line_cents - total_cents)), 0)
                  AS BIGINT) AS sum_abs
      FROM j)
SELECT n_orders, n_with_lines, n_exact, max_abs_drift_cents,
       CAST(round(1e6 * sum_abs / n_with_lines, 0) AS BIGINT)
           AS mean_abs_drift_cents_micro
FROM t WHERE n_with_lines > 0
"""


#: minimum line count for a part to enter the dispersion report
Q264_MIN_LINES = 5
Q264_TOPK = 20


def q264_part_price_dispersion(sf_dir: str):
    """Per-part price-dispersion ranking — coefficient of variation of
    line prices per part (exact cents moments), top-20 most dispersed
    parts with >= 5 lines: the catalog-anomaly surface (one part sold
    at wildly different prices = data bug or fraud). Plan: ONE
    partkey-keyed exchange colocates each part, block-local exact
    moments + distinct-supplier counts, per-block top-k candidates,
    blocks x k driver merge (no global sort)."""
    import math

    import numpy as np

    li = read_table(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    k = Q264_TOPK

    def _part_stats(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        cents = round_like_duckdb(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100,
            0,
        ).astype(np.int64)
        order = np.lexsort((sk, pk))
        pk, sk, cents = pk[order], sk[order], cents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        bounds = np.append(starts, len(pk))
        out = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = int(e - s)
            if n < Q264_MIN_LINES:
                continue
            c = cents[s:e]
            sc, scc = int(c.sum()), int((c * c).sum())
            if sc <= 0:
                continue
            num = max(n * scc - sc * sc, 0)  # n^2 * var, exact
            cv = int(round_like_duckdb(1e6 * math.sqrt(num * 1.0) / sc, 0))
            nsupp = len(np.unique(sk[s:e]))
            out.append((int(pk[s]), n, nsupp, cv))
        out.sort(key=lambda r: (-r[3], r[0]))
        out = out[:k]
        return pa.table(
            {
                "partkey": pa.array([r[0] for r in out], pa.int64()),
                "n_lines": pa.array([r[1] for r in out], pa.int64()),
                "n_suppliers": pa.array([r[2] for r in out], pa.int64()),
                "cv_micro": pa.array([r[3] for r in out], pa.int64()),
            }
        )

    cand = (
        li.repartition(hash_partitions(8), keys=["l_partkey"])
        .map_batches(_part_stats, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    cand.sort(key=lambda r: (-int(r["cv_micro"]), int(r["partkey"])))
    cand = cand[:k]
    return pa.table(
        {
            "rank": pa.array(
                list(range(1, len(cand) + 1)), pa.int64()
            ),
            "partkey": pa.array(
                [int(r["partkey"]) for r in cand], pa.int64()
            ),
            "n_lines": pa.array(
                [int(r["n_lines"]) for r in cand], pa.int64()
            ),
            "n_suppliers": pa.array(
                [int(r["n_suppliers"]) for r in cand], pa.int64()
            ),
            "cv_micro": pa.array(
                [int(r["cv_micro"]) for r in cand], pa.int64()
            ),
        }
    )


SQL_Q264 = f"""
WITH c AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         l_suppkey
  FROM lineitem),
m AS (SELECT l_partkey AS partkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(sum(cents) AS BIGINT) AS sc,
             CAST(sum(cents * cents) AS BIGINT) AS scc
      FROM c GROUP BY 1
      HAVING count(*) >= {Q264_MIN_LINES} AND sum(cents) > 0),
v AS (SELECT partkey, n_lines, n_suppliers,
             CAST(round(1e6 * sqrt(greatest(CAST(n_lines AS HUGEINT) * scc
                                            - CAST(sc AS HUGEINT) * sc, 0)
                                   * 1.0) / sc, 0) AS BIGINT) AS cv_micro
      FROM m)
SELECT CAST(row_number() OVER (ORDER BY cv_micro DESC, partkey) AS BIGINT)
           AS rank,
       partkey, n_lines, n_suppliers, cv_micro
FROM v ORDER BY cv_micro DESC, partkey LIMIT {Q264_TOPK}
"""


def q265_nation_share_trend(sf_dir: str):
    """Monthly revenue share per customer nation — the market-share
    trend matrix (who is growing) over the orders->customer->nation
    join chain. Plan: one large x large hash join (orders x customer),
    a 25-row broadcast for nation names, (nation, month)-bounded cents
    aggregation, shares derived on the bounded close (per-cell micro
    rounding, exact int cents throughout)."""
    import numpy as np

    from barks_ocr_ray.functions.relational import broadcast_lookup_column

    orders = read_table(
        sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"]
    )
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation_map = {
        int(r["n_nationkey"]): r["n_name"]
        for r in read_table(
            sf_dir, "nation", ["n_nationkey", "n_name"]
        ).take_all()
    }

    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=hash_partitions(8),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def _nkey64(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("c_nationkey"),
            "c_nationkey",
            t.column("c_nationkey").cast(pa.int64()),
        )

    joined = broadcast_lookup_column(
        joined.map_batches(_nkey64, batch_format="pyarrow"),
        nation_map,
        "c_nationkey",
        "n_name",
        pa.string(),
    )

    def _cents(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate")
        month = pc.add(
            pc.multiply(pc.year(ts).cast(pa.int64()), pa.scalar(100)),
            pc.month(ts).cast(pa.int64()),
        )
        cents = round_like_duckdb(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100,
            0,
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "n_name": t.column("n_name"),
                    "month": month,
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by(["n_name", "month"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["n_name", "month", "cents"])

    rows = (
        joined.map_batches(_cents, batch_format="pyarrow")
        .groupby(["n_name", "month"], num_partitions=2)
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    )
    tot: dict = {}
    for r in rows:
        tot[int(r["month"])] = tot.get(int(r["month"]), 0) + int(r["cents"])
    rows.sort(key=lambda r: (int(r["month"]), r["n_name"]))
    return pa.table(
        {
            "month": pa.array([int(r["month"]) for r in rows], pa.int64()),
            "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
            "revenue_cents": pa.array(
                [int(r["cents"]) for r in rows], pa.int64()
            ),
            "share_micro": pa.array(
                [
                    int(
                        round_like_duckdb(
                            1e6 * int(r["cents"]) / tot[int(r["month"])], 0
                        )
                    )
                    for r in rows
                ],
                pa.int64(),
            ),
        }
    )


SQL_Q265 = """
WITH o AS (
  SELECT CAST(date_part('year', o_orderdate) * 100
              + date_part('month', o_orderdate) AS BIGINT) AS month,
         n.n_name,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n_nationkey),
m AS (SELECT month, n_name, CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM o GROUP BY 1, 2),
t AS (SELECT month, CAST(sum(revenue_cents) AS BIGINT) AS total
      FROM m GROUP BY 1)
SELECT m.month, m.n_name, m.revenue_cents,
       CAST(round(1e6 * m.revenue_cents / t.total, 0) AS BIGINT)
           AS share_micro
FROM m JOIN t ON m.month = t.month
ORDER BY m.month, m.n_name
"""


#: Wilson z for 95% (constant shared by engine and SQL)
Q266_Z = 1.96
Q266_TOPK = 15
Q266_MIN_LINES = 20


def q266_return_rate_wilson(sf_dir: str):
    """Supplier return-rate ranking by the Wilson score LOWER bound —
    the right way to rank rates with unequal sample sizes (a 3/3
    returner must not outrank a 95/100 one; plain p does exactly that).
    Exact (returns, lines) integer counts per supplier, one mirrored
    IEEE Wilson expression, top-15 by lower bound desc. Plan: one
    supplier-bounded count aggregation fed by block combiners; the
    ranking closes on the suppliers-bounded driver table."""
    import math

    import numpy as np

    li = read_table(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"])

    def _counts(t: pa.Table) -> pa.Table:
        ret = (
            pc.equal(t.column("l_returnflag"), pa.scalar("R"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = (
            pa.table(
                {
                    "suppkey": t.column("l_suppkey"),
                    "ret": pa.array(ret, pa.int64()),
                }
            )
            .group_by("suppkey")
            .aggregate([("ret", "count"), ("ret", "sum")])
        )
        return g.rename_columns(["suppkey", "n", "x"])

    rows = (
        li.map_batches(_counts, batch_format="pyarrow")
        .groupby("suppkey", num_partitions=2)
        .aggregate(Sum("n", alias_name="n"), Sum("x", alias_name="x"))
        .take_all()
    )
    z = Q266_Z
    cand = []
    for r in rows:
        n, x = int(r["n"]), int(r["x"])
        if n < Q266_MIN_LINES:
            continue
        p = x * 1.0 / n
        lb = (
            p
            + z * z / (2 * n)
            - z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        ) / (1 + z * z / n)
        cand.append(
            (
                int(r["suppkey"]),
                n,
                x,
                int(round_like_duckdb(1e6 * p, 0)),
                int(round_like_duckdb(1e6 * lb, 0)),
            )
        )
    cand.sort(key=lambda r: (-r[4], r[0]))
    cand = cand[: Q266_TOPK]
    return pa.table(
        {
            "rank": pa.array(list(range(1, len(cand) + 1)), pa.int64()),
            "suppkey": pa.array([r[0] for r in cand], pa.int64()),
            "n_lines": pa.array([r[1] for r in cand], pa.int64()),
            "n_returns": pa.array([r[2] for r in cand], pa.int64()),
            "rate_micro": pa.array([r[3] for r in cand], pa.int64()),
            "wilson_lb_micro": pa.array([r[4] for r in cand], pa.int64()),
        }
    )


SQL_Q266 = f"""
WITH m AS (
  SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1 HAVING count(*) >= {Q266_MIN_LINES}),
v AS (SELECT suppkey, n, x, x * 1.0 / n AS p FROM m),
w AS (SELECT suppkey, n, x,
             CAST(round(1e6 * p, 0) AS BIGINT) AS rate_micro,
             CAST(round(1e6 * ((p + {Q266_Z} * {Q266_Z} / (2 * n)
                   - {Q266_Z} * sqrt(p * (1 - p) / n
                                     + {Q266_Z} * {Q266_Z}
                                       / (4.0 * n * n)))
                  / (1 + {Q266_Z} * {Q266_Z} / n)), 0) AS BIGINT)
                 AS wilson_lb_micro
      FROM v)
SELECT CAST(row_number() OVER (ORDER BY wilson_lb_micro DESC, suppkey)
            AS BIGINT) AS rank,
       suppkey, n AS n_lines, x AS n_returns, rate_micro, wilson_lb_micro
FROM w ORDER BY wilson_lb_micro DESC, suppkey LIMIT {Q266_TOPK}
"""


Q267_TAU_NUM, Q267_TAU_DEN = 9, 10


def q267_set_similarity_join(sf_dir: str):
    """GLOBAL exact token-set Jaccard join (threshold 0.9 — the corpus's
    token-set similarity is broadly high, so the threshold sits above the
    cross-template noise floor and prefixes shrink to ~L/10 tokens) via
    df-ordered prefix filtering — the SSJoin/PPJoin candidate generator
    in its distributed (Vernica et al., SIGMOD 2010) form. Contrast with
    q21 (blocked, heuristic recall): this join is complete — the oracle
    is the unblocked all-pairs SQL self-join. Plan: one vocabulary count,
    one term-keyed join, one doc-keyed assembly, one prefix-token-keyed
    verify; prefixes carry each doc's RAREST tokens, so hot tokens never
    form candidate groups (the construction's skew argument)."""
    from barks_ocr_ray.functions.dedupe import set_similarity_join

    return set_similarity_join(
        read_table(sf_dir, "documents", ["doc_id", "text"]),
        tau_num=Q267_TAU_NUM,
        tau_den=Q267_TAU_DEN,
    )


def _sql_q267() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    num, den = Q267_TAU_NUM, Q267_TAU_DEN
    return f"""
WITH e AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
sz AS (SELECT doc_id, count(*) AS L FROM e GROUP BY 1),
i AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(c AS BIGINT) AS n_shared,
       round(CAST(c AS DOUBLE) / (la.L + lb.L - c), 4) AS jaccard
FROM i
JOIN sz la ON la.doc_id = i.doc_a
JOIN sz lb ON lb.doc_id = i.doc_b
WHERE ({den} + {num}) * c >= {num} * (la.L + lb.L)
"""


def q268_naive_bayes_lang(sf_dir: str):
    """Distributed multinomial Naive Bayes lang classifier, trained and
    evaluated on the corpus itself (the fastText-style quality/lang
    classifier-training primitive, reduced to exact counts): Laplace
    class-term weights, integer micro-rounded log scores (rounded BEFORE
    summation so the result is reassociation-proof), argmax with lang-asc
    tie break, confusion matrix out. Plan: one (lang, term) vocabulary
    aggregation, one term-keyed weight join, one doc-keyed score
    assembly; class constants (priors, ln normalizers) are a langs-sized
    driver table. Score decomposition keeps missing (term, class) cells
    implicit: score = prior + sum_t tf*round(1e6*ln(n_ct+1))
    - L_d*round(1e6*ln(N_c+V))."""
    import math

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, Tokenizer

    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])

    class _LangTermCounts(Tokenizer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            from collections import Counter as _Counter

            out_d, out_l, out_t, out_n = [], [], [], []
            for doc_id, lang, s in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("lang").to_pylist(),
                batch.column("text"),
            ):
                counts = _Counter(self.tokens(s.as_py() or ""))
                out_d.extend([doc_id] * len(counts))
                out_l.extend([lang] * len(counts))
                out_t.extend(counts.keys())
                out_n.extend(counts.values())
            return pa.table(
                {
                    "doc_id": pa.array(out_d, pa.int64()),
                    "lang": pa.array(out_l, pa.string()),
                    "term": pa.array(out_t, pa.string()),
                    "tf": pa.array(out_n, pa.int64()),
                }
            )

    tf = docs.map_batches(
        _LangTermCounts, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()  # reused: weights, V, doc totals, score join

    ct = tf.groupby(["lang", "term"], num_partitions=VOCAB_PARTITIONS).aggregate(
        Sum("tf", alias_name="n_ct")
    )
    n_c = {
        r["lang"]: int(r["n_tokens"])
        for r in tf.groupby("lang", num_partitions=2)
        .aggregate(Sum("tf", alias_name="n_tokens"))
        .take_all()
    }  # langs-sized
    vocab_v = int(
        tf.groupby("term", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Count(alias_name="n"))
        .count()
    )
    ld = tf.groupby(["doc_id", "lang"], num_partitions=hash_partitions(8)).aggregate(
        Sum("tf", alias_name="ld")
    )
    pri = {
        r["lang"]: int(r["n_docs"])
        for r in ld.groupby("lang", num_partitions=2)
        .aggregate(Count(alias_name="n_docs"))
        .take_all()
    }  # langs-sized
    total_docs = sum(pri.values())
    consts = {
        lang: (
            int(round_like_duckdb(1e6 * math.log(pri[lang] / total_docs), 0)),
            int(round_like_duckdb(1e6 * math.log(n_c[lang] + vocab_v), 0)),
        )
        for lang in pri
    }
    langs = sorted(consts)

    def _weights(t: pa.Table) -> pa.Table:
        w = round_like_duckdb(
            1e6
            * np.log(
                t.column("n_ct").to_numpy(zero_copy_only=False).astype(np.float64)
                + 1.0
            ),
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "plang": t.column("lang"),
                "term": t.column("term"),
                "w": pa.array(w, pa.int64()),
            }
        )

    w_tbl = ct.map_batches(_weights, batch_format="pyarrow")

    joined = tf.drop_columns(["lang"]).join(
        w_tbl, join_type="inner", num_partitions=VOCAB_PARTITIONS, on=("term",)
    )

    def _contrib(t: pa.Table) -> pa.Table:
        s1 = pc.multiply(t.column("tf"), t.column("w"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "plang": t.column("plang"),
                "s1": s1,
            }
        )

    s1 = (
        joined.map_batches(_contrib, batch_format="pyarrow")
        .groupby(["doc_id", "plang"], num_partitions=hash_partitions(8))
        .aggregate(Sum("s1", alias_name="s1"))
    )

    from barks_ocr_ray.functions.relational import compact_nonempty

    s1c, _ = compact_nonempty(s1)
    ldc, _ = compact_nonempty(ld)
    scored = s1c.join(
        ldc,
        join_type="inner",
        num_partitions=hash_partitions(8),
        on=("doc_id",),
    )

    def _predict(g: pa.Table) -> pa.Table:
        actual = g.column("lang")[0].as_py()
        ld_val = int(g.column("ld")[0].as_py())
        have = dict(
            zip(
                g.column("plang").to_pylist(), g.column("s1").to_pylist()
            )
        )
        best_lang, best_score = None, None
        for lang in langs:
            prior, lnz = consts[lang]
            score = prior + int(have.get(lang, 0)) - ld_val * lnz
            if best_score is None or score > best_score:
                best_lang, best_score = lang, score
        return pa.table(
            {
                "lang": pa.array([actual], pa.string()),
                "predicted": pa.array([best_lang], pa.string()),
            }
        )

    return (
        scored.groupby("doc_id", num_partitions=hash_partitions(8))
        .map_groups(_predict, batch_format="pyarrow")
        .groupby(["lang", "predicted"], num_partitions=2)
        .aggregate(Count(alias_name="n_docs"))
    )


def _sql_q268() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tf AS (
  SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, lang,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents)
  GROUP BY 1, 2, 3),
ct AS (SELECT lang, term, sum(tf) AS n_ct FROM tf GROUP BY 1, 2),
nc AS (SELECT lang, sum(tf) AS n_tokens FROM tf GROUP BY 1),
vv AS (SELECT count(DISTINCT term) AS v FROM tf),
ld AS (SELECT doc_id, lang AS actual, sum(tf) AS ld FROM tf GROUP BY 1, 2),
pri AS (SELECT actual AS lang, count(*) AS n_docs FROM ld GROUP BY 1),
tot AS (SELECT sum(n_docs) AS total FROM pri),
cconst AS (
  SELECT p.lang,
         CAST(round(1e6 * ln(p.n_docs * 1.0 / t.total), 0) AS BIGINT)
           AS prior_micro,
         CAST(round(1e6 * ln(n.n_tokens + v.v), 0) AS BIGINT) AS lnz_micro
  FROM pri p
  JOIN nc n ON n.lang = p.lang
  CROSS JOIN tot t CROSS JOIN vv v),
w AS (SELECT lang AS plang, term,
             CAST(round(1e6 * ln(n_ct + 1), 0) AS BIGINT) AS w
      FROM ct),
s1 AS (SELECT tf.doc_id, w.plang, sum(tf.tf * w.w) AS s1
       FROM tf JOIN w USING (term) GROUP BY 1, 2),
sc AS (
  SELECT d.doc_id, d.actual, c.lang AS plang,
         c.prior_micro - d.ld * c.lnz_micro + coalesce(s.s1, 0) AS score
  FROM ld d CROSS JOIN cconst c
  LEFT JOIN s1 s ON s.doc_id = d.doc_id AND s.plang = c.lang),
pred AS (
  SELECT doc_id, actual,
         first(plang ORDER BY score DESC, plang) AS predicted
  FROM sc GROUP BY 1, 2)
SELECT actual AS lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
"""


def q269_time_weighted_value(sf_dir: str):
    """Time-weighted average held value per user (TWAP over an
    irregularly-sampled step series): each event's value is "held" until
    the user's next event, so the honest average is the step-function
    integral over the user's active span — the arithmetic mean
    over-weights burst periods (contrast q155's calendar-spine trailing
    mean, which assumes regular sampling). Exactness: values become
    integer cents and gaps integer ms, so the per-user weighted sum is
    an exact int64 (bound: max_cents x span_ms < 2^63 — a ~$10^7 value
    held for three centuries); ties at the same ms contribute dt=0
    under the (ms, event_id) total order mirrored by the oracle's
    window. Plan: ONE user-keyed exchange, block-local lexsort + masked
    diffs + reduceat (a user's rows are colocated by construction),
    zero driver-side state."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def _twap(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ms = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 1000
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = round_like_duckdb(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        order = np.lexsort((eid, ms, uid))
        uid, ms, cents = uid[order], ms[order], cents[order]
        same = (uid[1:] == uid[:-1]).astype(np.int64)
        dt = (ms[1:] - ms[:-1]) * same  # 0 across user boundaries
        w = np.append(cents[:-1] * dt, np.int64(0))  # exact int64
        uu, idx = np.unique(uid, return_index=True)
        n = np.diff(np.append(idx, len(uid)))
        swc = np.add.reduceat(w, idx)
        last = np.append(idx[1:], len(uid)) - 1
        span = ms[last] - ms[idx]
        keep = (n >= 2) & (span > 0)
        tw = round_like_duckdb(
            1e6 * (swc[keep] / 100.0) / span[keep], 0
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uu[keep], pa.int64()),
                "n_events": pa.array(n[keep].astype(np.int64), pa.int64()),
                "span_ms": pa.array(span[keep], pa.int64()),
                "twap_micro": pa.array(tw, pa.int64()),
            }
        )

    return ev.repartition(hash_partitions(8), keys=["user_id"]).map_batches(
        _twap, batch_format="pyarrow", batch_size=None
    )


SQL_Q269 = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000 AS ms, event_id,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events),
g AS (
  SELECT user_id, ms, cents,
         lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms
             AS dt
  FROM e),
a AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN dt IS NULL THEN 0 ELSE cents * dt END)
              AS BIGINT) AS swc,
         CAST(max(ms) - min(ms) AS BIGINT) AS span_ms
  FROM g GROUP BY 1)
SELECT user_id, n_events, span_ms,
       CAST(round(1e6 * (CAST(swc AS DOUBLE) / 100.0) / span_ms, 0)
            AS BIGINT) AS twap_micro
FROM a WHERE n_events >= 2 AND span_ms > 0
"""


def q270_degree_assortativity(sf_dir: str):
    """Degree assortativity of the customer<->supplier trade graph
    (Newman 2002: the Pearson correlation of endpoint degrees over
    edges) — do high-degree customers trade with high-degree suppliers
    (r > 0, hub-hub concentration) or with the long tail (r < 0, the
    disassortative shape typical of real commerce/web graphs)? The
    structural summary beside q94 centrality / q138 triangles / q185
    cores. Exactness: degrees are exact ints, so all five moment sums
    are exact (int64 block partials — bound: deg^2 x edges_per_block
    < 2^63 — merged into arbitrary-precision Python ints); ONE mirrored
    IEEE Pearson close. Plan: orders join + two keyed exchanges — by
    custkey (block-local pair distinct + cust-degree attach: a cust's
    pairs are colocated, so block-local distinct IS global), then by
    suppkey (supp-degree attach + O(1) moment partials per block)."""
    import numpy as np

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    od = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        od,
        join_type="inner",
        num_partitions=hash_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _dedup_degc(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "cust": t.column("o_custkey"),
                    "supp": t.column("l_suppkey"),
                }
            )
            .group_by(["cust", "supp"])
            .aggregate([])
        )
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        uu, inv, cnts = np.unique(cust, return_inverse=True, return_counts=True)
        dc = cnts[inv].astype(np.int64)
        # n_cust partial as a SUM-invariant column (first row carries the
        # block's distinct-cust count): survives the supp reshuffle, so
        # the single downstream pass closes n_cust without re-executing
        # this edge plan for a second consumer.
        nc_part = np.zeros(len(dc), dtype=np.int64)
        if len(nc_part):
            nc_part[0] = len(uu)
        return g.append_column("dc", pa.array(dc, pa.int64())).append_column(
            "nc_part", pa.array(nc_part, pa.int64())
        )

    edges = (
        joined.select_columns(["o_custkey", "l_suppkey"])
        .repartition(hash_partitions(8), keys=["o_custkey"])
        .map_batches(_dedup_degc, batch_format="pyarrow", batch_size=None)
    )

    def _moments(t: pa.Table) -> pa.Table:
        dc = t.column("dc").to_numpy(zero_copy_only=False)
        supp = t.column("supp").to_numpy(zero_copy_only=False)
        uu, inv, cnts = np.unique(supp, return_inverse=True, return_counts=True)
        ds = cnts[inv].astype(np.int64)
        nc = int(t.column("nc_part").to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "m": pa.array([len(dc)], pa.int64()),
                "nc": pa.array([nc], pa.int64()),
                "ns": pa.array([len(uu)], pa.int64()),
                "sdc": pa.array([int(dc.sum())], pa.int64()),
                "sds": pa.array([int(ds.sum())], pa.int64()),
                "sdc2": pa.array([int((dc * dc).sum())], pa.int64()),
                "sds2": pa.array([int((ds * ds).sum())], pa.int64()),
                "sdcds": pa.array([int((dc * ds).sum())], pa.int64()),
            }
        )

    parts = (
        edges.repartition(hash_partitions(8), keys=["supp"])
        .map_batches(_moments, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    m = sdc = sds = sdc2 = sds2 = sdcds = n_supp = n_cust = 0
    for r in parts:
        m += int(r["m"])
        n_cust += int(r["nc"])
        n_supp += int(r["ns"])
        sdc += int(r["sdc"])
        sds += int(r["sds"])
        sdc2 += int(r["sdc2"])
        sds2 += int(r["sds2"])
        sdcds += int(r["sdcds"])
    num = m * sdcds - sdc * sds
    v1, v2 = m * sdc2 - sdc * sdc, m * sds2 - sds * sds
    import math

    r_micro = int(
        round_like_duckdb(
            1e6 * float(num) / math.sqrt(float(v1) * float(v2)), 0
        )
    )
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "n_cust": pa.array([n_cust], pa.int64()),
            "n_supp": pa.array([n_supp], pa.int64()),
            "r_micro": pa.array([r_micro], pa.int64()),
        }
    )


SQL_Q270 = """
WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
dc AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM e GROUP BY 1),
dsx AS (SELECT s, CAST(count(*) AS BIGINT) AS ds FROM e GROUP BY 1),
j AS (SELECT dc.dc, dsx.ds FROM e JOIN dc USING (c) JOIN dsx USING (s)),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m,
              CAST(sum(dc) AS HUGEINT) AS sdc,
              CAST(sum(ds) AS HUGEINT) AS sds,
              CAST(sum(dc * dc) AS HUGEINT) AS sdc2,
              CAST(sum(ds * ds) AS HUGEINT) AS sds2,
              CAST(sum(dc * ds) AS HUGEINT) AS sdcds
       FROM j)
SELECT CAST(m AS BIGINT) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_cust,
       (SELECT CAST(count(*) AS BIGINT) FROM dsx) AS n_supp,
       CAST(round(1e6 * CAST(m * sdcds - sdc * sds AS DOUBLE)
                  / sqrt(CAST(m * sdc2 - sdc * sdc AS DOUBLE)
                         * CAST(m * sds2 - sds * sds AS DOUBLE)), 0)
            AS BIGINT) AS r_micro
FROM mm
"""


#: word2vec-style negative-sampling table: draws and smoothing exponent
Q271_DRAWS = 20000
Q271_SALT = "neg"


def q271_negative_sampling(sf_dir: str):
    """Word2vec-style negative-sampling table over the corpus unigram
    distribution (Mikolov et al. 2013: draw negatives ~ count^0.75 —
    the smoothing that lifts rare words above their raw frequency):
    the training-loop primitive that turns corpus counts into a
    reusable sampler. Exactness: weights are micro-rounded ints, the
    cumulative table is an exact int64 prefix sum over term-sorted
    vocab, and each draw is an md5 integer mod total mapped through
    exclusive-lo/inclusive-hi ranges — bit-replayable by the oracle's
    window cumsum + range join (bound: total weight < 2^63). Plan: one
    vocab-bounded (term, count) aggregation from block partials; the
    cumulative table, draws and bincount close on the driver's
    vocab-sized table (q175 discipline)."""
    import hashlib as _hashlib

    import numpy as np

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, Tokenizer

    docs = read_table(sf_dir, "documents", ["text"])

    class _TermCounts(Tokenizer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            from collections import Counter as _Counter

            counts = _Counter()
            for s in batch.column("text"):
                counts.update(self.tokens(s.as_py() or ""))
            return pa.table(
                {
                    "term": pa.array(list(counts.keys()), pa.string()),
                    "cnt": pa.array(list(counts.values()), pa.int64()),
                }
            )

    vocab = (
        docs.map_batches(_TermCounts, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("term", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    terms = np.array([r["term"] for r in vocab], dtype=object)
    cnt = np.array([int(r["cnt"]) for r in vocab], dtype=np.int64)
    order = np.argsort(terms)  # cum table is term-ordered on both sides
    terms, cnt = terms[order], cnt[order]
    weight = round_like_duckdb(1e6 * cnt.astype(np.float64) ** 0.75, 0).astype(
        np.int64
    )
    hi = np.cumsum(weight)
    total = int(hi[-1])
    draws = np.array(
        [
            int(
                _hashlib.md5(f"{Q271_SALT}:{s}".encode("utf-8")).hexdigest()[
                    :16
                ],
                16,
            )
            % total
            for s in range(Q271_DRAWS)
        ],
        dtype=np.uint64,
    )
    ix = np.searchsorted(hi, draws.astype(np.int64), side="right")
    n_drawn = np.bincount(ix, minlength=len(terms)).astype(np.int64)
    keep = n_drawn > 0
    return pa.table(
        {
            "term": pa.array(list(terms[keep]), pa.string()),
            "cnt": pa.array(cnt[keep], pa.int64()),
            "weight": pa.array(weight[keep], pa.int64()),
            "n_drawn": pa.array(n_drawn[keep], pa.int64()),
        }
    )


def _sql_q271() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tf AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
v AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tf GROUP BY 1),
w AS (SELECT term, cnt,
             CAST(round(1e6 * pow(cnt, 0.75), 0) AS BIGINT) AS weight
      FROM v),
c AS (SELECT term, cnt, weight,
             CAST(sum(weight) OVER (ORDER BY term
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
      FROM w),
c2 AS (SELECT term, cnt, weight, hi - weight AS lo, hi FROM c),
t AS (SELECT CAST(sum(weight) AS UBIGINT) AS total FROM w),
d AS (SELECT CAST(CAST('0x' || substring(
                md5('{Q271_SALT}:' || CAST(s AS VARCHAR)), 1, 16)
              AS UBIGINT) % (SELECT total FROM t) AS BIGINT) AS u
      FROM generate_series(0, {Q271_DRAWS - 1}) AS g(s))
SELECT c2.term, c2.cnt, c2.weight, CAST(count(*) AS BIGINT) AS n_drawn
FROM d JOIN c2 ON d.u >= c2.lo AND d.u < c2.hi
GROUP BY 1, 2, 3
"""


def q272_kendall_tau(sf_dir: str):
    """Exact grouped Kendall tau-b (quantity vs discount percent per
    return flag) via bounded-domain pair counting: both variables live
    on small integer domains, so concordant/discordant pair counts are
    exact products over the JOINT HISTOGRAM — no O(n^2) row pairs, no
    sort, no sampling (the rank-free sibling of q245 Spearman; tau-b's
    tie correction uses both marginals). Plan: one bounded (flag,
    quantity, discount_pct) cell aggregation fed by per-block Arrow
    group_by partials; the 550-cell-per-flag pair algebra closes on the
    driver with arbitrary-precision ints and ONE mirrored IEEE close
    per flag."""
    import math

    import numpy as np

    li = read_table(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"]
    )

    def _cells(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = round_like_duckdb(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        ones = pa.array(np.ones(len(q), dtype=np.int64), pa.int64())
        g = (
            pa.table(
                {
                    "flag": t.column("l_returnflag"),
                    "q": pa.array(q, pa.int64()),
                    "d": pa.array(d, pa.int64()),
                    "n": ones,
                }
            )
            .group_by(["flag", "q", "d"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["flag", "q", "d", "n"])

    cells = (
        li.map_batches(_cells, batch_format="pyarrow")
        .groupby(["flag", "q", "d"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_flag: dict = {}
    for r in cells:
        by_flag.setdefault(r["flag"], []).append(
            (int(r["q"]), int(r["d"]), int(r["n"]))
        )
    out = {
        "flag": [],
        "n_rows": [],
        "n_concordant": [],
        "n_discordant": [],
        "tau_b_micro": [],
    }
    for flag in sorted(by_flag):
        rows = by_flag[flag]
        q = np.array([r[0] for r in rows], dtype=np.int64)
        d = np.array([r[1] for r in rows], dtype=np.int64)
        n = np.array([r[2] for r in rows], dtype=object)  # exact Python ints
        q_lt, d_lt = q[:, None] < q[None, :], d[:, None] < d[None, :]
        d_gt = d[:, None] > d[None, :]
        prod = n[:, None] * n[None, :]
        conc = int((prod * (q_lt & d_lt)).sum())
        disc = int((prod * (q_lt & d_gt)).sum())
        nn = int(sum(int(x) for x in n))
        n0 = nn * (nn - 1) // 2
        n1 = 0
        for t in np.unique(q):
            tx = int(sum(int(x) for x in n[q == t]))
            n1 += tx * (tx - 1) // 2
        n2 = 0
        for t in np.unique(d):
            ty = int(sum(int(x) for x in n[d == t]))
            n2 += ty * (ty - 1) // 2
        tau = int(
            round_like_duckdb(
                1e6
                * float(conc - disc)
                / math.sqrt(float(n0 - n1) * float(n0 - n2)),
                0,
            )
        )
        out["flag"].append(flag)
        out["n_rows"].append(nn)
        out["n_concordant"].append(conc)
        out["n_discordant"].append(disc)
        out["tau_b_micro"].append(tau)
    return pa.table(
        {
            "flag": pa.array(out["flag"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_concordant": pa.array(out["n_concordant"], pa.int64()),
            "n_discordant": pa.array(out["n_discordant"], pa.int64()),
            "tau_b_micro": pa.array(out["tau_b_micro"], pa.int64()),
        }
    )


SQL_Q272 = """
WITH c AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2, 3),
tot AS (SELECT flag, CAST(sum(n) AS HUGEINT) AS nn FROM c GROUP BY 1),
cd AS (SELECT a.flag,
         CAST(coalesce(sum(CASE WHEN a.q < b.q AND a.d < b.d
                                THEN a.n * b.n END), 0) AS HUGEINT) AS conc,
         CAST(coalesce(sum(CASE WHEN a.q < b.q AND a.d > b.d
                                THEN a.n * b.n END), 0) AS HUGEINT) AS disc
       FROM c a JOIN c b ON a.flag = b.flag GROUP BY 1),
tx AS (SELECT flag, CAST(sum(t * (t - 1) // 2) AS HUGEINT) AS n1
       FROM (SELECT flag, q, sum(n) AS t FROM c GROUP BY 1, 2)
       GROUP BY 1),
ty AS (SELECT flag, CAST(sum(t * (t - 1) // 2) AS HUGEINT) AS n2
       FROM (SELECT flag, d, sum(n) AS t FROM c GROUP BY 1, 2)
       GROUP BY 1)
SELECT tot.flag, CAST(tot.nn AS BIGINT) AS n_rows,
       CAST(cd.conc AS BIGINT) AS n_concordant,
       CAST(cd.disc AS BIGINT) AS n_discordant,
       CAST(round(1e6 * CAST(cd.conc - cd.disc AS DOUBLE)
                  / sqrt(CAST(tot.nn * (tot.nn - 1) // 2 - tx.n1 AS DOUBLE)
                         * CAST(tot.nn * (tot.nn - 1) // 2 - ty.n2
                                AS DOUBLE)), 0) AS BIGINT) AS tau_b_micro
FROM tot JOIN cd USING (flag) JOIN tx USING (flag) JOIN ty USING (flag)
"""


#: Adamic-Adar: skew guard (custs above this degree are excluded on BOTH
#: sides — deterministic, oracle-replayable) and report size
Q273_MAX_DEG = 64
Q273_TOPK = 20


def q273_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the co-purchase bipartite graph:
    supplier pairs scored by their shared customers, each customer
    weighted 1/ln(degree) (Adamic & Adar 2003 — a shared pendant
    customer says more than a shared hub). The link-prediction rung
    beside q138 triangles / q270 assortativity. Exactness: per-customer
    weights are micro-rounded ints BEFORE the pair sum, so the
    distributed aggregation is reassociation-proof. Skew guard: custs
    with degree > Q273_MAX_DEG are excluded on BOTH sides (the pair
    fan-out is quadratic in degree; the cap is part of the operator's
    declared semantics, mirrored by the oracle's HAVING — the
    _bucket_pairs discipline). Plan: one cust-keyed exchange (block-
    local distinct + degree + pair emit), one pair-keyed aggregation,
    per-block top-k partials merged on the driver (blocks x k rows)."""
    import numpy as np

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
        g = (
            pa.table(
                {
                    "cust": t.column("o_custkey"),
                    "supp": t.column("l_suppkey"),
                }
            )
            .group_by(["cust", "supp"])
            .aggregate([])
        )
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        supp = g.column("supp").to_numpy(zero_copy_only=False)
        order = np.lexsort((supp, cust))
        cust, supp = cust[order], supp[order]
        uu, idx = np.unique(cust, return_index=True)
        ends = np.append(idx[1:], len(cust))
        out_a, out_b, out_w = [], [], []
        for k in range(len(uu)):
            block = supp[idx[k] : ends[k]]
            dc = len(block)
            if dc < 2 or dc > Q273_MAX_DEG:
                continue
            wc = int(round_like_duckdb(1e6 / np.log(float(dc)), 0))
            ia, ib = np.triu_indices(dc, k=1)
            out_a.append(block[ia])
            out_b.append(block[ib])
            out_w.append(np.full(len(ia), wc, dtype=np.int64))
        if out_a:
            s1 = np.concatenate(out_a)
            s2 = np.concatenate(out_b)
            w = np.concatenate(out_w)
        else:
            s1 = s2 = w = np.array([], dtype=np.int64)
        ones = np.ones(len(s1), dtype=np.int64)
        # block-local combiner: shrink the pair stream BEFORE the
        # exchange (pairs repeat across custs that hash to this block)
        return (
            pa.table(
                {
                    "s1": pa.array(s1.astype(np.int64), pa.int64()),
                    "s2": pa.array(s2.astype(np.int64), pa.int64()),
                    "w": pa.array(w, pa.int64()),
                    "n": pa.array(ones, pa.int64()),
                }
            )
            .group_by(["s1", "s2"])
            .aggregate([("w", "sum"), ("n", "sum")])
            .rename_columns(["s1", "s2", "w", "n"])
        )

    def _combine_topk(t: pa.Table) -> pa.Table:
        # pair-keyed repartition colocates each pair: block-local sum IS
        # the global score (Ray's HashAggregate is pathological on
        # multi-million-row unreduced pair streams — q189 discipline),
        # and only this block's top-k leaves.
        g = (
            t.group_by(["s1", "s2"])
            .aggregate([("n", "sum"), ("w", "sum")])
            .rename_columns(["s1", "s2", "n_common", "aa_micro"])
        )
        aa = g.column("aa_micro").to_numpy(zero_copy_only=False)
        s1c = g.column("s1").to_numpy(zero_copy_only=False)
        s2c = g.column("s2").to_numpy(zero_copy_only=False)
        k = min(Q273_TOPK, len(aa))
        # Block-local cut must mirror the oracle's TOTAL order
        # (aa_micro DESC, s1 ASC, s2 ASC): aa alone ties constantly
        # (sums of discrete 1/ln(deg) micro-weights), and an
        # argpartition keeps boundary ties arbitrarily — a tied pair
        # with smaller (s1, s2) could be dropped before the driver
        # merge. lexsort keys are last-is-primary.
        ix = np.lexsort((s2c, s1c, -aa))[:k]
        return g.take(pa.array(np.sort(ix)))

    cand = (
        joined.select_columns(["o_custkey", "l_suppkey"])
        .repartition(hash_partitions(8), keys=["o_custkey"])
        .map_batches(_pairs, batch_format="pyarrow", batch_size=None)
        .repartition(hash_partitions(8), keys=["s1", "s2"])
        .map_batches(_combine_topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    cand.sort(key=lambda r: (-int(r["aa_micro"]), int(r["s1"]), int(r["s2"])))
    cand = cand[:Q273_TOPK]
    return pa.table(
        {
            "rank": pa.array(range(1, len(cand) + 1), pa.int64()),
            "s1": pa.array([int(r["s1"]) for r in cand], pa.int64()),
            "s2": pa.array([int(r["s2"]) for r in cand], pa.int64()),
            "n_common": pa.array(
                [int(r["n_common"]) for r in cand], pa.int64()
            ),
            "aa_micro": pa.array(
                [int(r["aa_micro"]) for r in cand], pa.int64()
            ),
        }
    )


SQL_Q273 = f"""
WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
d AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM e GROUP BY 1
      HAVING count(*) BETWEEN 2 AND {Q273_MAX_DEG}),
w AS (SELECT c, CAST(round(1e6 / ln(dc), 0) AS BIGINT) AS wc FROM d),
p AS (SELECT a.s AS s1, b.s AS s2, w.wc
      FROM e a JOIN e b ON a.c = b.c AND a.s < b.s JOIN w ON w.c = a.c),
g AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(wc) AS BIGINT) AS aa_micro
      FROM p GROUP BY 1, 2)
SELECT CAST(row_number() OVER (ORDER BY aa_micro DESC, s1, s2) AS BIGINT)
           AS rank,
       s1, s2, n_common, aa_micro
FROM g ORDER BY aa_micro DESC, s1, s2 LIMIT {Q273_TOPK}
"""


def q274_pareto_frontier(sf_dir: str):
    """Pareto frontier (skyline) of the part catalog — minimize price,
    maximize size: every part no other part dominates (<= price, >=
    size, strict somewhere; equal points don't dominate each other, so
    coincident optima all survive). The multi-objective screen the
    top-k family can't express. Distributed correctness argument:
    dominance is transitive, so skyline(S) = skyline(union of per-block
    skylines) — each block emits its local frontier (a price-sorted
    running-max-size sweep) and the driver runs the SAME sweep once
    over the bounded candidate union. No exchange at all: one map pass
    + a frontier-sized driver close."""
    import numpy as np

    part = read_table(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def _sweep(key, price, size):
        """Keep iff size == its price-group max AND > every smaller-price
        group's max (ties on BOTH axes survive)."""
        order = np.lexsort((key, -size, price))
        key, price, size = key[order], price[order], size[order]
        uu, idx = np.unique(price, return_index=True)
        gmax = size[idx]  # sorted -size => first of each price group is max
        prev = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]))
        grp = np.searchsorted(uu, price)
        keep = (size == gmax[grp]) & (size > prev[grp])
        return key[keep], price[keep], size[keep]

    def _local(t: pa.Table) -> pa.Table:
        key = t.column("p_partkey").to_numpy(zero_copy_only=False)
        price = round_like_duckdb(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k, p, s = _sweep(key, price, size)
        return pa.table(
            {
                "p_partkey": pa.array(k, pa.int64()),
                "price_cents": pa.array(p, pa.int64()),
                "size": pa.array(s, pa.int64()),
            }
        )

    cand = part.map_batches(
        _local, batch_format="pyarrow", batch_size=None
    ).take_all()
    key = np.array([int(r["p_partkey"]) for r in cand], dtype=np.int64)
    price = np.array([int(r["price_cents"]) for r in cand], dtype=np.int64)
    size = np.array([int(r["size"]) for r in cand], dtype=np.int64)
    k, p, s = _sweep(key, price, size)
    return pa.table(
        {
            "p_partkey": pa.array(k, pa.int64()),
            "price_cents": pa.array(p, pa.int64()),
            "size": pa.array(s, pa.int64()),
        }
    )


SQL_Q274 = """
WITH v AS (SELECT p_partkey,
                  CAST(round(p_retailprice * 100, 0) AS BIGINT)
                      AS price_cents,
                  CAST(p_size AS BIGINT) AS size
           FROM part),
m AS (SELECT *,
             max(size) OVER (PARTITION BY price_cents) AS gmax,
             max(size) OVER (ORDER BY price_cents
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prevmax
      FROM v)
SELECT p_partkey, price_cents, size
FROM m WHERE size = gmax AND (prevmax IS NULL OR size > prevmax)
"""


#: DiD: arm salt (q253 convention, distinct experiment), period boundary
Q275_SALT = "did"
Q275_BOUNDARY = "2024-01-16"




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
