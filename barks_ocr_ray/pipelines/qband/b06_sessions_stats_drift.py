from __future__ import annotations

from barks_ocr_ray.pipelines.qband.b05_graph_embeddings_ranking import *  # noqa: F401,F403

def q219_filter_kappa(sf_dir: str):
    """Inter-filter agreement audit: Cohen's kappa between two
    independent quality gates — the Gopher repetition gate (q57
    thresholds) and a type-token-ratio gate (exact integer compare
    100*distinct >= PCT*total, no float threshold) — the standard
    rater-agreement check before trusting a cheap filter as a proxy
    for an expensive one.  Pure per-row pass: each block emits ONE
    confusion-cell partial row; the driver closes kappa from four
    exact ints (n*(po) and pe as integer products, one IEEE division
    mirrored by the oracle).  Zero exchanges."""
    import re as _re

    from collections import Counter as _Counter

    from barks_ocr_ray.functions.text import TOKEN_RE

    token_re = _re.compile(TOKEN_RE)
    top2_max, top3_max = Q57_TOP2_MAX, Q57_TOP3_MAX
    ttr_pct = Q219_TTR_PCT
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _cells(t: pa.Table) -> pa.Table:
        import numpy as np

        n11 = n10 = n01 = n00 = 0
        for s in t.column("text"):
            raw = s.as_py()
            if raw is None:
                continue
            toks = token_re.findall(raw.lower())
            n = len(toks)
            if n < 1:
                continue
            fracs = []
            for size in (2, 3):
                total = n - size + 1
                if total <= 0:
                    fracs.append(0.0)
                    continue
                counts = _Counter(
                    " ".join(toks[i : i + size]) for i in range(total)
                )
                fracs.append(max(counts.values()) / total)
            t2 = float(round_like_duckdb(np.array([fracs[0]]), 4)[0])
            t3 = float(round_like_duckdb(np.array([fracs[1]]), 4)[0])
            a_keep = not (t2 > top2_max or t3 > top3_max)
            b_keep = 100 * len(set(toks)) >= ttr_pct * n
            if a_keep and b_keep:
                n11 += 1
            elif a_keep:
                n10 += 1
            elif b_keep:
                n01 += 1
            else:
                n00 += 1
        return pa.table(
            {
                "n11": pa.array([n11], pa.int64()),
                "n10": pa.array([n10], pa.int64()),
                "n01": pa.array([n01], pa.int64()),
                "n00": pa.array([n00], pa.int64()),
            }
        )

    parts = docs.map_batches(_cells, batch_format="pyarrow").take_all()
    n11 = sum(int(r["n11"]) for r in parts)
    n10 = sum(int(r["n10"]) for r in parts)
    n01 = sum(int(r["n01"]) for r in parts)
    n00 = sum(int(r["n00"]) for r in parts)
    n = n11 + n10 + n01 + n00
    empty = pa.table(
        {
            "n_docs": pa.array([], pa.int64()),
            "n_both_keep": pa.array([], pa.int64()),
            "n_a_only": pa.array([], pa.int64()),
            "n_b_only": pa.array([], pa.int64()),
            "n_both_drop": pa.array([], pa.int64()),
            "agree_micro": pa.array([], pa.int64()),
            "kappa_micro": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    e = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)  # exact
    agree = int(round_like_duckdb(1e6 * float(n11 + n00) / float(n), 0))
    den = n * n - e
    if den > 0:
        num = n * (n11 + n00) - e
        kappa = pa.array(
            [int(round_like_duckdb(1e6 * float(num) / float(den), 0))],
            pa.int64(),
        )
    else:
        kappa = pa.nulls(1, pa.int64())
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_both_keep": pa.array([n11], pa.int64()),
            "n_a_only": pa.array([n10], pa.int64()),
            "n_b_only": pa.array([n01], pa.int64()),
            "n_both_drop": pa.array([n00], pa.int64()),
            "agree_micro": pa.array([agree], pa.int64()),
            "kappa_micro": kappa,
        }
    )


def _sql_q219() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents WHERE text IS NOT NULL),
g AS (
  SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bgs,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           AS tgs
  FROM t WHERE len(toks) >= 1),
b AS (SELECT doc_id, unnest(bgs) AS gram FROM g),
bc AS (SELECT doc_id, gram, count(*) AS c FROM b GROUP BY 1, 2),
btop AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bc GROUP BY 1),
tr AS (SELECT doc_id, unnest(tgs) AS gram FROM g),
tc AS (SELECT doc_id, gram, count(*) AS c FROM tr GROUP BY 1, 2),
ttop AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM tc GROUP BY 1),
f AS (
  SELECT g.doc_id,
         NOT (round(coalesce(CAST(btop.mx AS DOUBLE) / btop.tot, 0.0), 4)
                > {Q57_TOP2_MAX}
              OR round(coalesce(CAST(ttop.mx AS DOUBLE) / ttop.tot, 0.0), 4)
                > {Q57_TOP3_MAX}) AS a_keep,
         100 * g.nd >= {Q219_TTR_PCT} * g.n AS b_keep
  FROM g LEFT JOIN btop USING (doc_id) LEFT JOIN ttop USING (doc_id)),
c AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN a_keep AND b_keep THEN 1 END), 0)
         AS BIGINT) AS n11,
    CAST(coalesce(sum(CASE WHEN a_keep AND NOT b_keep THEN 1 END), 0)
         AS BIGINT) AS n10,
    CAST(coalesce(sum(CASE WHEN NOT a_keep AND b_keep THEN 1 END), 0)
         AS BIGINT) AS n01,
    CAST(coalesce(sum(CASE WHEN NOT a_keep AND NOT b_keep THEN 1 END), 0)
         AS BIGINT) AS n00
  FROM f),
k AS (SELECT n11 + n10 + n01 + n00 AS n,
             CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
               + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS e
      FROM c)
SELECT c.n11 + c.n10 + c.n01 + c.n00 AS n_docs,
       c.n11 AS n_both_keep, c.n10 AS n_a_only,
       c.n01 AS n_b_only, c.n00 AS n_both_drop,
       CAST(round(1e6 * (c.n11 + c.n00) / k.n, 0) AS BIGINT) AS agree_micro,
       CASE WHEN CAST(k.n AS HUGEINT) * k.n - k.e > 0 THEN
         CAST(round(1e6 * (CAST(k.n AS HUGEINT) * (c.n11 + c.n00) - k.e)
                    / (CAST(k.n AS HUGEINT) * k.n - k.e), 0) AS BIGINT)
       ELSE NULL END AS kappa_micro
FROM c, k
WHERE k.n > 0
"""


Q220_MIN_LEN = 2  #: terms shorter than this don't autocomplete
Q220_TOP_PREFIXES = 10
Q220_TOP_TERMS = 3


def q220_prefix_autocomplete(sf_dir: str):
    """Search-as-you-type completion index: for the TOP_PREFIXES
    hottest 1-char prefixes (by total term frequency), the TOP_TERMS
    most frequent completions (S12's search surface, at prefix
    resolution).  Plan: one tokenize pass ships block-level term-count
    partials into the vocab-bounded aggregation (q47 machinery); the
    prefix attach is a vectorized slice; per-prefix top-k runs via
    grouped_topk (hash-colocate prefix, block-local rank — no global
    sort); only the PREFIX-bounded totals table (≤ alphabet size)
    reaches the driver."""
    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    tok = Tokenizer()
    min_len = Q220_MIN_LEN
    docs = read_table(sf_dir, "documents", ["text"])

    def _counts(t: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        c: _Counter = _Counter()
        for s in t.column("text"):
            c.update(
                w for w in tok.tokens(s.as_py() or "") if len(w) >= min_len
            )
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    def _prefix(t: pa.Table) -> pa.Table:
        return t.append_column(
            "prefix", pc.utf8_slice_codeunits(t.column("term"), 0, 1)
        )

    terms = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby("term", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(_prefix, batch_format="pyarrow")
        .materialize()  # read by the totals agg AND the top-k pass
    )
    totals = (
        terms.groupby("prefix", num_partitions=2)
        .aggregate(Sum("c", alias_name="total"))
        .take_all()  # prefix-bounded (≤ alphabet size)
    )
    totals.sort(key=lambda r: (-int(r["total"]), r["prefix"]))
    hot = {r["prefix"] for r in totals[:Q220_TOP_PREFIXES]}
    topk = grouped_topk(
        terms, "prefix", "c", Q220_TOP_TERMS, tie_col="term"
    ).take_all()  # ≤ prefixes × TOP_TERMS
    rows = sorted(
        (
            (r["prefix"], int(r["rank"]), r["term"], int(r["c"]))
            for r in topk
            if r["prefix"] in hot
        ),
    )
    return pa.table(
        {
            "prefix": pa.array([r[0] for r in rows], pa.string()),
            "rank": pa.array([r[1] for r in rows], pa.int64()),
            "term": pa.array([r[2] for r in rows], pa.string()),
            "c": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_q220() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
       FROM tok WHERE len(term) >= {Q220_MIN_LEN} GROUP BY 1),
p AS (SELECT substr(term, 1, 1) AS prefix, term, c FROM tc),
pt AS (SELECT prefix, sum(c) AS total FROM p GROUP BY 1
       QUALIFY row_number() OVER (ORDER BY total DESC, prefix)
                 <= {Q220_TOP_PREFIXES}),
r AS (SELECT p.prefix, p.term, p.c,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY p.c DESC, p.term) AS rank
      FROM p JOIN pt USING (prefix)
      QUALIFY rank <= {Q220_TOP_TERMS})
SELECT prefix, CAST(rank AS BIGINT) AS rank, term, c
FROM r ORDER BY prefix, rank
"""


def q221_mutual_alignment(sf_dir: str):
    """Margin-based mutual-top-1 embedding alignment (bitext-mining
    primitive, Artetxe & Schwenk 2019) between the even-id and odd-id
    halves of the embeddings table — exact, block-nested-loop, no
    corpus broadcast (see ann.mutual_top1_alignment for the three
    exchange-bounded stages)."""
    from barks_ocr_ray.functions.ann import mutual_top1_alignment

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return mutual_top1_alignment(emb)


SQL_Q221 = """
WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id % 2 = 1),
ab AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              round(list_cosine_similarity(a.e, b.e), 6) AS cos
       FROM a, b),
ra AS (SELECT va, vb, cos,
              row_number() OVER (PARTITION BY va
                                 ORDER BY cos DESC, vb) AS rk
       FROM ab),
rb AS (SELECT va, vb,
              row_number() OVER (PARTITION BY vb
                                 ORDER BY cos DESC, va) AS rk
       FROM ab),
a1 AS (SELECT va, vb, cos FROM ra WHERE rk = 1),
a2 AS (SELECT va, cos AS cos2 FROM ra WHERE rk = 2),
b1 AS (SELECT va, vb FROM rb WHERE rk = 1)
SELECT a1.va AS vec_a, a1.vb AS vec_b, a1.cos AS cosine,
       CASE WHEN a2.cos2 > 0
         THEN CAST(round(1e6 * a1.cos / a2.cos2, 0) AS BIGINT)
       ELSE NULL END AS margin_micro
FROM a1
JOIN b1 ON a1.va = b1.va AND a1.vb = b1.vb
LEFT JOIN a2 ON a1.va = a2.va
ORDER BY vec_a
"""


def q222_grouped_trend(sf_dir: str):
    """Per-event-type OLS trend of value over time (slope / intercept /
    r² of integer-cents value vs epoch-day) — the 'is this source
    drifting' regression at key resolution.  Same exact-moments
    discipline as q154: the five sufficient statistics are exact int64
    block partials (order-independent keyed sums); slope, intercept
    (from the ROUNDED slope, so both engines derive from identical
    doubles) and r² are single mirrored IEEE expressions on the
    key-bounded driver table."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def _moments(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        y = round_like_duckdb(v * 100.0, 0).astype(np.int64)
        x = ts // 86_400_000_000  # epoch day
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
        .take_all()  # key-bounded
    )
    agg.sort(key=lambda r: r["event_type"])
    g_l, n_l, sl_l, ic_l, r2_l = [], [], [], [], []
    for r in agg:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        a = n * sxy - sx * sy
        b = n * sxx - sx * sx
        c = n * syy - sy * sy
        if b <= 0:
            continue  # single day (or empty): no trend defined
        slope = float(round_like_duckdb(float(a) / float(b), 6))
        intercept = float(
            round_like_duckdb(
                (float(sy) - slope * float(sx)) / float(n), 6
            )
        )
        r2 = (
            float(round_like_duckdb(float(a * a) / float(b * c), 6))
            if c > 0
            else None
        )
        g_l.append(r["event_type"])
        n_l.append(n)
        sl_l.append(slope)
        ic_l.append(intercept)
        r2_l.append(r2)
    return pa.table(
        {
            "event_type": pa.array(g_l, pa.string()),
            "n": pa.array(n_l, pa.int64()),
            "slope": pa.array(sl_l, pa.float64()),
            "intercept": pa.array(ic_l, pa.float64()),
            "r2": pa.array(r2_l, pa.float64()),
        }
    )


SQL_Q222 = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS sx,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sy,
         sum(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             * CAST(round(value * 100.0) AS BIGINT)) AS sxy,
         sum(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             * datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS sxx,
         sum(CAST(round(value * 100.0) AS BIGINT)
             * CAST(round(value * 100.0) AS BIGINT)) AS syy
  FROM events GROUP BY 1),
s AS (
  SELECT event_type, n, sx, sy, sxy, sxx, syy,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS a,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS b,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS c
  FROM m),
sl AS (
  SELECT *, round(CAST(a AS DOUBLE) / CAST(b AS DOUBLE), 6) AS slope
  FROM s WHERE b > 0)
SELECT event_type, n, slope,
       round((sy - slope * sx) / n, 6) AS intercept,
       CASE WHEN c > 0
         THEN round(CAST(a * a AS DOUBLE) / CAST(b * c AS DOUBLE), 6)
       ELSE NULL END AS r2
FROM sl
ORDER BY event_type
"""


def q223_trending_decay(sf_dir: str):
    """Exponentially-decayed event counts per type (half-life = one
    week, anchored at the corpus max day) — the 'trending now' score
    that weights this week's events 2× last week's.  Determinism
    discipline: ages are INTEGER weeks so 2^-w is an exact double, and
    each (type, week) bucket's contribution rounds to micro-units
    BEFORE the integer sum — no float accumulation anywhere, so the
    oracle replays bit-exactly regardless of either engine's sum
    order.  Two passes: a scalar max-day reduce, then a (types ×
    weeks)-bounded count aggregation."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["event_type", "ts"])

    def _day_max(t: pa.Table) -> pa.Table:
        d = pc.divide(
            t.column("ts").cast(pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        return pa.table(
            {"mxd": pa.array([pc.max(d).as_py()], pa.int64())}
        )

    mx_parts = ev.map_batches(_day_max, batch_format="pyarrow").take_all()
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "decayed_micro": pa.array([], pa.int64()),
        }
    )
    mxs = [int(r["mxd"]) for r in mx_parts if r["mxd"] is not None]
    if not mxs:
        return empty
    mxd = max(mxs)

    def _week_counts(t: pa.Table) -> pa.Table:
        day = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        wk = (mxd - day) // 7
        k = pa.table(
            {
                "event_type": t.column("event_type"),
                "wk": pa.array(wk, pa.int64()),
            }
        )
        return (
            k.group_by(["event_type", "wk"])
            .aggregate([("wk", "count")])
            .rename_columns(["event_type", "wk", "c"])
        )

    buckets = (
        ev.map_batches(_week_counts, batch_format="pyarrow")
        .groupby(["event_type", "wk"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # (types × weeks)-bounded
    )
    agg: dict = {}
    for r in buckets:
        et, wk, c = r["event_type"], int(r["wk"]), int(r["c"])
        n, dm = agg.get(et, (0, 0))
        contrib = int(
            round_like_duckdb((1e6 * float(c)) * (2.0 ** -wk), 0)
        )
        agg[et] = (n + c, dm + contrib)
    rows = sorted(
        ((et, n, dm) for et, (n, dm) in agg.items()),
        key=lambda x: (-x[2], x[0]),
    )
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "decayed_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


SQL_Q223 = """
WITH d AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events),
mx AS (SELECT max(day) AS mxd FROM d),
w AS (SELECT event_type, CAST((mx.mxd - day) // 7 AS BIGINT) AS wk,
             count(*) AS c
      FROM d, mx GROUP BY 1, 2)
SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
       CAST(sum(CAST(round(1e6 * c * pow(2.0, -wk), 0) AS BIGINT))
            AS BIGINT) AS decayed_micro
FROM w GROUP BY 1
ORDER BY decayed_micro DESC, event_type
"""


def q224_cluster_terms(sf_dir: str):
    """Topic labeling for embedding clusters: c-TF-IDF top-5 terms per
    cluster label (Grootendorst 2022, BERTopic §3.3 — each cluster is
    scored as ONE pseudo-document: tf share × ln(1 + avg_cluster_tokens
    / corpus term frequency)).  Distributed shape: one doc-keyed hash
    join attaches labels to text; one vocab-bounded (term, label) tf
    aggregation; the label totals are a k-bounded broadcast closure and
    the term-frequency attach is a term-keyed join; top-5 per label via
    grouped_topk (no global sort).  All inputs to the score are exact
    ints, the score is one mirrored IEEE expression."""
    import math as _math

    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS

    tok = Tokenizer()
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    emb = read_table(sf_dir, "embeddings", ["vec_id", "label"])
    joined = docs.join(
        emb,
        join_type="inner",
        num_partitions=hash_partitions(8),
        on=("doc_id",),
        right_on=("vec_id",),
    )

    def _tf(t: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        cnt: _Counter = _Counter()
        for lab, s in zip(
            t.column("label").to_pylist(), t.column("text")
        ):
            for w in tok.tokens(s.as_py() or ""):
                cnt[(int(lab), w)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "label": pa.array([k[0] for k in keys], pa.int64()),
                "term": pa.array([k[1] for k in keys], pa.string()),
                "tf": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    tf = (
        joined.map_batches(_tf, batch_format="pyarrow")
        .groupby(["term", "label"], num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("tf", alias_name="tf"))
        .materialize()  # read by tot, f AND the score join
    )
    tot_rows = (
        tf.groupby("label", num_partitions=2)
        .aggregate(Sum("tf", alias_name="tot"))
        .take_all()  # k-bounded
    )
    tot = {int(r["label"]): int(r["tot"]) for r in tot_rows}
    if not tot:
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "score_micro": pa.array([], pa.int64()),
            }
        )
    k = len(tot)
    tot_all = sum(tot.values())
    avg = float(tot_all) / float(k)  # mirrored: tot_all / k
    f = (
        tf.groupby("term", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("tf", alias_name="f"))
        .map_batches(
            lambda t: t.rename_columns(["fterm", "f"]),
            batch_format="pyarrow",
        )
    )
    scored_in = tf.join(
        f,
        join_type="inner",
        num_partitions=hash_partitions(VOCAB_PARTITIONS),
        on=("term",),
        right_on=("fterm",),
    )

    def _score(t: pa.Table) -> pa.Table:
        import numpy as np

        lab = t.column("label").to_numpy(zero_copy_only=False)
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        fv = t.column("f").to_numpy(zero_copy_only=False).astype(np.float64)
        totv = np.asarray([float(tot[int(x)]) for x in lab], np.float64)
        score = 1e6 * ((tfv / totv) * np.log(1.0 + (avg / fv)))
        return t.append_column(
            "score_micro",
            pa.array(
                round_like_duckdb(score, 0).astype("int64"), pa.int64()
            ),
        )

    topk = grouped_topk(
        scored_in.map_batches(_score, batch_format="pyarrow"),
        "label",
        "score_micro",
        5,
        tie_col="term",
    )
    return topk.select_columns(["label", "term", "tf", "score_micro"])


def _sql_q224() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH j AS (
  SELECT CAST(e.label AS BIGINT) AS label, d.text
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
tok AS (
  SELECT label, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}'))
           AS term
  FROM j),
tf AS (SELECT label, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
tot AS (SELECT label, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY 1),
f AS (SELECT term, CAST(sum(tf) AS BIGINT) AS f FROM tf GROUP BY 1),
c AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(tot) AS BIGINT) AS tot_all
      FROM tot),
s AS (SELECT tf.label, tf.term, tf.tf,
             CAST(round(1e6 * ((tf.tf / tot.tot)
                               * ln(1 + ((c.tot_all / c.k) / f.f))), 0)
                  AS BIGINT) AS score_micro
      FROM tf JOIN tot USING (label) JOIN f USING (term), c)
SELECT label, term, tf, score_micro FROM s
QUALIFY row_number() OVER (PARTITION BY label
                           ORDER BY score_micro DESC, term) <= 5
ORDER BY label, score_micro DESC, term
"""


def _daily_type_counts(sf_dir: str) -> list:
    """(event_type, epoch-day, count) rows — one keyed count
    aggregation, (types × days)-bounded, shared by the robust-stats
    family (q225/q226)."""
    ev = read_table(sf_dir, "events", ["event_type", "ts"])

    def _days(t: pa.Table) -> pa.Table:
        d = pc.divide(
            t.column("ts").cast(pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        k = pa.table({"event_type": t.column("event_type"), "day": d})
        return (
            k.group_by(["event_type", "day"])
            .aggregate([("day", "count")])
            .rename_columns(["event_type", "day", "c"])
        )

    return (
        ev.map_batches(_days, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # (types × days)-bounded
    )


def q225_theil_sen(sf_dir: str):
    """Theil–Sen robust trend of DAILY event volume per type: the
    lower median of all pairwise day-slopes — outlier days cannot drag
    the estimate the way they drag q222's OLS.  The distributed part
    is one (type, day) count aggregation; the O(days²) pair
    enumeration closes on the days-bounded driver table (the
    monitoring-window resolution, corpus-size independent).  Each
    slope is one identical IEEE division on both engines and the
    median is an EXPLICIT rank pick ((m+1)//2 after (slope, d1, d2)
    ordering) — no engine-specific quantile interpolation."""
    import numpy as np

    rows = _daily_type_counts(sf_dir)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["day"]), int(r["c"]))
        )
    g_l, nd_l, np_l, sm_l = [], [], [], []
    for et in sorted(by_type):
        pts = sorted(by_type[et])
        d = np.asarray([p[0] for p in pts], np.int64)
        c = np.asarray([p[1] for p in pts], np.int64)
        if len(d) < 2:
            continue
        i, j = np.triu_indices(len(d), k=1)
        slope = (c[j] - c[i]).astype(np.float64) / (
            d[j] - d[i]
        ).astype(np.float64)
        order = np.lexsort((d[j], d[i], slope))
        m = len(order)
        med = slope[order[(m + 1) // 2 - 1]]
        g_l.append(et)
        nd_l.append(len(d))
        np_l.append(m)
        sm_l.append(int(round_like_duckdb(1e6 * med, 0)))
    return pa.table(
        {
            "event_type": pa.array(g_l, pa.string()),
            "n_days": pa.array(nd_l, pa.int64()),
            "n_pairs": pa.array(np_l, pa.int64()),
            "slope_micro": pa.array(sm_l, pa.int64()),
        }
    )


SQL_Q225 = """
WITH d AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
p AS (
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         (b.c - a.c) / (b.day - a.day) AS slope
  FROM d a JOIN d b ON a.event_type = b.event_type AND b.day > a.day),
r AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM p),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
       FROM d GROUP BY 1)
SELECT r.event_type, nd.n_days, CAST(r.m AS BIGINT) AS n_pairs,
       CAST(round(1e6 * r.slope, 0) AS BIGINT) AS slope_micro
FROM r JOIN nd USING (event_type)
WHERE r.rn = (r.m + 1) // 2
ORDER BY r.event_type
"""


def q226_mad_anomaly_days(sf_dir: str):
    """Anomalous-volume days per event type: days whose daily count
    deviates from the type's median by more than 3× the median
    absolute deviation — the standard robust monitoring alarm, and
    INTEGER-ONLY end to end (counts, explicit lower-median rank picks,
    abs deviations), so both engines agree bit-for-bit with zero float
    expressions.  Distributed part: the shared (type, day) count
    aggregation; medians close on the days-bounded driver table."""
    rows = _daily_type_counts(sf_dir)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["day"]), int(r["c"]))
        )
    g_l, d_l, c_l, dev_l, mad_l = [], [], [], [], []
    for et in sorted(by_type):
        pts = sorted(by_type[et])
        cs = sorted(c for _, c in pts)
        med = cs[(len(cs) + 1) // 2 - 1]
        devs = sorted(abs(c - med) for _, c in pts)
        mad = devs[(len(devs) + 1) // 2 - 1]
        for day, c in pts:
            dev = abs(c - med)
            if dev > 3 * mad:
                g_l.append(et)
                d_l.append(day)
                c_l.append(c)
                dev_l.append(dev)
                mad_l.append(mad)
    return pa.table(
        {
            "event_type": pa.array(g_l, pa.string()),
            "day": pa.array(d_l, pa.int64()),
            "c": pa.array(c_l, pa.int64()),
            "dev": pa.array(dev_l, pa.int64()),
            "mad": pa.array(mad_l, pa.int64()),
        }
    )


SQL_Q226 = """
WITH d AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
m1 AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
med AS (SELECT event_type, c AS med FROM m1 WHERE rn = (n + 1) // 2),
dv AS (
  SELECT d.event_type, d.day, d.c, abs(d.c - med.med) AS dev
  FROM d JOIN med USING (event_type)),
m2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dv),
mad AS (SELECT event_type, dev AS mad FROM m2 WHERE rn = (n + 1) // 2)
SELECT dv.event_type, CAST(dv.day AS BIGINT) AS day, dv.c,
       CAST(dv.dev AS BIGINT) AS dev, CAST(mad.mad AS BIGINT) AS mad
FROM dv JOIN mad USING (event_type)
WHERE dv.dev > 3 * mad.mad
ORDER BY dv.event_type, dv.day
"""


def q227_group_purity(sf_dir: str):
    """Functional-dependency conformance audit (source → lang): per
    source, how close is it to a single language — the label-purity /
    FD-violation profile a data-quality layer runs before trusting a
    grouping column (companion to q104's row expectations and q139's
    schema drift, at VALUE resolution).  One (source, lang)-bounded
    count aggregation; purity and the majority pick close on the
    key-bounded driver table with an explicit (count desc, lang asc)
    tie rule."""
    docs = read_table(sf_dir, "documents", ["source", "lang"])

    def _counts(t: pa.Table) -> pa.Table:
        return (
            pa.table({"source": t.column("source"), "lang": t.column("lang")})
            .group_by(["source", "lang"])
            .aggregate([("lang", "count")])
            .rename_columns(["source", "lang", "c"])
        )

    rows = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["source", "lang"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # (sources × langs)-bounded
    )
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["lang"], int(r["c"])))
    s_l, n_l, k_l, tl_l, tc_l, p_l = [], [], [], [], [], []
    for src in sorted(by_src):
        langs = by_src[src]
        n_docs = sum(c for _, c in langs)
        top_lang, top_c = min(langs, key=lambda x: (-x[1], x[0]))
        s_l.append(src)
        n_l.append(n_docs)
        k_l.append(len(langs))
        tl_l.append(top_lang)
        tc_l.append(top_c)
        p_l.append(
            int(round_like_duckdb(1e6 * float(top_c) / float(n_docs), 0))
        )
    return pa.table(
        {
            "source": pa.array(s_l, pa.string()),
            "n_docs": pa.array(n_l, pa.int64()),
            "n_langs": pa.array(k_l, pa.int64()),
            "top_lang": pa.array(tl_l, pa.string()),
            "top_c": pa.array(tc_l, pa.int64()),
            "purity_micro": pa.array(p_l, pa.int64()),
        }
    )


SQL_Q227 = """
WITH g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, lang AS top_lang, c AS top_c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, lang) AS rn
      FROM g),
s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM g GROUP BY 1)
SELECT s.source, s.n_docs, s.n_langs, t.top_lang, t.top_c,
       CAST(round(1e6 * t.top_c / s.n_docs, 0) AS BIGINT) AS purity_micro
FROM s JOIN t ON s.source = t.source AND t.rn = 1
ORDER BY s.source
"""


Q228_TOUCHES = ("click", "signup", "view")


def q228_linear_attribution(sf_dir: str):
    """Linear multi-touch attribution: each purchase's cents split
    EQUALLY over every preceding touch event of the same user (q192's
    last-touch sibling — the other standard marketing credit model).
    Per-touch credit is one mirrored round(1000·cents/k) so the split
    is exact integers with no float accumulation.  One user-keyed
    exchange; each block's sorted-stream scan emits touch-type
    partials; the final table is touch-type-bounded."""
    import numpy as np

    touches = Q228_TOUCHES
    ev = read_table(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
    )

    def _scan(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_touch_credits": pa.array([], pa.int64()),
                "credit_millicents": pa.array([], pa.int64()),
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
        is_t = {ty: (et == ty) for ty in touches}
        is_p = et == "purchase"
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        tot_n = {ty: 0 for ty in touches}
        tot_c = {ty: 0 for ty in touches}
        for i, s in enumerate(seg):
            e = seg[i + 1] if i + 1 < len(seg) else len(u)
            cums = {
                ty: np.concatenate(
                    ([0], np.cumsum(is_t[ty][s:e])[:-1])
                )
                for ty in touches
            }
            for p_pos in np.flatnonzero(is_p[s:e]):
                k = sum(int(cums[ty][p_pos]) for ty in touches)
                if k == 0:
                    continue
                credit = int(
                    round_like_duckdb(
                        float(1000 * int(cents[s:e][p_pos])) / float(k), 0
                    )
                )
                for ty in touches:
                    n_ty = int(cums[ty][p_pos])
                    tot_n[ty] += n_ty
                    tot_c[ty] += n_ty * credit
        return pa.table(
            {
                "event_type": pa.array(list(touches), pa.string()),
                "n_touch_credits": pa.array(
                    [tot_n[ty] for ty in touches], pa.int64()
                ),
                "credit_millicents": pa.array(
                    [tot_c[ty] for ty in touches], pa.int64()
                ),
            }
        )

    parts = (
        ev.repartition(hash_partitions(16), keys=["user_id"])
        .map_batches(_scan, batch_format="pyarrow")
        .take_all()  # touch-types × blocks
    )
    agg: dict = {ty: [0, 0] for ty in touches}
    for r in parts:
        a = agg[r["event_type"]]
        a[0] += int(r["n_touch_credits"])
        a[1] += int(r["credit_millicents"])
    out = [(ty, *agg[ty]) for ty in sorted(touches) if agg[ty][0] > 0]
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out], pa.string()),
            "n_touch_credits": pa.array([r[1] for r in out], pa.int64()),
            "credit_millicents": pa.array([r[2] for r in out], pa.int64()),
        }
    )


SQL_Q228 = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events),
p AS (SELECT user_id, ts, event_id, cents FROM e
      WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts, event_id, event_type FROM e
      WHERE event_type IN {Q228_TOUCHES!r}),
pairs AS (
  SELECT p.event_id AS pid, p.cents, t.event_type
  FROM p JOIN t ON p.user_id = t.user_id
               AND (t.ts < p.ts
                    OR (t.ts = p.ts AND t.event_id < p.event_id))),
k AS (SELECT pid, CAST(count(*) AS BIGINT) AS k,
             CAST(round(1000 * any_value(cents) / count(*), 0) AS BIGINT)
               AS credit
      FROM pairs GROUP BY 1),
c AS (SELECT pairs.event_type, k.credit
      FROM pairs JOIN k USING (pid))
SELECT event_type, CAST(count(*) AS BIGINT) AS n_touch_credits,
       CAST(sum(credit) AS BIGINT) AS credit_millicents
FROM c GROUP BY 1
ORDER BY 1
"""


Q229_WINDOW = 14  #: days per observation/outcome window


def q229_churn_labels(sf_dir: str):
    """Churn-label table builder: per user active in the OBSERVATION
    window (first 14 corpus days), integer features (event count,
    purchases, cents, last-active relative day) plus the churn label =
    zero events in the following OUTCOME window — the standard
    leakage-safe label construction (features strictly from W1, label
    strictly from W2).  One scalar min-day reduce, then ONE user-keyed
    aggregation of per-block (user, window) partials; the result
    STREAMS (user-scale Dataset, nothing driver-side)."""
    import numpy as np

    w = Q229_WINDOW
    ev = read_table(
        sf_dir, "events", ["user_id", "ts", "event_type", "value"]
    )

    def _day_min(t: pa.Table) -> pa.Table:
        d = pc.divide(
            t.column("ts").cast(pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        return pa.table({"mnd": pa.array([pc.min(d).as_py()], pa.int64())})

    mn_parts = ev.map_batches(_day_min, batch_format="pyarrow").take_all()
    mns = [int(r["mnd"]) for r in mn_parts if r["mnd"] is not None]
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_purchases": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "last_day": pa.array([], pa.int64()),
            "churned": pa.array([], pa.bool_()),
        }
    )
    if not mns:
        return empty
    mnd = min(mns)

    def _partials(t: pa.Table) -> pa.Table:
        day = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
            - mnd
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist())
        cents = round_like_duckdb(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        w1 = day < w
        w2 = (day >= w) & (day < 2 * w)
        k = pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "w1_n": pa.array(w1.astype(np.int64), pa.int64()),
                "w1_purch": pa.array(
                    (w1 & (et == "purchase")).astype(np.int64), pa.int64()
                ),
                "w1_cents": pa.array(
                    np.where(w1, cents, 0), pa.int64()
                ),
                "w1_last": pa.array(
                    np.where(w1, day, -1), pa.int64()
                ),
                "w2_n": pa.array(w2.astype(np.int64), pa.int64()),
            }
        )
        return (
            k.group_by("user_id")
            .aggregate(
                [
                    ("w1_n", "sum"),
                    ("w1_purch", "sum"),
                    ("w1_cents", "sum"),
                    ("w1_last", "max"),
                    ("w2_n", "sum"),
                ]
            )
            .rename_columns(
                ["user_id", "w1_n", "w1_purch", "w1_cents", "w1_last", "w2_n"]
            )
        )

    agg = (
        ev.map_batches(_partials, batch_format="pyarrow")
        .groupby("user_id", num_partitions=hash_partitions(8))
        .aggregate(
            Sum("w1_n", alias_name="w1_n"),
            Sum("w1_purch", alias_name="w1_purch"),
            Sum("w1_cents", alias_name="w1_cents"),
            Max("w1_last", alias_name="w1_last"),
            Sum("w2_n", alias_name="w2_n"),
        )
    )

    def _finish(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("w1_n"), pa.scalar(0, pa.int64()))
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": t.column("w1_n"),
                "n_purchases": t.column("w1_purch"),
                "cents": t.column("w1_cents"),
                "last_day": t.column("w1_last"),
                "churned": pc.equal(
                    t.column("w2_n"), pa.scalar(0, pa.int64())
                ),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def _sql_q229() -> str:
    w = Q229_WINDOW
    return f"""
WITH e AS (
  SELECT user_id, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS cents,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
           - (SELECT min(datediff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE))) FROM events) AS day
  FROM events),
a AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN day < {w} THEN 1 END), 0) AS BIGINT)
           AS n_events,
         CAST(coalesce(sum(CASE WHEN day < {w}
                                 AND event_type = 'purchase'
                                THEN 1 END), 0) AS BIGINT) AS n_purchases,
         CAST(coalesce(sum(CASE WHEN day < {w} THEN cents END), 0)
              AS BIGINT) AS cents,
         CAST(coalesce(max(CASE WHEN day < {w} THEN day END), -1)
              AS BIGINT) AS last_day,
         CAST(coalesce(sum(CASE WHEN day >= {w} AND day < {2 * w}
                                THEN 1 END), 0) AS BIGINT) AS w2_n
  FROM e GROUP BY 1)
SELECT user_id, n_events, n_purchases, cents, last_day,
       w2_n = 0 AS churned
FROM a WHERE n_events > 0
ORDER BY user_id
"""


Q230_TERM = "data"
Q230_CTX = 3  #: tokens of context either side
Q230_K = 20


def q230_search_snippets(sf_dir: str):
    """KWIC (keyword-in-context) snippet generation — the search-result
    surface on top of S12's index: for the first Q230_K matching docs
    (doc_id asc), the 1-based position of the term's FIRST occurrence
    and a ±CTX-token window.  Pure per-row scan; each block emits only
    its local bottom-K matches, the driver merges blocks×K candidate
    rows — no global sort, no corpus-scale driver state."""
    tok = Tokenizer()
    term, ctx, k = Q230_TERM, Q230_CTX, Q230_K
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def _match(t: pa.Table) -> pa.Table:
        out_d, out_p, out_s = [], [], []
        for did, s in zip(
            t.column("doc_id").to_pylist(), t.column("text")
        ):
            toks = tok.tokens(s.as_py() or "")
            try:
                p0 = toks.index(term)
            except ValueError:
                continue
            lo = max(1, (p0 + 1) - ctx)  # 1-based inclusive, SQL slice rule
            hi = min(len(toks), (p0 + 1) + ctx)
            out_d.append(did)
            out_p.append(p0 + 1)
            out_s.append(" ".join(toks[lo - 1 : hi]))
        order = sorted(range(len(out_d)), key=lambda i: out_d[i])[:k]
        return pa.table(
            {
                "doc_id": pa.array([out_d[i] for i in order], pa.int64()),
                "pos": pa.array([out_p[i] for i in order], pa.int64()),
                "snippet": pa.array([out_s[i] for i in order], pa.string()),
            }
        )

    rows = docs.map_batches(_match, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["doc_id"])  # blocks×K candidates
    rows = rows[:k]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "pos": pa.array([r["pos"] for r in rows], pa.int64()),
            "snippet": pa.array([r["snippet"] for r in rows], pa.string()),
        }
    )


def _sql_q230() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
m AS (
  SELECT doc_id, toks, list_position(toks, '{Q230_TERM}') AS pos
  FROM t WHERE list_position(toks, '{Q230_TERM}') > 0)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(toks[greatest(1, pos - {Q230_CTX})
                            :least(len(toks), pos + {Q230_CTX})], ' ')
         AS snippet
FROM m ORDER BY doc_id LIMIT {Q230_K}
"""


Q231_BUDGET_PCT = 40  #: global token budget as % of corpus tokens


def q231_waterfill_budget(sf_dir: str):
    """Waterfilling token-budget allocation across sources: given a
    global budget B (= 40% of corpus tokens), find the integer cap c*
    such that every source keeps min(tokens, c*) and the total stays
    within B — the fair-share allocator behind q117's fixed quota and
    q63's fixed mixture (sources under the cap keep everything;
    surplus redistributes to the big ones).  One vocab-free tokenize
    count per source (sources-bounded agg); the sort + prefix walk
    closes on the sources-bounded driver table, ALL integer
    arithmetic."""
    from barks_ocr_ray.functions.text import TOKEN_RE as _TRE

    docs = read_table(sf_dir, "documents", ["source", "text"])

    def _counts(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), _TRE
        ).cast(pa.int64())
        k = pa.table({"source": t.column("source"), "tokens": n})
        return (
            k.group_by("source")
            .aggregate([("tokens", "sum")])
            .rename_columns(["source", "tokens"])
        )

    rows = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(Sum("tokens", alias_name="tokens"))
        .take_all()  # sources-bounded
    )
    srcs = sorted(
        ((r["source"], int(r["tokens"])) for r in rows),
        key=lambda x: (x[1], x[0]),
    )
    empty = pa.table(
        {
            "source": pa.array([], pa.string()),
            "tokens": pa.array([], pa.int64()),
            "alloc": pa.array([], pa.int64()),
            "capped": pa.array([], pa.bool_()),
        }
    )
    if not srcs:
        return empty
    total = sum(t for _, t in srcs)
    budget = (Q231_BUDGET_PCT * total) // 100
    n = len(srcs)
    prefix = 0
    cap = None
    for i, (_, t) in enumerate(srcs):
        if t * (n - i) + prefix > budget:  # first row the budget breaks at
            cap = (budget - prefix) // (n - i)
            break
        prefix += t
    out = []
    for s, t in srcs:
        capped = cap is not None and t > cap
        out.append((s, t, cap if capped else t, capped))
    out.sort()
    return pa.table(
        {
            "source": pa.array([r[0] for r in out], pa.string()),
            "tokens": pa.array([r[1] for r in out], pa.int64()),
            "alloc": pa.array([r[2] for r in out], pa.int64()),
            "capped": pa.array([r[3] for r in out], pa.bool_()),
        }
    )


def _sql_q231() -> str:
    from barks_ocr_ray.functions.text import TOKEN_RE

    return f"""
WITH c AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_RE}')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY 1),
b AS (SELECT ({Q231_BUDGET_PCT} * CAST(sum(tokens) AS BIGINT)) // 100
        AS budget FROM c),
r AS (
  SELECT source, tokens,
         CAST(coalesce(sum(tokens) OVER (ORDER BY tokens, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS prefix,
         CAST(count(*) OVER (ORDER BY tokens, source
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS rem
  FROM c),
v AS (
  SELECT (b.budget - r.prefix) // r.rem AS cap
  FROM r, b
  WHERE r.tokens * r.rem + r.prefix > b.budget
  ORDER BY r.tokens, r.source LIMIT 1)
SELECT r.source, r.tokens,
       CASE WHEN v.cap IS NOT NULL AND r.tokens > v.cap
            THEN v.cap ELSE r.tokens END AS alloc,
       coalesce(v.cap IS NOT NULL AND r.tokens > v.cap, FALSE) AS capped
FROM r LEFT JOIN v ON TRUE
ORDER BY r.source
"""


def q232_qq_drift(sf_dir: str):
    """Quantile–quantile mapping between the prior and new snapshot
    length distributions (q130's doc_id%10 split): the decile-level
    'where exactly did the distribution move' companion to q205's
    scalar KS statistic.  n_chars is a BOUNDED-domain integer, so the
    exact per-side quantiles come from one (side, value) count
    aggregation (domain-bounded exchange, no sort, no quickselect) and
    an explicit (d·n+9)//10 lower-rank pick on the driver — mirrored
    by the oracle's row_number pick, deterministic under ties."""
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _counts(t: pa.Table) -> pa.Table:
        import numpy as np

        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        side = ((did % 10) >= 7).astype(np.int64)
        k = pa.table(
            {
                "side": pa.array(side, pa.int64()),
                "v": t.column("n_chars"),
            }
        )
        return (
            k.group_by(["side", "v"])
            .aggregate([("v", "count")])
            .rename_columns(["side", "v", "c"])
        )

    rows = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["side", "v"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # 2 × value-domain bounded
    )
    hists: dict = {0: [], 1: []}
    for r in rows:
        hists[int(r["side"])].append((int(r["v"]), int(r["c"])))
    empty = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "v_prior": pa.array([], pa.int64()),
            "v_new": pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64()),
        }
    )
    if not hists[0] or not hists[1]:
        return empty

    def _pick(hist, idx):  # value at 1-based rank idx of the multiset
        cum = 0
        for v, c in sorted(hist):
            cum += c
            if cum >= idx:
                return v
        return sorted(hist)[-1][0]

    n0 = sum(c for _, c in hists[0])
    n1 = sum(c for _, c in hists[1])
    d_l, p_l, nw_l, dl_l = [], [], [], []
    for d in range(1, 10):
        vp = _pick(hists[0], (d * n0 + 9) // 10)
        vn = _pick(hists[1], (d * n1 + 9) // 10)
        d_l.append(d * 10)
        p_l.append(vp)
        nw_l.append(vn)
        dl_l.append(vn - vp)
    return pa.table(
        {
            "decile": pa.array(d_l, pa.int64()),
            "v_prior": pa.array(p_l, pa.int64()),
            "v_new": pa.array(nw_l, pa.int64()),
            "delta": pa.array(dl_l, pa.int64()),
        }
    )


SQL_Q232 = """
WITH s AS (
  SELECT CASE WHEN doc_id % 10 >= 7 THEN 1 ELSE 0 END AS side, n_chars
  FROM documents),
r AS (
  SELECT side, n_chars,
         row_number() OVER (PARTITION BY side ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY side) AS n
  FROM s),
g AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d),
p AS (
  SELECT g.d, r.side, r.n_chars
  FROM g JOIN r ON r.rn = (g.d * r.n + 9) // 10)
SELECT CAST(d * 10 AS BIGINT) AS decile,
       CAST(max(CASE WHEN side = 0 THEN n_chars END) AS BIGINT) AS v_prior,
       CAST(max(CASE WHEN side = 1 THEN n_chars END) AS BIGINT) AS v_new,
       CAST(max(CASE WHEN side = 1 THEN n_chars END)
            - max(CASE WHEN side = 0 THEN n_chars END) AS BIGINT) AS delta
FROM p GROUP BY 1
ORDER BY 1
"""


def q233_exact_auc(sf_dir: str):
    """Exact ROC-AUC of a deterministic score (n_chars) against a
    binary label (lang = 'en') via the tie-corrected rank-sum identity
    AUC = (#(pos > neg) + ½·ties) / (pos·neg) — the classifier-eval
    primitive next to q173's calibration bins, computed WITHOUT any
    per-row ranking: one (label, value) count aggregation over the
    bounded score domain, then an integer cumulative walk; the only
    float is the single mirrored final division (kept ×2 to stay
    integral until then)."""
    docs = read_table(sf_dir, "documents", ["n_chars", "lang"])

    def _counts(t: pa.Table) -> pa.Table:
        pos = pc.equal(t.column("lang"), pa.scalar("en"))
        k = pa.table(
            {
                "v": t.column("n_chars"),
                "pos": pos.cast(pa.int64()),
            }
        )
        return (
            k.group_by(["v", "pos"])
            .aggregate([("pos", "count")])
            .rename_columns(["v", "pos", "c"])
        )

    rows = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["v", "pos"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # 2 × value-domain bounded
    )
    by_v: dict = {}
    for r in rows:
        v = int(r["v"])
        cp, cn = by_v.get(v, (0, 0))
        if int(r["pos"]) == 1:
            cp += int(r["c"])
        else:
            cn += int(r["c"])
        by_v[v] = (cp, cn)
    empty = pa.table(
        {
            "n_pos": pa.array([], pa.int64()),
            "n_neg": pa.array([], pa.int64()),
            "auc_micro": pa.array([], pa.int64()),
        }
    )
    num2 = 0  # 2·#(pos>neg) + ties, exact
    cum_neg = 0
    for v in sorted(by_v):
        cp, cn = by_v[v]
        num2 += cp * (2 * cum_neg + cn)
        cum_neg += cn
    n_pos = sum(cp for cp, _ in by_v.values())
    n_neg = sum(cn for _, cn in by_v.values())
    if n_pos == 0 or n_neg == 0:
        return empty
    auc = int(
        round_like_duckdb(
            1e6 * float(num2) / float(2 * n_pos * n_neg), 0
        )
    )
    return pa.table(
        {
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "auc_micro": pa.array([auc], pa.int64()),
        }
    )


SQL_Q233 = """
WITH c AS (
  SELECT n_chars AS v,
         CAST(coalesce(sum(CASE WHEN lang = 'en' THEN 1 END), 0)
              AS BIGINT) AS cp,
         CAST(coalesce(sum(CASE WHEN lang <> 'en' THEN 1 END), 0)
              AS BIGINT) AS cn
  FROM documents GROUP BY 1),
w AS (
  SELECT cp, cn,
         CAST(coalesce(sum(cn) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_neg
  FROM c),
t AS (SELECT CAST(sum(cp * (2 * cum_neg + cn)) AS HUGEINT) AS num2,
             CAST(sum(cp) AS BIGINT) AS n_pos,
             CAST(sum(cn) AS BIGINT) AS n_neg
      FROM w)
SELECT n_pos, n_neg,
       CAST(round(1e6 * num2 / (2 * CAST(n_pos AS HUGEINT) * n_neg), 0)
            AS BIGINT) AS auc_micro
FROM t WHERE n_pos > 0 AND n_neg > 0
"""


Q234_FOLDS = 5


def q234_fold_balance(sf_dir: str):
    """K-fold cross-validation assignment + balance audit: folds come
    from the oracle-replayable md5 unit fraction (q113's convention,
    pure row function — stable under any partitioning) and the audit
    reports every (fold, lang) cell of the FULL grid with its
    χ²-contribution vs the independence expectation (zero-count cells
    included — they contribute e).  One (fold, lang)-bounded count
    aggregation; the grid and the per-cell mirrored IEEE expression
    close on the cells-bounded driver table; contributions are
    micro-rounded per cell so no float accumulation exists anywhere."""
    import numpy as np

    from barks_ocr_ray.functions.hashing import unit_fractions

    k = Q234_FOLDS
    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def _cells(t: pa.Table) -> pa.Table:
        u = unit_fractions(t.column("doc_id").to_pylist(), method="md5")
        fold = np.floor(u * k).astype(np.int64)
        g = pa.table(
            {"fold": pa.array(fold, pa.int64()), "lang": t.column("lang")}
        )
        return (
            g.group_by(["fold", "lang"])
            .aggregate([("lang", "count")])
            .rename_columns(["fold", "lang", "n"])
        )

    rows = (
        docs.map_batches(_cells, batch_format="pyarrow")
        .groupby(["fold", "lang"], num_partitions=2)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # (folds × langs)-bounded
    )
    counts = {(int(r["fold"]), r["lang"]): int(r["n"]) for r in rows}
    folds = sorted({f for f, _ in counts})
    langs = sorted({l for _, l in counts})
    total = sum(counts.values())
    empty = pa.table(
        {
            "fold": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "chi2_micro": pa.array([], pa.int64()),
        }
    )
    if total == 0:
        return empty
    row_tot = {f: sum(counts.get((f, l), 0) for l in langs) for f in folds}
    col_tot = {l: sum(counts.get((f, l), 0) for f in folds) for l in langs}
    f_l, l_l, n_l, x_l = [], [], [], []
    for f in folds:
        for l in langs:
            o = counts.get((f, l), 0)
            e = float(row_tot[f] * col_tot[l]) / float(total)
            x = (1e6 * ((float(o) - e) * (float(o) - e))) / e
            f_l.append(f)
            l_l.append(l)
            n_l.append(o)
            x_l.append(int(round_like_duckdb(x, 0)))
    return pa.table(
        {
            "fold": pa.array(f_l, pa.int64()),
            "lang": pa.array(l_l, pa.string()),
            "n": pa.array(n_l, pa.int64()),
            "chi2_micro": pa.array(x_l, pa.int64()),
        }
    )


def _sql_q234() -> str:
    return f"""
WITH f AS (
  SELECT CAST(floor(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                    1, 8)) AS UBIGINT)
                    / 4294967296.0 * {Q234_FOLDS}) AS BIGINT) AS fold,
         lang
  FROM documents),
c AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2),
grid AS (
  SELECT ff.fold, ll.lang
  FROM (SELECT DISTINCT fold FROM c) ff, (SELECT DISTINCT lang FROM c) ll),
g AS (
  SELECT grid.fold, grid.lang, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM grid LEFT JOIN c USING (fold, lang)),
rt AS (SELECT fold, CAST(sum(n) AS BIGINT) AS rn FROM g GROUP BY 1),
ct AS (SELECT lang, CAST(sum(n) AS BIGINT) AS cn FROM g GROUP BY 1),
tt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g)
SELECT g.fold, g.lang, g.n,
       CAST(round(1e6 * ((g.n - CAST(rt.rn AS HUGEINT) * ct.cn / tt.t)
                         * (g.n - CAST(rt.rn AS HUGEINT) * ct.cn / tt.t))
                  / (CAST(rt.rn AS HUGEINT) * ct.cn / tt.t), 0)
            AS BIGINT) AS chi2_micro
FROM g JOIN rt USING (fold) JOIN ct USING (lang), tt
ORDER BY g.fold, g.lang
"""


def q235_host_budget(sf_dir: str):
    """Per-host crawl-budget rollup over the EXTRACTED corpus: pages,
    extracted characters and mean doc size per host — the politeness /
    budget planning report a crawler scheduler consumes (host = url
    authority; q164 canonicalizes, this aggregates).  Runs the real
    extraction pipeline, then one hosts-bounded count/sum aggregation;
    the mean is the single mirrored IEEE division."""
    extracted = _extracted_docs()

    def _host_partials(t: pa.Table) -> pa.Table:
        hosts, chars = [], []
        for url, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            hosts.append(url.split("/")[2])
            chars.append(len(txt) if txt is not None else 0)
        k = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "chars": pa.array(chars, pa.int64()),
            }
        )
        return (
            k.group_by("host")
            .aggregate([("chars", "sum"), ("host", "count")])
            .rename_columns(["host", "chars", "n_pages"])
        )

    rows = (
        extracted.map_batches(_host_partials, batch_format="pyarrow")
        .groupby("host", num_partitions=2)
        .aggregate(
            Sum("chars", alias_name="chars"),
            Sum("n_pages", alias_name="n_pages"),
        )
        .take_all()  # hosts-bounded
    )
    rows.sort(key=lambda r: r["host"])
    return pa.table(
        {
            "host": pa.array([r["host"] for r in rows], pa.string()),
            "n_pages": pa.array(
                [int(r["n_pages"]) for r in rows], pa.int64()
            ),
            "chars": pa.array([int(r["chars"]) for r in rows], pa.int64()),
            "avg_chars": pa.array(
                [
                    float(
                        round_like_duckdb(
                            float(int(r["chars"])) / float(int(r["n_pages"])),
                            2,
                        )
                    )
                    for r in rows
                ],
                pa.float64(),
            ),
        }
    )


def _sql_q235() -> str:
    from barks_ocr_ray.oracle_data import Q24_N, extraction_golden_path

    return f"""
WITH e AS (
  SELECT string_split(url, '/')[3] AS host,
         CAST(len(extracted_text) AS BIGINT) AS chars
  FROM read_parquet('{extraction_golden_path(Q24_N)}'))
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(chars) AS BIGINT) AS chars,
       round(sum(chars) / count(*), 2) AS avg_chars
FROM e GROUP BY 1
ORDER BY host
"""


Q236_SPLIT = 250  #: docs below = base index, docs at/above = delta


def q236_delta_index_merge(sf_dir: str):
    """Incremental index maintenance: the word index is built as BASE
    (old docs) + DELTA (new docs) and merged with one word-keyed sum —
    the nightly-index-update path next to q129's incremental dedup and
    q136's incremental MinHash.  The oracle is the FULL REBUILD over
    all docs (q08's SQL), so the check IS the merge-equals-rebuild
    invariant.  Exchanges: two vocab-bounded partial aggregations +
    one vocab-bounded merge — never a re-tokenize of the base corpus
    at delta time."""
    from barks_ocr_ray.functions.text import VOCAB_PARTITIONS, word_index

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    base = docs.filter(expr=f"doc_id < {Q236_SPLIT}")
    delta = docs.filter(expr=f"doc_id >= {Q236_SPLIT}")
    return (
        word_index(base)
        .union(word_index(delta))
        .groupby("word", num_partitions=VOCAB_PARTITIONS)
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_Q236 = """
SELECT word, count(*) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents) t
GROUP BY word
"""


Q237_ALPHA_PCT = 10  #: miscoverage target (alpha = 10%)


def q237_conformal_coverage(sf_dir: str):
    """Split-conformal calibration (Vovk; Angelopoulos & Bates 2021
    §2): the threshold is the ceil((n_cal+1)(1−α))-th smallest
    calibration score (explicit integer rank — no quantile
    interpolation) and the audit reports empirical coverage on the
    held-out side.  Score = n_chars, calibration/test = the q130
    doc_id%10 split.  n_chars is bounded-domain, so both sides come
    from ONE (side, value) count aggregation; the rank walk and the
    single mirrored division close on the domain-bounded driver
    table."""
    import numpy as np

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def _counts(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        side = ((did % 10) >= 7).astype(np.int64)
        k = pa.table(
            {
                "side": pa.array(side, pa.int64()),
                "v": t.column("n_chars"),
            }
        )
        return (
            k.group_by(["side", "v"])
            .aggregate([("v", "count")])
            .rename_columns(["side", "v", "c"])
        )

    rows = (
        docs.map_batches(_counts, batch_format="pyarrow")
        .groupby(["side", "v"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # 2 × value-domain bounded
    )
    hists: dict = {0: [], 1: []}
    for r in rows:
        hists[int(r["side"])].append((int(r["v"]), int(r["c"])))
    empty = pa.table(
        {
            "n_cal": pa.array([], pa.int64()),
            "n_test": pa.array([], pa.int64()),
            "threshold": pa.array([], pa.int64()),
            "cov_micro": pa.array([], pa.int64()),
        }
    )
    n_cal = sum(c for _, c in hists[0])
    n_test = sum(c for _, c in hists[1])
    if n_cal == 0 or n_test == 0:
        return empty
    rk = ((n_cal + 1) * (100 - Q237_ALPHA_PCT) + 99) // 100  # ceil
    if rk <= n_cal:
        cum = 0
        thr = None
        for v, c in sorted(hists[0]):
            cum += c
            if cum >= rk:
                thr = v
                break
        n_cov = sum(c for v, c in hists[1] if v <= thr)
        thr_arr = pa.array([thr], pa.int64())
        cov = int(
            round_like_duckdb(1e6 * float(n_cov) / float(n_test), 0)
        )
    else:  # not enough calibration mass: vacuous infinite threshold
        thr_arr = pa.nulls(1, pa.int64())
        cov = 1_000_000
    return pa.table(
        {
            "n_cal": pa.array([n_cal], pa.int64()),
            "n_test": pa.array([n_test], pa.int64()),
            "threshold": thr_arr,
            "cov_micro": pa.array([cov], pa.int64()),
        }
    )


def _sql_q237() -> str:
    a = Q237_ALPHA_PCT
    return f"""
WITH s AS (
  SELECT CASE WHEN doc_id % 10 >= 7 THEN 1 ELSE 0 END AS side,
         n_chars AS v
  FROM documents),
cal AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         count(*) OVER () AS n
  FROM s WHERE side = 0),
r AS (SELECT n, ((n + 1) * {100 - a} + 99) // 100 AS rk
      FROM (SELECT DISTINCT n FROM cal)),
q AS (SELECT r.n AS n_cal,
             CASE WHEN r.rk <= r.n
               THEN (SELECT v FROM cal WHERE rn = r.rk) END AS thr
      FROM r),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(coalesce(sum(CASE WHEN s.v <= q.thr THEN 1 END), 0)
                  AS BIGINT) AS n_cov
      FROM s, q WHERE s.side = 1)
SELECT CAST(q.n_cal AS BIGINT) AS n_cal, t.n_test,
       CAST(q.thr AS BIGINT) AS threshold,
       CASE WHEN q.thr IS NULL THEN 1000000
            ELSE CAST(round(1e6 * t.n_cov / t.n_test, 0) AS BIGINT)
       END AS cov_micro
FROM q, t
WHERE t.n_test > 0
"""


Q238_QS = [0.25, 0.5, 0.75]


def q238_conversion_latency(sf_dir: str):
    """Conversion-latency distribution: seconds from each user's FIRST
    signup to their first purchase AFTER it (ROWS tie rule on
    (ts, event_id), q192's convention), summarized as exact quartiles
    — the activation-funnel timing report.  One user-keyed exchange +
    per-block sorted-stream scan emits a users-bounded latency stream;
    the quartiles ride the counting quickselect (q66 machinery), so no
    global sort and DuckDB's quantile_disc rank rule bit-matches."""
    import numpy as np

    from barks_ocr_ray.functions.quantiles import distributed_quantiles

    ev = read_table(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]
    )

    def _latency(t: pa.Table) -> pa.Table:
        empty = pa.table({"latency_sec": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist())
        order = np.lexsort((eid, us, u))
        u, us, et = u[order], us[order], et[order]
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        out = []
        for i, s in enumerate(seg):
            e = seg[i + 1] if i + 1 < len(seg) else len(u)
            sign = np.flatnonzero(et[s:e] == "signup")
            if not len(sign):
                continue
            first = sign[0]
            purch = np.flatnonzero(et[s:e][first + 1 :] == "purchase")
            if not len(purch):
                continue
            p_pos = first + 1 + purch[0]
            out.append(int((us[s:e][p_pos] - us[s:e][first]) // 1_000_000))
        return pa.table({"latency_sec": pa.array(out, pa.int64())})

    lat = ev.repartition(hash_partitions(16), keys=["user_id"]).map_batches(
        _latency, batch_format="pyarrow"
    )
    t = distributed_quantiles(lat, "latency_sec", Q238_QS, pull_cap=2000)
    return rd.from_arrow(t)


def _sql_q238() -> str:
    parts = " UNION ALL ".join(
        f"SELECT {q} AS q, CAST(quantile_disc(latency_sec, {q}) AS DOUBLE)"
        f" AS value FROM lat"
        for q in Q238_QS
    )
    return f"""
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
s AS (
  SELECT user_id, us, event_id FROM e WHERE event_type = 'signup'
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY us, event_id) = 1),
p AS (
  SELECT s.user_id, (p.us - s.us) // 1000000 AS latency_sec,
         row_number() OVER (PARTITION BY s.user_id
                            ORDER BY p.us, p.event_id) AS rn
  FROM s JOIN e p ON p.user_id = s.user_id
                 AND p.event_type = 'purchase'
                 AND (p.us > s.us
                      OR (p.us = s.us AND p.event_id > s.event_id))),
lat AS (SELECT CAST(latency_sec AS BIGINT) AS latency_sec
        FROM p WHERE rn = 1)
SELECT q, value FROM ({parts}) ORDER BY q
"""


def q239_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions (q166's interval convention: start =
    ts, duration = value minutes) via the classic sweep-line — but
    DISTRIBUTED as a scan-combine: one range sort of the ±1 delta
    stream on the UNIQUE key (t, d, event_id), then each batch emits
    O(1) partials (its delta total + its internal running max) and the
    driver folds the batches-bounded list left-to-right (prefix-sum
    carry + max), exactly the parallel-prefix decomposition of the
    sequential scan.  Zero-length intervals cancel before they count
    (ends sort before starts at equal t) — mirrored by the oracle's
    window ORDER BY."""
    import numpy as np

    ev = read_table(sf_dir, "events", ["event_id", "ts", "value"])

    def _deltas(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        dur = np.maximum(
            round_like_duckdb(
                t.column("value").to_numpy(zero_copy_only=False) * 60.0, 0
            ).astype(np.int64),
            0,
        )
        en = s + dur * 1_000_000
        return pa.table(
            {
                "t": pa.array(np.concatenate([s, en]), pa.int64()),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]
                    ),
                    pa.int64(),
                ),
                "event_id": pa.array(np.concatenate([eid, eid]), pa.int64()),
            }
        )

    def _scan_partials(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        return pa.table(
            {
                "first_t": pa.array([int(t.column("t")[0].as_py())], pa.int64()),
                "first_d": pa.array([int(d[0])], pa.int64()),
                "first_eid": pa.array(
                    [int(t.column("event_id")[0].as_py())], pa.int64()
                ),
                "total": pa.array([int(run[-1])], pa.int64()),
                "best": pa.array([int(run.max())], pa.int64()),
            }
        )

    parts = (
        ev.map_batches(_deltas, batch_format="pyarrow")
        .sort(["t", "d", "event_id"])
        .map_batches(_scan_partials, batch_format="pyarrow")
        .take_all()  # batches-bounded
    )
    empty = pa.table(
        {
            "n_intervals": pa.array([], pa.int64()),
            "peak": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    parts.sort(key=lambda r: (r["first_t"], r["first_d"], r["first_eid"]))
    acc, peak = 0, 0
    for r in parts:
        peak = max(peak, acc + int(r["best"]))
        acc += int(r["total"])
    n_intervals = ev.count()
    return pa.table(
        {
            "n_intervals": pa.array([int(n_intervals)], pa.int64()),
            "peak": pa.array([peak], pa.int64()),
        }
    )


SQL_Q239 = """
WITH e AS (
  SELECT event_id, epoch_us(ts) AS s,
         epoch_us(ts)
           + greatest(CAST(round(value * 60, 0) AS BIGINT), 0) * 1000000
           AS en
  FROM events),
d AS (
  SELECT s AS t, 1 AS d, event_id FROM e
  UNION ALL
  SELECT en AS t, -1 AS d, event_id FROM e),
w AS (
  SELECT sum(d) OVER (ORDER BY t, d, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM d)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_intervals,
       CAST(max(running) AS BIGINT) AS peak
FROM w
"""


def q240_ht_estimate(sf_dir: str):
    """Horvitz–Thompson estimator audit for unequal-probability
    sampling: docs sample at lang-dependent rates (en 1/2, others 1/4
    — md5 unit fraction, oracle-replayable), the HT total re-weights
    each sampled doc by its inverse inclusion probability, and the
    audit reports the signed relative error vs the exact total — the
    q184/q203/q210-style correctness harness for the SAMPLING family.
    Inverse rates are integers (2 and 4), so the estimate is EXACT
    int64 arithmetic end-to-end; one doc pass, O(1) partials per
    block, one mirrored division."""
    import numpy as np

    from barks_ocr_ray.functions.hashing import unit_fractions

    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def _partials(t: pa.Table) -> pa.Table:
        u = unit_fractions(t.column("doc_id").to_pylist(), method="md5")
        lang = np.asarray(t.column("lang").to_pylist())
        chars = t.column("n_chars").to_numpy(zero_copy_only=False)
        w = np.where(lang == "en", 2, 4).astype(np.int64)  # 1/rate
        keep = u * w < 1.0  # u < rate, rate = 1/w
        return pa.table(
            {
                "n_docs": pa.array([len(u)], pa.int64()),
                "n_sampled": pa.array([int(keep.sum())], pa.int64()),
                "exact_chars": pa.array([int(chars.sum())], pa.int64()),
                "ht_chars": pa.array(
                    [int((chars[keep] * w[keep]).sum())], pa.int64()
                ),
            }
        )

    parts = docs.map_batches(_partials, batch_format="pyarrow").take_all()
    n_docs = sum(int(r["n_docs"]) for r in parts)
    n_sampled = sum(int(r["n_sampled"]) for r in parts)
    exact = sum(int(r["exact_chars"]) for r in parts)
    ht = sum(int(r["ht_chars"]) for r in parts)
    empty = pa.table(
        {
            "n_docs": pa.array([], pa.int64()),
            "n_sampled": pa.array([], pa.int64()),
            "exact_chars": pa.array([], pa.int64()),
            "ht_chars": pa.array([], pa.int64()),
            "err_micro": pa.array([], pa.int64()),
        }
    )
    if exact == 0:
        return empty
    err = int(
        round_like_duckdb(1e6 * float(ht - exact) / float(exact), 0)
    )
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_sampled": pa.array([n_sampled], pa.int64()),
            "exact_chars": pa.array([exact], pa.int64()),
            "ht_chars": pa.array([ht], pa.int64()),
            "err_micro": pa.array([err], pa.int64()),
        }
    )


SQL_Q240 = """
WITH d AS (
  SELECT n_chars,
         CASE WHEN lang = 'en' THEN 2 ELSE 4 END AS w,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u
  FROM documents),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(coalesce(sum(CASE WHEN u * w < 1.0 THEN 1 END), 0)
              AS BIGINT) AS n_sampled,
         CAST(sum(n_chars) AS BIGINT) AS exact_chars,
         CAST(coalesce(sum(CASE WHEN u * w < 1.0 THEN n_chars * w END), 0)
              AS BIGINT) AS ht_chars
  FROM d)
SELECT n_docs, n_sampled, exact_chars, ht_chars,
       CAST(round(1e6 * (ht_chars - exact_chars) / exact_chars, 0)
            AS BIGINT) AS err_micro
FROM t WHERE exact_chars > 0
"""


def q241_gini_concentration(sf_dir: str):
    """Per-source Gini coefficient of document length — the corpus
    concentration audit a curation pipeline tracks per provider (a
    source whose byte mass concentrates in a few giant docs packs and
    shards very differently from a uniform one). Uses the rank-weighted
    identity G = 2*SUM(i*x_i)/(n*SUM(x)) - (n+1)/n over the
    ascending-sorted multiset, which is invariant to tie order, so the
    SQL row_number() oracle replays it exactly. Plan: one doc pass folds
    each block to (source, n_chars, cnt) histogram partials; ONE tiny
    keyed aggregate merges them — what shuffles is bounded by sources x
    distinct lengths, never docs — and the rank-weighted sum folds from
    cumulative counts on the report-sized histogram in exact int64."""
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
    src = np.asarray([r["source"] for r in hist])
    val = np.asarray([r["n_chars"] for r in hist], np.int64)
    cnt = np.asarray([r["cnt"] for r in hist], np.int64)
    out_src, out_n, out_tot, out_gini = [], [], [], []
    for s in sorted(set(src.tolist())):
        sel = src == s
        v, c = val[sel], cnt[sel]
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        n = int(c.sum())
        total = int((v * c).sum())
        if total <= 0:
            continue
        cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
        # sum of ranks 1..n occupied by each value's run of c copies
        rank_sum = c * cum_before + c * (c + 1) // 2
        s_weighted = int((v * rank_sum).sum())
        gini = (2.0 * s_weighted) / (n * total) - (n + 1.0) / n
        out_src.append(s)
        out_n.append(n)
        out_tot.append(total)
        out_gini.append(int(round_like_duckdb(1e6 * gini, 0)))
    return pa.table(
        {
            "source": pa.array(out_src, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "total_chars": pa.array(out_tot, pa.int64()),
            "gini_micro": pa.array(out_gini, pa.int64()),
        }
    )


SQL_Q241 = """
WITH r AS (
  SELECT source, n_chars AS x,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS i
  FROM documents),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(x) AS BIGINT) AS total_chars,
         2.0 * sum(i * x) / (count(*) * sum(x))
           - (count(*) + 1.0) / count(*) AS gini
  FROM r GROUP BY source HAVING sum(x) > 0)
SELECT source, n_docs, total_chars,
       CAST(round(1e6 * gini, 0) AS BIGINT) AS gini_micro
FROM g ORDER BY source
"""


#: capture probability per salted sample (md5 unit fraction on doc_id)
Q242_RATE = 0.5


def q242_capture_recapture(sf_dir: str):
    """Capture-recapture (Chapman) estimate of the corpus' DISTINCT
    content count from two independent md5-salted doc samples — the
    crawl-coverage estimator ("how big is the population our crawler
    draws from?") run entirely inside the engine, with the exact
    distinct count alongside as the error harness (the
    q184/q203/q210/q240 estimator-audit family). Plan: one doc pass
    hashes content (md5, null-distinct, the q07 key) and flags
    membership in the two salted samples; ONE content-keyed exchange
    colocates every copy of a content, so block-local any() flags and
    distinct counts ARE global; what returns to the driver is O(1)
    partials per block. Chapman N = (n1+1)(n2+1)//(m+1) - 1 in exact
    integer division on both sides."""
    from barks_ocr_ray.functions.dedupe import _NULL_TEXT_KEY, md5_hex
    from barks_ocr_ray.functions.hashing import unit_fractions

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    rate = Q242_RATE

    def _flags(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        keys = [
            _NULL_TEXT_KEY if s.as_py() is None else md5_hex(s.as_py())
            for s in t.column("text")
        ]
        in1 = unit_fractions(ids, method="md5", salt=1) < rate
        in2 = unit_fractions(ids, method="md5", salt=2) < rate
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "in1": pa.array(in1.astype("int64")),
                "in2": pa.array(in2.astype("int64")),
            }
        )

    def _block_partials(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("in1", "max"), ("in2", "max")])
        i1 = g.column("in1_max").to_numpy(zero_copy_only=False)
        i2 = g.column("in2_max").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_contents": pa.array([g.num_rows], pa.int64()),
                "n1": pa.array([int(i1.sum())], pa.int64()),
                "n2": pa.array([int(i2.sum())], pa.int64()),
                "m": pa.array([int((i1 * i2).sum())], pa.int64()),
            }
        )

    parts = (
        docs.map_batches(_flags, batch_format="pyarrow")
        .repartition(hash_partitions(8), keys=["key"])
        .map_batches(_block_partials, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    n = sum(int(r["n_contents"]) for r in parts)
    n1 = sum(int(r["n1"]) for r in parts)
    n2 = sum(int(r["n2"]) for r in parts)
    m = sum(int(r["m"]) for r in parts)
    if n == 0:
        return pa.table(
            {
                "n_contents": pa.array([], pa.int64()),
                "n1": pa.array([], pa.int64()),
                "n2": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "chapman": pa.array([], pa.int64()),
                "err_micro": pa.array([], pa.int64()),
            }
        )
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    err = int(round_like_duckdb(1e6 * (chapman - n) / n, 0))
    return pa.table(
        {
            "n_contents": pa.array([n], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "m": pa.array([m], pa.int64()),
            "chapman": pa.array([chapman], pa.int64()),
            "err_micro": pa.array([err], pa.int64()),
        }
    )


SQL_Q242 = f"""
WITH d AS (
  SELECT coalesce(md5(text), '__null_text__') AS k,
         CAST(('0x' || substring(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u1,
         CAST(('0x' || substring(md5('2:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS UBIGINT) / 4294967296.0 AS u2
  FROM documents),
c AS (
  SELECT k,
         max(CASE WHEN u1 < {Q242_RATE} THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN u2 < {Q242_RATE} THEN 1 ELSE 0 END) AS in2
  FROM d GROUP BY k),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_contents,
         CAST(sum(in1) AS BIGINT) AS n1,
         CAST(sum(in2) AS BIGINT) AS n2,
         CAST(sum(in1 * in2) AS BIGINT) AS m
  FROM c)
SELECT n_contents, n1, n2, m,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman,
       CAST(round(1e6 * ((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_contents)
                  / n_contents, 0) AS BIGINT) AS err_micro
FROM t WHERE n_contents > 0
"""


#: debounce window: a repeat of the same (user, event_type) within this
#: many microseconds of the PREVIOUS RAW event is an instrumentation
#: echo, not a new action (gap-based rule = the SQL lag() rule, so the
#: oracle replays it; the alternative "vs previous KEPT" rule is a
#: sequential scan SQL cannot express)
Q243_DEBOUNCE_US = 3_600_000_000


def q243_event_debounce(sf_dir: str):
    """Event-stream debounce dedup — drop instrumentation echoes (same
    user + event type re-fired within the debounce window of the
    previous raw event) and STREAM the kept events, the standard
    telemetry-cleaning stage in front of every funnel/session/attribution
    op. Plan: ONE user-keyed exchange colocates each user's history;
    each block lexsorts once and computes run-aware timestamp diffs
    vectorized (no Python per row); the kept stream never touches the
    driver."""
    import numpy as np

    ev = read_table(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    gap_us = Q243_DEBOUNCE_US

    def _debounce_block(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = t.take(idx)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        types = np.asarray(t.column("event_type").to_pylist())
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.ones(len(users), np.bool_)
        if len(users) > 1:
            same_run = (users[1:] == users[:-1]) & (types[1:] == types[:-1])
            keep[1:] = ~same_run | (ts[1:] - ts[:-1] > gap_us)
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "event_type": t.column("event_type").filter(pa.array(keep)),
            }
        )

    return ev.repartition(hash_partitions(8), keys=["user_id"]).map_batches(
        _debounce_block, batch_format="pyarrow", batch_size=None
    )


SQL_Q243 = f"""
WITH g AS (
  SELECT event_id, event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_id, event_type FROM g
WHERE gap IS NULL OR gap > {Q243_DEBOUNCE_US}
"""


def q244_benford_audit(sf_dir: str):
    """Benford first-significant-digit audit over line-item amounts —
    the classic synthetic-/fabricated-numbers detector a data-quality
    gate runs over any money-like column (Benford, "The Law of
    Anomalous Numbers", 1938). Plan: amounts are exact cents, the
    leading digit falls out of a vectorized integer divide-down (no
    strings, no logs on the data path), each block ships a 9-bin count
    partial, and the 9-row report closes with per-digit micro-rounded
    observed vs log10(1+1/d) expected shares."""
    import math

    import numpy as np

    li = read_table(sf_dir, "lineitem", ["l_extendedprice"])

    def _digit_partials(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(x * 100.0 + 0.5).astype(np.int64)  # exact cents
        d = cents.copy()
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10), pa.int64()),
                "n_obs": pa.array(counts.astype(np.int64)),
            }
        )

    hist = (
        li.map_batches(_digit_partials, batch_format="pyarrow")
        .groupby("digit", num_partitions=2)
        .aggregate(Sum("n_obs", alias_name="n_obs"))
        .take_all()
    )
    obs = {int(r["digit"]): int(r["n_obs"]) for r in hist}
    n = sum(obs.values())
    digits = [d for d in range(1, 10) if obs.get(d, 0) > 0]
    if n == 0:
        return pa.table(
            {
                "digit": pa.array([], pa.int64()),
                "n_obs": pa.array([], pa.int64()),
                "obs_micro": pa.array([], pa.int64()),
                "benford_micro": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "digit": pa.array(digits, pa.int64()),
            "n_obs": pa.array([obs[d] for d in digits], pa.int64()),
            "obs_micro": pa.array(
                [
                    int(round_like_duckdb(1e6 * obs[d] / n, 0))
                    for d in digits
                ],
                pa.int64(),
            ),
            "benford_micro": pa.array(
                [
                    int(round_like_duckdb(1e6 * math.log10(1 + 1.0 / d), 0))
                    for d in digits
                ],
                pa.int64(),
            ),
        }
    )


SQL_Q244 = """
WITH d AS (
  SELECT CAST(substring(CAST(CAST(round(l_extendedprice * 100.0, 0)
                                  AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM lineitem),
h AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
t AS (SELECT sum(n_obs) AS n FROM h)
SELECT digit, n_obs,
       CAST(round(1e6 * n_obs / t.n, 0) AS BIGINT) AS obs_micro,
       CAST(round(1e6 * log10(1 + 1.0 / digit), 0) AS BIGINT)
           AS benford_micro
FROM h, t ORDER BY digit
"""


def q245_spearman_length_tokens(sf_dir: str):
    """Per-language Spearman rank correlation between document length
    and whitespace token count — the monotone-association audit (robust
    to outliers and nonlinearity, unlike q154's Pearson) a corpus
    profiler reports per metric pair. Exact average-tie ranks, doubled
    to stay integer (2*cnt_less + cnt_eq + 1 — scale-invariant for
    rho). Plan: two (lang, value) count aggregations build rank maps
    bounded by langs x distinct values (vocabulary-sized, broadcast via
    closure); one streamed doc pass maps values to integer ranks with
    searchsorted and ships q154-style exact int64 moment partials; the
    langs-bounded close pays one mirrored IEEE division per lang."""
    import math

    import numpy as np

    docs = read_table(sf_dir, "documents", ["lang", "n_chars", "text"])

    def _metrics(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t.column("text"))
        t = t.filter(mask)
        return pa.table(
            {
                "lang": t.column("lang"),
                "x": t.column("n_chars").cast(pa.int64()),
                "y": pc.count_substring_regex(
                    t.column("text"), r"\S+"
                ).cast(pa.int64()),
            }
        )

    metrics = docs.map_batches(_metrics, batch_format="pyarrow")
    metrics = metrics.materialize()  # read once, feed three consumers

    def _rank_map(col: str) -> dict:
        """lang -> (sorted values, doubled avg-tie ranks): r2(v) =
        2*cnt_less(v) + cnt_eq(v) + 1, exact odd integers."""
        rows = (
            metrics.groupby(["lang", col], num_partitions=2)
            .aggregate(Count(alias_name="c"))
            .take_all()
        )
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append((int(r[col]), int(r["c"])))
        out = {}
        for lang, vc in by_lang.items():
            vc.sort()
            vals = np.asarray([v for v, _ in vc], np.int64)
            cnts = np.asarray([c for _, c in vc], np.int64)
            less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
            out[lang] = (vals, 2 * less + cnts + 1)
        return out

    rx, ry = _rank_map("x"), _rank_map("y")

    def _moment_partials(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist())
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        rows = []
        for lang in np.unique(langs):
            sel = langs == lang
            vx, rvx = rx[lang]
            vy, rvy = ry[lang]
            a = rvx[np.searchsorted(vx, x[sel])]
            b = rvy[np.searchsorted(vy, y[sel])]
            rows.append(
                (
                    lang,
                    len(a),
                    int(a.sum()),
                    int(b.sum()),
                    int((a * b).sum()),
                    int((a * a).sum()),
                    int((b * b).sum()),
                )
            )
        cols = list(zip(*rows)) if rows else [[]] * 7
        names = ["lang", "n", "sa", "sb", "sab", "saa", "sbb"]
        return pa.table(
            {
                names[0]: pa.array(list(cols[0]), pa.string()),
                **{
                    nm: pa.array(list(c), pa.int64())
                    for nm, c in zip(names[1:], cols[1:])
                },
            }
        )

    parts = metrics.map_batches(
        _moment_partials, batch_format="pyarrow"
    ).take_all()
    acc: dict = {}
    for r in parts:
        m = acc.setdefault(r["lang"], [0] * 6)
        for i, k in enumerate(("n", "sa", "sb", "sab", "saa", "sbb")):
            m[i] += int(r[k])
    out_lang, out_n, out_rho = [], [], []
    for lang in sorted(acc):
        n, sa, sb, sab, saa, sbb = acc[lang]
        da, db = n * saa - sa * sa, n * sbb - sb * sb
        if da <= 0 or db <= 0:
            continue
        rho = float(n * sab - sa * sb) / (
            math.sqrt(float(da)) * math.sqrt(float(db))
        )
        out_lang.append(lang)
        out_n.append(n)
        out_rho.append(round_like_duckdb(rho, 6))
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "spearman": pa.array(out_rho, pa.float64()),
        }
    )


SQL_Q245 = """
WITH d AS (
  SELECT lang, n_chars AS x,
         CAST(array_length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL),
rx AS (SELECT lang, x AS v, CAST(count(*) AS BIGINT) AS c
       FROM d GROUP BY 1, 2),
rxm AS (SELECT lang, v,
               2 * (sum(c) OVER (PARTITION BY lang ORDER BY v) - c)
                 + c + 1 AS r2
        FROM rx),
ry AS (SELECT lang, y AS v, CAST(count(*) AS BIGINT) AS c
       FROM d GROUP BY 1, 2),
rym AS (SELECT lang, v,
               2 * (sum(c) OVER (PARTITION BY lang ORDER BY v) - c)
                 + c + 1 AS r2
        FROM ry),
r AS (SELECT d.lang, rxm.r2 AS a, rym.r2 AS b
      FROM d
      JOIN rxm ON d.lang = rxm.lang AND d.x = rxm.v
      JOIN rym ON d.lang = rym.lang AND d.y = rym.v),
m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
             sum(a * a) AS saa, sum(b * b) AS sbb
      FROM r GROUP BY 1)
SELECT lang, n,
       round(CAST(n * sab - sa * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS spearman
FROM m
WHERE n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
ORDER BY lang
"""


def q246_ewma_backtest(sf_dir: str):
    """EWMA one-step-ahead forecast backtest per event type (half-life
    smoothing, alpha = 1/2) over the gap-filled daily series — the
    volume-forecast quality report a monitoring pipeline publishes
    before trusting its alerts. State is INTEGER micro-counts with
    floor-halving (s_d = (s_{d-1} + 1e6*c_d) // 2), so the recursion
    accumulates zero float error and the SQL recursive CTE replays it
    bit-exactly. Plan: ONE (type, day)-bounded count aggregation (q155
    dense-spine discipline); the sequential fold — inherent to the
    recursion — runs on the days x types driver table, never on docs."""
    import numpy as np

    DAY = 86_400_000_000
    ev = read_table(sf_dir, "events", ["ts", "event_type"])

    def _day_partials(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64())
        day = pc.divide(ts, pa.scalar(DAY, pa.int64()))
        tt = pa.table({"event_type": t.column("event_type"), "day": day})
        g = tt.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "c"])

    hist = (
        ev.map_batches(_day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    if not hist:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_forecasts": pa.array([], pa.int64()),
                "mae_micro": pa.array([], pa.int64()),
            }
        )
    d0 = min(int(r["day"]) for r in hist)
    nd = max(int(r["day"]) for r in hist) - d0
    dense: dict = {}
    for r in hist:
        dense.setdefault(r["event_type"], np.zeros(nd + 1, np.int64))[
            int(r["day"]) - d0
        ] = int(r["c"])
    out_type, out_n, out_mae = [], [], []
    for typ in sorted(dense):
        c = dense[typ]
        s = int(c[0]) * 1_000_000
        total_err, n_fc = 0, 0
        for d in range(1, nd + 1):
            actual = int(c[d]) * 1_000_000
            total_err += abs(actual - s)
            n_fc += 1
            s = (s + actual) // 2
        if n_fc == 0:
            continue
        out_type.append(typ)
        out_n.append(n_fc)
        out_mae.append(int(round_like_duckdb(total_err * 1.0 / n_fc, 0)))
    return pa.table(
        {
            "event_type": pa.array(out_type, pa.string()),
            "n_forecasts": pa.array(out_n, pa.int64()),
            "mae_micro": pa.array(out_mae, pa.int64()),
        }
    )


SQL_Q246 = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('day', min(ts)) AS d0,
         date_diff('day', date_trunc('day', min(ts)),
                   date_trunc('day', max(ts))) AS nd
  FROM events),
types AS (SELECT DISTINCT event_type FROM events),
-- generate_series cannot take a lateral column parameter: over-generate
-- a fixed 100k-day series (274 years) and filter to the corpus span
spine AS (SELECT t.event_type, gs.i
          FROM types t, bounds, generate_series(0, 100000) gs(i)
          WHERE gs.i <= bounds.nd),
counts AS (SELECT event_type,
                  date_diff('day', bounds.d0, date_trunc('day', ts)) AS i,
                  CAST(count(*) AS BIGINT) AS c
           FROM events, bounds GROUP BY 1, 2),
dense AS (SELECT s.event_type, s.i, coalesce(c.c, 0) AS c
          FROM spine s LEFT JOIN counts c
            ON s.event_type = c.event_type AND s.i = c.i),
rec AS (
  SELECT event_type, i, c, c * 1000000 AS s FROM dense WHERE i = 0
  UNION ALL
  SELECT d.event_type, d.i, d.c, (r.s + d.c * 1000000) // 2
  FROM rec r JOIN dense d
    ON d.event_type = r.event_type AND d.i = r.i + 1),
err AS (SELECT r.event_type, abs(d.c * 1000000 - r.s) AS e
        FROM rec r JOIN dense d
          ON d.event_type = r.event_type AND d.i = r.i + 1)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_forecasts,
       CAST(round(sum(e) * 1.0 / count(*), 0) AS BIGINT) AS mae_micro
FROM err GROUP BY 1 ORDER BY 1
"""


def q247_int8_quant_distortion(sf_dir: str):
    """Int8 scalar-quantization distortion audit — how much cosine
    fidelity survives compressing the embedding column 4x to uint8
    codes (the standard serving-index compression; q107 PQ's simpler
    sibling, and the audit beside it in the q184/q203/q210 estimator-
    quality family). Plan: pass 1 ships per-dim (min, max) block
    partials (d-bounded); pass 2 broadcasts the 2xd quantizer via
    closure, scores every vector with the shared int8_cos_micro kernel
    (vectorized, micro-rounded per vector so label sums are exact
    int64), and ships labels-bounded (n, sum, min) partials."""
    import numpy as np

    from barks_ocr_ray.functions.ann import _emb_matrix, int8_cos_micro

    emb = read_table(sf_dir, "embeddings", ["embedding", "label"])
    emb = emb.materialize()  # two passes over the same read

    def _minmax(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    mm = emb.map_batches(_minmax, batch_format="pyarrow").take_all()
    d = max(int(r["dim"]) for r in mm) + 1
    mins = np.full(d, np.inf)
    maxs = np.full(d, -np.inf)
    for r in mm:
        i = int(r["dim"])
        mins[i] = min(mins[i], float(r["mn"]))
        maxs[i] = max(maxs[i], float(r["mx"]))

    def _score(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        cos = int8_cos_micro(m, mins, maxs)
        labels = t.column("label").cast(pa.int64())
        part = pa.table({"label": labels, "cos": pa.array(cos, pa.int64())})
        g = part.group_by("label").aggregate(
            [("cos", "count"), ("cos", "sum"), ("cos", "min")]
        )
        return g.rename_columns(["label", "n_vecs", "sum_cos", "min_cos"])

    rows = (
        emb.map_batches(_score, batch_format="pyarrow")
        .groupby("label", num_partitions=2)
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("sum_cos", alias_name="sum_cos"),
            Min("min_cos", alias_name="min_cos"),
        )
        .take_all()
    )
    rows.sort(key=lambda r: int(r["label"]))
    return pa.table(
        {
            "label": pa.array([int(r["label"]) for r in rows], pa.int64()),
            "n_vecs": pa.array([int(r["n_vecs"]) for r in rows], pa.int64()),
            "mean_cos_micro": pa.array(
                [
                    int(
                        round_like_duckdb(
                            int(r["sum_cos"]) * 1.0 / int(r["n_vecs"]), 0
                        )
                    )
                    for r in rows
                ],
                pa.int64(),
            ),
            "worst_cos_micro": pa.array(
                [int(r["min_cos"]) for r in rows], pa.int64()
            ),
        }
    )




# chained-namespace export: the NEXT band (and the queries.py hub)
# imports * from this module; underscore helpers are exported on
# purpose — call-time references resolve in each function's own
# module globals, which this line hands to the next band verbatim.
__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
