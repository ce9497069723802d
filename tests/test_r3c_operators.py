"""Unit contracts for the round-3 session-2 operators: the as-of join
block kernel (q70), whose edge cases (purchase before any click,
equal-timestamp click, user-run isolation under the no-reset running
max) the synthetic corpus exercises only probabilistically. Value-
exactness vs DuckDB `ASOF JOIN` is pinned by the q70 oracle."""

import pyarrow as pa


def _events(rows):
    # rows: (event_id, ts_us, user_id, event_type)
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_asof_block_edges_match_duckdb():
    """The distributed result equals DuckDB ASOF JOIN on a crafted
    corpus hitting every edge: unmatched purchase (before any click),
    equal-timestamp click (>= semantics), user-boundary isolation
    (user B's purchase must not see user A's later click position),
    and multiple purchases sharing one click."""
    import duckdb
    import os
    import tempfile

    import pyarrow.parquet as pq

    from barks_ocr_ray.pipelines.queries import q70_asof_join

    rows = [
        # user 1: purchase BEFORE any click -> unmatched
        (1, 1_000_000, 1, "purchase"),
        (2, 2_000_000, 1, "click"),
        # equal-ts click matches (>=)
        (3, 3_000_000, 1, "click"),
        (4, 3_000_000, 1, "purchase"),
        # two purchases share the same latest click
        (5, 5_000_000, 1, "purchase"),
        # user 2 interleaved: must not see user 1's clicks
        (6, 4_000_000, 2, "purchase"),
        (7, 6_000_000, 2, "click"),
        (8, 7_000_000, 2, "purchase"),
        # irrelevant types are filtered by the read predicate; include
        # one to pin the in-kernel behavior if it ever leaks through
        (9, 1_500_000, 1, "view"),
    ]
    t = _events(rows)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = (
            q70_asof_join(d)
            .to_pandas()
            .sort_values("purchase_id")
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                f"""
            SELECT p.event_id AS purchase_id, p.user_id,
                   p.ts AS purchase_ts, c.event_id AS click_id,
                   c.ts AS click_ts,
                   date_diff('microsecond', c.ts, p.ts) AS gap_us
            FROM (SELECT * FROM '{d}/events.parquet'
                  WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM '{d}/events.parquet'
                       WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY purchase_id
            """
            )
            .df()
            .reset_index(drop=True)
        )
    assert list(got["purchase_id"]) == list(want["purchase_id"]) == [4, 5, 8]
    assert list(got["click_id"]) == list(want["click_id"]) == [3, 3, 7]
    assert list(got["gap_us"]) == list(want["gap_us"]) == [0, 2_000_000, 1_000_000]
    # user 1's unmatched purchase (event 1) is absent from both sides
    assert 1 not in set(got["purchase_id"])


def test_heavy_hitters_skew_and_paths():
    """Zipf-skewed keys: the two-pass result equals the exact DuckDB
    answer on BOTH attach paths (broadcast gate and distributed join),
    and the pass-1 exchange stays bounded at <= k candidates + 1
    sentinel per block even when one key floods the corpus."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.sketches import exact_heavy_hitters

    rng = np.random.default_rng(7)
    # one flooding key (40%), a mid tier, and a long uniform tail
    keys = np.concatenate(
        [
            np.zeros(40_000, np.int64),
            rng.integers(1, 20, 25_000),
            rng.integers(20, 20_000, 35_000),
        ]
    )
    rng.shuffle(keys)
    t = pa.table({"k": pa.array(keys, pa.int64())})
    want = duckdb.sql(
        "SELECT k, count(*) AS n FROM t GROUP BY k "
        "HAVING count(*) * 51 > (SELECT count(*) FROM t) ORDER BY k"
    ).fetchall()
    assert len(want) > 0  # the test corpus must actually have HHs

    for gate in (200_000, 0):  # broadcast path, then forced join path
        ds = rd.from_arrow(t).repartition(8)
        got = (
            exact_heavy_hitters(ds, "k", k=50, broadcast_gate=gate)
            .to_pandas()
            .sort_values("k")
        )
        assert list(map(tuple, got.itertuples(index=False))) == want


def test_heavy_hitters_no_hits_typed_empty():
    """A uniform corpus with every key unique has no phi-frequent key;
    the result is EMPTY but keeps the (key, n) schema (driver-compare
    contract for 0-row results)."""
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.sketches import exact_heavy_hitters

    t = pa.table({"k": pa.array(np.arange(5_000, dtype=np.int64))})
    out = exact_heavy_hitters(rd.from_arrow(t).repartition(4), "k", k=10)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default",
    ) if out.count() else None
    if tbl is None:
        # typed-empty direct return path
        assert out.schema().names == ["k", "n"]
        assert out.count() == 0
    else:
        assert tbl.num_rows == 0


def test_chunking_edges_match_duckdb():
    """Chunk geometry edges: doc shorter than overlap, exactly
    chunk_tokens, one past it, stride-boundary lengths, leading and
    trailing whitespace runs, empty and whitespace-only docs (no
    chunks), and multi-space gaps (canonical single-space re-join)."""
    import duckdb
    import ray.data as rd

    from barks_ocr_ray.functions.text import chunk_documents

    C, O = 8, 3  # stride 5
    texts = [
        "a b c",  # shorter than overlap
        " ".join(f"t{i}" for i in range(8)),  # exactly C -> 1 chunk
        " ".join(f"t{i}" for i in range(9)),  # C+1 -> 2 chunks
        " ".join(f"t{i}" for i in range(13)),  # n-O = 10 -> starts 0,5
        "  lead and   trail  ",  # whitespace runs collapse
        "",  # no chunks
        "   ",  # no chunks
        "one",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        chunk_documents(
            rd.from_arrow(t).repartition(3), chunk_tokens=C, overlap=O
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk,
                 len(regexp_extract_all(text, '\\S+')) AS n
          FROM t
        )
        SELECT doc_id, CAST(s / {C - O} AS BIGINT) AS chunk_idx,
               array_to_string(tk[s + 1 : least(s + {C}, n)], ' ') AS chunk_text,
               least(s + {C}, n) - s AS n_tokens
        FROM toks,
             LATERAL unnest(generate_series(0, greatest(n - {O} - 1, 0), {C - O})) AS g(s)
        WHERE n > 0
        ORDER BY doc_id, chunk_idx
        """
    ).df().reset_index(drop=True)
    assert got.equals(want), (got, want)
    # whitespace-only and empty docs emitted nothing
    assert not set(got["doc_id"]) & {5, 6}


def test_salted_join_hot_key_equivalence():
    """A 90%-hot fact key: the salted join's result (rows, all columns)
    equals the plain inner join exactly, including 1:N fan-out on the
    dimension side and unmatched fact keys dropped."""
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.relational import salted_join

    rng = np.random.default_rng(3)
    keys = np.where(rng.random(20_000) < 0.9, 7, rng.integers(0, 50, 20_000))
    fact = pa.table(
        {
            "fk": pa.array(keys, pa.int64()),
            "val": pa.array(np.arange(20_000, dtype=np.int64)),
        }
    )
    # dimension with a duplicate key (1:N fan-out) and keys the fact
    # never hits; fact key 49 has no dimension row (dropped by inner)
    dim = pa.table(
        {
            "dk": pa.array([7, 7, 3, 11, 48, 100], pa.int64()),
            "tag": pa.array(list("aabcde"), pa.string()),
        }
    )
    got = (
        salted_join(
            rd.from_arrow(fact).repartition(6),
            rd.from_arrow(dim),
            on=("fk",),
            right_on=("dk",),
            n_salts=4,
        )
        .to_pandas()
        .sort_values(["fk", "val", "tag"])
        .reset_index(drop=True)
    )
    import duckdb

    # Dataset.join coalesces the right key into fk (USING semantics)
    want = (
        duckdb.sql(
            "SELECT fk, val, tag FROM fact JOIN dim ON fk = dk "
            "ORDER BY fk, val, tag"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])


def _greedy_keep(ids, emb, threshold):
    """Reference keep-lowest-id rule: drop i iff cosine(i, j) >=
    threshold for some j < i (ids sorted ascending)."""
    import numpy as np

    order = np.argsort(ids)
    u = emb[order]
    norms = np.linalg.norm(u, axis=1)
    norms[norms == 0] = 1.0
    u = u / norms[:, None]
    sims = u @ u.T
    n = len(ids)
    tri = np.tril(np.ones((n, n), bool), -1)
    drop = ((sims >= threshold) & tri).any(axis=1)
    return dict(zip(ids[order], ~drop))


def test_semdedup_single_cluster_is_exact_greedy():
    """At n_clusters=1 SemDeDup reduces to the exact greedy
    keep-lowest-id rule over all pairs (the q44 sibling contract)."""
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.ann import semdedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(12, 16))
    # near-dup pairs: 12 originals + jittered copies of the first 6
    emb = np.vstack([base, base[:6] + rng.normal(scale=1e-3, size=(6, 16))])
    ids = np.arange(len(emb), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    )
    got = (
        semdedup(
            rd.from_arrow(t).repartition(3),
            threshold=0.999,
            n_clusters=1,
            pair_chunk=4,  # force the chunked scan path
        )
        .to_pandas()
        .set_index("vec_id")["keep"]
        .to_dict()
    )
    want = _greedy_keep(ids, emb, 0.999)
    assert got == want
    # the six jittered copies are dropped, their originals kept
    assert all(not got[i] for i in range(12, 18))
    assert all(got[i] for i in range(12))


def test_semdedup_clustering_only_reduces_drops():
    """With many clusters, every drop SemDeDup makes is also a drop of
    the exact rule (cluster bounding can only MISS pairs, never invent
    them) — the documented recall tradeoff, directionally pinned."""
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.ann import semdedup

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(80, 8))
    emb[40:] = emb[:40] + rng.normal(scale=1e-3, size=(40, 8))
    ids = np.arange(80, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    )
    got = (
        semdedup(rd.from_arrow(t).repartition(4), threshold=0.999, n_clusters=8)
        .to_pandas()
        .set_index("vec_id")["keep"]
        .to_dict()
    )
    exact = _greedy_keep(ids, emb, 0.999)
    dropped = {i for i, k in got.items() if not k}
    exact_dropped = {i for i, k in exact.items() if not k}
    assert dropped <= exact_dropped
    assert len(dropped) > 0  # jittered copies co-cluster with originals


def test_bloom_semi_join_fp_exactness_and_empty():
    """With m_bits=64 (guaranteed false positives at 40 keys) the
    verify join still makes the result EXACTLY `on IN small`; an empty
    small side returns an empty stream with big's schema."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from barks_ocr_ray.functions.sketches import bloom_semi_join

    rng = np.random.default_rng(9)
    big = pa.table(
        {
            "k": pa.array(rng.integers(0, 1000, 30_000), pa.int64()),
            "v": pa.array(np.arange(30_000, dtype=np.int64)),
        }
    )
    small = pa.table(
        {"sk": pa.array(rng.choice(1000, 40, replace=False).astype(np.int64))}
    )
    got = (
        bloom_semi_join(
            rd.from_arrow(big).repartition(5),
            rd.from_arrow(small),
            on="k",
            right_on="sk",
            m_bits=64,  # tiny: dense filter, many false positives
            n_hashes=2,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            "SELECT k, v FROM big WHERE k IN (SELECT sk FROM small) "
            "ORDER BY k, v"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got[["k", "v"]].equals(want)

    empty_small = pa.table({"sk": pa.array([], pa.int64())})
    out = bloom_semi_join(
        rd.from_arrow(big).repartition(3),
        rd.from_arrow(empty_small),
        on="k",
        right_on="sk",
        m_bits=64,
    )
    assert out.count() == 0
    assert out.schema().names == ["k", "v"]
