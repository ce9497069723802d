"""Round-3 regressions: the hot-LSH-bucket skew guard (VERDICT r2 "What's
wrong #1") plus the vectorized salted_count / grouped_topk rewrites.

The scenario the guard exists for: a web-scale template farm puts 10^5+
docs with identical (or near-identical) content into ONE (band, hash)
bucket; the naive all-pairs enumeration materializes O(n^2) pairs from a
single block. The guard (a) collapses identical-content docs to star
pairs around the min-id representative and (b) caps residual
distinct-content reps at ``max_bucket`` with a logged overflow count.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _pairs_table(n, key, ids, grps=None):
    cols = {
        "band_id": pa.array([0] * n, pa.int32()),
        "band_hash": pa.array([key] * n, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
    }
    if grps is not None:
        cols["grp"] = pa.array(grps, pa.string())
    return pa.table(cols)


def test_bucket_pairs_small_bucket_unchanged():
    """Buckets at or under the cap keep the exact all-pairs clique."""
    from barks_ocr_ray.functions.dedupe import _bucket_pairs

    t = _pairs_table(4, "k", [3, 1, 2, 9], grps=["a", "b", "c", "d"])
    out = _bucket_pairs(
        rd.from_arrow(t), ["band_id", "band_hash"], 2, grp_col="grp"
    ).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert pairs == {(1, 2), (1, 3), (1, 9), (2, 3), (2, 9), (3, 9)}


def test_bucket_pairs_hot_bucket_star_collapse():
    """An oversized bucket of identical-content docs emits O(n) star
    pairs around the min-id rep — not the O(n^2) clique — and every doc
    stays connected to the rep (cluster connectivity preserved)."""
    from barks_ocr_ray.functions.dedupe import _bucket_pairs

    n = 500
    ids = list(range(10, 10 + n))
    t = _pairs_table(n, "hot", ids, grps=["same"] * n)
    out = _bucket_pairs(
        rd.from_arrow(t),
        ["band_id", "band_hash"],
        2,
        grp_col="grp",
        max_bucket=50,
    ).to_pandas()
    # star: exactly n-1 pairs, all anchored at the min id
    assert len(out) == n - 1
    assert set(out["doc_a"]) == {10}
    assert set(out["doc_b"]) == set(ids) - {10}


def test_bucket_pairs_hot_bucket_mixed_grps_cap_and_overflow():
    """Oversized bucket with DISTINCT content: reps capped at max_bucket
    (smallest ids, deterministic); the overflow count is logged inside
    the worker (warning text pinned by reading the UDF, not caplog —
    worker logs don't reach the driver's handler)."""
    from barks_ocr_ray.functions.dedupe import _bucket_pairs

    n = 120
    ids = list(range(n))
    grps = [f"g{i}" for i in ids]  # all distinct content
    t = _pairs_table(n, "hot", ids, grps=grps)
    out = _bucket_pairs(
        rd.from_arrow(t).repartition(1),
        ["band_id", "band_hash"],
        1,
        grp_col="grp",
        max_bucket=20,
    ).to_pandas()
    # kept the 20 smallest ids -> C(20,2) pairs
    assert len(out) == 20 * 19 // 2
    assert out["doc_b"].max() == 19


def test_minhash_template_farm_bounded():
    """End-to-end: 10k byte-identical docs (the template-farm pathology)
    through the full MinHash+LSH pipeline completes with O(n) pairs —
    every doc pairs with the representative at est_jaccard 1.0. Without
    the guard this materializes ~50M pairs per band and hangs."""
    from barks_ocr_ray.functions.dedupe import minhash_near_dups

    n = 10_000
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
            }
        )
    )
    out = minhash_near_dups(docs, threshold=0.5).to_pandas()
    assert len(out) == n - 1
    assert set(out["doc_a"]) == {0}
    assert set(out["doc_b"]) == set(range(1, n))
    assert (out["est_jaccard"] == 1.0).all()


def test_salted_count_matches_plain_groupby():
    """Vectorized round-robin salt: same counts as a plain value_counts
    over a skewed key distribution."""
    from barks_ocr_ray.functions.relational import salted_count

    rng = np.random.RandomState(7)
    keys = np.where(rng.rand(5000) < 0.8, "hot", rng.choice(list("abcde"), 5000))
    ds = rd.from_arrow(pa.table({"k": pa.array(keys.tolist(), pa.string())}))
    out = salted_count(ds, "k", n_salts=8).to_pandas().set_index("k")["n"]
    import collections

    expect = collections.Counter(keys.tolist())
    assert dict(out) == dict(expect)


def test_grouped_topk_vectorized_rank():
    """Run-boundary rank == per-group head(k) semantics, including a
    group smaller than k and ties broken by the sort's order columns."""
    from barks_ocr_ray.functions.relational import grouped_topk

    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 2 + ["c"] * 4, pa.string()),
            "v": pa.array([5, 3, 9, 1, 7, 2, 8, 4, 4, 6, 0], pa.int64()),
            "id": pa.array(list(range(11)), pa.int64()),
        }
    )
    out = grouped_topk(rd.from_arrow(t), "g", "v", 3, tie_col="id").to_pandas()
    got = {g: sorted(sub["v"]) for g, sub in out.groupby("g")}
    assert got == {"a": [5, 7, 9], "b": [2, 8], "c": [4, 4, 6]}
