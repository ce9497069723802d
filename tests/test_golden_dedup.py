"""The dual-engine contract for the near-dup/ANN/sketch family: the
single-process goldens (golden_dedup.py) must agree with the distributed
pipelines value-exactly — the same second-opinion scheme the extraction
arc uses (extract/golden.py), here pinning the distributed orchestration
(banding shuffles, signature joins, quantizer broadcast, register merge)
against a sequential replay over the same corpus."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _assert_same(dist_df: pd.DataFrame, gold_df: pd.DataFrame):
    a, b = _canon(dist_df), _canon(gold_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(av, bv, equal_nan=True), c
        else:
            assert (av == bv).all(), c


def test_minhash_golden_matches_distributed(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.dedupe import minhash_near_dups
    from barks_ocr_ray.golden_dedup import golden_minhash_pairs

    docs = pq.read_table(f"{SF}/documents.parquet")
    dist = minhash_near_dups(
        rd.from_arrow(docs.select(["doc_id", "text"])), threshold=0.4
    ).to_pandas()
    gold = golden_minhash_pairs(docs, threshold=0.4).to_pandas()
    assert len(gold) > 0  # the corpus plants near-dups; empty = broken
    _assert_same(dist, gold)


def test_simhash_golden_matches_distributed(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.dedupe import simhash_near_dups
    from barks_ocr_ray.golden_dedup import golden_simhash_pairs

    docs = pq.read_table(f"{SF}/documents.parquet")
    dist = simhash_near_dups(
        rd.from_arrow(docs.select(["doc_id", "text"])), max_hamming=6
    ).to_pandas()
    gold = golden_simhash_pairs(docs, max_hamming=6).to_pandas()
    assert len(gold) > 0
    _assert_same(dist, gold)


def test_ivf_golden_shares_kmeans_kernel(ray_session):
    """golden_centroids must train BIT-identical centroids to the
    distributed _train_centroids (shared _kmeans kernel + replayed
    md5-sample rule) — the float-sensitive half of the q48/q75 oracle."""
    import ray.data as rd

    from barks_ocr_ray.functions.ann import _train_centroids
    from barks_ocr_ray.golden_dedup import golden_centroids

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    dist = _train_centroids(
        rd.from_arrow(emb.select(["vec_id", "embedding"])), 16, seed=7
    )
    gold = golden_centroids(emb, 16, seed=7)
    assert dist.shape == gold.shape
    assert np.array_equal(dist, gold)


def test_bucket_cap_replay_on_identical_docs():
    """The golden's cap replay must collapse identical texts to min-id
    star pairs exactly like _bucket_pairs' hot-bucket guard: with
    n > max_bucket copies, pairs stay O(n), not O(n^2)."""
    import pyarrow as pa

    from barks_ocr_ray.golden_dedup import golden_minhash_pairs

    n = 50
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["the same boilerplate text again"] * n),
        }
    )
    # force the guard with a tiny cap via the shared helper
    from barks_ocr_ray import golden_dedup as g

    orig = g._pairs_with_cap
    try:
        g._pairs_with_cap = lambda b, gr, max_bucket=5: orig(b, gr, 5)
        pairs = golden_minhash_pairs(docs, threshold=0.4)
    finally:
        g._pairs_with_cap = orig
    # star collapse: every member pairs with rep 0 once -> n-1 pairs
    df = pairs.to_pandas()
    assert len(df) == n - 1
    assert (df["doc_a"] == 0).all()
    assert (df["est_jaccard"] == 1.0).all()


@pytest.mark.parametrize("table,builder_rows", [("documents", 3)])
def test_neardup_golden_parquet_has_both_sf_slices(table, builder_rows):
    """ensure_neardup_golden writes one tagged slice per supported sf;
    the tags must be distinct so the oracle WHERE clause is selective."""
    from barks_ocr_ray.oracle_data import (
        ensure_neardup_goldens,
        neardup_golden_path,
    )

    ensure_neardup_goldens()
    t = pq.read_table(neardup_golden_path("minhash_pairs"))
    tags = set(t.column("corpus_tag").to_pylist())
    assert len(tags) == 2
