"""Dedup-family + similarity-search semantics on constructed inputs with
known near-duplicates."""

import numpy as np
import pyarrow as pa
import ray.data as rd

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


def _text(seed: int, n: int = 120) -> str:
    import random

    rng = random.Random(seed)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _near(text: str) -> str:
    toks = text.split()
    toks[5] = "changedword"
    toks[50] = "anotherchange"
    return " ".join(toks)


def _docs_with_dups():
    rows = [(i, _text(i)) for i in range(20)]
    rows.append((100, _near(rows[0][1])))  # near-dup of doc 0
    rows.append((101, rows[1][1]))  # exact dup of doc 1
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_minhash_finds_near_dup():
    from barks_ocr_ray.functions.dedupe import minhash_near_dups

    out = minhash_near_dups(_docs_with_dups(), threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 100) in pairs
    assert (1, 101) in pairs
    # exact dup has estimated jaccard 1.0
    row = out[(out["doc_a"] == 1) & (out["doc_b"] == 101)].iloc[0]
    assert row["est_jaccard"] == 1.0
    # unrelated docs don't pair at this threshold
    assert all(a in (0, 1) and b in (100, 101) for a, b in pairs)


def test_simhash_finds_near_dup():
    from barks_ocr_ray.functions.dedupe import simhash_near_dups, simhash64

    out = simhash_near_dups(_docs_with_dups(), max_hamming=16).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 101) in pairs  # exact dup -> hamming 0
    ham = out.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham.loc[(1, 101)] == 0
    # simhash deterministic
    assert simhash64(["a", "b", "c"]) == simhash64(["a", "b", "c"])


def test_ngram_jaccard_pairs():
    from barks_ocr_ray.functions.dedupe import ngram_jaccard_pairs

    rows = [(0, _text(0), "s1"), (1, _near(_text(0)), "s1"), (2, _text(7), "s1")]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5, bucket_chars=10_000).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs and (0, 2) not in pairs


def _emb_table():
    rng = np.random.RandomState(3)
    base = rng.standard_normal((30, 16))
    base[5] = base[4] + 0.01 * rng.standard_normal(16)  # near-dup pair (4,5)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(30)), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in base],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_embedding_near_dups():
    from barks_ocr_ray.functions.dedupe import embedding_near_dups

    out = embedding_near_dups(_emb_table(), threshold=0.98).to_pandas()
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    assert (4, 5) in pairs


def test_brute_force_topk_matches_numpy():
    from barks_ocr_ray.functions.ann import brute_force_topk

    ds = _emb_table()
    out = brute_force_topk(ds, [4], k=3).to_pandas()
    assert out.iloc[0]["neighbor_id"] == 5  # the planted near neighbor
    assert len(out) == 3
    assert out["cosine"].is_monotonic_decreasing


def test_lsh_topk_recall():
    from barks_ocr_ray.functions.ann import brute_force_topk, lsh_topk

    ds = _emb_table()
    exact = set(
        brute_force_topk(ds, [4], k=3).to_pandas()["neighbor_id"]
    )
    approx = set(lsh_topk(ds, [4], k=3, n_planes=4).to_pandas()["neighbor_id"])
    # multi-probe with few planes on a tiny set: the planted neighbor must
    # be found; overall recall is reported, not asserted to be 1
    assert 5 in approx
    assert len(exact & approx) >= 1


def test_fingerprint_deterministic():
    from barks_ocr_ray.functions.text import fingerprints

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([_text(0), _text(0), _text(9)], pa.string()),
            }
        )
    )
    out = fingerprints(docs).to_pandas().set_index("doc_id")["fingerprint"]
    assert out.loc[1] == out.loc[2]
    assert out.loc[1] != out.loc[3]


def test_multimodal_stub():
    import pytest

    from barks_ocr_ray.functions.multimodal import (
        MediaFeatureExtractor,
        decode_media,
        media_features,
    )

    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b"], pa.string()),
                "html": pa.array([b"\x89payload1", b"\x89payload2"], pa.binary()),
            }
        )
    )
    out = media_features(pages, batch_size=1).to_pandas().set_index("url")
    assert len(out.loc["a", "features"]) == 8
    # deterministic: same payload -> same features
    out2 = media_features(pages, batch_size=2).to_pandas().set_index("url")
    assert list(out.loc["a", "features"]) == list(out2.loc["a", "features"])
    # the real decode boundary is explicitly stubbed
    with pytest.raises(NotImplementedError):
        decode_media(b"anything")
    ext = MediaFeatureExtractor(fake_decode=False)
    with pytest.raises(Exception):
        ext(pages.take_batch(1, batch_format="pyarrow"))


def test_dup_clusters_transitive():
    """A~B and B~C must land in one cluster labeled by the min doc id."""
    from barks_ocr_ray.functions.dedupe import dup_clusters

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 10], pa.int64()),
                "doc_b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    out = dup_clusters(pairs).to_pandas().set_index("doc_id")["cluster"]
    assert out.loc[1] == out.loc[2] == out.loc[3] == 1
    assert out.loc[10] == out.loc[11] == 10


def test_dup_clusters_end_to_end():
    """minhash pairs -> clusters: the planted dup chain collapses."""
    from barks_ocr_ray.functions.dedupe import dup_clusters, minhash_near_dups

    rows = [(i, _text(i)) for i in range(10)]
    rows.append((100, _near(rows[0][1])))   # 0 ~ 100
    rows.append((101, _near(rows[0][1])))   # 0 ~ 101 (and 100 ~ 101)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    pairs = minhash_near_dups(docs, threshold=0.5)
    out = dup_clusters(pairs).to_pandas().set_index("doc_id")["cluster"]
    assert out.loc[0] == out.loc[100] == out.loc[101] == 0
