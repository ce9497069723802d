"""Round-2 operator semantics on constructed inputs: banded range join,
levenshtein join (DuckDB-exact metric), exact all-pairs cosine, and the
index-integrity/entity-search surfaces' building blocks."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_range_join_matches_bruteforce():
    from barks_ocr_ray.functions.dedupe import range_join_pairs

    rng = np.random.RandomState(3)
    n = 80
    ids = np.arange(n, dtype=np.int64)
    vals = rng.randint(0, 40, n).astype(np.int64)
    keys = np.array(["k%d" % (i % 3) for i in range(n)])
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": pa.array(vals),
                "source": pa.array(keys, pa.string()),
            }
        )
    )
    for max_diff in (0, 1, 3):
        got = (
            range_join_pairs(
                docs, value_col="n_chars", key_col="source", max_diff=max_diff
            )
            .to_pandas()
            .itertuples(index=False)
        )
        got = {(a, b) for a, b in got}
        want = {
            (int(min(i, j)), int(max(i, j)))
            for i in range(n)
            for j in range(i + 1, n)
            if keys[i] == keys[j] and abs(int(vals[i]) - int(vals[j])) <= max_diff
        }
        assert got == want, f"max_diff={max_diff}"


def test_levenshtein_matches_duckdb():
    import duckdb

    from barks_ocr_ray.functions.fuzzy import levenshtein

    rng = np.random.RandomState(11)
    alphabet = "abcde "
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    for _ in range(40):
        a = "".join(rng.choice(list(alphabet), rng.randint(0, 18)))
        b = "".join(rng.choice(list(alphabet), rng.randint(0, 18)))
        cases.append((a, b))
    for a, b in cases:
        want = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_best_match_picks_best_and_breaks_ties():
    from barks_ocr_ray.functions.fuzzy import levenshtein_best_match

    left = rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([0, 0], pa.int64()),
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["hello world", "zzzzzz"], pa.string()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([0, 0, 0], pa.int64()),
                # ids 20 and 30 carry IDENTICAL text -> tie -> min id wins
                "doc_id": pa.array([20, 30, 40], pa.int64()),
                "text": pa.array(
                    ["hello worlds", "hello worlds", "hello"], pa.string()
                ),
            }
        )
    )
    out = levenshtein_best_match(
        left, right, key_col="bucket", id_col="doc_id", text_col="text",
        min_ratio=0.5,
    ).to_pandas()
    assert len(out) == 1  # doc 2 has no match >= 0.5
    row = out.iloc[0]
    assert row["left_id"] == 1 and row["right_id"] == 20
    # ratio is emitted rounded to 4 decimals (oracle parity)
    assert abs(row["ratio"] - (1 - 1 / 12)) < 5e-5


def test_embedding_all_pairs_exact_matches_numpy():
    from barks_ocr_ray.functions.ann import embedding_all_pairs_exact

    rng = np.random.RandomState(5)
    n, d = 60, 16
    mat = rng.standard_normal((n, d))
    # plant two near-identical pairs
    mat[41] = mat[3] + 0.01 * rng.standard_normal(d)
    mat[42] = mat[7] + 0.01 * rng.standard_normal(d)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    got = embedding_all_pairs_exact(emb, threshold=0.6, n_blocks=3)
    got_df = got.to_pandas() if not isinstance(got, pa.Table) else got.to_pandas()
    got_pairs = {(a, b) for a, b in zip(got_df["vec_a"], got_df["vec_b"])}

    unit = mat.astype(np.float32).astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1)[:, None]
    sims = unit @ unit.T
    want = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= 0.6
    }
    assert got_pairs == want
    assert (3, 41) in got_pairs and (7, 42) in got_pairs


def test_index_and_scan_sides_agree_on_clean_text():
    """The q40 invariant on text where tokenization and \\b-regex agree:
    both counting paths must report the same docs per name."""
    from barks_ocr_ray.pipelines.queries import q40_index_integrity

    out = q40_index_integrity("/root/testdata/sf0.001")
    df = out.to_pandas() if not isinstance(out, pa.Table) else out.to_pandas()
    assert len(df) > 0
    assert bool(df["consistent"].all())


def test_apply_line_pattern_reference_semantics():
    """M16 contract (reference ocr_check.py:156-182): last pattern line
    absorbs the remainder; source exhaustion drops later lines; empty
    inputs degrade exactly as the reference does."""
    from barks_ocr_ray.functions.text import apply_line_pattern as f

    assert f("a b c d e f g", "x y\nz\nw w w") == "a b\nc\nd e f g"
    assert f("a b c", "x\ny\nz") == "a\nb\nc"
    # source exhausted before the last pattern line -> later lines dropped
    assert f("a b", "x y z\nq\nr") == "a b"
    # last line absorbs everything even when counts disagree
    assert f("a b c d", "x\ny") == "a\nb c d"
    assert f("", "x\ny") == ""
    # empty pattern = one zero-count line -> it is the last -> takes all
    assert f("a b c", "") == "a b c"


def test_line_pattern_repair_stage():
    from barks_ocr_ray.functions.text import line_pattern_repair

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["one two three four", "solo"], pa.string()),
                "pattern": pa.array(["a b\nc d", "x\ny"], pa.string()),
            }
        )
    )
    out = line_pattern_repair(ds, keep=["doc_id"]).to_pandas()
    got = dict(zip(out["doc_id"], out["rewrapped"]))
    assert got[1] == "one two\nthree four"
    # the LAST pattern line always emits, even with no words left
    # (reference: words[i:] with i past the end still joins to '')
    assert got[2] == "solo\n"


def test_dup_clusters_local_and_distributed_agree():
    """The auto-gate's local union-find and the distributed propagation
    rounds are the same operator: identical (doc_id, cluster) output on
    a graph with chains, a star, and singleton-free isolated edges."""
    from barks_ocr_ray.functions.dedupe import dup_clusters

    edges = [
        (5, 3), (3, 9), (9, 7),          # chain -> min 3
        (20, 21), (20, 22), (20, 23),    # star  -> min 20
        (40, 41),                        # pair  -> min 40
        (2, 50), (50, 1),                # chain through high id -> min 1
    ]
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    local = (
        dup_clusters(pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        dup_clusters(pairs, local_edge_cap=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert local.equals(dist)
    got = dict(zip(local["doc_id"], local["cluster"]))
    assert got[7] == 3 and got[23] == 20 and got[41] == 40 and got[50] == 1


def test_ivf_topk_recall_vs_bruteforce():
    """IVF with n_probe == n_centroids must EQUAL brute force (every
    list probed); with fewer probes it keeps high recall on clustered
    data (the documented tradeoff)."""
    from barks_ocr_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(9)
    # three well-separated clusters of 20
    centers = rng.standard_normal((3, 12)) * 5
    rows = []
    for i in range(60):
        rows.append(centers[i % 3] + 0.1 * rng.standard_normal(12))
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(60, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in rows],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    exact = brute_force_topk(emb, [0, 1], k=5).to_pandas()
    full = ivf_topk(emb, [0, 1], k=5, n_centroids=4, n_probe=4).to_pandas()
    cols = ["query_id", "neighbor_id", "cosine"]
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = full[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    probed = ivf_topk(emb, [0, 1], k=5, n_centroids=4, n_probe=1).to_pandas()
    for q in (0, 1):
        ex = set(exact[exact["query_id"] == q]["neighbor_id"])
        ap = set(probed[probed["query_id"] == q]["neighbor_id"])
        assert len(ex & ap) / len(ex) >= 0.8, f"recall@5 too low for query {q}"


def test_frame_sample_and_resize_stages():
    """Multimodal explode + resize plumbing: deterministic fake decode,
    stride/cap contract, aspect-fit geometry, NotImplementedError at the
    real decode boundary."""
    import pytest as _pytest

    from barks_ocr_ray.functions.multimodal import (
        aspect_fit,
        fake_frame_count,
        frame_sample,
        media_resize,
    )

    payload_small = b"x" * 100           # 1 frame
    payload_big = b"y" * (4096 * 30)     # 31 frames -> stride 5 -> 7 rows
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b"], pa.string()),
                "html": pa.array([payload_small, payload_big], pa.binary()),
            }
        )
    )
    frames = frame_sample(pages, stride=5, max_frames=8).to_pandas()
    assert len(frames[frames["url"] == "a"]) == 1
    assert len(frames[frames["url"] == "b"]) == 7
    assert list(frames[frames["url"] == "b"]["frame_idx"]) == [0, 5, 10, 15, 20, 25, 30]
    assert (frames["ts_ms"] == frames["frame_idx"] * 40).all()
    assert fake_frame_count(payload_big) == 31

    # cap wins over stride
    capped = frame_sample(pages, stride=1, max_frames=3).to_pandas()
    assert len(capped[capped["url"] == "b"]) == 3

    rs = media_resize(pages).to_pandas().set_index("url")
    for u in ("a", "b"):
        w, h = int(rs.loc[u, "src_width"]), int(rs.loc[u, "src_height"])
        tw, th = int(rs.loc[u, "out_width"]), int(rs.loc[u, "out_height"])
        assert aspect_fit(w, h) == (tw, th)
        assert max(tw, th) == 128 and min(tw, th) >= 1

    with _pytest.raises((NotImplementedError, Exception)):
        media_resize(pages, fake_decode=False).to_pandas()


def test_stratified_sample_is_partition_independent():
    """The md5-fraction keep decision is a pure row function: any
    repartitioning yields the same kept set (what Dataset.random_sample
    cannot promise)."""
    from barks_ocr_ray.functions.text import stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array(list(range(200)), pa.int64()),
            "lang": pa.array(["en", "de"] * 100, pa.string()),
        }
    )
    rates = {"en": 0.3, "de": 0.7}
    a = (
        stratified_sample(rd.from_arrow(t), rates=rates)
        .to_pandas()["doc_id"]
        .tolist()
    )
    b = (
        stratified_sample(rd.from_arrow(t).repartition(7), rates=rates)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert sorted(a) == sorted(b)
    assert 0 < len(a) < 200


def test_training_prep_composition():
    """q51's pipeline on a constructed corpus: low-token and
    low-confidence docs drop, exact dups resolve to min doc_id, kept
    rows carry the enriched columns."""
    from barks_ocr_ray.pipelines.prep import training_prep

    good = "the fast cat and the dog run to the house in the morning"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    good,            # kept (en, 13 tokens)
                    good,            # exact dup of 1 -> dropped (min wins)
                    "too short",     # < 10 tokens -> dropped
                    "xyzzy " * 20,   # no stopwords -> lang 'und', score 0
                ],
                pa.string(),
            ),
        }
    )
    out = training_prep(
        rd.from_arrow(docs),
        rates={},           # no stratum rated -> default_rate applies
        default_rate=1.0,
        min_lang_score=0.02,
        num_partitions=2,
    ).to_pandas()
    assert list(out["doc_id"]) == [1]
    row = out.iloc[0]
    assert row["lang_pred"] == "en" and row["n_tokens"] == 13


def test_range_join_value_clustered_single_band():
    """Value-clustered corpus: every doc lands in ONE (key, band) group
    (the peak-memory hazard the chunked two-pointer emit bounds —
    >65k pairs forces multiple PAIR_CHUNK rounds). Pair set must equal
    brute force exactly."""
    from barks_ocr_ray.functions.dedupe import range_join_pairs

    rng = np.random.RandomState(7)
    n = 600  # ~180k same-band pairs > PAIR_CHUNK (1<<16)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.randint(0, 3, n).astype(np.int64)  # all in band 0 (W=3)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": pa.array(vals),
                "source": pa.array(["hot"] * n, pa.string()),
            }
        )
    )
    got = {
        (a, b)
        for a, b in range_join_pairs(docs, max_diff=2)
        .to_pandas()
        .itertuples(index=False)
    }
    want = {
        (int(i), int(j))
        for i in range(n)
        for j in range(i + 1, n)
        if abs(int(vals[i]) - int(vals[j])) <= 2
    }
    assert got == want
    assert len(got) > (1 << 16)  # chunking actually engaged
