"""Contracts for DSIR importance resampling (q95 machinery): the weight
table favors target-enriched buckets, scores are partition-independent
integer sums, and tokenless docs are dropped like the SQL replay."""

import pyarrow as pa


def _corpus():
    # 'alpha' appears overwhelmingly in the target lang, 'beta' only
    # outside it; 'gamma' is background noise in both
    rows = []
    for i in range(40):
        rows.append((i, "alpha alpha gamma", "en"))
    for i in range(40, 80):
        rows.append((i, "beta beta gamma", "fr"))
    rows.append((80, "", "en"))  # tokenless: must not be scored
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_weights_separate_target_from_background(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.importance import (
        importance_weights,
    )
    from barks_ocr_ray.functions.text import hash_token

    w = importance_weights(rd.from_arrow(_corpus()), "en", concurrency=2)
    b_alpha = hash_token("alpha") % 64
    b_beta = hash_token("beta") % 64
    assert b_alpha != b_beta  # fixture sanity: distinct buckets
    assert w[b_alpha] > 0 > w[b_beta]


def test_resample_ranks_target_docs_first_and_drops_tokenless(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.importance import importance_resample

    out = importance_resample(
        rd.from_arrow(_corpus()), "en", k=200, concurrency=2
    ).take_all()
    assert len(out) == 80  # the tokenless doc 80 never appears
    top40 = {r["doc_id"] for r in out[:40]}
    assert top40 == set(range(40))  # every 'en'-like doc outranks the rest


def test_scores_partition_independent(ray_session):
    import ray.data as rd

    from barks_ocr_ray.functions.importance import importance_resample

    a = importance_resample(
        rd.from_arrow(_corpus()), "en", k=200, concurrency=2
    ).take_all()
    b = importance_resample(
        rd.from_arrow(_corpus()).repartition(9), "en", k=200, concurrency=3
    ).take_all()
    assert [(r["doc_id"], r["score_micro"]) for r in a] == [
        (r["doc_id"], r["score_micro"]) for r in b
    ]
