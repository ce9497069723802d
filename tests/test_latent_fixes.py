"""Pins for the four round-3 ADVICE latents. All four are fixed in the
code; these tests pin each behavior so it can't regress:

1. ``ngram_jaccard_pairs`` drops null-text rows (SQL NULL-join-key
   semantics — NULL never pairs), instead of forming a null bucket
   whose members pair with jaccard 1.0.
2. ``embedding_all_pairs_exact`` returns a *Dataset* with the typed
   empty schema on the 0-row path (composable with Dataset-only APIs),
   never a raw ``pa.Table``.
3. Pruned resume: a marker-bearing input with stray parquet OUTSIDE
   ``bucket=*/`` is rejected by ``bucketed_input_dirs`` so the job
   falls back to full scans — never silently skips rows the
   fingerprint counted.
4. ``_train_sample_matrix`` raises a descriptive ``ValueError`` on an
   empty embeddings dataset instead of ``np.stack``'s opaque error, so
   the IVF/PQ quantizer trainers fail loud on empty input.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_ngram_jaccard_drops_null_text():
    from barks_ocr_ray.functions.dedupe import ngram_jaccard_pairs

    body = "alpha beta gamma delta epsilon zeta eta theta " * 12
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array([body, body, None, None], pa.string()),
                "source": pa.array(["s1"] * 4, pa.string()),
            }
        )
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5, bucket_chars=10_000).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    # the real duplicate pair survives; the null-text docs never pair
    # (with each other or anything else) — SQL NULL join keys semantics
    assert (0, 1) in pairs
    assert not any(2 in p or 3 in p for p in pairs)


def test_embedding_all_pairs_empty_result_is_dataset():
    import numpy as np

    from barks_ocr_ray.functions.ann import (
        ALL_PAIRS_EMPTY,
        embedding_all_pairs_exact,
    )

    # orthogonal unit vectors: every pairwise cosine is 0 < threshold
    eye = np.eye(6, 8)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(6)), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in eye], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = embedding_all_pairs_exact(emb, threshold=0.9, n_blocks=2)
    assert isinstance(out, rd.Dataset)
    # typed empty schema survives, and the result stays composable with
    # Dataset-only APIs (the crash mode the advice described)
    assert out.schema().names == ALL_PAIRS_EMPTY.schema.names
    assert out.map_batches(lambda t: t, batch_format="pyarrow").count() == 0


def test_stray_parquet_outside_buckets_disables_pruning(tmp_path):
    from barks_ocr_ray.datagen import write_bucketed_pages_corpus
    from barks_ocr_ray.pipelines.resume import bucketed_input_dirs

    corpus = str(tmp_path / "bucketed")
    write_bucketed_pages_corpus(corpus, 80, 4)
    dirs = bucketed_input_dirs(corpus, 4)
    assert dirs is not None and len(dirs) > 0

    # a parquet file outside bucket=*/ is counted by input_fingerprint
    # but invisible to the pruned read -> pruning must disable itself
    stray = os.path.join(corpus, "stray.parquet")
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), stray)
    assert bucketed_input_dirs(corpus, 4) is None

    os.remove(stray)
    assert bucketed_input_dirs(corpus, 4) is not None

    # stray files in a non-bucket SUBDIRECTORY are caught too
    sub = os.path.join(corpus, "extra")
    os.makedirs(sub)
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), os.path.join(sub, "s.parquet"))
    assert bucketed_input_dirs(corpus, 4) is None


def test_quantizer_training_empty_input_raises_descriptive():
    from barks_ocr_ray.functions.ann import _train_sample_matrix

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(ValueError, match="empty"):
        _train_sample_matrix(empty)
