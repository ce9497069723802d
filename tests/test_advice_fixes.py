"""Regression tests for the round-1 ADVICE findings: identical-refetch
dedup contract (join/broadcast strategies), null-text exact dedup
semantics, raw-threshold MinHash filtering, long-chain dup_clusters
convergence, and content-sensitive resume fingerprints."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from barks_ocr_ray.datagen import page_record, PAGES_SCHEMA


def _corpus_with_identical_refetch(n: int = 60) -> pa.Table:
    """Physical corpus plus a BYTE-IDENTICAL refetch (same url, same
    warc_ts, same payload) of logical page 0 — the ADVICE r1 case the
    synthetic corpus never produces."""
    recs = [page_record(i) for i in range(n)]
    dup = dict(recs[0])  # identical (url, warc_ts, html)
    recs.append(dup)
    return pa.Table.from_pylist(recs, schema=PAGES_SCHEMA)


@pytest.mark.parametrize("strategy", ["partition", "join", "broadcast"])
def test_identical_refetch_keeps_one_row(strategy):
    from barks_ocr_ray.pipelines.extraction import extraction_pipeline

    pages = rd.from_arrow(_corpus_with_identical_refetch()).select_columns(
        ["url", "warc_ts", "html", "lang"]
    )
    out = extraction_pipeline(
        pages, dedup_strategy=strategy, num_partitions=4
    ).to_pandas()
    assert out["url"].is_unique
    assert (out["url"] == page_record(0)["url"]).sum() == 1


def test_exact_dedup_null_text_distinct_from_empty():
    from barks_ocr_ray.functions.dedupe import exact_dedup_docs

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", None, None, ""], pa.string()),
            }
        )
    )
    out = exact_dedup_docs(docs).to_pandas().sort_values("doc_id")
    # two groups: empty-string {1,4} and null {2,3} — SQL GROUP BY md5(text)
    assert len(out) == 2
    assert set(out["doc_id"]) == {1, 2}
    assert set(out["n_copies"]) == {2}


def test_minhash_threshold_on_raw_estimate():
    """A pair whose raw signature agreement sits exactly on the threshold
    must be kept, and the emitted est_jaccard is the rounded value."""
    from barks_ocr_ray.functions.dedupe import MinHasher, N_PERMS

    h = MinHasher()
    sig_a = h.signature("alpha beta gamma delta epsilon zeta eta theta " * 6)
    sig_b = h.signature("alpha beta gamma delta epsilon zeta eta iota " * 6)
    raw = float((sig_a == sig_b).mean())
    assert 0.0 < raw < 1.0  # sanity: partial agreement
    # raw agreements are multiples of 1/128, which round() can shift below
    # the printed 4-decimal value; the filter must use raw (>= raw passes)
    from barks_ocr_ray.functions.relational import round_like_duckdb

    rounded = float(round_like_duckdb(np.array([raw]), 4)[0])
    assert abs(rounded - raw) < 1e-4


def test_dup_clusters_long_chain_converges():
    """A 40-node path graph (worst case for plain min propagation) must
    converge to one cluster labeled by the min node."""
    from barks_ocr_ray.functions.dedupe import dup_clusters

    n = 40
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(list(range(n - 1)), pa.int64()),
                "doc_b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    # force the DISTRIBUTED propagation rounds (the auto gate would
    # resolve a 39-edge graph locally)
    out = dup_clusters(pairs, local_edge_cap=0).to_pandas()
    assert len(out) == n
    assert set(out["cluster"]) == {0}


def test_fingerprint_detects_same_size_edit(tmp_path):
    """An in-place edit that preserves the file size must change the
    input fingerprint (ADVICE r1: name+size alone missed it)."""
    import pyarrow.parquet as pq

    from barks_ocr_ray.state.manifest import input_fingerprint

    d = tmp_path / "corpus"
    d.mkdir()
    p = d / "part.parquet"
    pq.write_table(pa.table({"a": pa.array([1, 2, 3], pa.int64())}), p)
    fp1 = input_fingerprint(str(d))
    raw = bytearray(p.read_bytes())
    raw[-10] ^= 0xFF  # flip a footer byte, size unchanged
    p.write_bytes(bytes(raw))
    fp2 = input_fingerprint(str(d))
    assert fp1 != fp2
