"""Incremental corpus update (pipelines/incremental.py): append-only
nightly-crawl semantics — only unseen urls are extracted, shards are
disjoint, the union equals a from-scratch run, and the broadcast /
distributed anti paths agree."""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd


def _halves(n=400):
    """Split the pages corpus by url-hash parity so every fetch of a
    url lands in ONE half (otherwise append-only 'prev wins' and the
    full run's max-warc_ts winner could legitimately differ)."""
    from barks_ocr_ray.datagen import pages_table

    pages = pages_table(n).select(["url", "warc_ts", "html", "lang"])
    side = pa.array(
        [
            int(hashlib.md5(u.as_py().encode()).hexdigest(), 16) % 2 == 0
            for u in pages.column("url")
        ]
    )
    return pages, pages.filter(side), pages.filter(pc.invert(side))


def _read_all(corpus_dir):
    import glob

    from barks_ocr_ray.pipelines.incremental import _shard_dirs

    files = [
        f
        for d in _shard_dirs(str(corpus_dir))
        for f in sorted(glob.glob(d + "/*.parquet"))
    ]
    t = pads.dataset(files).to_table()
    return dict(
        zip(
            t.column("url").to_pylist(),
            t.column("extracted_text").to_pylist(),
        )
    )


def test_incremental_update_matches_full_run(tmp_path):
    from barks_ocr_ray.pipelines.extraction import extraction_pipeline
    from barks_ocr_ray.pipelines.incremental import update_corpus

    pages, a, _b = _halves()
    corpus = tmp_path / "corpus"

    r1 = update_corpus(str(corpus), rd.from_arrow(a), num_partitions=4)
    assert r1["known_urls"] == 0 and r1["new_rows"] > 0

    # second batch is the FULL corpus: only the unseen half extracts
    r2 = update_corpus(str(corpus), rd.from_arrow(pages), num_partitions=4)
    assert r2["known_urls"] == r1["new_rows"]
    assert r2["new_rows"] > 0

    # union of shards == from-scratch single run, byte-identical text
    full = extraction_pipeline(
        rd.from_arrow(pages), num_partitions=4
    ).to_pandas()
    want = dict(zip(full["url"], full["extracted_text"]))
    assert _read_all(corpus) == want

    # idempotent: re-sending the same batch appends nothing
    r3 = update_corpus(str(corpus), rd.from_arrow(pages), num_partitions=4)
    assert r3["new_rows"] == 0 and r3["shard"] is None


def test_incremental_torn_shard_is_ignored_and_healed(tmp_path):
    """A crashed update leaves only a .tmp directory: it must not count
    as known urls, and the next update must wipe it and extract the
    missing half in a committed shard."""
    import os

    from barks_ocr_ray.pipelines.incremental import update_corpus

    pages, a, _b = _halves(200)
    corpus = tmp_path / "corpus"
    update_corpus(str(corpus), rd.from_arrow(a), num_partitions=4)
    # simulate a crash: a half-written uncommitted shard
    torn = corpus / "shard-0001.tmp"
    torn.mkdir()
    (torn / "part-0.parquet").write_bytes(b"not a parquet file")
    r = update_corpus(str(corpus), rd.from_arrow(pages), num_partitions=4)
    assert not torn.exists()
    assert r["shard"] and r["shard"].endswith("shard-0001")
    assert r["known_urls"] > 0 and r["new_rows"] > 0
    assert sorted(os.listdir(corpus)) == ["shard-0000", "shard-0001"]


def test_incremental_distributed_anti_path_agrees(tmp_path):
    from barks_ocr_ray.pipelines.incremental import update_corpus

    pages, a, b = _halves(200)
    bc, dist = tmp_path / "bc", tmp_path / "dist"
    for d, cap in ((bc, None), (dist, 0)):
        kwargs = {} if cap is None else {"broadcast_cap": cap}
        update_corpus(str(d), rd.from_arrow(a), num_partitions=4)
        update_corpus(str(d), rd.from_arrow(b), num_partitions=4, **kwargs)
    assert _read_all(bc) == _read_all(dist)
