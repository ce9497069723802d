"""Checkpoint/resume tests (FIXTURES.md F3 resume fixture): run the
resumable job, delete commit markers for some partitions, re-run, and
assert (a) the final corpus is identical and complete, (b) untouched
partitions were not recomputed (file mtimes unchanged)."""

import os
import shutil

import pyarrow.dataset as pads
import pytest

from barks_ocr_ray.datagen import write_pages_corpus
from barks_ocr_ray.extract.golden import golden_corpus
from barks_ocr_ray.pipelines.resume import run_resumable
from barks_ocr_ray.state.manifest import manifest_path

N = 300
NUM_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume_pages"))
    write_pages_corpus(d, N, rows_per_file=100)
    return d


def _mtimes(out_dir):
    out = {}
    for b in range(NUM_BUCKETS):
        bdir = os.path.join(out_dir, f"bucket={b}")
        if os.path.isdir(bdir):
            out[b] = {
                f: os.stat(os.path.join(bdir, f)).st_mtime_ns
                for f in sorted(os.listdir(bdir))
            }
    return out


def _check_complete(out_dir, gold):
    tbl = pads.dataset(out_dir, partitioning="hive").to_table(
        columns=["url", "extracted_text", "content_hash"]
    )
    assert tbl.num_rows == len(gold)
    got = {
        u: (t, h)
        for u, t, h in zip(
            tbl.column("url").to_pylist(),
            tbl.column("extracted_text").to_pylist(),
            tbl.column("content_hash").to_pylist(),
        )
    }
    assert set(got) == set(gold)
    for url, g in gold.items():
        assert got[url][0] == g["extracted_text"], url
        assert got[url][1] == g["content_hash"], url


def test_resume_skips_committed_partitions(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    gold = golden_corpus(N)

    summary1 = run_resumable(
        corpus_dir, out_dir, num_buckets=NUM_BUCKETS, chunk_size=3,
        num_partitions=4,
    )
    assert summary1["computed"] == NUM_BUCKETS and summary1["skipped"] == 0
    _check_complete(out_dir, gold)
    mt1 = _mtimes(out_dir)

    # simulate a failed run: drop the commit markers of 3 buckets and
    # corrupt one of their data dirs (partial write)
    broken = [1, 4, 6]
    for b in broken:
        os.remove(manifest_path(out_dir, b))
    shutil.rmtree(os.path.join(out_dir, "bucket=4"), ignore_errors=True)

    summary2 = run_resumable(
        corpus_dir, out_dir, num_buckets=NUM_BUCKETS, chunk_size=3,
        num_partitions=4,
    )
    assert summary2["computed"] == len(broken)
    assert summary2["skipped"] == NUM_BUCKETS - len(broken)
    _check_complete(out_dir, gold)

    mt2 = _mtimes(out_dir)
    for b in range(NUM_BUCKETS):
        if b not in broken and b in mt1:
            assert mt2[b] == mt1[b], f"bucket {b} was recomputed"
    for b in broken:
        if b in mt1 and b in mt2:
            assert mt2[b] != mt1[b], f"bucket {b} was NOT recomputed"


def test_resume_noop_when_fully_committed(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    run_resumable(
        corpus_dir, out_dir, num_buckets=4, chunk_size=4, num_partitions=4
    )
    mt1 = _mtimes(out_dir)
    summary = run_resumable(
        corpus_dir, out_dir, num_buckets=4, chunk_size=4, num_partitions=4
    )
    assert summary["computed"] == 0 and summary["skipped"] == 4
    assert _mtimes(out_dir) == mt1


def test_single_pass_default_reads_input_once(corpus_dir, tmp_path):
    """chunk_size=None (default): whole job = ONE streaming scan of the
    input, all buckets written and committed from that single pass."""
    out_dir = str(tmp_path / "out_single")
    gold = golden_corpus(N)
    summary = run_resumable(
        corpus_dir, out_dir, num_buckets=NUM_BUCKETS, num_partitions=4
    )
    assert summary["computed"] == NUM_BUCKETS
    assert summary["input_scans"] == 1
    assert len(summary["chunks"]) == 1
    _check_complete(out_dir, gold)

    # resume after dropping one commit marker: still exactly one scan
    os.remove(manifest_path(out_dir, 2))
    summary2 = run_resumable(
        corpus_dir, out_dir, num_buckets=NUM_BUCKETS, num_partitions=4
    )
    assert summary2["computed"] == 1 and summary2["input_scans"] == 1
    _check_complete(out_dir, gold)


def test_chunked_mode_prunes_bucketed_input(tmp_path):
    """Chunked mode over a bucket-partitioned input opens only each
    chunk's bucket directories: <=1 input scan total instead of one full
    scan per chunk."""
    from barks_ocr_ray.datagen import write_bucketed_pages_corpus

    corpus = str(tmp_path / "bucketed_pages")
    write_bucketed_pages_corpus(corpus, N, NUM_BUCKETS)
    out_dir = str(tmp_path / "out_pruned")
    gold = golden_corpus(N)

    summary = run_resumable(
        corpus, out_dir, num_buckets=NUM_BUCKETS, chunk_size=3,
        num_partitions=4,
    )
    assert summary["read_pruned"] is True
    assert summary["input_scans"] <= 1
    assert summary["computed"] == NUM_BUCKETS
    _check_complete(out_dir, gold)

    # resume of 2 broken buckets opens only 2/NUM_BUCKETS of the input
    broken = [1, 6]
    for b in broken:
        os.remove(manifest_path(out_dir, b))
    summary2 = run_resumable(
        corpus, out_dir, num_buckets=NUM_BUCKETS, chunk_size=3,
        num_partitions=4,
    )
    assert summary2["computed"] == len(broken)
    assert summary2["input_scans"] == round(len(broken) / NUM_BUCKETS, 3)
    _check_complete(out_dir, gold)


def test_bucketing_marker_mismatch_disables_pruning(tmp_path):
    """A bucket-count mismatch between input layout and the requested
    bucketing must fall back to full scans (bucket identity does not
    survive a different modulus), never silently drop rows."""
    from barks_ocr_ray.datagen import write_bucketed_pages_corpus

    corpus = str(tmp_path / "bucketed4")
    write_bucketed_pages_corpus(corpus, 150, 4)
    out_dir = str(tmp_path / "out_mismatch")
    summary = run_resumable(
        corpus, out_dir, num_buckets=8, chunk_size=3, num_partitions=4
    )
    assert summary["read_pruned"] is False
    assert summary["computed"] == 8
    _check_complete(out_dir, golden_corpus(150))


def test_input_change_invalidates(corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out3")
    run_resumable(
        corpus_dir, out_dir, num_buckets=4, chunk_size=4, num_partitions=4
    )
    # grow the corpus -> fingerprint changes -> full recompute
    write_pages_corpus(corpus_dir, N + 100, rows_per_file=100)
    summary = run_resumable(
        corpus_dir, out_dir, num_buckets=4, chunk_size=4, num_partitions=4
    )
    assert summary["computed"] == 4 and summary["skipped"] == 0
    _check_complete(out_dir, golden_corpus(N + 100))


def test_kill_mid_run_then_resume(tmp_path):
    """True crash recovery: a subprocess running the chunked job is
    KILLED after its first chunk commits; the in-process resume must
    finish the corpus without recomputing the committed buckets."""

    import signal
    import subprocess
    import sys
    import time

    corpus = str(tmp_path / "pages")
    write_pages_corpus(corpus, N, rows_per_file=100)
    out_dir = str(tmp_path / "out_kill")
    script = f"""
import sys, os
sys.path.insert(0, {repr(os.getcwd())})
os.environ["PYTHONPATH"] = {repr(os.getcwd())}
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from barks_ocr_ray.context import configure; configure()
from barks_ocr_ray.pipelines.resume import run_resumable
run_resumable({repr(corpus)}, {repr(out_dir)}, num_buckets={NUM_BUCKETS},
              chunk_size=2, num_partitions=2)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the FIRST manifest to appear, then kill hard
    deadline = time.time() + 240
    manifest_dir = os.path.join(out_dir, "_manifests")
    committed = []
    while time.time() < deadline:
        if os.path.isdir(manifest_dir):
            # only COMPLETED manifests count — the atomic write goes
            # through bucket-*.json.tmp + os.replace, and a kill landing
            # between the two leaves a .tmp that never commits
            committed = [
                f
                for f in os.listdir(manifest_dir)
                if f.startswith("bucket-") and f.endswith(".json")
            ]
            if committed:
                break
        if proc.poll() is not None:
            break
        time.sleep(0.25)
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    # re-derive from the post-kill (now stable) filesystem state
    committed = (
        [
            f
            for f in os.listdir(manifest_dir)
            if f.startswith("bucket-") and f.endswith(".json")
        ]
        if os.path.isdir(manifest_dir)
        else []
    )
    if not committed:
        import pytest

        pytest.skip("job finished or died before first commit; nothing to resume")
    mt_before = _mtimes(out_dir)
    committed_ids = sorted(
        int(f.split("-")[1].split(".")[0]) for f in committed
    )

    summary = run_resumable(
        corpus, out_dir, num_buckets=NUM_BUCKETS, chunk_size=2,
        num_partitions=4,
    )
    assert summary["skipped"] >= len(committed_ids)
    _check_complete(out_dir, golden_corpus(N))
    mt_after = _mtimes(out_dir)
    for b in committed_ids:
        if b in mt_before:
            assert mt_after[b] == mt_before[b], f"committed bucket {b} recomputed"
