"""Resumable, checkpointed extraction: partitioned output + per-partition
lineage manifests (north rule; SURVEY.md §7.2 step 5).

Layout:

    out_dir/
      bucket=K/part-*.parquet      one directory per url-hash bucket
      _manifests/bucket-K.json     commit marker (written AFTER the data)
      _bucketing.json              layout marker (bucket fn + num_buckets)

Execution modes:

* ``chunk_size=None`` (default) — ONE streaming pass: read the input
  exactly once, tag each row's url-hash bucket, drop rows of committed
  buckets, write every pending bucket partitioned in the same run, then
  commit per-bucket manifests. Input scans: 1, always.
* ``chunk_size=k`` — bounded-recovery mode: pending buckets are
  processed k at a time, manifests committed after each chunk, so a
  mid-job failure loses at most one chunk of work. When the input is
  itself laid out by the SAME url-hash bucketing (a ``_bucketing.json``
  marker with matching ``num_buckets`` — e.g. a corpus staged by
  ``datagen.write_bucketed_pages_corpus`` or a previous bucketed run),
  each chunk reads ONLY its buckets' files (prune at the read); without
  that layout the chunk must re-scan the input, which is the documented
  price of finer recovery granularity — at 100 TB, stage the input
  bucketed or use the single-pass default.

On restart, committed buckets (manifest present + input fingerprint
match) are skipped entirely — their files are not even opened;
partially-written buckets (data without manifest) are wiped and
recomputed.

Correctness under bucketing: the bucket is a pure function of url, so
every fetch of a url lands in the same bucket and the per-run dedup sees
all of them (same invariant the hash repartition relies on).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

import pyarrow as pa

from barks_ocr_ray.pipelines.extraction import extraction_pipeline, read_pages
from barks_ocr_ray.state.manifest import (
    Manifest,
    bucket_of,
    combine_hashes,
    input_fingerprint,
    manifest_path,
    read_manifest,
    write_manifest,
)

ENGINE_VERSION = "barks-ocr-ray-0.1"

BUCKETING_MARKER = "_bucketing.json"


def write_bucketing_marker(out_dir: str, num_buckets: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, BUCKETING_MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"num_buckets": num_buckets, "bucket_fn": "crc32(url)", "engine": ENGINE_VERSION},
            f,
        )
    os.replace(tmp, os.path.join(out_dir, BUCKETING_MARKER))


def bucketed_input_dirs(input_path: str, num_buckets: int) -> dict[int, str] | None:
    """bucket -> directory map when (and only when) the input declares —
    via its ``_bucketing.json`` marker — that it is laid out by the same
    url-hash bucketing with the same ``num_buckets``. A matching marker
    is required because bucket identity is NOT preserved across different
    bucket counts (crc%4 == 1 says nothing about crc%8), so directory
    names alone are not evidence enough to skip files."""
    marker = os.path.join(input_path, BUCKETING_MARKER)
    if not os.path.isfile(marker):
        return None
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    if meta.get("num_buckets") != num_buckets or meta.get("bucket_fn") != "crc32(url)":
        return None
    # A marker alone is not proof the layout is COMPLETE: parquet files
    # sitting outside bucket=*/ would be counted by input_fingerprint but
    # silently skipped by the pruned read. Verify none exist (cheap
    # listdir walk) and fall back to the full scan otherwise.
    bucket_re = re.compile(r"^bucket=\d+$")
    for root, dirnames, filenames in os.walk(input_path):
        rel = os.path.relpath(root, input_path)
        inside_bucket = rel != "." and bucket_re.match(rel.split(os.sep)[0])
        if not inside_bucket and any(f.endswith(".parquet") for f in filenames):
            return None
    dirs = {}
    for b in range(num_buckets):
        d = os.path.join(input_path, f"bucket={b}")
        if os.path.isdir(d):
            dirs[b] = d
    return dirs


def _bucket_column(num_buckets: int):
    def _add(t: pa.Table) -> pa.Table:
        buckets = [
            bucket_of(u, num_buckets) for u in t.column("url").to_pylist()
        ]
        return t.append_column("bucket", pa.array(buckets, pa.int64()))

    return _add


def pending_buckets(out_dir: str, num_buckets: int, fingerprint: str) -> list[int]:
    pending = []
    for b in range(num_buckets):
        m = read_manifest(out_dir, b)
        if m is None or m.input_fingerprint != fingerprint:
            pending.append(b)
    return pending


def run_resumable(
    input_path: str,
    out_dir: str,
    *,
    num_buckets: int = 32,
    chunk_size: int | None = None,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict with
    counts of skipped/computed buckets and of input scans performed."""
    fingerprint = input_fingerprint(input_path)
    os.makedirs(out_dir, exist_ok=True)
    write_bucketing_marker(out_dir, num_buckets)
    pending = pending_buckets(out_dir, num_buckets, fingerprint)
    skipped = num_buckets - len(pending)

    # wipe partial output of uncommitted buckets (data without manifest)
    for b in pending:
        bdir = os.path.join(out_dir, f"bucket={b}")
        if os.path.isdir(bdir):
            shutil.rmtree(bdir)

    if chunk_size is None:
        chunks = [pending] if pending else []
    else:
        chunks = [
            pending[i : i + chunk_size] for i in range(0, len(pending), chunk_size)
        ]
    # pruning pays off whenever the layout allows it: a resume that
    # recomputes 3 of 32 buckets opens 3/32 of the input files.
    input_dirs = bucketed_input_dirs(input_path, num_buckets)

    computed = 0
    input_scans = 0
    dirs_read = 0
    chunk_metrics = []
    for chunk in chunks:
        chunk_set = set(chunk)

        def _in_chunk(t: pa.Table) -> pa.Table:
            mask = pa.array(
                [b in chunk_set for b in t.column("bucket").to_pylist()]
            )
            return t.filter(mask)

        t_chunk = time.time()
        if input_dirs is not None:
            # prune at the read: only this chunk's bucket directories
            # (expanded to files — read_parquet lists want file paths)
            paths = [
                os.path.join(input_dirs[b], f)
                for b in chunk
                if b in input_dirs
                for f in sorted(os.listdir(input_dirs[b]))
                if f.endswith(".parquet")
            ]
            dirs_read += sum(1 for b in chunk if b in input_dirs)
            if not paths:
                pages = None  # every bucket of the chunk is empty upstream
            else:
                pages = read_pages(paths)
        else:
            pages = read_pages(input_path)
            input_scans += 1
        if pages is not None:
            pages = pages.map_batches(
                _bucket_column(num_buckets), batch_format="pyarrow"
            )
            if len(chunk) < num_buckets:
                pages = pages.map_batches(_in_chunk, batch_format="pyarrow")
            out = extraction_pipeline(pages, keep_html=False, **pipeline_kwargs)
            # carry the bucket through (it was computed pre-pipeline;
            # recompute cheaply post-pipeline to keep the pipeline
            # signature unchanged)
            out = out.map_batches(
                _bucket_column(num_buckets), batch_format="pyarrow"
            )
            out.write_parquet(out_dir, partition_cols=["bucket"])

        chunk_wall = time.time() - t_chunk
        # commit: per-bucket manifest from the just-written data
        import pyarrow.dataset as pads

        chunk_rows = 0

        for b in chunk:
            bdir = os.path.join(out_dir, f"bucket={b}")
            if os.path.isdir(bdir):
                tbl = pads.dataset(bdir).to_table(columns=["content_hash"])
                hashes = tbl.column("content_hash").to_pylist()
            else:
                hashes = []  # bucket legitimately empty
            write_manifest(
                out_dir,
                Manifest(
                    bucket=b,
                    n_rows=len(hashes),
                    content_hash=combine_hashes(hashes),
                    input_fingerprint=fingerprint,
                    engine_version=ENGINE_VERSION,
                ),
            )
            chunk_rows += len(hashes)
            computed += 1
        chunk_metrics.append(
            {
                "buckets": chunk,
                "rows": chunk_rows,
                "wall_s": round(chunk_wall, 2),
                "docs_per_sec": round(chunk_rows / max(chunk_wall, 1e-9), 1),
            }
        )
    if input_dirs is not None:
        # pruned chunks partition the input: <=1 scan total, counted as
        # the fraction of bucket directories actually opened
        input_scans = round(dirs_read / num_buckets, 3)
    summary = {
        "num_buckets": num_buckets,
        "skipped": skipped,
        "computed": computed,
        "fingerprint": fingerprint,
        "input_scans": input_scans,
        "read_pruned": input_dirs is not None,
        "chunks": chunk_metrics,
    }
    # per-run metrics ledger next to the manifests (north rule: lineage
    # + metrics; the reference's run-total prints made durable)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    with open(os.path.join(out_dir, "_manifests", "last-run.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
