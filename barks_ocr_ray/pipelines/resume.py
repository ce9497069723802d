"""Resumable, checkpointed extraction: partitioned output + per-partition
lineage manifests (north rule; SURVEY.md §7.2 step 5).

Layout:

    out_dir/
      bucket=K/part-*.parquet      one directory per url-hash bucket
      _manifests/bucket-K.json     commit marker (written AFTER the data)

Execution: buckets are processed in CHUNKS; each chunk is one streaming
Dataset run (read -> sniff -> bucket filter -> dedup -> extract -> write
partitioned by bucket) followed by the chunk's manifest commits. On
restart, committed buckets (manifest present + input fingerprint match)
are skipped entirely — their files are not even opened; partially-written
buckets (data without manifest) are wiped and recomputed.

Correctness under bucketing: the bucket is a pure function of url, so
every fetch of a url lands in the same bucket and the per-chunk dedup
sees all of them (same invariant the hash repartition relies on).

The chunk size is the resume granularity / recovery cost knob: larger
chunks amortize per-run fixed cost, smaller chunks lose less work on
failure.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

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
    chunk_size: int = 8,
    **pipeline_kwargs,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict with
    counts of skipped/computed buckets."""
    fingerprint = input_fingerprint(input_path)
    os.makedirs(out_dir, exist_ok=True)
    pending = pending_buckets(out_dir, num_buckets, fingerprint)
    skipped = num_buckets - len(pending)

    # wipe partial output of uncommitted buckets (data without manifest)
    for b in pending:
        bdir = os.path.join(out_dir, f"bucket={b}")
        if os.path.isdir(bdir):
            shutil.rmtree(bdir)

    computed = 0
    chunk_metrics = []
    for start in range(0, len(pending), chunk_size):
        chunk = pending[start : start + chunk_size]
        chunk_set = set(chunk)

        def _in_chunk(t: pa.Table) -> pa.Table:
            mask = pa.array(
                [b in chunk_set for b in t.column("bucket").to_pylist()]
            )
            return t.filter(mask)

        t_chunk = time.time()
        pages = (
            read_pages(input_path)
            .map_batches(_bucket_column(num_buckets), batch_format="pyarrow")
            .map_batches(_in_chunk, batch_format="pyarrow")
        )
        out = extraction_pipeline(pages, keep_html=False, **pipeline_kwargs)
        # carry the bucket through (it was computed pre-pipeline; recompute
        # cheaply post-pipeline to keep the pipeline signature unchanged)
        out = out.map_batches(_bucket_column(num_buckets), batch_format="pyarrow")
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
    summary = {
        "num_buckets": num_buckets,
        "skipped": skipped,
        "computed": computed,
        "fingerprint": fingerprint,
        "chunks": chunk_metrics,
    }
    # per-run metrics ledger next to the manifests (north rule: lineage
    # + metrics; the reference's run-total prints made durable)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    with open(os.path.join(out_dir, "_manifests", "last-run.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
