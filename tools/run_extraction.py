"""Cluster job entrypoint for the extraction pipeline — the north
rule's ``ray job submit`` surface.

On a real fixed-size cluster (N or 4N nodes):

    ray job submit --working-dir /path/to/repo -- \
        python tools/run_extraction.py \
        --input  s3://bucket/pages/ \
        --output s3://bucket/extracted/ \
        --resume

Standalone on one node (this sandbox: RAY_ADDRESS=local is preset):

    python tools/run_extraction.py --input /tmp/pages --output /tmp/out

The script owns its Ray session (per the repo contract only CLI entry
points, bench.py and the test fixture do); under ``ray job submit`` it
attaches to the running cluster via the job runtime's RAY_ADDRESS.
Prints ONE JSON summary line: docs, wall seconds, docs/sec, and (in
--resume mode) the per-partition lineage summary (buckets skipped /
computed, input scans) from the manifest checkpointing layer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument(
        "--num-partitions",
        type=int,
        default=None,
        help="url-hash partitions (default: 2 per cluster CPU)",
    )
    ap.add_argument(
        "--order",
        default="dedup_first",
        choices=["dedup_first", "extract_first"],
    )
    ap.add_argument(
        "--resume",
        action="store_true",
        help="checkpointed mode: skip committed url-hash buckets via the "
        "per-partition lineage manifests (crash-safe restarts)",
    )
    ap.add_argument(
        "--num-buckets",
        type=int,
        default=32,
        help="resume-mode bucket count (one manifest per bucket)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import barks_ocr_ray
    from ray import cloudpickle

    # workers on remote nodes may not have the repo on their import
    # path; ship the package by value (same contract as __ray_entry__)
    cloudpickle.register_pickle_by_value(barks_ocr_ray)

    from barks_ocr_ray.context import configure

    configure()  # MUST precede the first Dataset

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    parts = args.num_partitions or max(16, n_cpus * 2)

    t0 = time.time()
    summary: dict = {}
    if args.resume:
        from barks_ocr_ray.pipelines.resume import run_resumable

        summary = run_resumable(
            args.input,
            args.output,
            num_buckets=args.num_buckets,
            num_partitions=parts,
            order=args.order,
        )
    else:
        from barks_ocr_ray.pipelines.extraction import run_extraction

        run_extraction(
            args.input, args.output, num_partitions=parts, order=args.order
        )
    wall = time.time() - t0

    import pyarrow.dataset as pads

    n_docs = pads.dataset(args.output).count_rows()
    print(
        json.dumps(
            {
                "docs": n_docs,
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "num_partitions": parts,
                "cluster_cpus": n_cpus,
                "order": args.order,
                "output": args.output,
                **({"resume": summary} if summary else {}),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
