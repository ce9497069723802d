"""Checkpoint/resume state: per-partition lineage manifests."""

from barks_ocr_ray.state.manifest import (
    Manifest,
    bucket_of,
    read_manifest,
    write_manifest,
)

__all__ = ["Manifest", "bucket_of", "read_manifest", "write_manifest"]
