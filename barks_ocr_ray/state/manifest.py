"""Per-partition lineage manifests (north rule: partition id, row ranges,
content hashes, written alongside outputs so a failed run resumes from the
last committed partition).

The engine's analog of the reference's skip-if-exists + finished-ledger
incrementality (/root/reference/src/barks_ocr/pipeline/batch_ocr.py:83-86;
finished-job rename /root/reference/src/barks_ocr/pipeline/gemini_batch_results.py:116-122)
— but content-addressed instead of mtime-based: a manifest commits
(bucket id, input fingerprint, row count, order-insensitive content hash),
and a bucket is recomputed iff its manifest is missing or its input
fingerprint changed.

Manifests are written atomically (temp file + rename), after the bucket's
output data is fully written — the manifest IS the commit marker.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import asdict, dataclass


@dataclass
class Manifest:
    bucket: int
    n_rows: int
    content_hash: str  # order-insensitive hash over row content hashes
    input_fingerprint: str
    engine_version: str


def bucket_of(url: str, num_buckets: int) -> int:
    """Deterministic url -> bucket (stable across runs and processes)."""
    return zlib.crc32(url.encode("utf-8")) % num_buckets


def combine_hashes(hex_hashes: list[str]) -> str:
    """Order-insensitive combination: xor of 64-bit prefixes + count."""
    acc = 0
    for h in hex_hashes:
        acc ^= int(h[:16], 16)
    return f"{acc:016x}-{len(hex_hashes)}"


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"bucket-{bucket:05d}.json")


def write_manifest(out_dir: str, m: Manifest) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, m.bucket)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(out_dir: str, bucket: int) -> Manifest | None:
    path = manifest_path(out_dir, bucket)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return Manifest(**json.load(f))
    except (json.JSONDecodeError, TypeError):
        return None  # torn/corrupt manifest -> recompute the bucket


_EVIDENCE_BYTES = 4096


def _file_entry(path: str) -> str:
    """name:size:crc(head+tail) — real content evidence (NOT mtimes, so a
    re-copy of identical data still resumes; an in-place edit that
    preserves file size is still caught because the parquet footer —
    always inside the tail window — changes with any rewrite)."""
    st = os.stat(path)
    crc = 0
    with open(path, "rb") as f:
        crc = zlib.crc32(f.read(_EVIDENCE_BYTES))
        if st.st_size > _EVIDENCE_BYTES:
            f.seek(max(_EVIDENCE_BYTES, st.st_size - _EVIDENCE_BYTES))
            crc = zlib.crc32(f.read(_EVIDENCE_BYTES), crc)
    return f"{os.path.basename(path)}:{st.st_size}:{crc:08x}"


def input_fingerprint(input_path: str) -> str:
    """Deterministic content fingerprint of the input corpus: per file,
    relative path + size + crc32 of the first and last 4 KiB (the tail
    window covers the parquet footer metadata, so any rewrite changes
    it). Recurses so hive-partitioned inputs (bucket=K/ subdirs — e.g.
    the output of a previous resumable run) fingerprint correctly; for a
    flat directory the relative path equals the basename."""
    entries = []
    if os.path.isdir(input_path):
        for root, dirs, files in sorted(os.walk(input_path)):
            dirs.sort()
            for name in sorted(files):
                if name.endswith(".parquet"):
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, input_path)
                    entries.append(
                        rel + _file_entry(full)[len(name):]
                    )
    else:
        entries.append(_file_entry(input_path))
    digest = zlib.crc32(";".join(entries).encode("utf-8"))
    return f"{digest:08x}-{len(entries)}"
