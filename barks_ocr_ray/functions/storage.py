"""Dataset-maintenance operators a 100 TB corpus accumulates a need
for: reading across SCHEMA GENERATIONS (crawl shards written months
apart with added/dropped columns) and SMALL-FILE COMPACTION (nightly
increments produce thousands of tiny parquet files that destroy read
parallelism and metadata caches).

Both stay streaming: schema discovery is driver-side FOOTER reads only
(one per shard directory, no data scanned), alignment is a zero-copy
per-batch projection, and compaction is a block-coalescing repartition
(data moves once, no key exchange) straight into a size-targeted
writer.

Reference analog: the reference reads work dirs written by different
pipeline versions (S2/S4 readers tolerate absent columns —
/root/reference/src/barks_ocr/pipeline/ocr_boxes.py:88-104 defaults
missing fields); this module makes that tolerance a first-class read.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

from barks_ocr_ray.functions.hashing import splitmix64
from barks_ocr_ray.functions.relational import strip_schema_metadata


def _dir_parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def union_schema(paths: list[str]) -> pa.Schema:
    """Union-by-name of each shard directory's file schema, one footer
    read per directory (shards within a directory share a generation).
    First-seen type wins; later same-named fields must be castable."""
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for p in paths:
        files = _dir_parquet_files(p)
        if not files:
            continue
        s = pq.read_schema(files[0]).remove_metadata()
        for f in s:
            if f.name not in fields:
                fields[f.name] = pa.field(f.name, f.type)
                order.append(f.name)
    return pa.schema([fields[n] for n in order])


class _Align:
    """Project a batch onto the union schema: missing columns become
    typed nulls, present columns cast to the union type (widening only
    — a lossy cast raises, which is the correct failure for a shard
    whose generation genuinely conflicts)."""

    def __init__(self, schema: pa.Schema):
        self.schema = schema

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = []
        for f in self.schema:
            if f.name in t.column_names:
                c = t.column(f.name)
                if c.type != f.type:
                    c = pc.cast(c, f.type)
                cols.append(c)
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=self.schema)


def read_evolving_parquet(
    paths: list[str], columns: list[str] | None = None
) -> Dataset:
    """Read shard directories written under different schema
    generations as ONE dataset with the union-by-name schema (missing
    columns null). Column pruning applies per shard: a shard is only
    asked for the union columns it actually has."""
    target = union_schema(paths)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])
    parts = []
    for p in paths:
        files = _dir_parquet_files(p)
        if not files:
            continue
        have = set(pq.read_schema(files[0]).names)
        want = [f.name for f in target if f.name in have]
        ds = rd.read_parquet(files, columns=want or None)
        parts.append(
            ds.map_batches(
                strip_schema_metadata, batch_format="pyarrow"
            ).map_batches(
                _Align,
                fn_constructor_kwargs={"schema": target},
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        )
    if not parts:
        return rd.from_arrow(target.empty_table())
    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out


def compact_parquet(
    in_dir: str, out_dir: str, target_rows_per_file: int
) -> dict:
    """Rewrite a directory of (typically tiny) parquet files into files
    of ~``target_rows_per_file`` rows. Row count comes from footers
    (no scan); the repartition only coalesces blocks — there is no key,
    so no hash exchange — and the size-targeted writer does the rest.
    Returns {files_before, files_after, rows} for the caller's ledger.
    Output goes to a fresh ``out_dir`` so a failed compaction never
    clobbers the input (resumable-output discipline)."""
    files = _dir_parquet_files(in_dir)
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_out = max(1, -(-rows // target_rows_per_file)) if rows else 1
    ds = rd.read_parquet(in_dir).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )
    ds.repartition(n_out).write_parquet(
        out_dir,
        min_rows_per_file=target_rows_per_file,
        max_rows_per_file=target_rows_per_file,
    )
    return {
        "files_before": len(files),
        "files_after": len(_dir_parquet_files(out_dir)),
        "rows": rows,
    }


# --- content-defined chunking (q248) ----------------------------------------

#: target average chunk size in bytes (boundary probability 1/CDC_AVG)
CDC_AVG = 256
#: rolling-window width the boundary decision hashes over
CDC_WIN = 8


def cdc_chunks(data: bytes, avg: int = CDC_AVG) -> tuple[list, list]:
    """Content-defined chunking (the FastCDC/LBFS family's shift-
    resistant storage dedup): a chunk boundary falls AFTER byte i
    exactly when the splitmix64 hash of the trailing 8-byte window is
    divisible by ``avg`` — a pure function of local content, so an
    insertion re-chunks only its neighborhood instead of shifting every
    later chunk (the failure mode of fixed-size blocks). Returns
    (chunk keys: blake2b-8 uint64 ints, chunk sizes). Vectorized: the
    window values fold from 8 shifted adds, one splitmix64 pass finds
    all boundaries; only the per-chunk fingerprint is a per-chunk call.
    Shared verbatim by the distributed pass and the sequential golden.
    NOTE: runs inside worker UDFs — its imports MUST stay module-level
    (a body-level ``from barks_ocr_ray...`` import fails in the
    driver's no-PYTHONPATH condition; by-value pickling ships objects,
    not sys.path)."""
    n = len(data)
    if n == 0:
        return [], []
    if n <= CDC_WIN:
        cuts = [n]
    else:
        arr = np.frombuffer(data, np.uint8).astype(np.uint64)
        width = n - CDC_WIN + 1
        w = np.zeros(width, np.uint64)
        for j in range(CDC_WIN):
            w += arr[j : j + width] << np.uint64(8 * j)
        hits = np.flatnonzero(splitmix64(w) % np.uint64(avg) == 0)
        cuts = [int(x) + CDC_WIN for x in hits if int(x) + CDC_WIN < n]
        cuts.append(n)
    keys, sizes, prev = [], [], 0
    for stop in cuts:
        chunk = data[prev:stop]
        keys.append(
            int.from_bytes(
                hashlib.blake2b(chunk, digest_size=8).digest(), "big"
            )
        )
        sizes.append(len(chunk))
        prev = stop
    return keys, sizes
