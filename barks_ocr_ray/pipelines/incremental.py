"""Incremental corpus update — the nightly-crawl append: extract ONLY
pages whose url is not already in the previous output, and append them
as a new shard directory (north rule's resumable-output family, the
cross-RUN complement of ``pipelines/resume.py``'s within-run
checkpoints).

Semantics: append-only, previous output wins. A url present in an
earlier shard is never re-extracted or rewritten, even if the new batch
carries a fresher fetch (re-crawl refresh is a different operation —
run a full rebuild). Within the new batch itself, the standard
extraction dedup (max warc_ts per url) applies.

Scale shape: the previous output is read COLUMN-PRUNED to its url key.
At or below a measured row cap the key set broadcasts once (``ray.put``
+ per-batch vectorized ``is_in`` anti-filter); above it a distributed
left-anti join runs (left_outer + null-marker filter, the q06/J9
shape) — the same measured-size gating as extraction's
``dedup_strategy="auto"`` and the signature-attach step. Nothing
corpus-scaled lands on the driver above the cap.

Layout:

    corpus_dir/
      shard-0000/part-*.parquet   first run's extraction output
      shard-0001/part-*.parquet   first update's NEW urls
      ...
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.pipelines.extraction import extraction_pipeline

#: broadcast the known-url set below this measured row count (strings,
#: ~60 B/url -> ~120 MiB at the cap); above it, distributed anti-join
KNOWN_URLS_BROADCAST_CAP = 2_000_000


def _shard_dirs(corpus_dir: str) -> list[str]:
    if not os.path.isdir(corpus_dir):
        return []
    return sorted(
        os.path.join(corpus_dir, d)
        for d in os.listdir(corpus_dir)
        if re.fullmatch(r"shard-\d{4}", d)
    )


def _known_urls(shards: list[str]) -> Dataset:
    """urls already in the corpus, pruned at the read to the key column
    (each shard's urls are unique by the extraction dedup, and shards
    are disjoint by construction, so no dedup pass is needed)."""
    import glob

    from barks_ocr_ray.functions.relational import strip_schema_metadata

    files = [
        f
        for d in shards
        for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
    ]
    return rd.read_parquet(files, columns=["url"]).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )


def update_corpus(
    corpus_dir: str,
    new_pages: Dataset,
    *,
    num_partitions: int = 16,
    broadcast_cap: int = KNOWN_URLS_BROADCAST_CAP,
    **pipeline_kwargs,
) -> dict:
    """Extract the urls of ``new_pages`` that are not yet in
    ``corpus_dir`` and append them as the next ``shard-NNNN``. Returns
    ``{"shard": path|None, "new_rows": n, "known_urls": k}`` (no shard
    directory is created when nothing is new)."""
    shards = _shard_dirs(corpus_dir)
    os.makedirs(corpus_dir, exist_ok=True)
    # wipe torn shards from a crashed previous update (never committed)
    import shutil as _shutil

    for d in os.listdir(corpus_dir):
        if d.endswith(".tmp"):
            _shutil.rmtree(
                os.path.join(corpus_dir, d), ignore_errors=True
            )

    n_known = 0
    fresh = new_pages
    if shards:
        known = _known_urls(shards)
        n_known = known.count()
        if n_known <= broadcast_cap:
            urls = pa.concat_tables(
                ray.get(known.to_arrow_refs())
            ).column("url")
            if isinstance(urls, pa.ChunkedArray):
                urls = urls.combine_chunks()
            ref = ray.put(urls)

            def _anti(t: pa.Table) -> pa.Table:
                ks = ray.get(ref)
                mask = pc.invert(
                    pc.is_in(t.column("url"), value_set=ks)
                )
                return t.filter(mask)

            fresh = new_pages.map_batches(_anti, batch_format="pyarrow")
        else:

            def _marker(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "url": t.column("url"),
                        "known_marker": pa.array(
                            [1] * t.num_rows, pa.int64()
                        ),
                    }
                )

            marked = known.map_batches(_marker, batch_format="pyarrow")
            joined = new_pages.join(
                marked,
                join_type="left_outer",
                num_partitions=hash_partitions(num_partitions),
                on=("url",),
            )

            def _drop_known(t: pa.Table) -> pa.Table:
                t = t.filter(pc.is_null(t.column("known_marker")))
                return t.drop_columns(["known_marker"])

            fresh = joined.map_batches(_drop_known, batch_format="pyarrow")

    out = extraction_pipeline(
        fresh, num_partitions=num_partitions, **pipeline_kwargs
    )
    # write-then-rename: _shard_dirs only matches committed shard-NNNN
    # names, so a crash mid-update leaves a .tmp directory the next run
    # ignores (and wipes) — no torn shard is ever treated as known urls
    shard_dir = os.path.join(corpus_dir, f"shard-{len(shards):04d}")
    tmp_dir = shard_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    out.write_parquet(tmp_dir)
    import pyarrow.dataset as pads

    # a 0-row write may not create the directory at all
    new_rows = (
        pads.dataset(tmp_dir).count_rows()
        if os.path.isdir(tmp_dir)
        else 0
    )
    if new_rows == 0:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shard_dir = None
    else:
        os.rename(tmp_dir, shard_dir)
    return {
        "shard": shard_dir,
        "new_rows": new_rows,
        "known_urls": n_known,
    }
