"""Stage 3 — dedup on url keeping max(warc_ts) (ties -> min content hash).

Reference ancestor: the seen-set queue-file dedup (D1,
/root/reference/src/barks_ocr/tools/ocr_check.py:521-538), re-expressed as
an explicit hash-partition + per-partition argmax: the pipeline's one
required all-to-all exchange on the ``url`` key (SURVEY.md §7.3).

Strategies (all avoid per-group Python over full rows):

* ``partition`` (default; the 10^12-document scale path): one hash
  ``repartition(num_partitions, keys=["url"])`` co-locates every fetch of
  a url in one block, then a vectorized Arrow kernel per block (sort by
  (url asc, dedup_rank desc), keep first per url) picks winners. Full
  rows move through exactly ONE exchange; no branch of the input plan, so
  the upstream read + sniff run once.
* ``join``: aggregate ``groupby(url).max(dedup_rank)`` over the pruned key
  columns, then ``Dataset.join`` the winners back. NOTE: the two plan
  branches re-execute the upstream read+sniff twice — kept for parity /
  comparison, not the default.
* ``broadcast``: winner keys pulled to the driver, ``ray.put`` once,
  applied as a vectorized semi-join filter inside ``map_batches`` — no
  full-row shuffle at all. Correct whenever the winner key set fits in
  driver memory (a bounded crawl shard); same double-branch caveat.

``dedup_rank`` (built in the sniff stage) encodes the winner ordering in
one lexicographically sortable string, so every strategy and the
single-process golden agree on ties by construction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max

from barks_ocr_ray.stages.sniff_stage import DEDUP_RANK, make_dedup_rank


def _keep_winner_per_url(t: pa.Table) -> pa.Table:
    """Vectorized per-block winner pick. Requires all fetches of a url to
    be co-located in this block (guaranteed by the hash repartition).
    Sorts only the two key columns and materializes the surviving rows
    with a single take (never copies the payload column twice)."""
    if t.num_rows <= 1:
        return t
    import numpy as np

    keys = t.select(["url", DEDUP_RANK])
    idx = pc.sort_indices(
        keys, sort_keys=[("url", "ascending"), (DEDUP_RANK, "descending")]
    )
    urls_sorted = keys.column("url").take(idx).combine_chunks()
    first_of_run = pc.not_equal(
        urls_sorted.slice(1), urls_sorted.slice(0, len(urls_sorted) - 1)
    )
    if isinstance(first_of_run, pa.ChunkedArray):
        first_of_run = first_of_run.combine_chunks()
    keep_sorted = np.concatenate(
        [[True], first_of_run.to_numpy(zero_copy_only=False)]
    )
    winner_idx = np.sort(idx.to_numpy(zero_copy_only=False)[keep_sorted])
    return t.take(pa.array(winner_idx))


def winner_keys_cheap(pages: Dataset, num_partitions: int | None = None):
    """Winner key set from the RAW pages dataset via a keys-only pass
    (url + dedup_rank; no payload compression, no kind detection) — the
    broadcast strategy's first phase. Returns a python set of
    (url, dedup_rank)."""
    import hashlib

    import pyarrow.compute as _pc

    def _keys(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256(memoryview(b.as_buffer())).hexdigest()
            for b in t.column("html")
        ]
        ts = _pc.cast(t.column("warc_ts"), pa.int64()).to_pylist()
        ranks = [make_dedup_rank(a, h) for a, h in zip(ts, hashes)]
        return pa.table(
            {
                "url": t.column("url"),
                DEDUP_RANK: pa.array(ranks, pa.string()),
            }
        )

    win = (
        pages.map_batches(_keys, batch_format="pyarrow")
        .groupby("url", num_partitions=num_partitions)
        .aggregate(Max(DEDUP_RANK, alias_name=DEDUP_RANK))
        .to_pandas()
    )
    return set(zip(win["url"], win[DEDUP_RANK]))


def broadcast_winner_filter(ds: Dataset, keys: set) -> Dataset:
    """Apply a pre-computed winner key set as a semi-join filter."""
    keys_ref = ray.put(keys)

    def semi_join(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        urls = batch.column("url").to_pylist()
        ranks = batch.column(DEDUP_RANK).to_pylist()
        mask = pa.array([(u, r) in ks for u, r in zip(urls, ranks)])
        return batch.filter(mask)

    return ds.map_batches(semi_join, batch_format="pyarrow")


def winner_keys(ds: Dataset, num_partitions: int | None = None) -> Dataset:
    """(url, dedup_rank) of each url's winning fetch — pruned-column
    aggregation; the only data shuffled is the key pair."""
    return (
        ds.select_columns(["url", DEDUP_RANK])
        .groupby("url", num_partitions=num_partitions)
        .aggregate(Max(DEDUP_RANK, alias_name=DEDUP_RANK))
    )


def dedup_max_ts(
    ds: Dataset, *, strategy: str = "partition", num_partitions: int = 32
) -> Dataset:
    if strategy == "partition":
        ds = ds.repartition(num_partitions, keys=["url"])
        # batch_size=None -> whole blocks, so the co-location invariant of
        # the hash partition is visible to the kernel
        return ds.map_batches(
            _keep_winner_per_url, batch_format="pyarrow", batch_size=None
        )
    if strategy == "join":
        winners = winner_keys(ds, num_partitions)
        return ds.join(
            winners,
            join_type="inner",
            num_partitions=num_partitions,
            on=("url", DEDUP_RANK),
        )
    if strategy == "broadcast":
        win_tbl = winner_keys(ds, num_partitions).to_pandas()
        keys = set(zip(win_tbl["url"], win_tbl[DEDUP_RANK]))
        keys_ref = ray.put(keys)

        def semi_join(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            urls = batch.column("url").to_pylist()
            ranks = batch.column(DEDUP_RANK).to_pylist()
            mask = pa.array([(u, r) in ks for u, r in zip(urls, ranks)])
            return batch.filter(mask)

        return ds.map_batches(semi_join, batch_format="pyarrow")
    raise ValueError(f"unknown dedup strategy: {strategy}")
