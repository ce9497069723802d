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

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.stages.sniff_stage import (
    DEDUP_RANK,
    hash_and_rank_arrays,
    make_dedup_rank,
)


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


#: joint separator for the combined (url, dedup_rank) broadcast key —
#: \x00 cannot appear in a url or a hex/decimal rank string
_KEY_SEP = "\x00"


def _winners_and_ties(counts_df) -> tuple[set, set]:
    """From a (url, dedup_rank, n) frame: the winner key set (combined
    strings) and the urls whose WINNING rank has n > 1 physical rows —
    byte-identical refetches at identical warc_ts (the ADVICE r1 case);
    those urls need a keyed exchange to keep exactly one row."""
    df = counts_df.sort_values(["url", DEDUP_RANK], kind="mergesort")
    win = df.groupby("url", sort=False).last().reset_index()
    # NOTE: plain Python concat — pandas' arrow-backed string ``+``
    # silently DROPS \x00 bytes (measured on pandas 2.2/pyarrow 16)
    keys = {
        u + _KEY_SEP + r for u, r in zip(win["url"], win[DEDUP_RANK])
    }
    ties = set(win.loc[win["n"] > 1, "url"])
    return keys, ties


def winner_keys_cheap(
    pages: Dataset, num_partitions: int | None = None
) -> tuple[set, set]:
    """Winner key set from the RAW pages dataset via a keys-only pass
    (url + dedup_rank; no payload compression, no kind detection) — the
    broadcast strategy's first phase. Returns (winner key set of combined
    url\\x00rank strings, urls whose winning rank is duplicated)."""
    from ray.data.aggregate import Count as _Count

    def _keys(t: pa.Table) -> pa.Table:
        # sha256 stays one C call per row; rank assembly is the
        # vectorized helper (numpy hex matrix + Arrow kernels), not the
        # per-row f-string build the r4 VERDICT flagged
        _, ranks = hash_and_rank_arrays(
            t.column("html"), t.column("warc_ts")
        )
        return pa.table({"url": t.column("url"), DEDUP_RANK: ranks})

    counts = (
        pages.map_batches(_keys, batch_format="pyarrow")
        .groupby(["url", DEDUP_RANK], num_partitions=num_partitions)
        .aggregate(_Count(alias_name="n"))
        .to_pandas()
    )
    return _winners_and_ties(counts)


def broadcast_winner_filter(
    ds: Dataset, keys: set, tie_urls: set | None = None
) -> Dataset:
    """Apply a pre-computed winner key set as a vectorized semi-join
    filter (one ``pc.is_in`` over the combined url\\x00rank key). Rows of
    ``tie_urls`` (urls whose winning rank covers >1 physical row) are
    routed through one tiny keyed exchange + first-per-url so the
    one-row-per-url contract holds even for byte-identical refetches."""
    keys_ref = ray.put(pa.array(sorted(keys), pa.string()))
    ties = tie_urls or set()
    ties_ref = ray.put(pa.array(sorted(ties), pa.string())) if ties else None

    def _combined(batch: pa.Table):
        return pc.binary_join_element_wise(
            batch.column("url"), batch.column(DEDUP_RANK), _KEY_SEP
        )

    def semi_join(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(_combined(batch), value_set=ray.get(keys_ref))
        if ties_ref is not None:
            mask = pc.and_(
                mask,
                pc.invert(
                    pc.is_in(batch.column("url"), value_set=ray.get(ties_ref))
                ),
            )
        return batch.filter(mask)

    safe = ds.map_batches(semi_join, batch_format="pyarrow")
    if not ties:
        return safe

    def tie_rows(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(_combined(batch), value_set=ray.get(keys_ref)),
            pc.is_in(batch.column("url"), value_set=ray.get(ties_ref)),
        )
        return batch.filter(mask)

    from barks_ocr_ray.functions.relational import exact_dedup

    risky = exact_dedup(
        ds.map_batches(tie_rows, batch_format="pyarrow"),
        "url",
        num_partitions=8,
    )
    return safe.union(risky)


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
        joined = ds.join(
            winners,
            join_type="inner",
            num_partitions=hash_partitions(num_partitions),
            on=("url", DEDUP_RANK),
        )
        # byte-identical refetches (same warc_ts AND content hash) share
        # the winning (url, rank): the inner join keeps them ALL. One
        # first-per-url pass restores the one-row-per-url contract
        # (ADVICE r1). Surviving rows of a url are hash-identical in
        # content, so which physical row is kept is immaterial.
        from barks_ocr_ray.functions.relational import exact_dedup

        return exact_dedup(joined, "url", num_partitions=num_partitions)
    if strategy == "broadcast":
        from ray.data.aggregate import Count as _Count

        counts = (
            ds.select_columns(["url", DEDUP_RANK])
            .groupby(["url", DEDUP_RANK], num_partitions=num_partitions)
            .aggregate(_Count(alias_name="n"))
            .to_pandas()
        )
        keys, ties = _winners_and_ties(counts)
        return broadcast_winner_filter(ds, keys, ties)
    raise ValueError(f"unknown dedup strategy: {strategy}")
