"""The flagship extraction pipeline (SURVEY.md §7.1, north rule):

    read_parquet(pages)
      -> sniff                (stateless map_batches, zero-copy Arrow;
                               optional zstd payload compression for the
                               exchange)
      -> dedup on url         (hash-partition + vectorized argmax by
                               default; agg+join and broadcast variants,
                               cost-based "auto" selection)
      -> extract-big          (dedicated stage consumes oversized payloads
                               first; split-yield routing)
      -> extract              (main warm-parser stage finishes the rest)
      -> drop html            (downstream moves text + spans only)
      -> write partitioned Parquet + per-partition lineage manifests
         (see pipelines/resume.py) or return the streaming Dataset.

The extract stages are callable classes run as stateless TASK pools by
default (their per-worker state is compiled regexes — cheap init) with a
``stateful=True`` actor-pool mode for heavyweight warm state; see
``_extract`` for the measured rationale. Every stage is a Dataset
transform; the only all-to-all exchange is the dedup on ``url``. Output
order is not semantic — identity is the ``url`` key (the reference's
positional contracts J1/J6 are exactly what breaks under parallelism;
everything here is keyed — SURVEY.md §7.3).
"""

from __future__ import annotations

import ray
import ray.data as rd
from ray.data import Dataset

from barks_ocr_ray.datagen import OVERSIZE_BYTES
from barks_ocr_ray.stages.dedup import dedup_max_ts
from barks_ocr_ray.stages.extract_stage import DONE_COL, ExtractBig, ExtractSmall
from barks_ocr_ray.stages.sniff_stage import sniff_batch

#: columns of the final extracted table (FIXTURES.md F2)
OUTPUT_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "kind",
    "content_hash",
    "html_len",
    "extracted_text",
    "spans",
    "blocks",
    "n_blocks",
    "error",
]


def read_pages(path: str, *, columns: list[str] | None = None) -> Dataset:
    """Read the pages corpus, pruning at the read: the crawl-provided
    fallback ``text`` column is noise the pipeline must not echo
    (FIXTURES.md F1) and is never loaded."""
    from barks_ocr_ray.context import configure
    from barks_ocr_ray.functions.relational import strip_schema_metadata

    configure()
    return rd.read_parquet(
        path, columns=columns or ["url", "warc_ts", "html", "lang"]
    ).map_batches(strip_schema_metadata, batch_format="pyarrow")


def _pool_sizes(cpus: int) -> tuple[int, int, int]:
    """(small_pool_max, big_pool_max, big_num_cpus): both pools autoscale
    from 1 actor (min) so neither can deadlock a small cluster, and both
    may scale toward the full CPU budget — the byte mix between normal
    and oversized rows is corpus-dependent, so static splits waste
    whichever pool the skew starves. The big pool's num_cpus=2 models the
    high-memory route (more headroom per actor)."""
    big_cpus = 2 if cpus >= 16 else 1
    big_actors = max(1, (cpus - 1) // big_cpus)
    small = max(1, cpus - 1)
    return small, big_actors, big_cpus


def extraction_pipeline(
    pages: Dataset,
    *,
    oversize_bytes: int = OVERSIZE_BYTES,
    dedup_strategy: str = "partition",
    num_partitions: int = 32,
    extract_concurrency: int | None = None,
    big_concurrency: int | None = None,
    big_num_cpus: int | None = None,
    batch_size: int = 64,
    big_batch_size: int = 128,
    keep_html: bool = False,
    order: str = "dedup_first",
    stateful: bool = False,
    compress_payload: bool = True,
) -> Dataset:
    """pages Dataset -> extracted Dataset (streaming, lazy).

    ``order`` picks where the one all-to-all exchange sits:

    * ``dedup_first`` (default — measured faster at both 8 and 32 CPUs,
      BASELINE.md round-2 A/B): sniff -> dedup -> extract -> emit.
      Minimal compute (losers never extracted, shuffle moves
      zstd-compressed raw html), but the hash shuffle is a barrier —
      the extract pools idle until the last input block is ingested.
    * ``extract_first``: sniff -> extract -> dedup -> emit. Extraction
      streams fully overlapped with the read (no barrier in front of
      the heavy stage); the dedup shuffle moves extracted rows (html
      already dropped) and re-extracts nothing. Costs: duplicate
      fetches (~the corpus dup rate) are extracted wastefully before
      being dropped, and the post-extract exchange moves text+spans,
      which here outweigh the compressed payload.

    Both orders produce byte-identical output: the winner is a pure
    function of (url, dedup_rank) and extraction is a pure per-row
    function, so when they commute the result cannot change.
    """
    from barks_ocr_ray.context import configure

    configure()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    small_n, big_n, big_cpus = _pool_sizes(cpus)
    concurrency = extract_concurrency or small_n
    big_concurrency = big_concurrency or big_n
    big_num_cpus = big_num_cpus or big_cpus

    def _extract(ds: Dataset) -> Dataset:
        # Big stage FIRST: oversized payloads are consumed at the earliest
        # stage and their html never crosses another stage boundary.
        #
        # ``stateful`` picks the execution vehicle for the two routing
        # stages:
        #  * False (default): stateless TASK pools — the parser kernel's
        #    per-worker state is a handful of module-level compiled
        #    regexes, so per the Ray sizing rule (cheap init -> tasks)
        #    tasks are correct, and they scale freely to the cluster.
        #    Measured on the sf0.1 corpus at 32 CPUs: the actor-pool
        #    variant plateaued at ~8 dispatched tasks regardless of pool
        #    size/num_cpus/reservation settings (2.2x slower end to end).
        #  * True: dedicated actor pools (the warm-parser pattern for
        #    heavyweight state: a model, a large dictionary) with the
        #    high-memory pool sized by big_concurrency x big_num_cpus.
        if stateful:
            ds = ds.map_batches(
                ExtractBig,
                fn_constructor_kwargs={
                    "oversize_bytes": oversize_bytes,
                    "keep_html": keep_html,
                },
                batch_format="pyarrow",
                batch_size=big_batch_size,
                concurrency=big_concurrency
                if isinstance(big_concurrency, tuple)
                else (1, big_concurrency),
                num_cpus=big_num_cpus,
            )
            return ds.map_batches(
                ExtractSmall,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency
                if isinstance(concurrency, tuple)
                else (1, concurrency),
                num_cpus=1,
            )
        # note: num_cpus=1 here — in the stateless path the stages fuse
        # into one task-pool operator and the fused task inherits the MAX
        # num_cpus of its members, which would halve cluster parallelism.
        # Memory headroom for oversized rows comes from big_batch_size;
        # use stateful=True when per-actor num_cpus isolation is needed.
        ds = ds.map_batches(
            ExtractBig(oversize_bytes=oversize_bytes, keep_html=keep_html),
            batch_format="pyarrow",
            batch_size=big_batch_size,
            num_cpus=1,
        )
        return ds.map_batches(
            ExtractSmall(),
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )

    # payload compression: the html column rides every exchange zstd-
    # compressed (~25x smaller on web text, >500 MB/s/core each way),
    # shrinking the dedup shuffle from GBs to tens of MBs. Disabled when
    # the caller wants the raw payload in the output.
    compress = compress_payload and not keep_html
    if dedup_strategy == "auto":
        # cost-based strategy selection: the winner key set is
        # ~100 B/url in driver memory, so a bounded input (a crawl
        # shard) dedups without any full-row exchange via broadcast;
        # unbounded inputs take the hash-partition exchange.
        n_rows = pages.count()
        dedup_strategy = "broadcast" if n_rows <= 2_000_000 else "partition"
    if dedup_strategy == "broadcast" and order == "dedup_first":
        # broadcast without a plan branch: winners from a cheap keys-only
        # pass (second read, no compress/kind work), then ONE streaming
        # main pass — no all-to-all barrier in front of extraction.
        from barks_ocr_ray.stages.dedup import (
            broadcast_winner_filter,
            winner_keys_cheap,
        )

        winners, tie_urls = winner_keys_cheap(pages, num_partitions)
        ds = pages.map_batches(
            sniff_batch, batch_format="pyarrow", fn_kwargs={"compress": compress}
        )
        ds = broadcast_winner_filter(ds, winners, tie_urls)
        ds = _extract(ds)
        cols2 = OUTPUT_COLUMNS + (["html"] if keep_html else [])
        return ds.drop_columns([DONE_COL]).select_columns(cols2)
    ds = pages.map_batches(
        sniff_batch, batch_format="pyarrow", fn_kwargs={"compress": compress}
    )
    cols = OUTPUT_COLUMNS + (["html"] if keep_html else [])
    if order == "extract_first":
        from barks_ocr_ray.stages.sniff_stage import DEDUP_RANK

        ds = _extract(ds)
        # drop the payload BEFORE the shuffle: the exchange moves
        # text + spans only (plus the dedup key)
        ds = ds.drop_columns([DONE_COL]).select_columns(cols + [DEDUP_RANK])
        ds = dedup_max_ts(
            ds, strategy=dedup_strategy, num_partitions=num_partitions
        )
        return ds.select_columns(cols)
    if order == "dedup_first":
        ds = dedup_max_ts(
            ds, strategy=dedup_strategy, num_partitions=num_partitions
        )
        ds = _extract(ds)
        return ds.drop_columns([DONE_COL]).select_columns(cols)
    raise ValueError(f"unknown order: {order}")


def run_extraction(
    input_path: str, output_path: str | None = None, **kwargs
) -> Dataset | None:
    ds = extraction_pipeline(read_pages(input_path), **kwargs)
    if output_path is None:
        return ds
    ds.write_parquet(output_path)
    return None
