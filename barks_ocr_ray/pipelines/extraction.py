"""The flagship extraction pipeline (SURVEY.md §7.1, north rule):

    read_parquet(pages)
      -> sniff                (stateless map_batches, zero-copy Arrow)
      -> dedup on url         (groupby max(warc_ts); join or broadcast)
      -> extract              (warm-parser actor pool)
      -> extract-big          (dedicated high-memory pool for oversized rows)
      -> drop html            (so downstream stages move text + spans only)
      -> write partitioned Parquet + per-partition lineage manifests
         (see pipelines/resume.py) or return the streaming Dataset.

Every stage is a Dataset transform; the only all-to-all exchange is the
dedup on ``url``. Output order is not semantic — identity is the ``url``
key (the reference's positional contracts J1/J6 are exactly what breaks
under parallelism; everything here is keyed — SURVEY.md §7.3).
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

    configure()
    return rd.read_parquet(
        path, columns=columns or ["url", "warc_ts", "html", "lang"]
    )


def _pool_sizes(cpus: int) -> tuple[int, int, int]:
    """(small_pool_actors, big_pool_actors, big_num_cpus) sized so both
    pools plus the stateless task stages fit the cluster without
    starving each other (a pool that reserves every CPU serializes the
    pipeline). The big pool models the high-memory route: fewer actors,
    more cpus (= memory headroom) each."""
    big_cpus = 2 if cpus >= 16 else 1
    big_actors = max(1, cpus // 16)
    small = max(1, cpus - big_actors * big_cpus - 1)
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
    big_batch_size: int = 4,
    keep_html: bool = False,
) -> Dataset:
    """pages Dataset -> extracted Dataset (streaming, lazy)."""
    from barks_ocr_ray.context import configure

    configure()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    small_n, big_n, big_cpus = _pool_sizes(cpus)
    concurrency = extract_concurrency or small_n
    big_concurrency = big_concurrency or big_n
    big_num_cpus = big_num_cpus or big_cpus
    ds = pages.map_batches(sniff_batch, batch_format="pyarrow")
    ds = dedup_max_ts(ds, strategy=dedup_strategy, num_partitions=num_partitions)
    ds = ds.map_batches(
        ExtractSmall,
        fn_constructor_kwargs={"oversize_bytes": oversize_bytes},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    ds = ds.map_batches(
        ExtractBig,
        batch_format="pyarrow",
        batch_size=big_batch_size,
        concurrency=(1, big_concurrency),
        num_cpus=big_num_cpus,
    )
    cols = OUTPUT_COLUMNS + (["html"] if keep_html else [])
    # drop the payload immediately after span extraction so anything
    # downstream (shuffles, sinks) moves text + spans only
    return ds.drop_columns([DONE_COL]).select_columns(cols)


def run_extraction(
    input_path: str, output_path: str | None = None, **kwargs
) -> Dataset | None:
    ds = extraction_pipeline(read_pages(input_path), **kwargs)
    if output_path is None:
        return ds
    ds.write_parquet(output_path)
    return None
