"""barks_ocr_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference `glk1001/barks-ocr` pipeline, re-expressed
Ray-Data-first over a Parquet corpus of Common-Crawl-style web pages:

    read_parquet(pages) -> sniff (stateless map_batches, zero-copy Arrow)
    -> dedup on url keeping max(warc_ts) (groupby / agg+join, explicit shuffle)
    -> extract (warm-parser actor pool; oversized rows routed to a
       dedicated high-memory pool)
    -> normalize/clean -> write partitioned Parquet + lineage manifests.

Layout:
    datagen      — deterministic synthetic pages corpus (FIXTURES.md F1)
    extract/     — the frozen single-process reference extractor (golden oracle)
    stages/      — Ray Data stage wrappers (sniff, dedup, extract pools)
    pipelines/   — composed pipelines (extraction, word index, validate, resume)
    functions/   — reusable operator layer (relational, text, dedup, ann, windows)
    state/       — per-partition lineage manifests / resume bookkeeping
"""

__version__ = "0.1.0"
