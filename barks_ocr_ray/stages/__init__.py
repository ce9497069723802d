"""Ray Data stage wrappers: each stage is a Dataset -> Dataset function or
a batch-callable suitable for ``map_batches`` (SURVEY.md §7.1)."""

from barks_ocr_ray.stages.sniff_stage import sniff_batch
from barks_ocr_ray.stages.dedup import dedup_max_ts
from barks_ocr_ray.stages.extract_stage import ExtractBig, ExtractSmall

__all__ = ["sniff_batch", "dedup_max_ts", "ExtractSmall", "ExtractBig"]
