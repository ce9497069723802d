"""Composed Dataset -> Dataset pipelines (SURVEY.md §7.1)."""

from barks_ocr_ray.pipelines.extraction import (
    extraction_pipeline,
    read_pages,
    run_extraction,
)

__all__ = ["extraction_pipeline", "read_pages", "run_extraction"]
