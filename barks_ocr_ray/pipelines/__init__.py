"""Composed Dataset -> Dataset pipelines (SURVEY.md §7.1)."""

from barks_ocr_ray.pipelines.extraction import (
    extraction_pipeline,
    read_pages,
    run_extraction,
)
from barks_ocr_ray.pipelines.resume import run_resumable
from barks_ocr_ray.pipelines.validate import validate_extraction

__all__ = [
    "extraction_pipeline",
    "read_pages",
    "run_extraction",
    "run_resumable",
    "validate_extraction",
]
