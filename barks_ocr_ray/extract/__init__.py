"""The frozen single-process reference extractor (golden oracle).

Pure Python, deterministic, no Ray: this is the engine's analog of the
reference's dual-engine oracle (easyocr vs paddleocr cross-validation,
/root/reference/src/barks_ocr/pipeline/batch_ocr.py:103-108 and
/root/reference/src/barks_ocr/tools/compare.py:44-206) — the
single-process extractor and the distributed Ray pipeline are our two
"engines", and pytest asserts byte-identical extracted text per url.
"""

from barks_ocr_ray.extract.reference import (
    ExtractResult,
    clean_text,
    content_sha256,
    extract_page,
)
from barks_ocr_ray.extract.sniff import sniff

__all__ = [
    "ExtractResult",
    "clean_text",
    "content_sha256",
    "extract_page",
    "sniff",
]
