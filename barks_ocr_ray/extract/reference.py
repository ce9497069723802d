"""The frozen reference extractor: one pure function per page.

``extract_page(payload)`` = sniff -> decode -> (HTML walk | PDF layout |
binary passthrough) -> normalize -> assemble. This is the golden oracle
(SURVEY.md §5): the Ray pipeline wraps this exact kernel in an actor pool
and must reproduce its output byte-identically per url at any parallelism.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from barks_ocr_ray.extract.html_extract import (
    Block,
    assemble_text,
    clean_text,
    extract_html,
)
from barks_ocr_ray.extract.pdf_layout import extract_pdf
from barks_ocr_ray.extract.sniff import KIND_BINARY, KIND_HTML, KIND_PDF, sniff


@dataclass
class ExtractResult:
    kind: str
    extracted_text: str
    spans: list[tuple[int, int]] = field(default_factory=list)
    blocks: list[Block] = field(default_factory=list)


def content_sha256(payload: bytes) -> str:
    """Content hash used for the dedup tie-break (FIXTURES.md F2: ties on
    warc_ts -> lexicographically smallest content sha256 wins)."""
    return hashlib.sha256(payload).hexdigest()


def extract_page(payload: bytes) -> ExtractResult:
    kind, encoding = sniff(payload)
    if kind == KIND_PDF:
        blocks = extract_pdf(payload)
        return ExtractResult(
            kind=KIND_PDF,
            extracted_text=assemble_text(blocks),
            spans=[],
            blocks=blocks,
        )
    if kind == KIND_HTML:
        doc = payload.decode(encoding, errors="replace")
        blocks = extract_html(doc)
        spans = [sp for b in blocks if b.type == "content" for sp in b.spans]
        return ExtractResult(
            kind=KIND_HTML,
            extracted_text=assemble_text(blocks),
            spans=spans,
            blocks=blocks,
        )
    return ExtractResult(kind=KIND_BINARY, extracted_text="", spans=[], blocks=[])


__all__ = ["ExtractResult", "extract_page", "content_sha256", "clean_text"]
