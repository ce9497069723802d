"""Byte-stream sniffing: content-type detection + encoding detection.

Engine stage 2 (SURVEY.md §7.1): the analog of the reference's
engine-dispatch-by-filename (`get_ocr_type`,
/root/reference/src/barks_ocr/pipeline/batch_ocr.py:103-108) done
properly on the byte stream itself, plus charset detection standing in
for the grey-image normalization (M1,
/root/reference/src/barks_ocr/utils/preprocessing.py:6-22).

Deterministic, stdlib-only, pure per-row — safe to run at any
parallelism level.
"""

from __future__ import annotations

import re

PDF_MAGIC = b"%SPDF"

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)")
_KNOWN_ENCODINGS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "ascii": "utf-8",
}

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_BINARY = "binary"


def sniff_kind(payload: bytes) -> str:
    """Classify a payload as html / pdf / binary from its leading bytes."""
    if payload.startswith(PDF_MAGIC):
        return KIND_PDF
    head = payload[:512].lstrip()
    if head.startswith(b"<"):
        return KIND_HTML
    if b"<html" in payload[:512].lower():
        return KIND_HTML
    return KIND_BINARY


def sniff_encoding(payload: bytes) -> str:
    """Detect the declared charset in the first 1 KiB; default utf-8."""
    m = _CHARSET_RE.search(payload[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        return _KNOWN_ENCODINGS.get(name, "utf-8")
    return "utf-8"


def sniff(payload: bytes) -> tuple[str, str]:
    """Returns (kind, encoding)."""
    kind = sniff_kind(payload)
    enc = sniff_encoding(payload) if kind == KIND_HTML else "utf-8"
    return kind, enc
