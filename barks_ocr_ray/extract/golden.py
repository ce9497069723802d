"""Single-process golden computation: corpus -> per-url expected output.

This is the "second engine" in the dual-engine oracle scheme (SURVEY.md
§5): plain Python loops, no Ray — intentionally the simplest possible
implementation of the same semantics (dedup keep max(warc_ts), tie ->
min content sha256; then extract_page) against which the distributed
pipeline is compared byte-for-byte.
"""

from __future__ import annotations

from barks_ocr_ray.datagen import page_record
from barks_ocr_ray.extract.reference import (
    ExtractResult,
    content_sha256,
    extract_page,
)
from barks_ocr_ray.stages.sniff_stage import make_dedup_rank


def _ts_micros(dt) -> int:
    from datetime import datetime

    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def golden_corpus(n: int, seed: int = 42) -> dict[str, dict]:
    """url -> {warc_ts, content_hash, kind, extracted_text, result}."""
    winners: dict[str, tuple[str, dict, str]] = {}
    for i in range(n):
        rec = page_record(i, seed)
        h = content_sha256(rec["html"])
        rank = make_dedup_rank(_ts_micros(rec["warc_ts"]), h)
        cur = winners.get(rec["url"])
        if cur is None or rank > cur[0]:
            winners[rec["url"]] = (rank, rec, h)
    out: dict[str, dict] = {}
    for url, (rank, rec, h) in winners.items():
        res: ExtractResult = extract_page(rec["html"])
        out[url] = {
            "warc_ts": rec["warc_ts"],
            "content_hash": h,
            "kind": res.kind,
            "html_len": len(rec["html"]),
            "extracted_text": res.extracted_text,
            "spans": res.spans,
            "n_blocks": len(res.blocks),
            "result": res,
        }
    return out
