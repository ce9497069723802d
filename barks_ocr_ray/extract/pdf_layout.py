"""PDF-like layout-analysis kernel: reading-order sort + column detection.

Engine stage 4 for the PDF path (SURVEY.md §7.1): a direct analog of the
reference's contour precedence sort — row-band quantization
``(y // 200) * 200 * cols + x``
(/root/reference/scraps/damishshah_comic_book_reader.py:33-37,58) — applied
to text boxes instead of panel contours, with explicit column detection.

The payload is the %SPDF stand-in format from datagen (no PDF library
exists in this environment; the layout kernel — the actual algorithmic
content — is real): JSON ``{width, height, ncols, pages:[{page, boxes:
[{x,y,w,h,text}]}]}``.

Reading order: per page, boxes are assigned to a column by x-midpoint
against the page midline (when 2 columns), then sorted by
``(column, y_band, x)`` with a 50px y-band — deterministic, with the box's
input index as the final tie-break so equal coordinates can never
reorder under parallelism (SURVEY.md §7.3 determinism contract).
"""

from __future__ import annotations

import json

from barks_ocr_ray.extract.html_extract import Block, TYPE_CONTENT, clean_text
from barks_ocr_ray.extract.sniff import PDF_MAGIC

Y_BAND = 50


def parse_pdf_payload(payload: bytes) -> dict:
    return json.loads(payload[len(PDF_MAGIC):].decode("utf-8"))


def reading_order(boxes: list[dict], width: float, ncols: int) -> list[int]:
    """Indices of ``boxes`` in reading order (column, y-band, x)."""
    mid = width / 2.0

    def key(i: int):
        b = boxes[i]
        col = 0 if ncols <= 1 else (0 if b["x"] + b["w"] / 2.0 < mid else 1)
        return (col, (b["y"] // Y_BAND) * Y_BAND, b["x"], i)

    return sorted(range(len(boxes)), key=key)


def extract_pdf(payload: bytes) -> list[Block]:
    doc = parse_pdf_payload(payload)
    width = float(doc.get("width", 600))
    ncols = int(doc.get("ncols", 1))
    blocks: list[Block] = []
    for page in doc.get("pages", []):
        boxes = page.get("boxes", [])
        for i in reading_order(boxes, width, ncols):
            text = clean_text(boxes[i]["text"])
            if not text:
                continue
            blocks.append(
                Block(
                    block_id=len(blocks),
                    type=TYPE_CONTENT,
                    text=text,
                    link_density=0.0,
                    text_density=float(len(text)),
                    spans=[],
                )
            )
    return blocks


# --- box-geometry utilities (M6 / M18 parity) ------------------------------

AI_GRID = 1000


def norm_boxes(doc: dict) -> list[dict]:
    """Normalize box coords to a 0-1000 grid in y-before-x order — the
    model-convention projection (M6 `norm2ai`,
    /root/reference/src/barks_ocr/utils/gemini_ai_for_grouping.py:26-42)."""
    width = float(doc.get("width", 600)) or 1.0
    height = float(doc.get("height", 800)) or 1.0
    out = []
    for page in doc.get("pages", []):
        for b in page.get("boxes", []):
            out.append(
                {
                    "page": page.get("page", 0),
                    "y0": round(b["y"] / height * AI_GRID),
                    "x0": round(b["x"] / width * AI_GRID),
                    "y1": round((b["y"] + b["h"]) / height * AI_GRID),
                    "x1": round((b["x"] + b["w"]) / width * AI_GRID),
                    "text": b["text"],
                }
            )
    return out


def transform_boxes(doc: dict, scale: float, dx: float, dy: float) -> dict:
    """Affine re-fit of text boxes (M18 analog: the center-scaling box
    repair, /root/reference/src/barks_ocr/tools/quick_fix.py:7-113) —
    pure arithmetic, returns a new payload dict."""
    out = {k: v for k, v in doc.items() if k != "pages"}
    pages = []
    for page in doc.get("pages", []):
        boxes = [
            {
                "x": b["x"] * scale + dx,
                "y": b["y"] * scale + dy,
                "w": b["w"] * scale,
                "h": b["h"] * scale,
                "text": b["text"],
            }
            for b in page.get("boxes", [])
        ]
        pages.append({"page": page.get("page", 0), "boxes": boxes})
    out["pages"] = pages
    return out
