"""Unit tests for the frozen single-process reference extractor
(no Ray needed — pure Python oracle layer)."""

from barks_ocr_ray.datagen import (
    OVERSIZE_BYTES,
    logical_urls,
    page_record,
    pages_table,
)
from barks_ocr_ray.extract import clean_text, content_sha256, extract_page
from barks_ocr_ray.extract.html_extract import extract_html
from barks_ocr_ray.extract.pdf_layout import reading_order
from barks_ocr_ray.extract.sniff import sniff
from barks_ocr_ray.stages.sniff_stage import make_dedup_rank


def test_datagen_deterministic():
    assert page_record(17) == page_record(17)
    t1, t2 = pages_table(30), pages_table(30)
    assert t1.equals(t2)


def test_row_classes_and_sniff():
    kinds = {}
    for i in range(10):
        rec = page_record(i)
        kind, enc = sniff(rec["html"])
        kinds[i] = kind
    assert kinds[0] == "html" and kinds[5] == "html" and kinds[8] == "html"
    assert kinds[6] == "pdf" and kinds[7] == "pdf"
    assert kinds[9] == "binary"


def test_latin1_charset_detected():
    rec = page_record(1)  # logical_id % 20 == 1 -> latin-1 slice
    kind, enc = sniff(rec["html"])
    assert kind == "html" and enc == "latin-1"
    res = extract_page(rec["html"])
    assert "café" in res.extracted_text or "Café" in res.extracted_text


def test_article_extraction_strips_boilerplate():
    res = extract_page(page_record(0)["html"])
    assert res.kind == "html"
    text = res.extracted_text
    assert len(text) > 200
    # nav/footer link text must not leak into the extraction
    assert "Privacy" not in text and "News" not in text
    types = {b.type for b in res.blocks}
    assert "content" in types and ("nav" in types or "boilerplate" in types)


def test_link_farm_extracts_empty():
    res = extract_page(page_record(5)["html"])
    assert res.extracted_text == ""


def test_binary_payload():
    res = extract_page(page_record(9)["html"])
    assert res.kind == "binary" and res.extracted_text == ""


def test_span_invariant():
    """decoded[start:end] must reassemble each block's raw text
    (FIXTURES.md F2 invariant)."""
    for i in (0, 1, 2, 5, 8):
        rec = page_record(i)
        kind, enc = sniff(rec["html"])
        doc = rec["html"].decode(enc, errors="replace")
        res = extract_page(rec["html"])
        assert res.blocks
        for b in res.blocks:
            raw = "".join(doc[s:e] for s, e in b.spans)
            assert clean_text(raw) == b.text
        # spans are in-bounds and ordered within each block
        for b in res.blocks:
            for s, e in b.spans:
                assert 0 <= s <= e <= len(doc)


def test_pdf_reading_order_columns():
    boxes = [
        {"x": 320, "y": 30, "w": 150, "h": 40, "text": "right-top"},
        {"x": 20, "y": 210, "w": 150, "h": 40, "text": "left-bottom"},
        {"x": 20, "y": 35, "w": 150, "h": 40, "text": "left-top"},
        {"x": 330, "y": 200, "w": 150, "h": 40, "text": "right-bottom"},
    ]
    order = reading_order(boxes, width=600, ncols=2)
    assert [boxes[i]["text"] for i in order] == [
        "left-top",
        "left-bottom",
        "right-top",
        "right-bottom",
    ]


def test_pdf_y_band_ties_resolved_by_x():
    boxes = [
        {"x": 200, "y": 52, "w": 50, "h": 20, "text": "b"},
        {"x": 10, "y": 58, "w": 50, "h": 20, "text": "a"},  # same 50px band
    ]
    order = reading_order(boxes, width=600, ncols=1)
    assert [boxes[i]["text"] for i in order] == ["a", "b"]


def test_pdf_extraction_deterministic():
    rec = page_record(6)
    assert extract_page(rec["html"]).extracted_text == extract_page(
        rec["html"]
    ).extracted_text
    assert extract_page(rec["html"]).kind == "pdf"
    assert len(extract_page(rec["html"]).extracted_text) > 0


def test_oversized_page_exceeds_threshold():
    rec = page_record(8)
    assert len(rec["html"]) > OVERSIZE_BYTES
    res = extract_page(rec["html"])
    assert len(res.extracted_text) > OVERSIZE_BYTES / 2


def test_clean_text():
    assert clean_text("a­b") == "ab"
    assert clean_text("a — b – c") == "a - b - c"
    assert clean_text("  x \n\t y  ") == "x y"


def test_dedup_rank_ordering():
    h1 = "0" * 64
    h2 = "f" * 64
    # later timestamp always wins
    assert make_dedup_rank(2_000, h2) > make_dedup_rank(1_000, h1)
    # tie on timestamp: lexicographically smaller hash wins (rank larger)
    assert make_dedup_rank(1_000, h1) > make_dedup_rank(1_000, h2)


def test_duplicate_urls_present():
    n = 60
    t = pages_table(n)
    assert t.num_rows == n
    assert len(logical_urls(n)) < n  # refetches collapse


def test_content_hash_stable():
    rec = page_record(3)
    assert content_sha256(rec["html"]) == content_sha256(rec["html"])
    assert len(content_sha256(rec["html"])) == 64


def test_html_block_ids_sequential():
    blocks = extract_html("<html><body><p>one two three four five six</p>"
                          "<p>seven eight nine ten eleven twelve</p></body></html>")
    assert [b.block_id for b in blocks] == list(range(len(blocks)))
