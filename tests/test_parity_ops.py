"""Parity tests for the remaining SURVEY.md §2 operators: fuzzy join
(J4/J5), sinks (S6/S13/S14, S7/S8 roundtrip), box geometry (M6/M18)."""

import os

import pyarrow as pa
import ray.data as rd


def test_fuzzy_best_match():
    from barks_ocr_ray.functions.fuzzy import fuzzy_best_match

    left = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b"],
                "id": [1, 2, 3],
                "text": ["hello world", "completely different", "quack"],
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b"],
                "id": [10, 11, 12],
                "text": ["hello wurld", "zzzzz", "quicksand"],
            }
        )
    )
    out = (
        fuzzy_best_match(left, right, key_col="k", id_col="id", text_col="text")
        .to_pandas()
        .set_index("left_id")
    )
    assert out.loc[1, "right_id"] == 10 and out.loc[1, "ratio"] > 0.8
    assert out.loc[2, "right_id"] is None or out.loc[2, "right_id"] != out.loc[2, "right_id"] or out.loc[2, "right_id"] is pa.NA or str(out.loc[2, "right_id"]) in ("None", "nan", "<NA>")
    # 'quack' vs 'quicksand': ratio below 0.7 -> unmatched
    assert str(out.loc[3, "right_id"]) in ("None", "nan", "<NA>")


def test_queue_file_sink(tmp_path):
    from barks_ocr_ray.functions.sinks import write_queue_file

    ds = rd.from_arrow(
        pa.table(
            {
                "url": ["b", "a", "a", "c"],
                "issue": ["short", "short", "short", "caps"],
            }
        )
    )
    path = str(tmp_path / "queue.txt")
    n = write_queue_file(ds, path, ["url", "issue"])
    lines = open(path).read().splitlines()
    assert n == 3 and lines == sorted(lines)
    assert "a short" in lines and "c caps" in lines


def test_text_report_sink(tmp_path):
    from barks_ocr_ray.functions.sinks import write_text_report

    ds = rd.from_arrow(
        pa.table({"word": ["alpha", "be"], "n": [10, 2]})
    )
    path = str(tmp_path / "report.txt")
    n = write_text_report(ds, path, ["word", "n"])
    lines = open(path).read().splitlines()
    assert n == 2 and lines[0].startswith("word")
    assert any(line.startswith("alpha") for line in lines)


def test_jsonl_roundtrip(tmp_path):
    from barks_ocr_ray.functions.sinks import read_jsonl, write_jsonl

    ds = rd.from_arrow(
        pa.table({"url": ["u1", "u2"], "payload": ["x", "y"]})
    )
    d = str(tmp_path / "jl")
    write_jsonl(ds, d)
    back = read_jsonl(d).to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == ["u1", "u2"]
    assert back["payload"].tolist() == ["x", "y"]


def test_csv_source(tmp_path):
    from barks_ocr_ray.functions.sinks import read_csv_table

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    out = read_csv_table(str(p)).to_pandas().sort_values("a")
    assert out["a"].tolist() == [1, 2] and out["b"].tolist() == ["x", "y"]


def test_norm_boxes_grid():
    from barks_ocr_ray.extract.pdf_layout import norm_boxes

    doc = {
        "width": 600,
        "height": 800,
        "pages": [{"page": 0, "boxes": [{"x": 300, "y": 400, "w": 60, "h": 80, "text": "t"}]}],
    }
    nb = norm_boxes(doc)
    assert nb == [
        {"page": 0, "y0": 500, "x0": 500, "y1": 600, "x1": 600, "text": "t"}
    ]
    # y-before-x key order (model convention)
    assert list(nb[0].keys())[1:3] == ["y0", "x0"]


def test_transform_boxes_affine():
    from barks_ocr_ray.extract.pdf_layout import reading_order, transform_boxes

    doc = {
        "width": 600,
        "ncols": 1,
        "pages": [
            {
                "page": 0,
                "boxes": [
                    {"x": 10, "y": 100, "w": 50, "h": 20, "text": "b"},
                    {"x": 10, "y": 10, "w": 50, "h": 20, "text": "a"},
                ],
            }
        ],
    }
    moved = transform_boxes(doc, scale=2.0, dx=5, dy=7)
    b0 = moved["pages"][0]["boxes"][0]
    assert (b0["x"], b0["y"], b0["w"], b0["h"]) == (25.0, 207.0, 100.0, 40.0)
    # affine transform preserves reading order
    before = reading_order(doc["pages"][0]["boxes"], 600, 1)
    after = reading_order(moved["pages"][0]["boxes"], 1200, 1)
    assert before == after


def test_fuzzy_skew_guard_one_hot_key():
    """Template-farm hazard (the `_bucket_pairs` pattern applied to the
    J4/J5 pairing): 10k docs sharing ONE blocking key must complete in
    bounded time — each left is matched against only the
    max_group_pairs // |L| smallest-id right candidates; every left
    still emits exactly one output row, and matches that exist inside
    the kept prefix are found."""
    import time

    from barks_ocr_ray.functions.fuzzy import fuzzy_best_match

    n = 5_000  # per side -> 25M pairs unguarded; 100k with the default cap
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["hot"] * n, pa.string()),
                "id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(
                    [f"common boilerplate row {i % 7}" for i in range(n)],
                    pa.string(),
                ),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["hot"] * n, pa.string()),
                "id": pa.array(list(range(10_000, 10_000 + n)), pa.int64()),
                "text": pa.array(
                    [f"common boilerplate row {i % 7}" for i in range(n)],
                    pa.string(),
                ),
            }
        )
    )
    t0 = time.time()
    out = fuzzy_best_match(
        left, right, key_col="k", id_col="id", text_col="text"
    ).to_pandas()
    wall = time.time() - t0
    assert wall < 60, f"skew guard failed to bound the group: {wall:.1f}s"
    # one row per left, matched or not
    assert len(out) == n
    # kept candidates are the smallest right ids: every matched right id
    # falls inside the rhs_cap prefix (cap = 100_000 // 5_000 = 20)
    matched = out["right_id"].dropna()
    assert len(matched) > 0
    assert matched.max() < 10_000 + 20
