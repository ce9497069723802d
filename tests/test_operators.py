"""Operator unit tests on hand-built tables (SURVEY.md §5: operator-level
parity tests)."""

from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_word_index_counts():
    from barks_ocr_ray.functions.text import word_index

    docs = _docs([(1, "alpha beta alpha"), (2, "beta gamma!"), (3, "")])
    out = word_index(docs).to_pandas().set_index("word")["n"].to_dict()
    assert out == {"alpha": 2, "beta": 2, "gamma": 1}


def test_doc_stats_values():
    from barks_ocr_ray.functions.text import doc_stats

    docs = _docs([(1, "The quick fox. It ran!"), (2, "short")])
    out = doc_stats(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 5
    assert out.loc[1, "n_punct"] == 2
    assert bool(out.loc[1, "low_quality"])  # < 10 tokens
    assert out.loc[2, "n_punct"] == 0 and bool(out.loc[2, "low_quality"])


def test_doc_issues_predicates():
    from barks_ocr_ray.functions.text import doc_issues

    long_ok = "x" * 120 + "."
    docs = _docs([(1, "tiny"), (2, long_ok), (3, "ALL CAPS TEXT" + "!" * 90)])
    out = doc_issues(docs).to_pandas()
    issues = set(zip(out["doc_id"], out["issue_type"]))
    assert (1, "short_text") in issues
    assert (1, "no_terminal_punct") in issues
    assert (2, "short_text") not in issues
    assert (3, "all_caps") in issues


def test_exact_dedup_keeps_min():
    from barks_ocr_ray.functions.relational import exact_dedup

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b", "b", "c"], pa.string()),
            "v": pa.array([2, 1, 9, 7, 8, 5], pa.int64()),
        }
    )
    out = (
        exact_dedup(rd.from_arrow(t), "k", tie_break_col="v", num_partitions=3)
        .to_pandas()
        .set_index("k")["v"]
        .to_dict()
    )
    assert out == {"a": 1, "b": 7, "c": 5}


def test_grouped_topk():
    from barks_ocr_ray.functions.relational import grouped_topk

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "score": pa.array([5.0, 9.0, 7.0, 3.0, 3.0], pa.float64()),
            "id": pa.array([10, 11, 12, 20, 21], pa.int64()),
        }
    )
    out = grouped_topk(
        rd.from_arrow(t), "g", "score", 2, tie_col="id", rank_col="rnk",
        num_partitions=2,
    ).to_pandas()
    got = sorted(zip(out["g"], out["id"], out["rnk"]))
    # group 2 ties on score -> smaller id ranks first
    assert got == [(1, 11, 1), (1, 12, 2), (2, 20, 1), (2, 21, 2)]


def test_broadcast_joins():
    from barks_ocr_ray.functions.relational import (
        broadcast_lookup_column,
        broadcast_semi_join,
    )

    t = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    )
    out = broadcast_lookup_column(t, {1: "x", 3: "y"}, "k", "v").to_pandas()
    assert sorted(zip(out["k"], out["v"])) == [(1, "x"), (3, "y")]
    anti = broadcast_semi_join(t, {1, 3}, "k", anti=True).to_pandas()
    assert anti["k"].tolist() == [2]


def test_sessionize_gap_rule():
    from barks_ocr_ray.functions.windows import sessionize

    base = datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap of 45 min between event 2 and 3)
        (1, base, 1),
        (1, base + timedelta(minutes=10), 2),
        (1, base + timedelta(minutes=55), 3),
        # user 2: one session
        (2, base, 4),
        (2, base + timedelta(minutes=29), 5),
    ]
    events = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )
    out = sessionize(events).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[2, "n_sessions"] == 1 and out.loc[2, "n_events"] == 2


def test_tumbling_hourly():
    from barks_ocr_ray.functions.windows import tumbling_hourly

    base = datetime(2024, 1, 1)
    events = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                "ts": pa.array(
                    [
                        base,
                        base + timedelta(minutes=30),
                        base + timedelta(hours=1, minutes=5),
                        base,
                    ],
                    pa.timestamp("us"),
                ),
                "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
            }
        )
    )
    out = tumbling_hourly(events).to_pandas()
    rows = {
        (r.event_type, int(r.hour_id)): (int(r.n), r.sum_value)
        for r in out.itertuples()
    }
    h0 = int(base.timestamp() // 3600)
    assert rows[("a", h0)] == (2, 3.0)
    assert rows[("a", h0 + 1)] == (1, 4.0)
    assert rows[("b", h0)] == (1, 8.0)


def test_entity_tagger_counts():
    from barks_ocr_ray.functions.tagging import tag_entities

    docs = _docs([(1, "hash join beats merge join; hash wins")])
    out = tag_entities(docs).to_pandas()
    got = {(r.name, int(r.n)) for r in out.itertuples()}
    assert ("hash", 2) in got and ("join", 2) in got and ("merge", 1) in got


def test_round_like_duckdb():
    import numpy as np

    from barks_ocr_ray.functions.relational import round_like_duckdb

    x = np.array([2.5, -2.5, 2.45, 2.4449999, 0.49999999999999994])
    got = round_like_duckdb(x, 1)
    assert got.tolist() == [2.5, -2.5, 2.5, 2.4, 0.5]
    # the classic +0.5 trap: scaled value one ulp below a half boundary
    assert round_like_duckdb(np.array([0.49999999999999994]), 0)[0] == 0.0


def test_validator_scores_articles_high():
    import ray.data as rd

    from barks_ocr_ray.datagen import pages_table
    from barks_ocr_ray.pipelines.validate import validate_extraction

    pages = rd.from_arrow(pages_table(100)).select_columns(
        ["url", "warc_ts", "html", "lang"]
    )
    out = validate_extraction(
        pages, sample_frac=1.0, num_partitions=4
    ).to_pandas()
    assert len(out) > 50
    html_rows = out[out["kind"] == "html"]
    # the real extractor's content is always contained in the stripped
    # full text -> no html page should be flagged
    assert not html_rows["flagged"].any()
    assert (out[out["kind"] == "binary"]["score"] == 1.0).all()
