"""Unit contracts for the web-corpus cleaning operators
(functions/cleaning.py): Gopher repetition stats, C4 line filtering,
paragraph-level dedup. The value-exact behavior vs SQL is pinned by the
q57/q58/q59 oracles; these tests pin the semantic edges the oracles
can't reach on the synthetic corpus (empty docs, null text, cross-doc
paragraph kills, ordering)."""

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


def test_gopher_repetition_flags_and_edges():
    from barks_ocr_ray.functions.cleaning import gopher_repetition

    docs = _docs(
        [
            (1, "spam ham " * 50),  # one bigram dominates -> flagged
            (2, "a b c d e f g h i j"),  # all bigrams distinct
            (3, ""),  # no tokens
            (4, "one"),  # single token: no bigrams
        ]
    )
    out = (
        gopher_repetition(docs).to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "flagged"] and out.loc[1, "top2_frac"] > 0.4
    assert not out.loc[2, "flagged"]
    # "a b ... j": every 2-gram unique -> top frac = 1/9
    assert abs(out.loc[2, "top2_frac"] - 1 / 9) < 1e-3
    assert out.loc[3, "top2_frac"] == 0.0 and out.loc[3, "n_tokens"] == 0
    assert out.loc[4, "top2_frac"] == 0.0 and out.loc[4, "top3_frac"] == 0.0


def test_c4_line_filter_line_and_doc_rules():
    from barks_ocr_ray.functions.cleaning import c4_line_filter

    good = "alpha beta gamma delta epsilon."
    docs = _docs(
        [
            # 3 good lines + 1 short + 1 unterminated -> kept, cleaned
            (1, "\n".join([good, "too short.", good, "no terminal punct here", good])),
            # only 2 good lines -> whole doc dropped
            (2, "\n".join([good, good, "nope"])),
            (3, None),  # null text -> dropped
        ]
    )
    out = c4_line_filter(docs).to_pandas().set_index("doc_id")
    assert list(out.index) == [1]
    assert out.loc[1, "n_lines"] == 5 and out.loc[1, "n_kept"] == 3
    assert out.loc[1, "clean_text"] == "\n".join([good, good, good])


def test_paragraph_dedup_within_and_cross_doc():
    from barks_ocr_ray.functions.cleaning import paragraph_dedup

    boiler = "subscribe to our newsletter today please."
    docs = _docs(
        [
            (1, "\n".join(["unique one", boiler, "unique one", "unique two"])),
            (2, "\n".join([boiler, "other text"])),
            (3, boiler),  # only the shared paragraph -> doc disappears
        ]
    )
    out = (
        paragraph_dedup(docs, min_docs=2, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # boiler appears in 3 docs -> dropped everywhere; within-doc repeat
    # of "unique one" collapses to the first occurrence, order kept
    assert list(out.index) == [1, 2]
    assert out.loc[1, "clean_text"] == "unique one\nunique two"
    assert out.loc[1, "n_paras"] == 4 and out.loc[1, "n_kept"] == 2
    assert out.loc[2, "clean_text"] == "other text"
