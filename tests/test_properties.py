"""Property tests (hypothesis) for the pure helpers the oracle
comparisons hinge on. No Ray needed — these run on plain values."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_like_duckdb_matches_duckdb(x, nd):
    """round_like_duckdb is the contract every float oracle column rests
    on: bit-identical to DuckDB's round() for any double."""
    from barks_ocr_ray.functions.relational import round_like_duckdb

    ours = float(round_like_duckdb(np.array([x], np.float64), nd)[0])
    theirs = duckdb.sql(
        f"SELECT round(CAST(? AS DOUBLE), {nd})", params=[x]
    ).fetchone()[0]
    assert ours == theirs or (np.isnan(ours) and theirs is None), (x, nd)


def _reference_line_pattern(source_text, pattern_text):
    """Independent reimplementation of the reference's re-wrap
    (ocr_check.py:156-182), structured differently on purpose."""
    counts = [len(ln.split()) for ln in pattern_text.rstrip("\n").split("\n")]
    words = source_text.split()
    if not counts:
        return source_text
    if not words:
        return ""
    out, i = [], 0
    for idx in range(len(counts)):
        if idx == len(counts) - 1:
            out.append(" ".join(words[i:]))
            break
        if i >= len(words):
            break
        out.append(" ".join(words[i : i + counts[idx]]))
        i += counts[idx]
    return "\n".join(out)


_words = st.lists(st.sampled_from(["aa", "b", "ccc", "dddd"]), max_size=12)


@settings(max_examples=200, deadline=None)
@given(_words, st.lists(_words, max_size=5))
def test_apply_line_pattern_matches_reference(src_words, pat_lines):
    from barks_ocr_ray.functions.text import apply_line_pattern

    source = " ".join(src_words)
    pattern = "\n".join(" ".join(ln) for ln in pat_lines)
    assert apply_line_pattern(source, pattern) == _reference_line_pattern(
        source, pattern
    )


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_levenshtein_matches_duckdb_property(a, b):
    from barks_ocr_ray.functions.fuzzy import levenshtein

    # DuckDB's levenshtein counts unicode code points like ours; skip
    # NUL which the SQL layer cannot carry
    a = a.replace("\x00", "")
    b = b.replace("\x00", "")
    want = duckdb.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
    assert levenshtein(a, b) == want


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**12), st.integers(2, 64))
def test_bucket_of_stable_and_in_range(doc, buckets):
    from barks_ocr_ray.state.manifest import bucket_of

    url = f"https://example.com/{doc}"
    b1 = bucket_of(url, buckets)
    b2 = bucket_of(url, buckets)
    assert b1 == b2 and 0 <= b1 < buckets
