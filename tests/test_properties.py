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


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=1,
        max_size=12,
    ),
    st.text(alphabet="abc", min_size=1, max_size=3),
    st.text(alphabet="abc", min_size=1, max_size=3),
)
def test_bpe_merge_preserves_concatenation(syms, lhs, rhs):
    """The BPE merge kernel never changes the underlying string: the
    concatenation of symbols is invariant under any merge — the
    property every learned tokenizer rests on."""
    from barks_ocr_ray.functions.bpe import merge_pair_in_word

    merged = merge_pair_in_word(syms, lhs, rhs)
    assert "".join(merged) == "".join(syms)
    # no (lhs, rhs) adjacency survives one pass: a new one could only
    # form if lhs+rhs == lhs or rhs == lhs+rhs, impossible at len >= 1
    assert not any(a == lhs and b == rhs for a, b in zip(merged, merged[1:]))


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab cd", min_size=0, max_size=40))
def test_bpe_encode_len_bounds(word):
    """Encoded length is monotonically bounded: between 1 and the
    initial symbol count, for any merge list."""
    from barks_ocr_ray.functions.bpe import (
        encode_word_len,
        word_symbols,
    )

    merges = [("a", "b"), ("ab", "a"), ("b", "</w>")]
    n0 = len(word_symbols(word))
    n = encode_word_len(word, merges)
    assert 1 <= n <= n0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_histogram_bucket_expression_matches_duckdb(vals, n_buckets):
    """The q127/q133/q134 bucket contract: the single IEEE expression
    least(floor((x - lo) / w), B-1) assigns every value to the same
    bucket in numpy and DuckDB — FOR w > 0, which is the contract's
    stated precondition. hi != lo does NOT imply w > 0: a subnormal
    range underflows (hi - lo) / B to 0.0 (hypothesis found
    [0.0, 5e-324]), where numpy propagates the NaN of 0/0 but DuckDB's
    least() skips NaN — so the operators guard on the computed w, not
    on hi == lo (quantiles.py takes the constant-column path; pinned by
    test_histogram_quantiles_subnormal_range_takes_constant_path)."""
    lo, hi = min(vals), max(vals)
    w = (hi - lo) / float(n_buckets)
    if w == 0.0:
        return
    x = np.array(vals, np.float64)
    ours = np.minimum(
        np.floor((x - lo) / w), float(n_buckets - 1)
    ).astype(np.int64)
    theirs = duckdb.sql(
        "SELECT CAST(least(floor((v - ?) / ?), ?) AS BIGINT) "
        "FROM (SELECT unnest(?) AS v)",
        params=[lo, w, n_buckets - 1, list(map(float, vals))],
    ).fetchnumpy()
    assert (ours == list(theirs.values())[0]).all()
