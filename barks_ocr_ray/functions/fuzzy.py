"""Fuzzy similarity join (J4/J5 analog): pair rows from two sides by best
SequenceMatcher ratio within a blocking group.

Reference ancestors: the easy×paddle group pairing — same panel, best
``SequenceMatcher.ratio >= 0.7``
(/root/reference/src/barks_ocr/tools/ocr_check.py:185-218, MIN_MATCH_RATIO
:39) and the per-panel outer join with ``only_in_*`` records
(/root/reference/src/barks_ocr/tools/compare.py:159-206).

Shape: union the two sides with a ``side`` tag, co-partition by the
blocking key with ONE groupby, and do the quadratic best-match only inside
each (small) group — the documented partitioning assumption is that
true matches share the blocking key.
"""

from __future__ import annotations

import logging
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

MIN_MATCH_RATIO = 0.7  # tools/ocr_check.py:39

#: per-group pair budget (skew guard, the `_bucket_pairs` pattern): a
#: blocking-key group whose |L| x |R| exceeds this is a template-farm
#: pathology, not a match neighborhood — reference-shaped groups
#: (boxes of ONE panel, ocr_check.py:185-218) are tens of rows and
#: never bind the cap. When it binds, each left is matched against the
#: ``budget // |L|`` SMALLEST-id right candidates (deterministic — the
#: same ids the tie-break already prefers) and the overflow is LOGGED;
#: lefts keep their one-output-row semantics either way, so output
#: size is unchanged and per-group cost is linear, not quadratic.
DEFAULT_MAX_GROUP_PAIRS = 100_000


def _cap_rhs(n_lhs: int, rhs: list, key, max_group_pairs: int) -> list:
    """Bound the per-group quadratic step: keep the smallest-row_id
    right candidates so |L| x |R'| <= max_group_pairs (rhs is a list of
    (row_id, text) sorted by row_id ascending). No silent caps —
    overflow is logged."""
    if n_lhs * len(rhs) <= max_group_pairs:
        return rhs
    rhs_cap = max(1, max_group_pairs // max(1, n_lhs))
    logging.getLogger(__name__).warning(
        "fuzzy group %r: %d x %d candidate pairs exceeds "
        "max_group_pairs=%d; keeping the %d smallest-id right "
        "candidates per left (%d right rows excluded)",
        key, n_lhs, len(rhs), max_group_pairs, rhs_cap,
        len(rhs) - rhs_cap,
    )
    return rhs[:rhs_cap]


def _group_sides(g: pa.Table) -> tuple[list, list]:
    """Split a fuzzy group into row_id-sorted (row_id, text) lists per
    side."""
    side = g.column("side").to_pylist()
    rid = g.column("row_id").to_pylist()
    txt = g.column("text").to_pylist()
    lhs = sorted((r, t) for r, t, sd in zip(rid, txt, side) if sd == "l")
    rhs = sorted((r, t) for r, t, sd in zip(rid, txt, side) if sd == "r")
    return lhs, rhs


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, row-vectorized DP (numpy over one string
    axis) — exactly DuckDB's ``levenshtein()`` semantics, which operate
    on UTF-8 BYTES, not code points (property-tested against DuckDB over
    arbitrary unicode), so the paired query has a value-exact oracle."""
    if a == b:
        return 0
    ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(ab) == 0:
        return len(bb)
    if len(bb) == 0:
        return len(ab)
    prev = np.arange(len(bb) + 1, dtype=np.int64)
    cur = np.empty(len(bb) + 1, dtype=np.int64)
    for i, ch in enumerate(ab):
        cur[0] = i + 1
        sub = prev[:-1] + (bb != ch)
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # insertion needs a sequential scan: cur[j] = min(cur[j], cur[j-1]+1)
        np.minimum.accumulate(
            cur - np.arange(len(cur)), out=cur
        )
        cur += np.arange(len(cur))
        prev, cur = cur, prev
    return int(prev[-1])


def lev_ratio(a: str, b: str) -> float:
    """1 - lev/max(len) — the normalized similarity the oracle mirrors."""
    denom = max(len(a), len(b), 1)
    return 1.0 - levenshtein(a, b) / denom


def levenshtein_best_match(
    left: Dataset,
    right: Dataset,
    *,
    key_col: str,
    id_col: str,
    text_col: str,
    min_ratio: float = 0.3,
    left_pre=None,
    right_pre=None,
    max_group_pairs: int = DEFAULT_MAX_GROUP_PAIRS,
) -> Dataset:
    """For every left row, the best right row in the same blocking group
    by levenshtein ratio (ties -> smallest right id); lefts with no match
    >= min_ratio are dropped (inner semantics — the SQL-oracle variant of
    ``fuzzy_best_match``). ``max_group_pairs`` bounds the per-group
    quadratic step (see ``_cap_rhs``). Output: (left_id, right_id, ratio).

    ``left_pre``/``right_pre`` fuse an optional row filter INSIDE the
    side-tagging UDF: a selective upstream ``Dataset.filter`` empties
    blocks, and the next fused map over an empty block emits a
    schema-less table (the RefBundle warning class)."""
    from barks_ocr_ray.functions.relational import round_like_duckdb

    def _tag(side: str, pre=None):
        def _t(t: pa.Table) -> pa.Table:
            if pre is not None:
                t = pre(t)
            return pa.table(
                {
                    "key": t.column(key_col),
                    "row_id": t.column(id_col),
                    "text": t.column(text_col),
                    "side": pa.array([side] * t.num_rows, pa.string()),
                }
            )

        return _t

    both = left.map_batches(_tag("l", left_pre), batch_format="pyarrow").union(
        right.map_batches(_tag("r", right_pre), batch_format="pyarrow")
    )

    def _match(g: pa.Table) -> pa.Table:
        lhs, rhs = _group_sides(g)
        rhs = _cap_rhs(
            len(lhs), rhs, g.column("key")[0].as_py(), max_group_pairs
        )
        lids, rids, ratios = [], [], []
        for lid, ltext in lhs:
            best_id, best_ratio = None, min_ratio
            for rrow_id, rtext in rhs:
                r = lev_ratio(ltext, rtext)
                # strict > keeps the SMALLEST right id on ties (rhs is
                # sorted ascending); >= min_ratio admits the boundary
                if r > best_ratio or (best_id is None and r >= min_ratio):
                    best_id, best_ratio = rrow_id, r
            if best_id is not None:
                lids.append(lid)
                rids.append(best_id)
                ratios.append(best_ratio)
        return pa.table(
            {
                "left_id": pa.array(lids, pa.int64()),
                "right_id": pa.array(rids, pa.int64()),
                "ratio": pa.array(
                    round_like_duckdb(np.asarray(ratios, np.float64), 4),
                    pa.float64(),
                ),
            }
        )

    return both.groupby("key").map_groups(_match, batch_format="pyarrow")


def fuzzy_best_match(
    left: Dataset,
    right: Dataset,
    *,
    key_col: str,
    id_col: str,
    text_col: str,
    min_ratio: float = MIN_MATCH_RATIO,
    left_pre=None,
    right_pre=None,
    max_group_pairs: int = DEFAULT_MAX_GROUP_PAIRS,
) -> Dataset:
    """For every left row, the best-ratio right row in the same blocking
    group. Output: (key, left_id, right_id, ratio) — right_id null for
    unmatched lefts (the ``only_in_easy`` analog). ``left_pre`` /
    ``right_pre``: see ``levenshtein_best_match``; ``max_group_pairs``
    bounds the per-group quadratic step (see ``_cap_rhs``)."""

    def _tag(side: str, pre=None):
        def _t(t: pa.Table) -> pa.Table:
            if pre is not None:
                t = pre(t)
            return pa.table(
                {
                    "key": t.column(key_col),
                    "row_id": t.column(id_col),
                    "text": t.column(text_col),
                    "side": pa.array([side] * t.num_rows, pa.string()),
                }
            )

        return _t

    both = left.map_batches(_tag("l", left_pre), batch_format="pyarrow").union(
        right.map_batches(_tag("r", right_pre), batch_format="pyarrow")
    )

    def _match(g: pa.Table) -> pa.Table:
        gkey = g.column("key")[0].as_py()
        lhs, rhs = _group_sides(g)
        rhs = _cap_rhs(len(lhs), rhs, gkey, max_group_pairs)
        keys, lids, rids, ratios = [], [], [], []
        for lid, ltext in lhs:
            best_id, best_ratio = None, min_ratio
            for rrow_id, rtext in rhs:
                # ratio ties resolved by smaller right id (deterministic)
                r = SequenceMatcher(None, ltext, rtext).ratio()
                if r > best_ratio or (r == best_ratio and best_id is None):
                    if r >= min_ratio:
                        best_id, best_ratio = rrow_id, r
            keys.append(gkey)
            lids.append(lid)
            rids.append(best_id)
            ratios.append(round(best_ratio, 4) if best_id is not None else None)
        # typed arrow out: a pandas frame gives ratio dtype object when a
        # group is all-unmatched (schema flip-flops across blocks)
        return pa.table(
            {
                "key": pa.array(keys),
                "left_id": pa.array(lids, pa.int64()),
                "right_id": pa.array(rids, pa.int64()),
                "ratio": pa.array(ratios, pa.float64()),
            }
        )

    return both.groupby("key").map_groups(_match, batch_format="pyarrow")
