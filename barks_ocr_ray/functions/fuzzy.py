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

from difflib import SequenceMatcher

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

MIN_MATCH_RATIO = 0.7  # tools/ocr_check.py:39


def fuzzy_best_match(
    left: Dataset,
    right: Dataset,
    *,
    key_col: str,
    id_col: str,
    text_col: str,
    min_ratio: float = MIN_MATCH_RATIO,
) -> Dataset:
    """For every left row, the best-ratio right row in the same blocking
    group. Output: (key, left_id, right_id, ratio) — right_id null for
    unmatched lefts (the ``only_in_easy`` analog)."""

    def _tag(side: str):
        def _t(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t.column(key_col),
                    "row_id": t.column(id_col),
                    "text": t.column(text_col),
                    "side": pa.array([side] * t.num_rows, pa.string()),
                }
            )

        return _t

    both = left.map_batches(_tag("l"), batch_format="pyarrow").union(
        right.map_batches(_tag("r"), batch_format="pyarrow")
    )

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["side"] == "l"].sort_values("row_id")
        rhs = g[g["side"] == "r"].sort_values("row_id")
        keys, lids, rids, ratios = [], [], [], []
        for lrow in lhs.itertuples():
            best_id, best_ratio = None, min_ratio
            for rrow in rhs.itertuples():
                # ratio ties resolved by smaller right id (deterministic)
                r = SequenceMatcher(None, lrow.text, rrow.text).ratio()
                if r > best_ratio or (r == best_ratio and best_id is None):
                    if r >= min_ratio:
                        best_id, best_ratio = rrow.row_id, r
            keys.append(lrow.key)
            lids.append(lrow.row_id)
            rids.append(best_id)
            ratios.append(round(best_ratio, 4) if best_id is not None else None)
        return pd.DataFrame(
            {"key": keys, "left_id": lids, "right_id": rids, "ratio": ratios}
        )

    return both.groupby("key").map_groups(_match, batch_format="pandas")
