"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows (SURVEY.md §2.9: the reference has no
streaming semantics either); windows are expressed as keyed computations:
tumbling = groupby on a derived window id (vectorized), sessions =
per-user ordered gap analysis inside ``map_groups``. Ordering assumption:
within a (user) group, rows are sorted by (ts, event_id) before the gap
scan — stated here because the oracle SQL relies on the same order.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

US_PER_HOUR = 3_600_000_000


def tumbling_hourly(events: Dataset) -> Dataset:
    """Per (event_type, hour) count + sum(value): window id derived
    vectorized, then a grouped aggregate (partial+final under the hood)."""

    def _win(t: pa.Table) -> pa.Table:
        ts_us = t.column("ts").cast(pa.int64())
        hour_id = pc.divide(ts_us, pa.scalar(US_PER_HOUR, pa.int64()))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour_id": hour_id,
                "value": t.column("value"),
            }
        )

    out = (
        events.map_batches(_win, batch_format="pyarrow")
        .groupby(["event_type", "hour_id"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )

    from barks_ocr_ray.functions.relational import round_columns

    return round_columns(out, {"sum_value": 2})


def sessionize(events: Dataset, gap_minutes: int = 30) -> Dataset:
    """Per-user session stats with a gap rule: a new session starts when
    the time since the previous event exceeds ``gap_minutes``."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        new_session = g["ts"].diff() > gap
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum()) + 1],
                "n_events": [len(g)],
            }
        )

    return (
        events.select_columns(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
    )
