"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows (SURVEY.md §2.9: the reference has no
streaming semantics either); windows are expressed as keyed computations:
tumbling = groupby on a derived window id (vectorized), sessions =
hash-repartition on user + ONE vectorized gap scan per block (all of a
block's users together — no per-group UDF dispatch). Ordering
assumption: within a (user) group, rows are sorted by (ts, event_id)
before the gap scan — stated here because the oracle SQL relies on the
same order.
"""

from __future__ import annotations


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


def sessionize(
    events: Dataset, gap_minutes: int = 30, num_partitions: int = 16
) -> Dataset:
    """Per-user session stats with a gap rule: a new session starts when
    the time since the previous event exceeds ``gap_minutes``.

    Execution shape: hash-repartition on user co-locates each user's
    events, then ONE vectorized pass per block computes every user's gap
    scan together (sort by (user, ts, event_id), diff, group-boundary
    reset) — one UDF call per block instead of one per user."""
    gap_us = gap_minutes * 60_000_000

    def _sessions_block(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t.select(["user_id", "ts", "event_id"]),
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = t.take(idx)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        same_user = np.concatenate(([False], users[1:] == users[:-1]))
        gap_break = np.concatenate(([False], np.diff(ts_us) > gap_us))
        # a session boundary inside a user's run; the first row of each
        # user starts their first session implicitly
        new_session = same_user & gap_break
        uniq, starts = np.unique(users, return_index=True)
        ends = np.concatenate((starts[1:], [len(users)]))
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts) + 1
        # reduceat quirk: a run of length 1 at the array end still works
        # because new_session[start] is always False for a run start
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return (
        events.select_columns(["user_id", "ts", "event_id"])
        .repartition(num_partitions, keys=["user_id"])
        .map_batches(_sessions_block, batch_format="pyarrow", batch_size=None)
    )
