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


# ---------------------------------------------------------------------------
# Interval overlap join (temporal self-join)
# ---------------------------------------------------------------------------


def interval_overlap_pairs(events: Dataset, num_partitions: int = 8) -> Dataset:
    """Per-user temporal interval overlap self-join: each event spans
    [ts, ts + max(value, 0) minutes] (duration rounded to whole seconds
    with the shared DuckDB rounding, then exact integer microseconds);
    a pair (a, b) overlaps when a precedes b in (ts, event_id) order and
    b starts no later than a ends. Returns (type_a, type_b, n_pairs) —
    type_a is the earlier event's type — an event-type² table.

    Execution: ONE user-keyed exchange, then a per-block vectorized
    sweep (lexsort by (user, start, event_id); for each event,
    np.searchsorted finds how many successors start before its end —
    the same output-bounded chunked emission as range_join_pairs, never
    a per-user quadratic materialization), block-local (type, type)
    pair counts, and a types²-sized final aggregation. The sweep is
    exact because rows are start-sorted: a.start <= b.start holds by
    order, so overlap reduces to b.start <= a.end."""
    import numpy as np

    from barks_ocr_ray.functions.relational import round_like_duckdb

    def _spans(t: pa.Table) -> pa.Table:
        val = t.column("value").to_numpy(zero_copy_only=False)
        dur_s = round_like_duckdb(val * 60.0, 0).astype(np.int64)
        dur_us = np.maximum(dur_s, 0) * 1_000_000
        s = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "s": pa.array(s, pa.int64()),
                "e": pa.array(s + dur_us, pa.int64()),
            }
        )

    def _sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        e = t.column("e").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, s, u))
        u, s, e, ty = u[order], s[order], e[order], ty[order]
        # per-user segment bounds
        seg_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg_end = np.r_[seg_start[1:], len(u)]
        seg_of = np.repeat(
            np.arange(len(seg_start)), seg_end - seg_start
        ).astype(np.int64)
        # successors within the same user starting at or before my end:
        # searchsorted over a (segment, relative-start) composite key
        # that is monotone across the whole block (relative offsets fit
        # 52 bits for any block spanning < ~140 years)
        base = s.min()
        key = seg_of * (1 << 52) + (s - base)
        hi = np.searchsorted(key, seg_of * (1 << 52) + (e - base), "right")
        idx = np.arange(len(u), dtype=np.int64)
        cnt = np.maximum(hi - idx - 1, 0)
        total = int(cnt.sum())
        a_idx = np.repeat(idx, cnt)
        # b enumerates a's sorted-order successors: a+1 .. a+cnt[a]
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(cnt)[:-1]], cnt
        )
        b_idx = a_idx + 1 + within
        pair = pa.table(
            {
                "type_a": pa.array(list(ty[a_idx]), pa.string()),
                "type_b": pa.array(list(ty[b_idx]), pa.string()),
            }
        )
        return (
            pair.group_by(["type_a", "type_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["type_a", "type_b", "n_pairs"])
        )

    return (
        events.map_batches(_spans, batch_format="pyarrow")
        .repartition(num_partitions, keys=["user_id"])
        .map_batches(_sweep, batch_format="pyarrow", batch_size=None)
        .groupby(["type_a", "type_b"], num_partitions=2)
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------

US_PER_WEEK = 7 * 86_400 * 1_000_000


def retention_matrix(events: Dataset, num_partitions: int = 8) -> Dataset:
    """Weekly cohort retention: users cohorted by their FIRST event's
    epoch week; n_active = distinct users of cohort c active in week
    c + offset. The classic product-analytics matrix, and the
    crawl-freshness matrix when events are fetches.

    ONE user-keyed exchange does everything row-scaled: per block,
    lexsort by (user, week), collapse to distinct (user, week) pairs,
    take the segment's first week as the cohort, emit (cohort_week,
    week_offset) — at most one row per distinct (user, week), so the
    final (cohort, offset)-keyed count IS the distinct-user count. The
    rollup output is weeks²-bounded."""
    import numpy as np

    def _weeks(t: pa.Table) -> pa.Table:
        wk = pc.divide(
            t.column("ts").cast(pa.int64()),
            pa.scalar(US_PER_WEEK, pa.int64()),
        )
        return pa.table({"user_id": t.column("user_id"), "wk": wk})

    def _cohort_offsets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_week": pa.array([], pa.int64()),
                    "week_offset": pa.array([], pa.int64()),
                    "n_active": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("wk").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cohort = np.repeat(w[seg], np.diff(np.r_[seg, len(u)]))
        pairs = pa.table(
            {
                "cohort_week": pa.array(cohort, pa.int64()),
                "week_offset": pa.array(w - cohort, pa.int64()),
            }
        )
        return (
            pairs.group_by(["cohort_week", "week_offset"])
            .aggregate([([], "count_all")])
            .rename_columns(["cohort_week", "week_offset", "n_active"])
        )

    return (
        events.map_batches(_weeks, batch_format="pyarrow")
        .repartition(num_partitions, keys=["user_id"])
        .map_batches(_cohort_offsets, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_week", "week_offset"], num_partitions=2)
        .aggregate(Sum("n_active", alias_name="n_active"))
    )
