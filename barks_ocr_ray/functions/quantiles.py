"""Exact distributed quantiles — a multi-round counting quickselect:
the k-th smallest element of a numeric column found with O(pivots) of
driver state and O(log_32(n / pull_cap)) streaming passes, never a
global sort (the A-family analog a 100 TB engine needs where
``ds.sort()[k]`` would shuffle the world; Greenwald-Matta-style
sketches trade exactness — this keeps it, matching DuckDB's
``quantile_disc`` bit-for-bit).

Round structure: each unresolved rank holds an open value bracket
(lo, hi); a round spreads 31 pivots across every active bracket and
ONE map_batches pass counts, per pivot, rows strictly below and rows
at-or-below (two vectorized ``np.searchsorted`` calls per batch over
the sorted pivot array, emitted as combiner partials into one
vocabulary-sized aggregation). A rank landing on a pivot's own mass
resolves immediately; otherwise its bracket shrinks ~32x. When a
bracket's row count falls under ``pull_cap`` its rows are pulled,
sorted locally, and indexed exactly.

DuckDB contract (probed, tests pin it): quantile_disc(x, q) is the
ceil(q*n)-th smallest element, 1-based.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from barks_ocr_ray.context import hash_partitions

DEFAULT_PULL_CAP = 100_000
PIVOTS_PER_BRACKET = 31
MAX_ROUNDS = 64


def _count_pass(ds: Dataset, col: str, pivots: np.ndarray) -> tuple:
    """(n_lt, n_le) row counts per pivot, via one streaming pass:
    per-batch searchsorted partials -> one tiny keyed aggregation."""
    piv_list = pivots.tolist()

    def _partials(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)] if x.dtype.kind == "f" else x
        xs = np.sort(x)
        lt = np.searchsorted(xs, np.asarray(piv_list), side="left")
        le = np.searchsorted(xs, np.asarray(piv_list), side="right")
        return pa.table(
            {
                "piv_idx": pa.array(
                    np.arange(len(piv_list)), pa.int64()
                ),
                "n_lt": pa.array(lt.astype(np.int64), pa.int64()),
                "n_le": pa.array(le.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("piv_idx", num_partitions=2)
        .aggregate(
            Sum("n_lt", alias_name="n_lt"), Sum("n_le", alias_name="n_le")
        )
        .take_all()
    )
    n_lt = np.zeros(len(piv_list), np.int64)
    n_le = np.zeros(len(piv_list), np.int64)
    for r in agg:
        n_lt[r["piv_idx"]] = r["n_lt"]
        n_le[r["piv_idx"]] = r["n_le"]
    return n_lt, n_le


def distributed_quantiles(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    pull_cap: int = DEFAULT_PULL_CAP,
    max_rounds: int = MAX_ROUNDS,
) -> pa.Table:
    """Exact ``quantile_disc`` values for every q in ``qs`` over
    ``ds[col]``; returns a (q, value) pa.Table sorted by q."""
    # counting quickselect consumes ds O(log32 n) times: pin the (narrow,
    # 1-2 column) input once so each pass streams object-store blocks
    # instead of re-executing the whole upstream plan (a lazy Dataset
    # re-runs its plan PER CONSUMER; the store spills if needed)
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return pa.table(
            {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
        )
    lo0 = float(ds.min(col))
    hi0 = float(ds.max(col))

    # 1-based target rank per q: the ceil(q*n)-th smallest (DuckDB)
    targets = {float(q): max(1, math.ceil(q * n)) for q in qs}
    resolved: dict[float, float] = {}
    # bracket per q: (lo, hi) OPEN interval, n_below = rows <= lo.
    # Brackets start at +-inf (so rows equal to the global min/max are
    # INSIDE the interval); the pivot grid below clamps to the finite
    # [lo0, hi0] with the endpoints as pivots, so min/max-rank targets
    # resolve on pivot mass.
    brackets: dict[float, tuple[float, float, int, int]] = {
        q: (-math.inf, math.inf, 0, n) for q in targets
    }

    for _ in range(max_rounds):
        active = {q: b for q, b in brackets.items() if q not in resolved}
        if not active:
            break
        # pull small brackets exactly
        for q, (blo, bhi, n_below, n_in) in list(active.items()):
            if n_in <= pull_cap:
                k = targets[q]

                def _in_range(t, _lo=blo, _hi=bhi):
                    c = t.column(col)
                    m = pc.and_(
                        pc.greater(c, pa.scalar(_lo)),
                        pc.less(c, pa.scalar(_hi)),
                    )
                    return t.filter(m).select([col])

                rows = ds.map_batches(
                    _in_range, batch_format="pyarrow"
                ).take_all()
                vals = np.sort(np.array([r[col] for r in rows]))
                # rank within the open interval — by the bracket
                # invariant (n_below < k <= n_below + n_in) the index
                # is always inside vals
                idx = k - n_below - 1
                if not (0 <= idx < len(vals)):
                    raise RuntimeError(
                        "distributed_quantiles: bracket invariant broken "
                        f"(q={q}, k={k}, n_below={n_below}, pulled={len(vals)})"
                    )
                resolved[q] = float(vals[idx])
                del active[q]
        if not active:
            continue
        # one counting pass over the union of all active brackets' pivots
        piv_set: set[float] = set()
        for q, (blo, bhi, _nb, _ni) in active.items():
            glo = lo0 if blo == -math.inf else blo
            ghi = hi0 if bhi == math.inf else bhi
            grid = np.linspace(glo, ghi, PIVOTS_PER_BRACKET + 2)
            piv_set.update(float(p) for p in grid)
        pivots = np.array(sorted(piv_set), np.float64)
        n_lt, n_le = _count_pass(ds, col, pivots)
        for q, (blo, bhi, _nb, n_in_old) in active.items():
            k = targets[q]
            # does k land on a pivot's own mass?
            hit = np.where((n_lt < k) & (k <= n_le))[0]
            if len(hit):
                resolved[q] = float(pivots[hit[0]])
                continue
            # otherwise k falls in an open gap between adjacent pivots
            i = int(np.searchsorted(n_le, k, side="left")) - 1
            new_lo = float(pivots[i]) if i >= 0 else blo
            new_below = int(n_le[i]) if i >= 0 else 0
            j = int(np.searchsorted(n_lt, k, side="left"))
            new_hi = float(pivots[j]) if j < len(pivots) else bhi
            hi_lt = int(n_lt[j]) if j < len(pivots) else n
            brackets[q] = (new_lo, new_hi, new_below, hi_lt - new_below)
    else:
        missing = [q for q in targets if q not in resolved]
        raise RuntimeError(
            f"distributed_quantiles: ranks for {missing} did not resolve "
            f"in {max_rounds} rounds"
        )

    order = sorted(resolved)
    return pa.table(
        {
            "q": pa.array(order, pa.float64()),
            "value": pa.array([resolved[q] for q in order], pa.float64()),
        }
    )


def histogram_quantiles(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = 1024,
) -> pa.Table:
    """ONE-pass mergeable approximate quantiles — the sketch-path
    sibling of :func:`distributed_quantiles` (which is exact but pays
    O(log n) streaming rounds). A 100 TB profiling job that wants the
    p50/p99 of every numeric column cannot afford multi-round
    quickselects per column; the classic answer (Spark's
    approxQuantile lineage, t-digest/KLL in the mergeable-summaries
    literature) is a mergeable one-pass summary. t-digest/KLL merges
    are ORDER-dependent (the result changes with block boundaries —
    unreplayable under Ray's nondeterministic partitioning), so this
    uses the order-independent fixed-grid variant: a cheap min/max/
    count aggregate fixes ``n_buckets`` uniform edges, one streaming
    pass histograms every block (integer partials, sum-mergeable in
    ANY order), and each quantile resolves to the UPPER edge of the
    first bucket whose cumulative count reaches ceil(q*n). The
    estimate is within one bucket width (hi-lo)/n_buckets of the exact
    quantile by construction, and bit-replayable: bucket assignment is
    the single IEEE expression floor((x-lo)/w) on both engines.

    Exchange cost: pass 0 ships 3 scalars per block; pass 1 ships at
    most ``n_buckets`` integer rows per block into one tiny keyed
    aggregation. Driver state is one n_buckets-long int64 array.

    Returns (q, value_est) sorted by q — value_est rounded to 6
    decimals on both engines (round_like_duckdb) for hash stability.
    """
    from ray.data.aggregate import Count, Max, Min

    from barks_ocr_ray.functions.relational import round_like_duckdb

    stats = ds.aggregate(
        Min(col, alias_name="lo"),
        Max(col, alias_name="hi"),
        Count(alias_name="n"),
    )
    n = int(stats["n"])
    empty = pa.table(
        {"q": pa.array([], pa.float64()), "value_est": pa.array([], pa.float64())}
    )
    if n == 0:
        return empty
    lo, hi = float(stats["lo"]), float(stats["hi"])
    # guard on the COMPUTED width, not hi == lo: a subnormal range
    # underflows (hi - lo) / B to 0.0, where the bucket expression
    # diverges between numpy (NaN propagates) and DuckDB (least skips
    # NaN) — the constant-column path is the correct degenerate answer
    w = (hi - lo) / float(n_buckets)
    if w == 0.0:
        order = sorted(float(q) for q in qs)
        return pa.table(
            {
                "q": pa.array(order, pa.float64()),
                "value_est": pa.array(
                    [round_like_duckdb(lo, 6)] * len(order), pa.float64()
                ),
            }
        )

    def _hist(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        # the single-expression contract shared with the SQL oracle:
        # least(floor((x - lo) / w), n_buckets - 1)
        idx = np.minimum(
            np.floor((x - lo) / w), float(n_buckets - 1)
        ).astype(np.int64)
        uniq, counts = np.unique(idx, return_counts=True)
        return pa.table(
            {
                "idx": pa.array(uniq, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_hist, batch_format="pyarrow")
        .groupby("idx", num_partitions=2)
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    counts = np.zeros(n_buckets, np.int64)
    for r in agg:
        counts[r["idx"]] = r["c"]
    cum = np.cumsum(counts)
    order = sorted(float(q) for q in qs)
    ests = []
    for q in order:
        k = max(1, math.ceil(q * n))
        i = int(np.searchsorted(cum, k, side="left"))
        ests.append(round_like_duckdb(lo + (i + 1) * w, 6))
    return pa.table(
        {
            "q": pa.array(order, pa.float64()),
            "value_est": pa.array(ests, pa.float64()),
        }
    )


def grouped_histogram_quantiles(
    ds: Dataset,
    key_col: str,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = 256,
) -> Dataset:
    """Per-group one-pass quantile sketch — histogram_quantiles with a
    grid PER GROUP (each group's min/max/count from one keyed
    aggregate fixes its own edges; a shared global grid would let one
    wide-range group destroy every narrow group's resolution).

    Exchanges: pass 0 ships per-block (group, min, max, count)
    partials into a group-sized aggregate; pass 1 ships per-block
    (group, bucket, c) integer partials — at most n_buckets rows per
    group per block — into ONE keyed aggregation, and the per-group
    quantile selection runs inside map_groups on the bucket-sized
    result (never corpus-sized). Group edges attach to pass 1 through
    a driver dict when the group count is bounded (take_all on the
    group-stats aggregate — group-cardinality rows, the q55/q110
    broadcast-gate precedent applies above that).

    Returns (key, q, value_est) — same bit-replayable bucket contract
    as histogram_quantiles (single IEEE expression, duckdb rounding).
    """
    from ray.data.aggregate import Count, Max, Min

    from barks_ocr_ray.functions.relational import round_like_duckdb

    stats = (
        ds.groupby(key_col)
        .aggregate(
            Min(col, alias_name="lo"),
            Max(col, alias_name="hi"),
            Count(alias_name="n"),
        )
        .take_all()
    )
    if not stats:
        return ds.map_batches(
            lambda t: pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "q": pa.array([], pa.float64()),
                    "value_est": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    edges = {
        r[key_col]: (float(r["lo"]), float(r["hi"]), int(r["n"])) for r in stats
    }
    qs_sorted = sorted(float(q) for q in qs)

    def _hist(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        keys, x = keys[ok], x[ok]
        idx = np.empty(len(x), np.int64)
        for g, (lo, hi, _n) in edges.items():
            m = keys == g
            if not m.any():
                continue
            w = (hi - lo) / float(n_buckets)
            if w == 0.0:  # includes subnormal-range underflow
                idx[m] = 0
            else:
                idx[m] = np.minimum(
                    np.floor((x[m] - lo) / w), float(n_buckets - 1)
                ).astype(np.int64)
        pairs = pa.table(
            {
                key_col: pa.array(keys),
                "bucket": pa.array(idx, pa.int64()),
                "c": pa.array(np.ones(len(x), np.int64), pa.int64()),
            }
        )
        g = pairs.group_by([key_col, "bucket"]).aggregate([("c", "sum")])
        return g.rename_columns([key_col, "bucket", "c"])

    agg = (
        ds.select_columns([key_col, col])
        .map_batches(_hist, batch_format="pyarrow")
        .groupby(key_col, num_partitions=hash_partitions(4))
    )

    def _resolve(t: pa.Table) -> pa.Table:
        import math as _math

        g = t.column(key_col)[0].as_py()
        lo, hi, n = edges[g]
        counts = np.zeros(n_buckets, np.int64)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        np.add.at(counts, b, c)
        cum = np.cumsum(counts)
        w = (hi - lo) / float(n_buckets)
        ests = []
        for q in qs_sorted:
            if w == 0.0:
                ests.append(round_like_duckdb(lo, 6))
                continue
            k = max(1, _math.ceil(q * n))
            i = int(np.searchsorted(cum, k, side="left"))
            ests.append(round_like_duckdb(lo + (i + 1) * w, 6))
        return pa.table(
            {
                key_col: pa.array([g] * len(qs_sorted)),
                "q": pa.array(qs_sorted, pa.float64()),
                "value_est": pa.array(ests, pa.float64()),
            }
        )

    # (group, bucket) partials were pre-summed per block; the keyed
    # map_groups below folds them per group and resolves quantiles
    return agg.map_groups(_resolve, batch_format="pyarrow")


def _weighted_count_pass(
    ds: Dataset, col: str, weight_col: str, pivots: np.ndarray
) -> tuple:
    """(w_lt, w_le) WEIGHT sums per pivot — the weighted sibling of
    _count_pass: per batch, sort values with aligned int64 weights,
    prefix-sum, read the prefix at each searchsorted index."""
    piv_list = pivots.tolist()

    def _partials(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        w = np.asarray(w, np.float64).astype(np.int64)
        ok = ~np.isnan(x)
        x, w = x[ok], w[ok]
        order = np.argsort(x, kind="mergesort")
        xs, ws = x[order], w[order]
        prefix = np.concatenate(([0], np.cumsum(ws)))
        piv = np.asarray(piv_list)
        lt = prefix[np.searchsorted(xs, piv, side="left")]
        le = prefix[np.searchsorted(xs, piv, side="right")]
        return pa.table(
            {
                "piv_idx": pa.array(np.arange(len(piv_list)), pa.int64()),
                "n_lt": pa.array(lt.astype(np.int64), pa.int64()),
                "n_le": pa.array(le.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("piv_idx", num_partitions=2)
        .aggregate(
            Sum("n_lt", alias_name="n_lt"), Sum("n_le", alias_name="n_le")
        )
        .take_all()
    )
    w_lt = np.zeros(len(piv_list), np.int64)
    w_le = np.zeros(len(piv_list), np.int64)
    for r in agg:
        w_lt[r["piv_idx"]] = r["n_lt"]
        w_le[r["piv_idx"]] = r["n_le"]
    return w_lt, w_le


def weighted_quantiles(
    ds: Dataset,
    col: str,
    weight_col: str,
    qs: list[float],
    *,
    pull_cap: int = DEFAULT_PULL_CAP,
    max_rounds: int = MAX_ROUNDS,
) -> pa.Table:
    """Exact WEIGHTED quantiles — the value v such that the total
    weight of rows with value <= v first reaches ceil(q * W) (the
    weighted generalization of DuckDB's quantile_disc rank rule;
    weights must be non-negative integers, e.g. token counts, so every
    rank is integer-exact). Same counting-quickselect round structure
    as distributed_quantiles — O(pivots) driver state, no global sort
    — with weight prefix-sums replacing row counts. Because weights
    are >= 1 per row, a bracket whose WEIGHT fits pull_cap holds at
    most pull_cap rows, so the exact pull stays bounded."""
    from ray.data.aggregate import Sum as _Sum

    # multi-pass consumer: pin the narrow input once (see
    # distributed_quantiles)
    ds = ds.materialize()
    stats = ds.aggregate(_Sum(weight_col, alias_name="w"))
    W = int(stats["w"] or 0)
    empty = pa.table(
        {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
    )
    if W == 0:
        return empty
    lo0 = float(ds.min(col))
    hi0 = float(ds.max(col))

    targets = {float(q): max(1, math.ceil(q * W)) for q in qs}
    resolved: dict[float, float] = {}
    brackets: dict[float, tuple[float, float, int, int]] = {
        q: (-math.inf, math.inf, 0, W) for q in targets
    }

    for _ in range(max_rounds):
        active = {q: b for q, b in brackets.items() if q not in resolved}
        if not active:
            break
        for q, (blo, bhi, w_below, w_in) in list(active.items()):
            if w_in <= pull_cap:
                k = targets[q]

                def _in_range(t, _lo=blo, _hi=bhi):
                    c = t.column(col)
                    m = pc.and_(
                        pc.greater(c, pa.scalar(_lo)),
                        pc.less(c, pa.scalar(_hi)),
                    )
                    return t.filter(m).select([col, weight_col])

                rows = ds.map_batches(
                    _in_range, batch_format="pyarrow"
                ).take_all()
                vals = np.array([r[col] for r in rows], np.float64)
                ws = np.array([r[weight_col] for r in rows]).astype(np.int64)
                order = np.argsort(vals, kind="mergesort")
                vals, ws = vals[order], ws[order]
                cum = w_below + np.cumsum(ws)
                idx = int(np.searchsorted(cum, k, side="left"))
                if not (0 <= idx < len(vals)):
                    raise RuntimeError(
                        "weighted_quantiles: bracket invariant broken "
                        f"(q={q}, k={k}, w_below={w_below}, pulled={len(vals)})"
                    )
                resolved[q] = float(vals[idx])
                del active[q]
        if not active:
            continue
        piv_set: set[float] = set()
        for q, (blo, bhi, _wb, _wi) in active.items():
            glo = lo0 if blo == -math.inf else blo
            ghi = hi0 if bhi == math.inf else bhi
            grid = np.linspace(glo, ghi, PIVOTS_PER_BRACKET + 2)
            piv_set.update(float(p) for p in grid)
        pivots = np.array(sorted(piv_set), np.float64)
        w_lt, w_le = _weighted_count_pass(ds, col, weight_col, pivots)
        for q, (blo, bhi, _wb, _wi) in active.items():
            k = targets[q]
            hit = np.where((w_lt < k) & (k <= w_le))[0]
            if len(hit):
                resolved[q] = float(pivots[hit[0]])
                continue
            i = int(np.searchsorted(w_le, k, side="left")) - 1
            new_lo = float(pivots[i]) if i >= 0 else blo
            new_below = int(w_le[i]) if i >= 0 else 0
            j = int(np.searchsorted(w_lt, k, side="left"))
            new_hi = float(pivots[j]) if j < len(pivots) else bhi
            hi_lt = int(w_lt[j]) if j < len(pivots) else W
            brackets[q] = (new_lo, new_hi, new_below, hi_lt - new_below)
    else:
        missing = [q for q in targets if q not in resolved]
        raise RuntimeError(
            f"weighted_quantiles: ranks for {missing} did not resolve "
            f"in {max_rounds} rounds"
        )

    order = sorted(resolved)
    return pa.table(
        {
            "q": pa.array(order, pa.float64()),
            "value": pa.array([resolved[q] for q in order], pa.float64()),
        }
    )


# --- grouped exact quantiles: ALL groups share each counting pass --------


def _grouped_stats_pass(ds: Dataset, key: str, col: str) -> dict:
    """Per-group (non-null n, min, max) in ONE streaming pass of
    block partials; driver state is group-bounded. Null group keys are
    dropped (callers with nullable keys should bucket them first)."""

    def _partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(key)))
        k = t.column(key).to_numpy(zero_copy_only=False)
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        k, x = k[ok], x[ok]
        out_t = pa.table(
            {
                "grp": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "mn": pa.array([], pa.float64()),
                "mx": pa.array([], pa.float64()),
            }
        )
        if len(k) == 0:
            return out_t
        order = np.argsort(k, kind="mergesort")
        ks, xs = k[order], x[order]
        new = np.empty(len(ks), np.bool_)
        new[0] = True
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ks))
        return pa.table(
            {
                "grp": pa.array([str(g) for g in ks[starts]], pa.string()),
                "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "mn": pa.array(np.minimum.reduceat(xs, starts), pa.float64()),
                "mx": pa.array(np.maximum.reduceat(xs, starts), pa.float64()),
            }
        )

    stats: dict = {}
    for r in ds.map_batches(_partials, batch_format="pyarrow").take_all():
        g = r["grp"]
        if g in stats:
            n, mn, mx = stats[g]
            stats[g] = (n + r["n"], min(mn, r["mn"]), max(mx, r["mx"]))
        else:
            stats[g] = (r["n"], r["mn"], r["mx"])
    return stats


def _grouped_count_pass(
    ds: Dataset, key: str, col: str, pivots_by_group: dict
) -> dict:
    """(n_lt, n_le) per (group, pivot) for EVERY group at once — the
    whole point of the grouped quickselect: #groups never multiplies
    the number of corpus passes. Per block: rows are grouped with one
    mergesort, each present group's slice is sorted and searchsorted
    against THAT group's pivot grid; partials flow into one
    (groups x pivots)-sized keyed aggregation."""
    piv_items = sorted(
        (g, np.asarray(p, np.float64)) for g, p in pivots_by_group.items()
    )
    piv_map = {g: p for g, p in piv_items}

    def _partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(key)))
        k = t.column(key).to_numpy(zero_copy_only=False)
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        k, x = k[ok], x[ok]
        grps, idxs, lts, les = [], [], [], []
        if len(k):
            order = np.argsort(k, kind="mergesort")
            ks, xs = k[order], x[order]
            new = np.empty(len(ks), np.bool_)
            new[0] = True
            new[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(ks))
            for s, e in zip(starts, ends):
                g = str(ks[s])
                piv = piv_map.get(g)
                if piv is None:
                    continue
                vs = np.sort(xs[s:e])
                grps.append(np.full(len(piv), g, object))
                idxs.append(np.arange(len(piv), dtype=np.int64))
                lts.append(np.searchsorted(vs, piv, side="left"))
                les.append(np.searchsorted(vs, piv, side="right"))
        if not grps:
            return pa.table(
                {
                    "grp": pa.array([], pa.string()),
                    "piv_idx": pa.array([], pa.int64()),
                    "n_lt": pa.array([], pa.int64()),
                    "n_le": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "grp": pa.array(
                    np.concatenate(grps).tolist(), pa.string()
                ),
                "piv_idx": pa.array(np.concatenate(idxs), pa.int64()),
                "n_lt": pa.array(
                    np.concatenate(lts).astype(np.int64), pa.int64()
                ),
                "n_le": pa.array(
                    np.concatenate(les).astype(np.int64), pa.int64()
                ),
            }
        )

    out: dict = {
        g: (
            np.zeros(len(p), np.int64),
            np.zeros(len(p), np.int64),
        )
        for g, p in piv_map.items()
    }
    agg = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["grp", "piv_idx"], num_partitions=2)
        .aggregate(
            Sum("n_lt", alias_name="n_lt"), Sum("n_le", alias_name="n_le")
        )
        .take_all()
    )
    for r in agg:
        lt, le = out[r["grp"]]
        lt[r["piv_idx"]] = r["n_lt"]
        le[r["piv_idx"]] = r["n_le"]
    return out


def grouped_distributed_quantiles(
    ds: Dataset,
    key: str,
    col: str,
    qs: list[float],
    *,
    pull_cap: int = DEFAULT_PULL_CAP,
    max_rounds: int = MAX_ROUNDS,
) -> pa.Table:
    """Exact ``quantile_disc`` per GROUP for every q, with all groups
    advancing through SHARED counting passes — total corpus passes stay
    O(log_32(n / pull_cap)) no matter how many groups there are (q68's
    per-key loop pays #keys x that; its docstring tells unbounded key
    spaces to bucket — this is the primitive that makes a bounded key
    set free). Driver state is O(groups x qs x pivots); group keys are
    stringified (the callers' keys are categorical strings). Returns a
    (group, q, value) table sorted by (group, q); NULL values are
    ignored per group, matching DuckDB."""
    # shared counting passes consume ds O(log32 n) times — pin once
    # (see distributed_quantiles; narrow input, store spills if needed)
    ds = ds.materialize()
    stats = _grouped_stats_pass(ds, key, col)
    if not stats:
        return pa.table(
            {
                "grp": pa.array([], pa.string()),
                "q": pa.array([], pa.float64()),
                "value": pa.array([], pa.float64()),
            }
        )
    targets = {
        (g, float(q)): max(1, math.ceil(q * stats[g][0]))
        for g in stats
        for q in qs
    }
    resolved: dict = {}
    brackets: dict = {
        gq: (-math.inf, math.inf, 0, stats[gq[0]][0]) for gq in targets
    }

    for _ in range(max_rounds):
        active = {gq: b for gq, b in brackets.items() if gq not in resolved}
        if not active:
            break
        # exact pull: ONE filter pass serves every small bracket
        pulls = {
            gq: b for gq, b in active.items() if b[3] <= pull_cap
        }
        if pulls:
            ranges = {}
            for (g, q), (blo, bhi, _nb, _ni) in pulls.items():
                lo, hi = ranges.get(g, (math.inf, -math.inf))
                ranges[g] = (min(lo, blo), max(hi, bhi))

            def _in_ranges(t: pa.Table, _r=dict(ranges)) -> pa.Table:
                t = t.filter(pc.is_valid(t.column(key)))
                k = t.column(key).to_numpy(zero_copy_only=False)
                x = (
                    t.column(col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                )
                # vectorized per GROUP (bounded), never per row
                ks = k.astype(str) if k.dtype.kind != "U" else k
                keep = np.zeros(len(k), np.bool_)
                for g, (lo, hi) in _r.items():
                    keep |= (ks == g) & (x > lo) & (x < hi)
                return pa.table(
                    {
                        "grp": pa.array(
                            [str(g) for g in k[keep]], pa.string()
                        ),
                        "value": pa.array(x[keep], pa.float64()),
                    }
                )

            pulled: dict = {}
            for r in ds.map_batches(
                _in_ranges, batch_format="pyarrow"
            ).take_all():
                pulled.setdefault(r["grp"], []).append(r["value"])
            for (g, q), (blo, bhi, n_below, _ni) in pulls.items():
                vals = np.sort(
                    [v for v in pulled.get(g, []) if blo < v < bhi]
                )
                idx = targets[(g, q)] - n_below - 1
                if not (0 <= idx < len(vals)):
                    raise RuntimeError(
                        "grouped_distributed_quantiles: bracket invariant "
                        f"broken (g={g}, q={q}, pulled={len(vals)})"
                    )
                resolved[(g, q)] = float(vals[idx])
                del active[(g, q)]
        if not active:
            continue
        # one shared counting pass over every group's pivot union
        piv_by_group: dict = {}
        for (g, q), (blo, bhi, _nb, _ni) in active.items():
            glo = stats[g][1] if blo == -math.inf else blo
            ghi = stats[g][2] if bhi == math.inf else bhi
            grid = np.linspace(glo, ghi, PIVOTS_PER_BRACKET + 2)
            piv_by_group.setdefault(g, set()).update(
                float(p) for p in grid
            )
        piv_by_group = {
            g: np.array(sorted(s), np.float64)
            for g, s in piv_by_group.items()
        }
        counts = _grouped_count_pass(ds, key, col, piv_by_group)
        for (g, q), (blo, bhi, _nb, _ni) in active.items():
            k = targets[(g, q)]
            pivots = piv_by_group[g]
            n_lt, n_le = counts[g]
            hit = np.where((n_lt < k) & (k <= n_le))[0]
            if len(hit):
                resolved[(g, q)] = float(pivots[hit[0]])
                continue
            i = int(np.searchsorted(n_le, k, side="left")) - 1
            new_lo = float(pivots[i]) if i >= 0 else blo
            new_below = int(n_le[i]) if i >= 0 else 0
            j = int(np.searchsorted(n_lt, k, side="left"))
            new_hi = float(pivots[j]) if j < len(pivots) else bhi
            hi_lt = int(n_lt[j]) if j < len(pivots) else stats[g][0]
            brackets[(g, q)] = (new_lo, new_hi, new_below, hi_lt - new_below)
    else:
        missing = [gq for gq in targets if gq not in resolved]
        raise RuntimeError(
            f"grouped_distributed_quantiles: {missing} did not resolve "
            f"in {max_rounds} rounds"
        )

    order = sorted(resolved)
    return pa.table(
        {
            "grp": pa.array([g for g, _ in order], pa.string()),
            "q": pa.array([q for _, q in order], pa.float64()),
            "value": pa.array([resolved[gq] for gq in order], pa.float64()),
        }
    )
