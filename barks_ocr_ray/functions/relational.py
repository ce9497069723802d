"""Relational operators over Ray Datasets: vectorized filters/projections,
grouped aggregates with pre-aggregation, broadcast joins, anti-joins,
top-k — the engine's answer to the reference's joins/aggregations
inventory (SURVEY.md §2.4-§2.7).

Design rules applied throughout:
* prune columns at the read (callers pass ``columns=[...]``),
* vectorized pyarrow.compute kernels inside ``map_batches`` (never
  per-row Python in hot paths),
* broadcast small sides with ``ray.put`` + per-batch lookup instead of a
  shuffle join (J7/J8 analog, /root/reference/src/barks_ocr/pipeline/entity_store.py:69-88),
* exact dedup = hash partition + vectorized per-block first (D1 analog,
  /root/reference/src/barks_ocr/tools/ocr_check.py:521-538).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset


def round_like_duckdb(x: np.ndarray, nd: int) -> np.ndarray:
    """Bit-exact replica of DuckDB's round(): std::round(x * 10^n) / 10^n
    with C round = half away from zero. Implemented without the naive
    ``+0.5`` (which mis-rounds values one ulp below a half boundary):
    the fractional part of |scaled| is compared to 0.5 exactly."""
    p = 10.0 ** nd
    scaled = np.asarray(x, dtype=np.float64) * p
    a = np.abs(scaled)
    fa = np.floor(a)
    r = fa + (a - fa >= 0.5)
    return np.copysign(r, scaled) / p


#: read-task cap kicks in only below this row count; above it Ray's own
#: target-block-size splitting never produces empty blocks
_SMALL_READ_ROWS = 4096


def _footer_read_kwargs(
    path: str, columns: list[str] | None
) -> dict:
    """Read-planning hints from ONE driver-side footer read (no data
    scanned):

    * ``schema``: the file schema with pandas metadata stripped (pruned
      to ``columns``). pandas-written parquet carries b'pandas' metadata
      that makes pa.Schema unhashable, so the read operator's own
      SplitBlocks stage logs 'Failed to hash the schemas' per block and
      loses schema dedup; a clean schema at the scanner fixes it at the
      source (strip_schema_metadata still guards non-read paths).
    * ``override_num_blocks`` for small files: Ray splits a parquet read
      into ~2x-CPU output blocks regardless of row count, so a file with
      fewer rows than blocks yields EMPTY blocks — and every
      ``map_batches`` over an empty block emits a schema-less
      ``pa.table({})`` (the UDF is never invoked), which trips the
      executor's RefBundle schema check and is the failure class behind
      round-1's join crashes. Capping tasks at the row count keeps every
      block non-empty while preserving up-to-row-count parallelism;
      files above _SMALL_READ_ROWS rows are left to Ray's size-based
      splitting, so the cap is a no-op at real scale."""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
    except (OSError, pa.ArrowInvalid):
        return {}  # directory / remote layout: let Ray plan it
    schema = f.schema_arrow.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    kwargs: dict = {"schema": schema}
    n = f.metadata.num_rows
    if n < _SMALL_READ_ROWS:
        kwargs["override_num_blocks"] = max(1, min(n, 64))
    return kwargs


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    predicate=None,
) -> Dataset:
    """Column-pruned (and, with ``predicate`` — a ``pyarrow.dataset``
    expression — row-group-pruned) parquet read: the filter is pushed to
    the pyarrow scanner so skipped row groups never leave storage."""
    from barks_ocr_ray.context import configure

    configure()
    path = f"{sf_dir}/{name}.parquet"
    kwargs = _footer_read_kwargs(path, columns)
    if predicate is not None:
        kwargs["filter"] = predicate  # lands in **arrow_parquet_args
    return rd.read_parquet(
        path, columns=columns, **kwargs
    ).map_batches(strip_schema_metadata, batch_format="pyarrow")


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). Pandas-written parquet
    carries b'pandas' metadata whose presence makes pa.Schema UNhashable,
    which silently defeats Ray's shuffle schema deduplication on every
    block ('Failed to hash the schemas' warnings from every
    HashShuffleAggregator); fused into the read, this costs nothing."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def round_columns(ds: Dataset, spec: dict[str, int]) -> Dataset:
    """Round float columns to DuckDB-bit-identical doubles (stabilizes
    the driver's value-hash comparison vs the SQL oracle)."""

    def _round(t: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            idx = t.schema.get_field_index(col)
            vals = round_like_duckdb(
                t.column(col).to_numpy(zero_copy_only=False), nd
            )
            t = t.set_column(idx, col, pa.array(vals, pa.float64()))
        return t

    return ds.map_batches(_round, batch_format="pyarrow")


def broadcast_lookup_column(
    ds: Dataset,
    lookup: dict,
    key_col: str,
    out_col: str,
    out_type: pa.DataType | None = None,
    drop_missing: bool = True,
) -> Dataset:
    """Broadcast hash join: the small side is ``ray.put`` ONCE as a pair
    of Arrow arrays and read inside each task (not re-shipped per batch);
    the mapping is applied per batch as a vectorized ``pc.index_in`` +
    ``take`` (Arrow dictionary lookup — no per-row Python)."""
    keys_arr = pa.array(list(lookup.keys()))
    vals_arr = pa.array(list(lookup.values()), out_type)
    ref = ray.put((keys_arr, vals_arr))

    def _join(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        idx = pc.index_in(t.column(key_col), value_set=ks)
        arr = vs.take(idx)  # null index -> null value
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = t.append_column(out_col, arr)
        if drop_missing:
            t = t.filter(pc.is_valid(t.column(out_col)))
        return t

    return ds.map_batches(_join, batch_format="pyarrow")


def broadcast_semi_join(
    ds: Dataset, keys: set, key_col: str, anti: bool = False
) -> Dataset:
    """Semi/anti join via a broadcast key set (J8/J9 analog), applied per
    batch as one vectorized ``pc.is_in`` over the broadcast Arrow array."""
    ref = ray.put(pa.array(sorted(keys)))

    def _filter(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(t.column(key_col), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def compact_nonempty(
    ds: Dataset, num_partitions: int = 8
) -> tuple[Dataset, int]:
    """Merge a dataset's blocks so EVERY block is non-empty, returning
    (dataset, row_count).

    Ray 2.49 workaround (measured, see tests/test_dedup_family.py): a
    hash-shuffle/join input marks its schema as broadcast on the FIRST
    shipped block, but an empty first block short-circuits before the
    broadcast — aggregator partitions that receive no rows then have no
    schema, and ``Dataset.join`` dies with ``No match ... FieldRef`` in
    finalize. Sparse map stages (filters, per-group pair emitters) produce
    empty blocks routinely, so every join input that is not provably
    dense is compacted first: materialize (small tables only — candidate
    pairs, label tables), then one key-less repartition to
    ``min(num_partitions, n_rows)`` blocks so each carries >=1 row."""
    mat = ds.materialize()
    n = mat.count()
    if n == 0:
        return mat, 0
    parts = max(1, min(num_partitions, n))
    return mat.repartition(parts).materialize(), n


def exact_dedup(
    ds: Dataset,
    key_col: str,
    *,
    tie_break_col: str | None = None,
    num_partitions: int = 16,
) -> Dataset:
    """One row per ``key_col`` (winner = min ``tie_break_col``): hash
    partition on the key + vectorized per-block first — no per-group
    Python, one exchange (the engine's D1 template)."""
    sort_keys = [(key_col, "ascending")]
    if tie_break_col:
        sort_keys.append((tie_break_col, "ascending"))

    def _first_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        idx = pc.sort_indices(
            t.select([k for k, _ in sort_keys]), sort_keys=sort_keys
        )
        t = t.take(idx)
        keys = t.column(key_col).combine_chunks()
        neq = pc.not_equal(keys.slice(1), keys.slice(0, len(keys) - 1))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        mask = pa.concat_arrays([pa.array([True]), neq])
        return t.filter(mask)

    ds = ds.repartition(num_partitions, keys=[key_col])
    return ds.map_batches(_first_per_key, batch_format="pyarrow", batch_size=None)


def grouped_topk(
    ds: Dataset,
    group_col: str,
    order_col: str,
    k: int,
    *,
    tie_col: str,
    rank_col: str = "rank",
    num_partitions: int = 16,
) -> Dataset:
    """Top-k rows per group (O7/O9 analog) without a global sort: hash
    partition on the group key, then a vectorized per-block
    sort + rank + filter (all groups are co-located per block)."""

    def _topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(rank_col, pa.array([], pa.int64()))
        idx = pc.sort_indices(
            t.select([group_col, order_col, tie_col]),
            sort_keys=[
                (group_col, "ascending"),
                (order_col, "descending"),
                (tie_col, "ascending"),
            ],
        )
        t = t.take(idx)
        # vectorized rank within group: run boundaries over the sorted
        # key, then index minus last-boundary index (no per-row Python)
        n = t.num_rows
        keys = t.column(group_col).combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(keys.slice(1), keys.slice(0, n - 1)), True
        )
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        is_start = np.concatenate(
            ([True], neq.to_numpy(zero_copy_only=False).astype(bool))
        )
        idx = np.arange(n, dtype=np.int64)
        start_idx = np.maximum.accumulate(np.where(is_start, idx, 0))
        ranks = idx - start_idx + 1
        t = t.append_column(rank_col, pa.array(ranks, pa.int64()))
        return t.filter(pc.less_equal(t.column(rank_col), pa.scalar(k)))

    ds = ds.repartition(num_partitions, keys=[group_col])
    return ds.map_batches(_topk, batch_format="pyarrow", batch_size=None)


def salted_count(
    ds: Dataset,
    key_col: str,
    *,
    n_salts: int = 16,
    num_partitions: int = 16,
) -> Dataset:
    """Grouped count that survives HOT KEYS: phase 1 aggregates on
    (key, salt) — salt derived from a row hash, spreading each hot key
    over ``n_salts`` reducers — phase 2 sums the per-salt partials with
    one tiny exchange keyed on the original key. The canonical
    skew-salting pattern: no single reducer ever receives more than
    ~1/n_salts of a hot key's rows. Output: (key_col, n)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    def _salt(t: pa.Table) -> pa.Table:
        # round-robin salt per block: a hot key's rows within any block
        # spread evenly over all n_salts reducers, fully vectorized —
        # the salt value itself never surfaces (summed out in phase 2)
        salts = np.arange(t.num_rows, dtype=np.int64) % n_salts
        return pa.table(
            {
                key_col: t.column(key_col),
                "salt": pa.array(salts, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(_salt, batch_format="pyarrow")
        .groupby([key_col, "salt"])
        .aggregate(_Count(alias_name="n_part"))
    )
    return (
        partials.groupby(key_col)
        .aggregate(_Sum("n_part", alias_name="n"))
    )


def salted_join(
    left: Dataset,
    right: Dataset,
    *,
    on: tuple,
    right_on: tuple | None = None,
    n_salts: int = 8,
    num_partitions: int = 16,
) -> Dataset:
    """Inner hash join that survives a HOT join key on the (large) left
    side: the dimension-sized right side is replicated once per salt,
    left rows take a vectorized round-robin salt, and the exchange runs
    on (key..., salt) — so no join partition ever receives more than
    ~1/n_salts of a hot key's left rows. The result is EXACTLY the
    plain inner join: each left row meets its key's full right side in
    exactly one salt replica. Cost: the right side ships n_salts times
    — appropriate for dimension tables (the classic skew-join tradeoff;
    for two large skewed sides, salt only the hot keys instead).
    Output drops the internal salt column."""
    r_on = right_on if right_on is not None else on

    def _salt_left(t: pa.Table) -> pa.Table:
        salts = np.arange(t.num_rows, dtype=np.int64) % n_salts
        return t.append_column("salt", pa.array(salts, pa.int64()))

    def _replicate_right(t: pa.Table) -> pa.Table:
        reps = []
        for s in range(n_salts):
            reps.append(
                t.append_column(
                    "salt", pa.array(np.full(t.num_rows, s, np.int64))
                )
            )
        return pa.concat_tables(reps)

    from barks_ocr_ray.context import hash_partitions

    joined = left.map_batches(_salt_left, batch_format="pyarrow").join(
        right.map_batches(_replicate_right, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=hash_partitions(num_partitions),
        on=(*on, "salt"),
        right_on=(*r_on, "salt"),
    )
    return joined.drop_columns(["salt"])


def melt(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "metric",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
) -> Dataset:
    """UNPIVOT/melt: reshape wide metric columns into long
    (id..., metric, value) rows — the normalization step feeding
    long-format aggregates (the inverse of the q77 pivot). Pure
    block-local reshape: per block, one zero-copy column select + a
    constant metric column per value col, concatenated — no exchange,
    output streams at len(value_cols) x input rows."""
    vt = value_type or pa.float64()

    def _melt(t: pa.Table) -> pa.Table:
        parts = []
        for col in value_cols:
            parts.append(
                pa.table(
                    {
                        **{c: t.column(c) for c in id_cols},
                        var_name: pa.array([col] * t.num_rows, pa.string()),
                        value_name: t.column(col).cast(vt),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.select_columns(id_cols + value_cols).map_batches(
        _melt, batch_format="pyarrow"
    )
