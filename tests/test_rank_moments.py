"""q80 (range-bucketed global ranking) and q81 (exact fixed-point
moments): partitioning invariance and exactness contracts."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_global_rank_is_a_permutation_and_matches_local_sort(ray_session):
    from barks_ocr_ray.pipelines.queries import q80_global_rank

    df = q80_global_rank(SF).to_pandas()
    n = len(df)
    assert sorted(df["global_rank"]) == list(range(1, n + 1))
    # the rank order must equal the single-process sort order
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    from barks_ocr_ray.functions.relational import round_like_duckdb

    cents = round_like_duckdb(
        t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0, 0
    ).astype(np.int64)
    keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((keys, -cents))
    expected = {int(keys[pos]): r + 1 for r, pos in enumerate(order)}
    got = dict(zip(df["o_orderkey"], df["global_rank"]))
    assert got == expected


def test_corr_moments_exact_vs_numpy(ray_session):
    from barks_ocr_ray.functions.relational import round_like_duckdb
    from barks_ocr_ray.pipelines.queries import q81_corr_moments

    out = q81_corr_moments(SF).to_pandas()
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
    d = round_like_duckdb(
        t.column("l_extendedprice").to_numpy(zero_copy_only=False), 0
    ).astype(np.int64)
    # exact big-int moments, then the same one-shot float expression
    n = len(q)
    sx, sy = int(q.sum()), int(d.sum())
    sxx = int((q.astype(object) * q.astype(object)).sum())
    syy = int((d.astype(object) * d.astype(object)).sum())
    sxy = int((q.astype(object) * d.astype(object)).sum())
    num = n * sxy - sx * sy
    corr = float(num) / float(np.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy)))
    assert out["n"][0] == n
    assert out["corr_qty_dollars"][0] == float(round_like_duckdb(np.array([corr]), 9)[0])
    # sanity: a real correlation in [-1, 1] (the synthetic corpus draws
    # quantity and price independently, so it sits near 0)
    assert -1.0 <= out["corr_qty_dollars"][0] <= 1.0
