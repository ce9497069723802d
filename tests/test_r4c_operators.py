"""Session-9 batch-2 operator tests: grouped heavy terms (q150),
ordered funnel (q151), ROLLUP (q152), A-ES weighted sampling (q153),
exact grouped correlation (q154) — pinning the ordering/level/edge
semantics the fixed-corpus sweep can't isolate."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname="documents.parquet"):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / fname))
    return str(d)


class TestFunnelOrdering:
    def test_strict_step_ordering(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q151_funnel_steps

        us = [1, 1, 1, 2, 2, 2, 3, 3]
        ts = [1, 2, 3, 1, 2, 3, 1, 2]
        et = [
            "view", "click", "purchase",        # full funnel
            "purchase", "view", "click",        # purchase BEFORE click: 2 steps
            "click", "view",                    # click before view: 1 step
        ]
        t = pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "ts": pa.array(
                    np.array(ts, np.int64) * 1_000_000, pa.timestamp("us")
                ),
                "event_type": pa.array(et, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_funnel", t, "events.parquet")
        got = q151_funnel_steps(d).to_pydict()
        assert got["n_users"] == [3, 2, 1]

    def test_same_instant_does_not_convert(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q151_funnel_steps

        t = pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "ts": pa.array(
                    np.array([5, 5], np.int64) * 1_000_000,
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["view", "click"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_funnel2", t, "events.parquet")
        got = q151_funnel_steps(d).to_pydict()
        # click at the SAME ts as the view is not strictly after it
        assert got["n_users"] == [1, 0, 0]


class TestRollup:
    def test_matches_duckdb_rollup(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q152_rollup_quantity

        rng = np.random.default_rng(5)
        n = 3_000
        t = pa.table(
            {
                "l_returnflag": pa.array(
                    rng.choice(["A", "N", "R"], size=n).tolist(), pa.string()
                ),
                "l_linestatus": pa.array(
                    rng.choice(["O", "F"], size=n).tolist(), pa.string()
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, size=n).astype(np.float64),
                    pa.float64(),
                ),
            }
        )
        d = _write(tmp_path, "sf_rollup", t, "lineitem.parquet")
        got = q152_rollup_quantity(d).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", t)
        exp = con.execute(
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem "
            "GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ).fetch_df()
        key = ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
        g = {tuple(r) for r in got[key].fillna("~").itertuples(index=False)}
        e = {tuple(r) for r in exp[key].fillna("~").itertuples(index=False)}
        assert g == e
        assert len(got) == 3 * 2 + 3 + 1


class TestWeightedSample:
    def test_matches_sql_on_fresh_corpus(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q153, q153_weighted_sample

        rng = np.random.default_rng(9)
        t = pa.table(
            {
                "doc_id": pa.array(
                    rng.permutation(5_000).astype(np.int64), pa.int64()
                ),
                "n_chars": pa.array(
                    rng.integers(1, 3_000, size=5_000).astype(np.int64),
                    pa.int64(),
                ),
            }
        )
        d = _write(tmp_path, "sf_wsample", t)
        got = q153_weighted_sample(d).to_pydict()
        con = duckdb.connect()
        con.register("documents", t)
        exp = con.execute(SQL_Q153).fetch_df()
        assert got["doc_id"] == list(exp["doc_id"])
        assert got["priority"] == list(exp["priority"])


class TestGroupedCorrelation:
    def test_zero_variance_group_dropped(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q154,
            q154_grouped_correlation,
        )

        rng = np.random.default_rng(2)
        n = 2_000
        base = rng.integers(0, 10**9, size=n) * 3_600  # second-resolution
        t = pa.table(
            {
                "event_type": pa.array(
                    (["flat"] * (n // 2)) + (["vary"] * (n // 2)), pa.string()
                ),
                "ts": pa.array(
                    (base * 1_000_000).astype(np.int64), pa.timestamp("us")
                ),
                "value": pa.array(
                    np.concatenate(
                        [np.full(n // 2, 7.25), rng.gamma(2, 30, n // 2)]
                    ),
                    pa.float64(),
                ),
            }
        )
        d = _write(tmp_path, "sf_corr", t, "events.parquet")
        got = q154_grouped_correlation(d).to_pydict()
        assert got["event_type"] == ["vary"]  # flat has zero x-variance
        con = duckdb.connect()
        con.register("events", t)
        exp = con.execute(SQL_Q154).fetch_df()
        assert got["corr"] == list(exp["corr"])


class TestGroupedHeavyTerms:
    def test_tie_break_and_null_text(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q150_grouped_heavy_terms

        t = pa.table(
            {
                "lang": pa.array(["en", "en", "de"], pa.string()),
                "text": pa.array(
                    ["bb aa bb aa cc", None, "zz yy zz"], pa.string()
                ),
            }
        )
        d = _write(tmp_path, "sf_terms", t)
        got = (
            q150_grouped_heavy_terms(d)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        en = got[got.lang == "en"]
        # equal counts rank alphabetically: aa before bb
        assert list(en.word) == ["aa", "bb", "cc"]
        assert list(en["n"]) == [2, 2, 1]
        assert list(got[got.lang == "de"].word) == ["zz", "yy"]
