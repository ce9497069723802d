"""Session-9 batch-3 operator tests: date-spine trailing average
(q155), inter-event gap quantiles (q156), RFM segmentation (q157),
dup-cluster size histogram (q158)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / fname))
    return str(d)


class TestDailyTrailingAverage:
    def test_gap_days_zero_filled(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q155,
            q155_daily_trailing_average,
        )

        DAY = 86_400_000_000
        # events on days 0, 1, 4 (days 2-3 silent), several on day 4
        us = np.array([0, 1, 4, 4, 4], np.int64) * DAY + 123
        t = pa.table(
            {"ts": pa.array(us + 1_700_000_000_000_000, pa.timestamp("us"))}
        )
        d = _write(tmp_path, "sf_days", t, "events.parquet")
        got = q155_daily_trailing_average(d).to_pandas()
        assert len(got) == 5  # dense spine incl. the two silent days
        assert list(got["n"]) == [1, 1, 0, 0, 3]
        con = duckdb.connect()
        con.register("events", t)
        exp = con.execute(SQL_Q155 + " ORDER BY day").fetch_df()
        assert list(got["avg7"]) == list(exp["avg7"])


class TestGapQuantiles:
    def test_single_event_users_produce_no_gap(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q156,
            q156_gap_quantiles,
        )

        rng = np.random.default_rng(4)
        n = 600
        t = pa.table(
            {
                "user_id": pa.array(
                    np.concatenate(
                        [rng.integers(0, 40, n - 50), np.arange(1000, 1050)]
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "ts": pa.array(
                    rng.integers(0, 10**9, n) * 1_000_000, pa.timestamp("us")
                ),
                "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_gaps", t, "events.parquet")
        got = q156_gap_quantiles(d).to_pydict()
        con = duckdb.connect()
        con.register("events", t)
        exp = con.execute(SQL_Q156).fetch_df()
        assert got["gap_s"] == list(exp["gap_s"])


class TestRfmSegments:
    def test_matches_duckdb_on_fresh_orders(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q157, q157_rfm_segments

        rng = np.random.default_rng(8)
        n = 4_000
        t = pa.table(
            {
                "o_custkey": pa.array(
                    rng.integers(1, 400, n).astype(np.int64), pa.int64()
                ),
                "o_orderdate": pa.array(
                    rng.integers(0, 400, n).astype(np.int64)
                    * 86_400_000_000
                    + 1_500_000_000_000_000,
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array(
                    np.round(rng.gamma(3, 1000, n), 2), pa.float64()
                ),
            }
        )
        d = _write(tmp_path, "sf_rfm", t, "orders.parquet")
        got = (
            q157_rfm_segments(d)
            .to_pandas()
            .sort_values("o_custkey")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("orders", t)
        exp = con.execute(SQL_Q157 + " ORDER BY o_custkey").fetch_df()
        for col in ("o_custkey", "r_score", "f_score", "m_score", "rfm"):
            assert list(got[col]) == list(exp[col]), col
        # every score is a quartile code
        assert got[["r_score", "f_score", "m_score"]].isin([1, 2, 3, 4]).all().all()


class TestDupClusterSizes:
    def test_histogram_and_null_text(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q158_dup_cluster_sizes

        texts = (["same"] * 3) + (["other"] * 2) + ["solo", None, None]
        t = pa.table({"text": pa.array(texts, pa.string())})
        d = _write(tmp_path, "sf_clusters", t, "documents.parquet")
        got = (
            q158_dup_cluster_sizes(d)
            .to_pandas()
            .sort_values("sz")
            .reset_index(drop=True)
        )
        # clusters: size 3 ("same"), size 2 ("other"), size 1 ("solo");
        # nulls form no cluster
        assert list(got["sz"]) == [1, 2, 3]
        assert list(got["n_clusters"]) == [1, 1, 1]
