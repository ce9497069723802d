"""Session-18 operator tests: time-weighted average value (q269),
degree assortativity (q270), negative-sampling table (q271), exact
grouped Kendall tau-b (q272)."""

import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / fname))
    return str(d)


_BASE = datetime.datetime(2024, 1, 1)


def _events(rows):
    """rows: (event_id, user_id, seconds_offset, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_BASE + datetime.timedelta(seconds=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )


class TestTimeWeightedValue:
    def test_hand_step_integral(self, ray_session, tmp_path):
        """User 1 holds 100.00 for 10 s then 200.00 for 30 s: TWAP =
        (100*10 + 200*30) / 40 = 175 — NOT the arithmetic mean 150.
        The final event's value is never held. Single-event user 2 and
        zero-span user 3 are excluded."""
        from barks_ocr_ray.pipelines.queries import q269_time_weighted_value

        rows = [
            (0, 1, 0, 100.0),
            (1, 1, 10, 200.0),
            (2, 1, 40, 999.0),  # last value never held
            (3, 2, 5, 50.0),    # single event: excluded
            (4, 3, 7, 10.0),    # same-ts pair: span 0, excluded
            (5, 3, 7, 20.0),
        ]
        d = _write(tmp_path, "sf_twap", _events(rows), "events.parquet")
        got = (
            q269_time_weighted_value(d)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got.user_id.tolist() == [1]
        assert got.n_events.tolist() == [3]
        assert got.span_ms.tolist() == [40_000]
        assert got.twap_micro.tolist() == [175_000_000]

    def test_same_ms_tie_matches_oracle(self, ray_session, tmp_path):
        """Two events in the same millisecond: the (ms, event_id) total
        order decides which value is held to the next distinct ms —
        engine and oracle must agree on the tie."""
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q269,
            q269_time_weighted_value,
        )

        rows = [
            (7, 1, 0, 10.0),   # tie at t=0, higher event_id
            (3, 1, 0, 30.0),   # tie at t=0, lower event_id: held first (dt=0)
            (9, 1, 4, 50.0),
        ]
        ev = _events(rows)
        d = _write(tmp_path, "sf_twap_tie", ev, "events.parquet")
        got = q269_time_weighted_value(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q269).fetch_df()
        assert got.twap_micro.tolist() == exp.twap_micro.tolist()
        # value 10.0 (event_id 7) is the one held across the 4 s gap
        assert got.twap_micro.tolist() == [10_000_000]

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q269,
            q269_time_weighted_value,
        )

        got = (
            q269_time_weighted_value("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')"
        )
        exp = con.execute(SQL_Q269 + " ORDER BY user_id").fetch_df()
        assert got.user_id.tolist() == exp.user_id.tolist()
        assert got.twap_micro.tolist() == exp.twap_micro.tolist()
        assert got.span_ms.tolist() == exp.span_ms.tolist()


def _trade(pairs):
    """Minimal lineitem+orders realizing the given (cust, supp) edges."""
    li = pa.table(
        {
            "l_orderkey": pa.array(range(len(pairs)), pa.int64()),
            "l_suppkey": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    od = pa.table(
        {
            "o_orderkey": pa.array(range(len(pairs)), pa.int64()),
            "o_custkey": pa.array([p[0] for p in pairs], pa.int64()),
        }
    )
    return li, od


class TestDegreeAssortativity:
    def test_hand_disassortative(self, ray_session, tmp_path):
        """A hub customer trading with three pendant suppliers plus a
        pendant customer on one of them: high-degree endpoints pair
        with low-degree ones, so r < 0; counts are exact."""
        from barks_ocr_ray.pipelines.queries import q270_degree_assortativity

        pairs = [(1, 10), (1, 11), (1, 12), (2, 12), (2, 12)]  # dup edge
        li, od = _trade(pairs)
        d = tmp_path / "sf_assort"
        d.mkdir()
        pq.write_table(li, str(d / "lineitem.parquet"))
        pq.write_table(od, str(d / "orders.parquet"))
        got = q270_degree_assortativity(str(d)).to_pandas()
        assert got.n_edges.tolist() == [4]  # dup (2,12) collapsed
        assert got.n_cust.tolist() == [2]
        assert got.n_supp.tolist() == [3]
        # exact Pearson over edges: dc=(3,3,3,1), ds=(1,1,2,2)
        dc = np.array([3, 3, 3, 1])
        ds = np.array([1, 1, 2, 2])
        m = 4
        num = m * (dc * ds).sum() - dc.sum() * ds.sum()
        den = np.sqrt(
            float(m * (dc * dc).sum() - dc.sum() ** 2)
            * float(m * (ds * ds).sum() - ds.sum() ** 2)
        )
        exp = round(1e6 * num / den)
        assert got.r_micro.tolist() == [exp]
        assert got.r_micro.tolist()[0] < 0

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q270,
            q270_degree_assortativity,
        )

        got = q270_degree_assortativity("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            )
        exp = con.execute(SQL_Q270).fetch_df()
        for c in ("n_edges", "n_cust", "n_supp", "r_micro"):
            assert got[c].tolist() == exp[c].tolist(), c


class TestNegativeSampling:
    def test_weights_and_draw_conservation(self, ray_session, tmp_path):
        """Two-term corpus: weights are round(1e6 * cnt^0.75), every one
        of the Q271_DRAWS draws lands on some term (conservation), and
        the common term dominates but the rare one still appears (the
        0.75 smoothing's whole point)."""
        from barks_ocr_ray.pipelines.queries import (
            Q271_DRAWS,
            q271_negative_sampling,
        )

        texts = ["aardvark " * 81 + "zyzzyva"] * 2  # cnt: aardvark 162, z 2
        docs = pa.table(
            {
                "doc_id": pa.array(range(2), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s0", "s1"], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_neg", docs, "documents.parquet")
        got = (
            q271_negative_sampling(d)
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        assert got.term.tolist() == ["aardvark", "zyzzyva"]
        assert got.weight.tolist() == [
            round(1e6 * 162**0.75),
            round(1e6 * 2**0.75),
        ]
        assert got.n_drawn.sum() == Q271_DRAWS
        a, z = got.n_drawn.tolist()
        assert a > z > 0  # smoothed, not starved

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q271,
            q271_negative_sampling,
        )

        got = (
            q271_negative_sampling("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        exp = (
            con.execute(_sql_q271())
            .fetch_df()
            .sort_values("term")
            .reset_index(drop=True)
        )
        assert got.term.tolist() == exp.term.tolist()
        assert got.weight.tolist() == exp.weight.tolist()
        assert got.n_drawn.tolist() == exp.n_drawn.tolist()


class TestKendallTau:
    def _li(self, rows):
        """rows: (flag, quantity, discount)."""
        return pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "l_quantity": pa.array(
                    [float(r[1]) for r in rows], pa.float64()
                ),
                "l_discount": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
            }
        )

    def test_perfect_and_tied_hand_cases(self, ray_session, tmp_path):
        """Flag A: perfectly concordant (tau = +1). Flag B: perfectly
        discordant (tau = -1). Flag C: one x-tie — tau-b's denominator
        corrects for it (3 pairs, 1 tied-x, C=2, D=0:
        tau = 2/sqrt((3-1)*3) ~ 0.8165)."""
        from barks_ocr_ray.pipelines.queries import q272_kendall_tau

        rows = (
            [("A", q, q) for q in (1, 2, 3)]
            + [("B", q, 4 - q) for q in (1, 2, 3)]
            + [("C", 1, 0.01), ("C", 1, 0.02), ("C", 2, 0.03)]
        )
        d = _write(tmp_path, "sf_tau", self._li(rows), "lineitem.parquet")
        got = (
            q272_kendall_tau(d)
            .to_pandas()
            .sort_values("flag")
            .reset_index(drop=True)
        )
        assert got.flag.tolist() == ["A", "B", "C"]
        assert got.n_concordant.tolist() == [3, 0, 2]
        assert got.n_discordant.tolist() == [0, 3, 0]
        assert got.tau_b_micro.tolist() == [
            1_000_000,
            -1_000_000,
            round(1e6 * 2 / np.sqrt(2.0 * 3.0)),
        ]

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import SQL_Q272, q272_kendall_tau

        got = (
            q272_kendall_tau("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("flag")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
        )
        exp = (
            con.execute(SQL_Q272 + " ORDER BY flag")
            .fetch_df()
            .reset_index(drop=True)
        )
        for c in (
            "flag",
            "n_rows",
            "n_concordant",
            "n_discordant",
            "tau_b_micro",
        ):
            assert got[c].tolist() == exp[c].tolist(), c


class TestAdamicAdar:
    def test_hand_weights_and_skew_guard(self, ray_session, tmp_path):
        """Custs 1:(A,B) deg2, 2:(A,B,C) deg3, 3:(A) deg1 (no pairs), and
        a hub cust over MAX_DEG that must contribute nothing. Pair (A,B)
        = w(2)+w(3) outranks (A,C)=(B,C)=w(3)."""
        from barks_ocr_ray.pipelines.queries import (
            Q273_MAX_DEG,
            q273_adamic_adar,
        )
        from barks_ocr_ray.functions.relational import round_like_duckdb

        A, B, C = 100, 101, 102
        pairs = [(1, A), (1, B), (2, A), (2, B), (2, C), (3, A)]
        pairs += [(9, 1000 + i) for i in range(Q273_MAX_DEG + 1)]  # hub
        li = pa.table(
            {
                "l_orderkey": pa.array(range(len(pairs)), pa.int64()),
                "l_suppkey": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
        od = pa.table(
            {
                "o_orderkey": pa.array(range(len(pairs)), pa.int64()),
                "o_custkey": pa.array([p[0] for p in pairs], pa.int64()),
            }
        )
        d = tmp_path / "sf_aa"
        d.mkdir()
        pq.write_table(li, str(d / "lineitem.parquet"))
        pq.write_table(od, str(d / "orders.parquet"))
        got = q273_adamic_adar(str(d)).to_pandas()
        w2 = round(float(round_like_duckdb(1e6 / np.log(2.0), 0)))
        w3 = round(float(round_like_duckdb(1e6 / np.log(3.0), 0)))
        assert list(zip(got.s1, got.s2)) == [(A, B), (A, C), (B, C)]
        assert got.aa_micro.tolist() == [w2 + w3, w3, w3]
        assert got.n_common.tolist() == [2, 1, 1]
        assert got["rank"].tolist() == [1, 2, 3]
        assert not any(s >= 1000 for s in got.s1.tolist() + got.s2.tolist())

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import SQL_Q273, q273_adamic_adar

        got = q273_adamic_adar("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
            )
        exp = con.execute(SQL_Q273).fetch_df()
        for c in ("rank", "s1", "s2", "n_common", "aa_micro"):
            assert got[c].tolist() == exp[c].tolist(), c


class TestParetoFrontier:
    def test_hand_frontier_with_ties(self, ray_session, tmp_path):
        """Coincident optima both survive; same-price smaller size and
        pricier same-size points are dominated."""
        from barks_ocr_ray.pipelines.queries import q274_pareto_frontier

        # (partkey, price, size)
        rows = [
            (1, 1.00, 5),  # frontier (tied with 2)
            (2, 1.00, 5),  # frontier (tie kept)
            (3, 1.00, 4),  # dominated by 1 (same price, bigger size)
            (4, 2.00, 6),  # frontier (bigger size than all cheaper)
            (5, 3.00, 6),  # dominated by 4 (cheaper, same size)
            (6, 0.50, 1),  # frontier (cheapest overall)
        ]
        part = pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_retailprice": pa.array(
                    [float(r[1]) for r in rows], pa.float64()
                ),
                "p_size": pa.array([r[2] for r in rows], pa.int32()),
            }
        )
        d = tmp_path / "sf_sky"
        d.mkdir()
        pq.write_table(part, str(d / "part.parquet"))
        got = (
            q274_pareto_frontier(str(d))
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        assert got.p_partkey.tolist() == [1, 2, 4, 6]

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q274,
            q274_pareto_frontier,
        )

        got = (
            q274_pareto_frontier("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW part AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/part.parquet')"
        )
        exp = (
            con.execute(SQL_Q274 + " ORDER BY p_partkey")
            .fetch_df()
            .reset_index(drop=True)
        )
        for c in ("p_partkey", "price_cents", "size"):
            assert got[c].tolist() == exp[c].tolist(), c


class TestDiffInDiff:
    def test_hand_effect_recovered(self, ray_session, tmp_path):
        """Pick one treated and one control user by replaying the arm
        hash, give both identical pre/post baselines except a +7.00
        lift on the treated user's post purchases: DiD = +7.00."""
        import hashlib

        from barks_ocr_ray.pipelines.queries import (
            Q275_SALT,
            SQL_Q275,
            q275_diff_in_diff,
        )

        def arm(u):
            h = int(
                hashlib.md5(f"{Q275_SALT}:{u}".encode()).hexdigest()[:8], 16
            )
            return "T" if h / float(1 << 32) < 0.5 else "C"

        t_user = next(u for u in range(100) if arm(u) == "T")
        c_user = next(u for u in range(100) if arm(u) == "C")
        rows = []  # (event_id, user, day, value)
        for i, u in enumerate((t_user, c_user)):
            rows.append((4 * i + 0, u, 5, 10.0))      # pre
            rows.append((4 * i + 1, u, 10, 20.0))     # pre
            post = 22.0 + (7.0 if u == t_user else 0.0)
            rows.append((4 * i + 2, u, 20, post))     # post
            rows.append((4 * i + 3, u, 25, post))     # post
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[2])
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(["purchase"] * len(rows), pa.string()),
                "value": pa.array([float(r[3]) for r in rows], pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_did", ev, "events.parquet")
        got = q275_diff_in_diff(d).to_pandas()
        assert got.did_micro.tolist() == [7_000_000]
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q275).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import SQL_Q275, q275_diff_in_diff

        got = q275_diff_in_diff("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')"
        )
        exp = con.execute(SQL_Q275).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestEmbeddingFrechetDrift:
    def _emb(self, rows):
        """rows: (vec_id, label, [floats])."""
        return pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[2] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[1] for r in rows], pa.int32()),
            }
        )

    def test_single_label_is_zero_drift(self, ray_session, tmp_path):
        """With one label, the label cloud IS the corpus cloud: every
        gap term is exactly 0 (the formula's fixed point)."""
        from barks_ocr_ray.pipelines.queries import (
            q276_embedding_frechet_drift,
        )

        rows = [(i, 1, [0.1 * i, -0.2 * i]) for i in range(6)]
        d = _write(
            tmp_path, "sf_fid0", self._emb(rows), "embeddings.parquet"
        )
        got = q276_embedding_frechet_drift(d).to_pandas()
        assert got.label.tolist() == [1]
        assert got.n_vecs.tolist() == [6]
        assert got.fid_micro2.tolist() == [0]

    def test_shifted_label_matches_oracle(self, ray_session, tmp_path):
        """Two labels, one shifted by +1.0 in dim 1: drift is dominated
        by the mean gap; engine == oracle on the hand table."""
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q276,
            q276_embedding_frechet_drift,
        )

        rows = [(i, 1, [0.1 * i, 0.5]) for i in range(5)] + [
            (10 + i, 2, [1.0 + 0.1 * i, 0.5]) for i in range(5)
        ]
        emb = self._emb(rows)
        d = _write(tmp_path, "sf_fid", emb, "embeddings.parquet")
        got = (
            q276_embedding_frechet_drift(d)
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", emb)
        exp = (
            con.execute(SQL_Q276 + " ORDER BY label")
            .fetch_df()
            .reset_index(drop=True)
        )
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert (got.mean_gap_micro2 > 0).all()

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q276,
            q276_embedding_frechet_drift,
        )

        got = (
            q276_embedding_frechet_drift("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
        )
        exp = (
            con.execute(SQL_Q276 + " ORDER BY label")
            .fetch_df()
            .reset_index(drop=True)
        )
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestSpanCorruption:
    def test_length_identities_and_rate(self):
        """input_len + n_masked - n_spans == n_tokens and target_len ==
        n_masked + n_spans for every doc; on a long doc the masked
        fraction sits near the designed 15% (within [5%, 25%])."""
        from barks_ocr_ray.functions.curation import (
            span_corruption_table,
            span_plan,
        )

        t = span_corruption_table(list(range(50)), [200] * 50)
        n = np.array(t.column("n_tokens"))
        masked = np.array(t.column("n_masked"))
        spans = np.array(t.column("n_spans"))
        inp = np.array(t.column("input_len"))
        tgt = np.array(t.column("target_len"))
        assert ((inp + masked - spans) == n).all()
        assert (tgt == masked + spans).all()
        frac = masked.sum() / n.sum()
        assert 0.05 < frac < 0.25
        assert span_plan(7, 100) == span_plan(7, 100)  # pure function
        assert span_plan(0, 0) == (0, 0)

    def test_partitioning_invariance(self, ray_session, tmp_path):
        """The plan is a pure row function: 1-block and 7-block runs
        produce identical per-doc rows."""
        from barks_ocr_ray.functions.relational import read_table
        from barks_ocr_ray.pipelines.queries import q277_span_corruption

        texts = [f"tok{j} " * (10 + 17 * j % 90) for j in range(40)]
        docs = pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 40, pa.string()),
                "source": pa.array(["s0"] * 40, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_span", docs, "documents.parquet")
        base = (
            q277_span_corruption(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        rep = (
            read_table(d, "documents", ["doc_id", "text"])
            .repartition(7)
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        # same kernel over a differently-blocked dataset
        from barks_ocr_ray.functions.curation import span_corruption_table
        from barks_ocr_ray.functions.text import Tokenizer

        class _Plans(Tokenizer):
            def __call__(self, batch):
                ids = batch.column("doc_id").to_pylist()
                counts = [
                    len(self.tokens(s.as_py() or ""))
                    for s in batch.column("text")
                ]
                return span_corruption_table(ids, counts)

        alt = (
            rep.map_batches(_Plans, batch_format="pyarrow", concurrency=(1, 2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert base.equals(alt)
