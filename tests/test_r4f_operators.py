"""Session-15 operator tests: per-source Gini concentration (q241)
and capture-recapture coverage estimation (q242)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / fname))
    return str(d)


class TestGiniConcentration:
    def test_hand_gini_and_tie_invariance(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q241,
            q241_gini_concentration,
        )

        # source a: x = [1,2,3,4] -> G = 2*30/(4*10) - 5/4 = 0.25
        # source b: all equal -> G = 0 (ties exercise the rank-run fold)
        # source c: all-zero lengths -> dropped by the sum(x) > 0 gate
        docs = pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "source": pa.array(
                    ["a", "a", "a", "a", "b", "b", "b", "c", "c", "c"],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    [3, 1, 4, 2, 7, 7, 7, 0, 0, 0], pa.int64()
                ),
                "text": pa.array(["t"] * 10, pa.string()),
                "lang": pa.array(["en"] * 10, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_gini", docs, "documents.parquet")
        got = q241_gini_concentration(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q241).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.source.tolist() == ["a", "b"]
        assert got.gini_micro.tolist() == [250000, 0]
        assert got.n_docs.tolist() == [4, 3]
        assert got.total_chars.tolist() == [10, 21]

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q241,
            q241_gini_concentration,
        )

        d = "/root/testdata/sf0.001"
        got = q241_gini_concentration(d).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        exp = con.execute(SQL_Q241).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # a real corpus is never perfectly equal nor degenerate
        assert (got.gini_micro > 0).all()
        assert (got.gini_micro < 1_000_000).all()


class TestCaptureRecapture:
    def test_hand_corpus_replays_decisions(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.hashing import unit_fractions
        from barks_ocr_ray.pipelines.queries import (
            Q242_RATE,
            SQL_Q242,
            q242_capture_recapture,
        )

        # 12 docs over 5 distinct contents (one null) — dup copies must
        # count once per sample no matter which copy was sampled
        texts = [
            "alpha", "alpha", "alpha",
            "beta", "beta",
            "gamma",
            None, None,
            "delta", "delta", "delta", "delta",
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_caprecap", docs, "documents.parquet")
        got = q242_capture_recapture(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q242).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.n_contents.iloc[0] == 5

        # replay by hand: a content is in sample k iff ANY copy's
        # doc_id hashes under the rate with salt k
        ids = list(range(len(texts)))
        u1 = unit_fractions(ids, method="md5", salt=1) < Q242_RATE
        u2 = unit_fractions(ids, method="md5", salt=2) < Q242_RATE
        groups = {}
        for i, t in enumerate(texts):
            groups.setdefault(t, []).append(i)
        n1 = sum(any(u1[i] for i in g) for g in groups.values())
        n2 = sum(any(u2[i] for i in g) for g in groups.values())
        m = sum(
            any(u1[i] for i in g) and any(u2[i] for i in g)
            for g in groups.values()
        )
        assert got.n1.iloc[0] == n1
        assert got.n2.iloc[0] == n2
        assert got.m.iloc[0] == m
        assert got.chapman.iloc[0] == (n1 + 1) * (n2 + 1) // (m + 1) - 1

    def test_estimator_sane_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import q242_capture_recapture

        got = q242_capture_recapture("/root/testdata/sf0.001").to_pandas()
        n = int(got.n_contents.iloc[0])
        chap = int(got.chapman.iloc[0])
        # at capture rate 0.5 the Chapman estimate lands near truth
        assert abs(chap - n) / n < 0.25


class TestEventDebounce:
    def test_hand_stream_echoes_dropped(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import (
            Q243_DEBOUNCE_US,
            SQL_Q243,
            q243_event_debounce,
        )

        base = datetime.datetime(2024, 3, 1)

        def ts(s):
            return base + datetime.timedelta(seconds=s)

        win = Q243_DEBOUNCE_US // 1_000_000
        # user 1 view: 0 (keep), +win (echo of RAW predecessor: gap ==
        # win -> dropped since rule is gap > win), +2*win+1 (keep);
        # user 1 click at 1 (keep: different type); user 2 view at 2
        # (keep: different user)
        rows = [
            (1, 0, "view"), (1, win, "view"), (1, 2 * win + 1, "view"),
            (1, 1, "click"), (2, 2, "view"),
        ]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_debounce", ev, "events.parquet")
        got = (
            q243_event_debounce(d)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q243 + " ORDER BY event_id").fetch_df()
        assert got.event_id.tolist() == exp.event_id.tolist()
        assert got.event_type.tolist() == exp.event_type.tolist()
        assert got.event_id.tolist() == [0, 2, 3, 4]


class TestBenfordAudit:
    def test_hand_digits_and_shares(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q244,
            q244_benford_audit,
        )

        # leading digits: 1,1,1,9,2 — digit 9 from a sub-dollar amount
        prices = [1.00, 19999.99, 123.45, 0.09, 250.00]
        li = pa.table(
            {
                "l_orderkey": pa.array(range(len(prices)), pa.int64()),
                "l_extendedprice": pa.array(prices, pa.float64()),
            }
        )
        d = _write(tmp_path, "sf_benford", li, "lineitem.parquet")
        got = q244_benford_audit(d).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", li)
        exp = con.execute(SQL_Q244).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.digit.tolist() == [1, 2, 9]
        assert got.n_obs.tolist() == [3, 1, 1]
        assert got.benford_micro.tolist() == [301030, 176091, 45757]


class TestSpearmanLengthTokens:
    def test_perfect_monotone_and_ties(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q245,
            q245_spearman_length_tokens,
        )

        # en: y strictly increases with x but nonlinearly -> rho = 1.0
        # exactly (Pearson would be < 1); de: x has ties and y inverts
        # -> negative rho; fr: constant x -> excluded by the gate
        texts_en = ["a", "a b", "a b c", "a b c d"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(9), pa.int64()),
                "lang": pa.array(
                    ["en"] * 4 + ["de"] * 3 + ["fr"] * 2, pa.string()
                ),
                "n_chars": pa.array(
                    [10, 20, 30, 1000, 5, 5, 9, 7, 7], pa.int64()
                ),
                "text": pa.array(
                    texts_en + ["w x y", "v w", "u"] + ["t", "t t"],
                    pa.string(),
                ),
                "source": pa.array(["s"] * 9, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_spear", docs, "documents.parquet")
        got = q245_spearman_length_tokens(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q245).fetch_df()
        assert got.lang.tolist() == exp.lang.tolist() == ["de", "en"]
        assert got.n.tolist() == exp.n.tolist()
        assert got.spearman.tolist() == exp.spearman.tolist()
        assert got.spearman.tolist()[1] == 1.0
        assert got.spearman.tolist()[0] < 0


class TestEwmaBacktest:
    def test_hand_fold_with_gap_day(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q246,
            q246_ewma_backtest,
        )

        base = datetime.datetime(2024, 5, 1)

        def ts(day, k):
            return base + datetime.timedelta(days=day, hours=k)

        # view: days 0..3 counts [2, 4, 0(gap), 3] — the gap day must be
        # forecast against (zero actual), not skipped
        rows = [(0, "view")] * 2 + [(1, "view")] * 4 + [(3, "view")] * 3
        # click only on day 2: dense spine gives [0, 0, 1, 0]
        rows += [(2, "click")]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [ts(r[0], i % 5) for i, r in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ewma", ev, "events.parquet")
        got = q246_ewma_backtest(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q246).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # hand fold for view (micro units): s0=2e6; errs |4-2|,|0-3|,|3-1.5|
        # s1=(2e6+4e6)//2=3e6, s2=(3e6+0)//2=1.5e6
        # MAE = (2e6 + 3e6 + 1.5e6) / 3
        view = got[got.event_type == "view"]
        assert view.n_forecasts.iloc[0] == 3
        assert view.mae_micro.iloc[0] == round((2e6 + 3e6 + 1.5e6) / 3)


class TestInt8QuantDistortion:
    def test_matches_golden_and_handles_degenerate_dims(
        self, ray_session, tmp_path
    ):
        from barks_ocr_ray.functions.ann import int8_cos_micro
        from barks_ocr_ray.golden_dedup import golden_int8_quant
        from barks_ocr_ray.pipelines.queries import q247_int8_quant_distortion

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(40, 6))
        mat[:, 2] = 7.0  # constant dim: range 0 must reconstruct exactly
        mat[5] = 0.0  # zero vector: cosine pinned to 1.0
        emb = pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 3 for i in range(40)], pa.int32()),
            }
        )
        d = _write(tmp_path, "sf_quant", emb, "embeddings.parquet")
        got = q247_int8_quant_distortion(d).to_pandas()
        exp = golden_int8_quant(emb).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # kernel edge checks
        m64 = np.stack(
            [np.asarray(v, np.float64) for v in emb.column("embedding").to_pylist()]
        )
        cos = int8_cos_micro(m64, m64.min(0), m64.max(0))
        assert cos[5] == 1_000_000  # zero vector
        assert (cos > 990_000).all()  # 8-bit codes keep cosine near 1

    def test_matches_golden_on_sf0001(self, ray_session):
        import pyarrow.parquet as pq2

        from barks_ocr_ray.golden_dedup import golden_int8_quant
        from barks_ocr_ray.pipelines.queries import q247_int8_quant_distortion

        got = q247_int8_quant_distortion("/root/testdata/sf0.001").to_pandas()
        exp = golden_int8_quant(
            pq2.read_table("/root/testdata/sf0.001/embeddings.parquet")
        ).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestCdcDedup:
    def test_kernel_shift_resistance_and_edges(self):
        import duckdb as dk

        from barks_ocr_ray.functions.storage import cdc_chunks

        assert cdc_chunks(b"") == ([], [])
        k, z = cdc_chunks(b"tiny")
        assert len(k) == 1 and z == [4]
        texts = [
            r[0]
            for r in dk.sql(
                "SELECT text FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet') "
                "WHERE len(text) > 800 LIMIT 5"
            ).fetchall()
        ]
        blob = ("\n".join(texts)).encode("utf-8")
        k1, z1 = cdc_chunks(blob)
        k2, z2 = cdc_chunks(b"INSERTED PREFIX >>> " + blob)
        assert sum(z1) == len(blob)
        # shift resistance: an insertion at the front must NOT re-chunk
        # the whole stream (fixed-size blocking would share ~0 keys)
        shared = len(set(k1) & set(k2))
        assert shared >= len(set(k1)) * 0.6, (shared, len(set(k1)))

    def test_matches_golden_with_cross_doc_dups(self, ray_session, tmp_path):
        import duckdb as dk

        from barks_ocr_ray.golden_dedup import golden_cdc_stats
        from barks_ocr_ray.pipelines.queries import q248_cdc_dedup

        base = [
            r[0]
            for r in dk.sql(
                "SELECT text FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet') LIMIT 30"
            ).fetchall()
        ]
        # duplicate docs + a None: chunk-level dedup must fire
        texts = base + base[:10] + [None]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_cdc", docs, "documents.parquet")
        got = q248_cdc_dedup(d).to_pandas()
        exp = golden_cdc_stats(docs).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.n_unique_chunks.iloc[0] < got.n_chunks.iloc[0]
        assert got.ratio_micro.iloc[0] < 1_000_000


class TestPcaTopComponent:
    def test_line_corpus_recovers_direction(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_pca_top
        from barks_ocr_ray.pipelines.queries import q249_pca_top_component

        rng = np.random.default_rng(5)
        t = rng.normal(size=200)
        noise = rng.normal(size=(200, 4)) * 0.01
        direction = np.array([0.6, -0.8, 0.0, 0.0])
        mat = t[:, None] * direction[None, :] + noise
        emb = pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 200, pa.int32()),
            }
        )
        d = _write(tmp_path, "sf_pca", emb, "embeddings.parquet")
        got = q249_pca_top_component(d).to_pandas()
        exp = golden_pca_top(emb).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # recovered loading ≈ ±(0.6, -0.8, 0, 0) with the largest-|v|
        # component positive -> (-0.6, 0.8, 0, 0)
        lv = got.loading_micro.to_numpy() / 1e6
        assert abs(lv[1] - 0.8) < 0.01
        assert abs(lv[0] + 0.6) < 0.01
        assert got.eig_share_micro.iloc[0] > 990_000

    def test_matches_golden_on_sf0001(self, ray_session):
        import pyarrow.parquet as pq2

        from barks_ocr_ray.golden_dedup import golden_pca_top
        from barks_ocr_ray.pipelines.queries import q249_pca_top_component

        got = q249_pca_top_component("/root/testdata/sf0.001").to_pandas()
        exp = golden_pca_top(
            pq2.read_table("/root/testdata/sf0.001/embeddings.parquet")
        ).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestNewReturningUsers:
    def test_hand_daily_split(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q250,
            q250_new_returning_users,
        )

        base = datetime.datetime(2024, 6, 1)

        def ts(day, h):
            return base + datetime.timedelta(days=day, hours=h)

        # day0: u1(new), u2(new); day1: u1(ret), u3(new); u1 fires twice
        # on day0 (distinct (user,day) must count once)
        rows = [(1, 0), (1, 0), (2, 0), (1, 1), (3, 1)]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [ts(r[1], i) for i, r in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_dau", ev, "events.parquet")
        got = (
            q250_new_returning_users(d)
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q250).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.n_active.tolist() == [2, 2]
        assert got.n_new.tolist() == [2, 1]
        assert got.n_returning.tolist() == [0, 1]


class TestTransitionEntropy:
    def test_deterministic_vs_uniform_successors(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q251,
            q251_transition_entropy,
        )

        base = datetime.datetime(2024, 6, 1)
        # transitions: u1 gives a->b, b->a, a->b; u2 gives c->a, a->c,
        # c->b => prev b is deterministic (H=0), prev c is uniform over
        # {a,b} (H=ln2), prev a mixes {b:2, c:1}
        seqs = {1: ["a", "b", "a", "b"], 2: ["c", "a", "c", "b"]}
        rows = []
        for u, seq in seqs.items():
            for i, t in enumerate(seq):
                rows.append((u, i, t))
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(minutes=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_tentropy", ev, "events.parquet")
        got = q251_transition_entropy(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q251).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        h = dict(zip(got.prev, got.h_micro))
        assert h["b"] == 0  # deterministic successor
        assert h["c"] == 693148  # 2 * round(1e6 * 0.5 * ln 2)
        # {b:2, c:1}: round(1e6*2/3*ln(3/2)) + round(1e6*1/3*ln 3)
        assert h["a"] == 270310 + 366204


class TestHillTailIndex:
    def test_pareto_like_histogram(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q252,
            q252_hill_tail_index,
        )

        # exact Pareto(alpha=2) quantiles: x_i = round(10 / sqrt(u_i))
        u = (np.arange(400) + 0.5) / 400
        x = np.round(10.0 / np.sqrt(u)).astype(np.int64)
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(x)), pa.int64()),
                "n_chars": pa.array(x, pa.int64()),
                "text": pa.array(["t"] * len(x), pa.string()),
                "lang": pa.array(["en"] * len(x), pa.string()),
                "source": pa.array(["s"] * len(x), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_hill", docs, "documents.parquet")
        got = q252_hill_tail_index(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q252).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # Hill on a clean Pareto(2) tail lands near alpha=2
        assert 1_500_000 < got.alpha_micro.iloc[0] < 2_700_000
        assert got.n.iloc[0] == 400


class TestAbZtest:
    def test_replays_arm_assignment_and_z(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.hashing import unit_fractions
        from barks_ocr_ray.pipelines.queries import (
            Q253_SALT,
            SQL_Q253,
            q253_ab_ztest,
        )

        # 60 users; net-positive (purchases > errors) only for
        # user_id % 3 == 0 — others get an error so conv = 0
        rows = []
        for u in range(60):
            rows.append((u, "view"))
            rows.append((u, "click"))
            if u % 3 == 0:
                rows.append((u, "purchase"))
            else:
                rows.append((u, "error"))
                rows.append((u, "purchase"))  # 1 purchase, 1 error: tie -> 0
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(len(rows))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ab", ev, "events.parquet")
        got = q253_ab_ztest(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q253).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        in_a = unit_fractions(list(range(60)), method="md5", salt=Q253_SALT) < 0.5
        assert got.n_a.iloc[0] == int(in_a.sum())
        assert got.x_a.iloc[0] == sum(
            1 for u in range(60) if in_a[u] and u % 3 == 0
        )


class TestWeightedReservoir:
    def test_replays_keys_and_prefers_heavy_docs(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.hashing import unit_fractions
        from barks_ocr_ray.pipelines.queries import (
            Q254_K,
            SQL_Q254,
            q254_weighted_reservoir,
        )

        # 300 docs: ids 0..9 carry 1000x the weight of the rest; a
        # zero-weight doc must be excluded
        n = 300
        w = [100_000 if i < 10 else 100 for i in range(n)]
        w[250] = 0
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "n_chars": pa.array(w, pa.int64()),
                "text": pa.array(["t"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_wres", docs, "documents.parquet")
        got = q254_weighted_reservoir(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q254).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert len(got) == Q254_K
        assert 250 not in set(got.doc_id)
        # all ten heavy docs should make a 50-slot sample (p_miss ~ 0)
        assert sum(1 for i in got.doc_id if i < 10) == 10
        # replay one key by hand
        u0 = unit_fractions([0], method="md5")[0]
        k0 = float(
            np.round(u0 ** (1.0 / 100_000), 9)
        )
        row0 = got[got.doc_id == 0]
        assert abs(row0.skey.iloc[0] - k0) < 2e-9


class TestInterarrivalDispersion:
    def test_regular_vs_bursty_streams(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q255,
            q255_interarrival_dispersion,
        )

        base = datetime.datetime(2024, 6, 1)
        rows = []
        # 'tick': perfectly regular 60 s gaps -> CV = 0
        for i in range(20):
            rows.append(("tick", base + datetime.timedelta(seconds=60 * i)))
        # 'burst': 10 events in 1 s, then an hour gap, then 10 more
        for i in range(10):
            rows.append(("burst", base + datetime.timedelta(milliseconds=100 * i)))
        for i in range(10):
            rows.append(
                ("burst", base + datetime.timedelta(hours=1, milliseconds=100 * i))
            )
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_gaps", ev, "events.parquet")
        got = q255_interarrival_dispersion(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q255).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.set_index("event_type")
        assert r.loc["tick", "cv_micro"] == 0
        assert r.loc["burst", "cv_micro"] > 3_000_000  # heavy burstiness


class TestJlDistortion:
    def test_matches_golden_and_mean_near_one(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_jl_distortion
        from barks_ocr_ray.pipelines.queries import q256_jl_distortion

        rng = np.random.default_rng(9)
        n = 120
        mat = rng.normal(size=(n, 64))
        # vec_id 7 removed -> pair 3 incomplete and must be dropped
        ids = [i for i in range(n) if i != 7]
        emb = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, mat[i])) for i in ids],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(ids), pa.int32()),
            }
        )
        d = _write(tmp_path, "sf_jl", emb, "embeddings.parquet")
        got = (
            q256_jl_distortion(d)
            .to_pandas()
            .sort_values("pair_id")
            .reset_index(drop=True)
        )
        exp = golden_jl_distortion(emb).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert 3 not in set(got.pair_id)
        assert len(got) == n // 2 - 1
        mean_ratio = got.ratio_micro.mean() / 1e6
        assert 0.85 < mean_ratio < 1.15


class TestBounceRate:
    def test_hand_sessions(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import SQL_Q257, q257_bounce_rate

        base = datetime.datetime(2024, 6, 1)

        def ts(m):
            return base + datetime.timedelta(minutes=m)

        # u1: [view@0, click@10] one session entry=view (not bounce),
        #     [view@100] second session entry=view (bounce; gap 90 min)
        # u2: [click@0] bounce entry=click; boundary: gap EXACTLY 30 min
        #     stays in-session (rule is > 30)
        # u3: [search@0, search@30] ONE session (not bounce)
        rows = [
            (1, 0, "view"), (1, 10, "click"), (1, 100, "view"),
            (2, 0, "click"),
            (3, 0, "search"), (3, 30, "search"),
        ]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_bounce", ev, "events.parquet")
        got = q257_bounce_rate(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q257).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.set_index("entry_type")
        assert r.loc["view", "n_sessions"] == 2
        assert r.loc["view", "n_bounce"] == 1
        assert r.loc["click", "bounce_micro"] == 1_000_000
        assert r.loc["search", "n_bounce"] == 0


class TestNeymanAllocation:
    def test_variance_earns_budget(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q258,
            q258_neyman_allocation,
        )

        rng = np.random.default_rng(11)
        # source a: high variance lengths; source b: constant (S=0 ->
        # zero weight -> zero sampled); source c: mild variance
        la = rng.integers(10, 5000, 400).tolist()
        lb = [700] * 400
        lc = rng.integers(900, 1100, 400).tolist()
        lens = la + lb + lc
        srcs = ["a"] * 400 + ["b"] * 400 + ["c"] * 400
        docs = pa.table(
            {
                "doc_id": pa.array(range(1200), pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
                "text": pa.array(["t"] * 1200, pa.string()),
                "lang": pa.array(["en"] * 1200, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_neyman", docs, "documents.parquet")
        got = q258_neyman_allocation(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q258).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.set_index("source")
        assert r.loc["b", "w_micro"] == 0
        assert r.loc["b", "n_sampled"] == 0
        assert r.loc["a", "rate_micro"] > r.loc["c", "rate_micro"]
        assert r.loc["a", "n_sampled"] > 0


class TestKmRetention:
    def test_hand_cohort_with_censoring(self, ray_session, tmp_path):
        import datetime

        from barks_ocr_ray.pipelines.queries import SQL_Q259, q259_km_retention

        base = datetime.datetime(2024, 6, 1)

        def ts(day):
            return base + datetime.timedelta(days=day, hours=3)

        # dmax = 3. u1: f=0,l=1 churn dur1; u2: f=0,l=3 CENSORED dur3;
        # u3: f=1,l=1 churn dur0; u4: f=2,l=3 censored dur1;
        # u5: f=0,l=2 churn dur2
        rows = [
            (1, 0), (1, 1),
            (2, 0), (2, 3),
            (3, 1),
            (4, 2), (4, 3),
            (5, 0), (5, 2),
        ]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_km", ev, "events.parquet")
        got = q259_km_retention(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q259).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # hand walk: d0: n=5 ch=1 -> S=0.8; d1: n=4 ch=1 cens=1 -> S=0.6;
        # d2: n=2 ch=1 -> S=0.3; d3: n=1 ch=0 cens=1 -> S=0.3
        assert got.dur.tolist() == [0, 1, 2, 3]
        assert got.n_risk.tolist() == [5, 4, 2, 1]
        assert got.surv_micro.tolist() == [800000, 600000, 300000, 300000]


class TestWinsorizedMean:
    def test_outliers_clamped_by_rank(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q260,
            q260_winsorized_mean,
        )

        # source a: 20 docs, one giant (10_000) and one tiny (1);
        # k = ceil(20*0.05) = 1 -> lo = 2nd smallest? no: lo = rank-1
        # value = 1, hi = rank-20 value... with k=1: lo = rank 1 = 1,
        # hi = rank 20 = 10000 -> clamping is a NO-OP at k=1 rank
        # boundaries equal to extremes. Use 40 docs so k=2.
        base = list(range(100, 136))  # 36 mid values
        vals = [1, 2] + base + [9000, 10000]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(vals)), pa.int64()),
                "source": pa.array(["a"] * len(vals), pa.string()),
                "n_chars": pa.array(vals, pa.int64()),
                "text": pa.array(["t"] * len(vals), pa.string()),
                "lang": pa.array(["en"] * len(vals), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_wins", docs, "documents.parquet")
        got = q260_winsorized_mean(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q260).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # k = ceil(40*0.05) = 2: lo = rank-2 value = 2, hi = rank-39 = 9000
        assert got.lo.iloc[0] == 2
        assert got.hi.iloc[0] == 9000
        total = 2 + 2 + sum(base) + 9000 + 9000
        assert got.wmean_micro.iloc[0] == round(1e6 * total / 40)


class TestEffectiveSampleSize:
    def test_equal_weights_give_full_ess(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q261,
            q261_effective_sample_size,
        )

        # source a: equal weights -> ESS = n exactly; source b: one
        # giant dominates -> ESS near 1
        vals = [500] * 30 + [1_000_000] + [1] * 9
        srcs = ["a"] * 30 + ["b"] * 10
        docs = pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(vals, pa.int64()),
                "text": pa.array(["t"] * 40, pa.string()),
                "lang": pa.array(["en"] * 40, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ess", docs, "documents.parquet")
        got = q261_effective_sample_size(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q261).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.set_index("source")
        assert r.loc["a", "ess_micro"] == 30_000_000
        assert r.loc["a", "ess_ratio_micro"] == 1_000_000
        assert r.loc["b", "ess_micro"] < 1_100_000  # ~1 effective doc


class TestCharsetProfile:
    def test_multilingual_and_nonascii(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q262,
            q262_charset_profile,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "lang": pa.array(["en", "zh", "zh", "de"], pa.string()),
                "text": pa.array(
                    ["abca", "中文 ok", "中國", ""],
                    pa.string(),
                ),
                "source": pa.array(["s"] * 4, pa.string()),
                "n_chars": pa.array([4, 5, 2, 0], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_charset", docs, "documents.parquet")
        got = q262_charset_profile(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q262).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.set_index("lang")
        # en: {a,b,c} 3 codepoints, all ascii; de (empty text) absent
        assert r.loc["en", "n_codepoints"] == 3
        assert r.loc["en", "ascii_micro"] == 1_000_000
        # zh: chars = 中文 ok + 中國 -> codepoints {中,文,國,space,o,k}
        assert r.loc["zh", "n_codepoints"] == 6
        assert r.loc["zh", "n_chars_total"] == 7
        assert r.loc["zh", "ascii_micro"] == round(1e6 * 3 / 7)
        assert "de" not in r.index


class TestOrderReconciliation:
    def test_hand_drift_and_orphans(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q263,
            q263_order_reconciliation,
        )

        # order 1: two lines summing EXACTLY to the header (n_exact=1)
        # order 2: header off by 50 cents; order 3: no lines at all
        li = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([100.0, 50.0, 10.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.1, 0.0], pa.float64()),
                "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
            }
        )
        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_totalprice": pa.array([145.0, 10.5, 99.0], pa.float64()),
            }
        )
        d = tmp_path / "sf_recon"
        d.mkdir()
        pq.write_table(li, str(d / "lineitem.parquet"))
        pq.write_table(orders, str(d / "orders.parquet"))
        got = q263_order_reconciliation(str(d)).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", li)
        con.register("orders", orders)
        exp = con.execute(SQL_Q263).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.n_orders.iloc[0] == 3
        assert got.n_with_lines.iloc[0] == 2
        assert got.n_exact.iloc[0] == 1
        assert got.max_abs_drift_cents.iloc[0] == 50

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q263,
            q263_order_reconciliation,
        )

        d = "/root/testdata/sf0.001"
        got = q263_order_reconciliation(d).to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        exp = con.execute(SQL_Q263).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestPartPriceDispersion:
    def test_dispersed_part_outranks_stable(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q264,
            q264_part_price_dispersion,
        )

        # part 1: wild prices; part 2: constant (cv=0); part 3: only 2
        # lines (below MIN_LINES -> excluded)
        rows = (
            [(1, s, p) for s, p in
             [(10, 1.0), (11, 100.0), (10, 1.0), (12, 200.0), (13, 5.0)]]
            + [(2, 20, 50.0)] * 6
            + [(3, 30, 7.0), (3, 31, 9.0)]
        )
        li = pa.table(
            {
                "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_extendedprice": pa.array(
                    [r[2] for r in rows], pa.float64()
                ),
            }
        )
        d = _write(tmp_path, "sf_disp", li, "lineitem.parquet")
        got = q264_part_price_dispersion(d).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", li)
        exp = con.execute(SQL_Q264).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.partkey.tolist() == [1, 2]
        assert got.cv_micro.tolist()[1] == 0
        assert got.n_suppliers.tolist() == [4, 1]


class TestNationShareTrend:
    def test_matches_oracle_and_shares_sum(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q265,
            q265_nation_share_trend,
        )

        d = "/root/testdata/sf0.001"
        got = q265_nation_share_trend(d).to_pandas()
        con = duckdb.connect()
        for t in ("orders", "customer", "nation"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        exp = con.execute(SQL_Q265).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # per-month shares sum to ~1e6 (micro rounding tolerance)
        s = got.groupby("month").share_micro.sum()
        assert ((s - 1_000_000).abs() <= len(got.n_name.unique())).all()


class TestReturnRateWilson:
    def test_small_sample_does_not_outrank(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q266,
            q266_return_rate_wilson,
        )

        # supplier 1: 20/20 returns (perfect rate, small-ish n)
        # supplier 2: 95/100 returns (lower rate, big n) — Wilson LB
        # must rank 2 ABOVE 1? No: LB(20/20) ~ 0.839, LB(95/100) ~ 0.887
        # -> supplier 2 first. supplier 3: below MIN_LINES, excluded.
        rows = (
            [(1, "R")] * 20
            + [(2, "R")] * 95 + [(2, "N")] * 5
            + [(3, "R")] * 5
        )
        li = pa.table(
            {
                "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_wilson", li, "lineitem.parquet")
        got = q266_return_rate_wilson(d).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", li)
        exp = con.execute(SQL_Q266).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.suppkey.tolist() == [2, 1]
        assert got.rate_micro.tolist() == [950000, 1000000]
        # plain-rate ranking would have put supplier 1 first
        assert got.wilson_lb_micro.iloc[0] > got.wilson_lb_micro.iloc[1]
