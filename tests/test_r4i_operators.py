"""Session-19 operator tests: per-language BPE fertility (q278) and
LZ76 event-sequence complexity (q279)."""

import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from barks_ocr_ray.functions.text import lz76_phrases


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / fname))
    return str(d)


_BASE = datetime.datetime(2024, 1, 1)


class TestLZ76Kernel:
    def test_kaspar_schuster_example(self):
        # The worked example from Kaspar & Schuster (1987):
        # 0001101001000101 decomposes into 0.001.10.100.1000.101 -> 6.
        s = "0001101001000101"
        assert lz76_phrases(tuple(s)) == 6

    def test_degenerate_sequences(self):
        assert lz76_phrases(()) == 0
        assert lz76_phrases(("a",)) == 1
        # Constant sequence: 2 phrases regardless of length.
        assert lz76_phrases(("x",) * 50) == 2
        # Strict alternation stays tiny too.
        assert lz76_phrases(tuple("ababababab")) == 3

    def test_random_sequence_is_complex(self):
        rng = np.random.default_rng(7)
        seq = tuple(rng.integers(0, 4, size=400).tolist())
        n = len(seq)
        c = lz76_phrases(seq)
        # An i.i.d. sequence approaches n / log_alpha(n) phrases; a
        # periodic one stays O(1). Pin the gap.
        assert lz76_phrases(("x",) * n) < 5 < 40 < c < n
        assert math.isfinite(1e6 * c * math.log(n) / n)

    def test_tuple_elements_compare_by_value(self):
        assert lz76_phrases(("view", "view", "click", "view")) == lz76_phrases(
            tuple("vvcv")
        )


class TestLZComplexityQuery:
    def test_matches_sequential_replay(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_lz_complexity
        from barks_ocr_ray.pipelines.queries import q279_lz_complexity

        rng = np.random.default_rng(11)
        rows = []
        eid = 0
        for uid in range(9):
            k = int(rng.integers(1, 40))
            for j in range(k):
                rows.append((eid, uid, int(rng.integers(0, 5000)),
                             ["view", "click", "buy"][int(rng.integers(0, 3))]))
                eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [_BASE + datetime.timedelta(seconds=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_lz", ev, "events.parquet")
        got = (
            q279_lz_complexity(d)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want = golden_lz_complexity(ev).to_pandas()
        assert got.equals(want)
        # 1-event users are dropped; the rest all present.
        counts = {uid: 0 for uid in range(9)}
        for r in rows:
            counts[r[1]] += 1
        expect_users = sorted(u for u, c in counts.items() if c >= 2)
        assert got["user_id"].tolist() == expect_users


class TestBpeFertility:
    def test_matches_sequential_replay(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_bpe_fertility
        from barks_ocr_ray.pipelines.queries import q278_bpe_fertility

        rng = np.random.default_rng(3)
        langs = ["en", "de", "fr"]
        words = ["the", "internationalization", "katze", "chien", "data",
                 "pipeline", "und", "le", "of", "straightforwardly"]
        texts, lang_col = [], []
        for i in range(36):
            lang = langs[i % 3]
            k = int(rng.integers(3, 30))
            texts.append(" ".join(words[int(j)] for j in rng.integers(0, len(words), k)))
            lang_col.append(lang)
        docs = pa.table(
            {
                "doc_id": pa.array(range(36), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(lang_col, pa.string()),
                "source": pa.array(["s0"] * 36, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_fert", docs, "documents.parquet")
        got = (
            q278_bpe_fertility(d)
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        want = golden_bpe_fertility(docs).to_pandas()
        assert got.equals(want)
        # Fertility is >= 1 subword per word by construction.
        assert (got["fertility_micro"] >= 1_000_000).all()


class TestCusumChangepoint:
    def test_level_shift_alarms(self, ray_session, tmp_path):
        """A series that doubles its level mid-stream must raise
        positive-side alarms after the shift and none before."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q280,
            q280_cusum_changepoint,
        )

        rows = []
        eid = 0
        for day in range(30):
            n = 10 if day < 20 else 25
            for _ in range(n):
                rows.append((eid, day))
                eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[1], hours=3)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_cusum", ev, "events.parquet")
        got = q280_cusum_changepoint(d).to_pandas()
        assert got["n_alarm_days"].iloc[0] > 0
        assert got["max_pos_micro"].iloc[0] > got["max_neg_micro"].iloc[0]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(SQL_Q280).fetchdf()
        assert got.sort_values("event_type").reset_index(drop=True).equals(
            want.sort_values("event_type").reset_index(drop=True)
        )

    def test_steady_series_silent(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q280_cusum_changepoint

        rows = [(i, i % 20) for i in range(20 * 7)]
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[1], hours=5)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_cusum2", ev, "events.parquet")
        got = q280_cusum_changepoint(d).to_pandas()
        assert got["n_alarm_days"].iloc[0] == 0
        assert got["max_pos_micro"].iloc[0] == 0  # constant at mean


class TestMarkovStationary:
    def test_absorbing_cycle_gets_mass(self, ray_session, tmp_path):
        """Users that all funnel into a b<->c cycle: stationary mass
        concentrates on b and c; mass on the transient 'a' decays to
        ~0; conservation holds within floor loss."""
        from barks_ocr_ray.pipelines.queries import q281_markov_stationary

        rows = []
        eid = 0
        for uid in range(6):
            seq = ["a"] + ["b", "c"] * 12
            for j, s in enumerate(seq):
                rows.append((eid, uid, j, s))
                eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(seconds=r[2])
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_markov", ev, "events.parquet")
        got = (
            q281_markov_stationary(d)
            .to_pandas()
            .set_index("state")["pi_micro"]
        )
        assert got["a"] < 1000  # transient state drains
        assert got["b"] + got["c"] > 900_000  # cycle holds the mass
        assert got.sum() <= 1_000_000  # floors only lose mass


class TestClusterSilhouette:
    def test_tight_clusters_score_high(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_silhouette
        from barks_ocr_ray.pipelines.queries import q282_cluster_silhouette

        rng = np.random.default_rng(5)
        centers = rng.normal(0, 1, size=(8, 16))
        vecs, labels = [], []
        for i in range(200):
            c = i % 8
            vecs.append(centers[c] + rng.normal(0, 0.01, 16))
            labels.append(c)
        emb = pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [v.astype("float32").tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        )
        d = _write(tmp_path, "sf_sil", emb, "embeddings.parquet")
        got = (
            q282_cluster_silhouette(d)
            .to_pandas()
            .sort_values("cluster")
            .reset_index(drop=True)
        )
        want = golden_silhouette(emb).to_pandas()
        assert got.equals(want)
        # The md5-seeded init can split a blob between two centroids
        # (those clusters legitimately score low) — but at least one
        # cluster captures a whole tight blob and scores near 1e6,
        # and every score stays in the [-1e6, 1e6] silhouette range.
        assert got["mean_sil_micro"].max() > 900_000
        assert got["mean_sil_micro"].between(-1_000_000, 1_000_000).all()
        assert got["n"].sum() == 200


class TestKsLengthShift:
    def test_shifted_source_flags(self, ray_session, tmp_path):
        """One source with clearly longer docs scores a much larger KS
        than an identically-distributed one."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q283,
            q283_ks_length_shift,
        )

        rng = np.random.default_rng(2)
        srcs, lens = [], []
        for i in range(300):
            srcs.append("same_a" if i % 2 else "same_b")
            lens.append(int(rng.integers(100, 200)))
        for i in range(150):
            srcs.append("shifted")
            lens.append(int(rng.integers(400, 500)))
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(srcs)), pa.int64()),
                "text": pa.array(["x"] * len(srcs), pa.string()),
                "lang": pa.array(["en"] * len(srcs), pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_ks", docs, "documents.parquet")
        got = (
            q283_ks_length_shift(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        ks = got.set_index("source")["ks_ppm"]
        assert ks["shifted"] == 1_000_000  # disjoint supports -> D = 1
        # same_a's rest is half same_b (identical dist) + half shifted,
        # so its KS sits near the shifted share of the rest (0.5) —
        # clearly below the fully-disjoint source.
        assert 400_000 < ks["same_a"] < 620_000
        assert abs(ks["same_a"] - ks["same_b"]) < 120_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(SQL_Q283).fetchdf()
        assert got.equals(want.sort_values("source").reset_index(drop=True))


class TestLongestSelfRepeat:
    def test_kernel(self):
        from barks_ocr_ray.functions.text import longest_repeated_run

        assert longest_repeated_run([]) == 0
        assert longest_repeated_run(["a"]) == 0
        assert longest_repeated_run(["a", "b"]) == 0
        assert longest_repeated_run(["a", "a"]) == 1
        # 'a b c' repeats verbatim, separated by distinct filler
        toks = "a b c x a b c y".split()
        assert longest_repeated_run(toks) == 3
        # overlapping repeat: aaaa -> 'aaa' occurs twice (overlap ok)
        assert longest_repeated_run(["a"] * 4) == 3
        assert longest_repeated_run("a b a b a".split()) == 3  # 'a b a'

    def test_matches_golden(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_self_repeat
        from barks_ocr_ray.pipelines.queries import q284_longest_self_repeat

        rng = np.random.default_rng(9)
        texts = []
        for i in range(30):
            words = [f"w{int(x)}" for x in rng.integers(0, 50, 60)]
            if i % 3 == 0:  # inject a verbatim self-repeat
                block = "copy one two three four five"
                words = words[:10] + block.split() + words[10:30] + block.split()
            texts.append(" ".join(words))
        docs = pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 30, pa.string()),
                "source": pa.array(["s0"] * 30, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_rep", docs, "documents.parquet")
        got = (
            q284_longest_self_repeat(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = golden_self_repeat(docs).to_pandas()
        assert got.equals(want)
        injected = got[got["doc_id"] % 3 == 0]
        assert (injected["max_repeat_len"] >= 6).all()


class TestChiSquareIndependence:
    def test_dependent_vs_independent(self, ray_session, tmp_path):
        """A lang confined to one source dominates the chi-square;
        a perfectly proportional grid contributes ~0 everywhere."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q285,
            q285_chi_square_independence,
        )

        langs, srcs = [], []
        # proportional block: en/de spread evenly over s0/s1
        for i in range(80):
            langs.append("en" if i % 2 else "de")
            srcs.append("s0" if i % 4 < 2 else "s1")
        # dependent block: zz only ever in s2
        for i in range(40):
            langs.append("zz")
            srcs.append("s2")
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(langs)), pa.int64()),
                "text": pa.array(["x"] * len(langs), pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([1] * len(langs), pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_chi", docs, "documents.parquet")
        got = (
            q285_chi_square_independence(d)
            .to_pandas()
            .sort_values(["lang", "source"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(SQL_Q285).fetchdf()
        assert got.equals(
            want.sort_values(["lang", "source"]).reset_index(drop=True)
        )
        cell = got.set_index(["lang", "source"])["contrib_micro"]
        # the confined lang's own cell and its zero cells carry the mass
        assert cell[("zz", "s2")] > cell[("en", "s0")]
        # zero-observed cells still contribute E
        assert cell[("zz", "s0")] > 0
        # the confined lang's own cell dominates the en/de cells by an
        # order of magnitude (the en/de cells are off only because the
        # zz block shifts the marginals)
        assert cell[("zz", "s2")] > 10 * cell[("en", "s0")]


class TestPoissonBootstrap:
    def test_ci_brackets_mean_and_replays(self, ray_session, tmp_path):
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            _sql_q286,
            q286_poisson_bootstrap_ci,
        )

        rng = np.random.default_rng(13)
        n = 400
        prices = rng.normal(1000.0, 100.0, n).round(2)
        od = pa.table(
            {
                "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(
                    [_BASE] * n, pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_boot", od, "orders.parquet")
        got = q286_poisson_bootstrap_ci(d).to_pandas()
        assert got["ci_lo_micro"].iloc[0] <= got["mean_micro"].iloc[0]
        assert got["mean_micro"].iloc[0] <= got["ci_hi_micro"].iloc[0]
        # CI width is a few stderr: sd=100 -> se ~ 5 -> lo/hi within
        # ~30 units of the mean (micro = 1e4 * cents = 1e6 * dollars)
        assert (
            got["ci_hi_micro"].iloc[0] - got["ci_lo_micro"].iloc[0]
            < 60 * 1_000_000
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')"
        )
        want = con.execute(_sql_q286()).fetchdf()
        assert got.equals(want)


class TestDpCountRelease:
    def test_noise_replays_and_bounds(self, ray_session, tmp_path):
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q287,
            q287_dp_count_release,
        )

        rows = [(i, ["view", "click", "buy"][i % 3]) for i in range(90)]
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [_BASE] * len(rows), pa.timestamp("us")
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_dp", ev, "events.parquet")
        got = q287_dp_count_release(d).to_pandas()
        assert (got["n"] == 30).all()
        # released = exact count + the replayable draw
        assert (
            got["released_micro"]
            == got["n"] * 1_000_000 + got["noise_micro"]
        ).all()
        # same type -> same noise across runs (pure function of type)
        again = q287_dp_count_release(d).to_pandas()
        assert got.equals(again)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(SQL_Q287).fetchdf()
        assert got.sort_values("event_type").reset_index(drop=True).equals(
            want.sort_values("event_type").reset_index(drop=True)
        )


class TestTheilSenTrend:
    def test_outlier_resistant_slope(self, ray_session, tmp_path):
        """Linear growth +2/day with one enormous spike day: the
        Theil-Sen median slope stays at ~2 (micro = 2e6); SQL
        replays exactly."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q288,
            q288_theil_sen_trend,
        )

        rows = []
        eid = 0
        for day in range(15):
            n = 10 + 2 * day if day != 7 else 500  # spike
            for _ in range(n):
                rows.append((eid, day))
                eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[1], hours=4)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ts", ev, "events.parquet")
        got = q288_theil_sen_trend(d).to_pandas()
        assert got["slope_micro"].iloc[0] == 2_000_000
        assert got["n_pairs"].iloc[0] == 15 * 14 // 2
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(SQL_Q288).fetchdf()
        assert got.equals(want)


class TestChao1Vocabulary:
    def test_hand_counts(self, ray_session, tmp_path):
        """3 singletons, 1 doubleton, 1 tripleton -> V=5, f1=3, f2=1,
        chao1 = 5 + 3*2/(2*2) = 6.5."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q289,
            q289_chao1_vocabulary,
        )

        texts = ["alpha beta gamma", "delta delta", "eps eps eps"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s0"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_chao", docs, "documents.parquet")
        got = q289_chao1_vocabulary(d).to_pandas()
        assert got["v_obs"].iloc[0] == 5
        assert got["f1"].iloc[0] == 3
        assert got["f2"].iloc[0] == 1
        assert got["n_tokens"].iloc[0] == 8
        assert got["chao1_micro"].iloc[0] == 6_500_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(SQL_Q289).fetchdf()
        assert got.equals(want)


class TestHeapsLaw:
    def test_saturating_vs_growing(self, ray_session, tmp_path):
        """A corpus where every doc repeats the same 5 words fits
        beta ~ 0; one where every doc brings fresh words fits
        beta ~ 1."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import SQL_Q290, q290_heaps_law

        def _mk(texts, name):
            t = pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts), pa.string()),
                    "source": pa.array(["s0"] * len(texts), pa.string()),
                    "n_chars": pa.array(
                        [len(x) for x in texts], pa.int64()
                    ),
                }
            )
            return _write(tmp_path, name, t, "documents.parquet"), t

        sat, _ = _mk(["one two three four five"] * 60, "sf_heaps_sat")
        grow, _ = _mk(
            [" ".join(f"w{i}x{j}" for j in range(5)) for i in range(60)],
            "sf_heaps_grow",
        )
        b_sat = q290_heaps_law(sat).to_pandas()["beta_micro"].iloc[0]
        b_grow = q290_heaps_law(grow).to_pandas()["beta_micro"].iloc[0]
        assert b_sat < 100_000  # saturated: ~0
        assert b_grow > 900_000  # every doc fresh: ~1
        got = q290_heaps_law(grow).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{grow}/documents.parquet')"
        )
        want = con.execute(SQL_Q290).fetchdf()
        assert got.equals(want)


class TestNeardupLcsAudit:
    def test_kernel(self):
        from barks_ocr_ray.functions.text import longest_common_run

        assert longest_common_run([], ["a"]) == 0
        assert longest_common_run(["a"], ["a"]) == 1
        assert longest_common_run("a b c d".split(), "x b c y".split()) == 2
        # symmetric
        assert longest_common_run("a b c".split(), "z a b c".split()) == 3
        assert longest_common_run("z a b c".split(), "a b c".split()) == 3
        assert longest_common_run(["q"], ["r"]) == 0

    def test_matches_golden(self, ray_session, tmp_path):
        """Pairs that share one long lifted passage score a high
        lcs_share; scattered-overlap pairs score low — and the
        distributed pass equals the sequential replay exactly."""
        from barks_ocr_ray.golden_dedup import golden_neardup_lcs
        from barks_ocr_ray.pipelines.queries import q291_neardup_lcs_audit

        rng = np.random.default_rng(21)
        base = [f"w{int(x)}" for x in rng.integers(0, 400, 120)]
        passage = [f"p{j}" for j in range(60)]
        texts = []
        # near-identical docs (J ~ 0.95 — 16x8 LSH banding recalls a
        # 0.68-Jaccard pair only ~half the time, so the test pair must
        # sit WELL above the threshold) sharing the 60-token passage
        texts.append(" ".join(base[:3] + passage))
        texts.append(" ".join(base[100:103] + passage))
        # two docs with the same vocabulary scattered differently
        words = [f"s{j}" for j in range(40)]
        order1 = list(words)
        order2 = list(words[::-1])
        texts.append(" ".join(order1 * 3))
        texts.append(" ".join(order2 * 3))
        # filler docs
        for i in range(8):
            texts.append(
                " ".join(f"f{i}_{int(x)}" for x in rng.integers(0, 500, 80))
            )
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s0"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_lcs", docs, "documents.parquet")
        got = (
            q291_neardup_lcs_audit(d)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        want = (
            golden_neardup_lcs(docs)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert got.equals(want)
        by_pair = got.set_index(["doc_a", "doc_b"])
        assert by_pair.loc[(0, 1), "lcs_tokens"] >= 60  # lifted passage


class TestPowerAnalysis:
    def test_variance_drives_sample_size(self, ray_session, tmp_path):
        """Same mean, 4x the sd -> ~16x the required n; SQL replays."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q292,
            q292_power_analysis,
        )

        rng = np.random.default_rng(17)
        srcs, lens = [], []
        for i in range(400):
            srcs.append("tight")
            lens.append(int(rng.normal(1000, 20)))
        for i in range(400):
            srcs.append("wide")
            lens.append(int(rng.normal(1000, 80)))
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(srcs)), pa.int64()),
                "text": pa.array(["x"] * len(srcs), pa.string()),
                "lang": pa.array(["en"] * len(srcs), pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_pow", docs, "documents.parquet")
        got = (
            q292_power_analysis(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        req = got.set_index("source")["n_required"]
        assert 10 < req["wide"] / req["tight"] < 22  # ~16x
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(SQL_Q292).fetchdf()
        assert got.equals(want.sort_values("source").reset_index(drop=True))


class TestMixtureWaterfill:
    def test_small_source_saturates_leftover_respreads(
        self, ray_session, tmp_path
    ):
        """3 sources with ~10/30/60% of tokens, budget = 50%: the tiny
        source saturates, the rest split the remainder equally; totals
        conserve within floor loss; SQL replays."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            _sql_q293,
            q293_mixture_waterfill,
        )

        texts, srcs = [], []
        for n, src in ((10, "small"), (30, "mid"), (60, "big")):
            for i in range(n):
                texts.append("tok " * 50)  # 50 tokens per doc
                srcs.append(src)
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_wf", docs, "documents.parquet")
        got = (
            q293_mixture_waterfill(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        by = got.set_index("source")
        # budget = 2500; fair round 1: 833 each; small (500) saturates;
        # leftover respreads until mid/big hold 1000 each
        assert by.loc["small", "saturated"] == 1
        assert by.loc["small", "alloc_tokens"] == 500
        assert by.loc["mid", "alloc_tokens"] == by.loc["big", "alloc_tokens"]
        total = int(got["alloc_tokens"].sum())
        assert 2500 - 3 <= total <= 2500  # floor loss < n_sources
        assert by.loc["mid", "saturated"] == 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(_sql_q293()).fetchdf()
        assert got.equals(want.sort_values("source").reset_index(drop=True))


class TestAliasSampler:
    def test_kernel_hand_case(self):
        """weights [1,1,2], V=3, W=4: p=[3,3,6]; both small slots keep
        prob 3/4 aliased to the heavy term; the heavy slot closes at
        1.0 — and the heavy term's total mass is exactly w/W = 1/2."""
        from barks_ocr_ray.functions.importance import alias_table

        t = alias_table(["a", "b", "c"], [1, 1, 2]).to_pandas()
        assert t["prob_ppm"].tolist() == [750_000, 750_000, 1_000_000]
        assert t["alias_term"].tolist() == ["c", "c", "c"]

    def test_mass_conservation(self):
        """For every term: own-slot kept mass + donated alias mass
        over all slots equals w/W exactly (checked on exact integer
        numerators reconstructed from the kernel's math)."""
        from collections import deque

        import numpy as np

        from barks_ocr_ray.functions.importance import alias_table

        rng = np.random.default_rng(8)
        terms = [f"t{i:02d}" for i in range(17)]
        w = rng.integers(1, 1000, len(terms)).astype(np.int64)
        V, W = len(terms), int(w.sum())
        tbl = alias_table(terms, w).to_pandas()
        # reconstruct exact numerators: prob_ppm = floor(1e6*p/W)
        # -> recover p from a parallel replay of the same kernel
        p = (w * V).astype(object)
        prob_num = [0] * V
        alias = list(range(V))
        small = deque(i for i in range(V) if int(p[i]) < W)
        large = deque(i for i in range(V) if int(p[i]) >= W)
        while small and large:
            s, l = small.popleft(), large.popleft()
            prob_num[s], alias[s] = int(p[s]), l
            p[l] = int(p[l]) - (W - int(p[s]))
            (small if int(p[l]) < W else large).append(l)
        for q in (large, small):
            while q:
                i = q.popleft()
                prob_num[i], alias[i] = W, i
        mass = [0] * V
        for s in range(V):
            mass[s] += prob_num[s]
            if alias[s] != s:
                mass[alias[s]] += W - prob_num[s]
        for i in range(V):
            assert mass[i] == int(w[i]) * V  # mass/VW == w/W exactly
        # and the public table matches the replay's floors
        assert tbl["prob_ppm"].tolist() == [
            (n * 1_000_000) // W for n in prob_num
        ]

    def test_query_matches_golden(self, ray_session, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_alias_sampler
        from barks_ocr_ray.pipelines.queries import q294_alias_sampler

        texts = ["the the the cat", "the dog dog", "fish"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s0"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_alias", docs, "documents.parquet")
        got = q294_alias_sampler(d).to_pandas()
        want = golden_alias_sampler(docs).to_pandas()
        assert got.equals(want)
        assert set(got["term"]) == {"the", "cat", "dog", "fish"}


class TestSprtMonitor:
    def test_hot_type_accepts_h1(self, ray_session, tmp_path):
        """A type whose realized share runs well above its planning
        share p0... p0 is computed from the data itself, so construct
        the asymmetry IN TIME: 'hot' concentrates early at a high
        share then vanishes, making day-level evidence swing; at
        minimum the walk must replay the SQL exactly and a balanced
        type must NOT decide."""
        import duckdb

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q295,
            q295_sprt_monitor,
        )

        rows = []
        eid = 0
        # 'steady' and 'other' split every day 50/50 for 20 days:
        # shares match p0 exactly -> LLR drifts slightly NEGATIVE
        # under H1 (the standard SPRT behavior at p = p0), but must
        # not cross ln(19) this fast.
        for day in range(20):
            for _ in range(30):
                rows.append((eid, day, "steady")); eid += 1
            for _ in range(30):
                rows.append((eid, day, "other")); eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[1], hours=2)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_sprt", ev, "events.parquet")
        got = (
            q295_sprt_monitor(d)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        # balanced-by-construction types: no H1 acceptance
        assert (got["decision"] <= 0).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(SQL_Q295).fetchdf()
        assert got.equals(
            want.sort_values("event_type").reset_index(drop=True)
        )

    def test_h0_rejection_fires(self, ray_session, tmp_path):
        """A type at exactly its average share accumulates negative
        LLR (running-at-p0 under an 'is it 10% hot?' test) and, given
        enough identical days, crosses the lower bound -> decision -1
        with a recorded decision day."""
        from barks_ocr_ray.pipelines.queries import q295_sprt_monitor

        rows = []
        eid = 0
        for day in range(120):
            for _ in range(40):
                rows.append((eid, day, "a")); eid += 1
            for _ in range(40):
                rows.append((eid, day, "b")); eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        _BASE + datetime.timedelta(days=r[1], hours=2)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_sprt2", ev, "events.parquet")
        got = q295_sprt_monitor(d).to_pandas()
        assert (got["decision"] == -1).all()
        assert (got["decision_day"] > 0).all()
        assert (got["final_llr_micro"] < 0).all()
