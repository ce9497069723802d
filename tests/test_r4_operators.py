"""Round-4 operator tests: histogram quantile sketch (q127), SCD2
history build (q128), incremental snapshot dedup (q129), snapshot
drift (q130). The oracle sweep pins exact values vs DuckDB; these pin
the semantic edges the sweep's fixed corpus can't reach."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(ids, texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


class TestHistogramQuantiles:
    def test_error_bounded_by_bucket_width(self):
        from barks_ocr_ray.functions.quantiles import (
            distributed_quantiles,
            histogram_quantiles,
        )

        rng = np.random.default_rng(7)
        vals = rng.gamma(2.0, 50.0, size=20_000)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
        qs = [0.1, 0.5, 0.9, 0.99]
        est = histogram_quantiles(ds, "x", qs, n_buckets=512).to_pydict()
        exact = distributed_quantiles(ds, "x", qs).to_pydict()
        width = (vals.max() - vals.min()) / 512
        for e, x in zip(est["value_est"], exact["value"]):
            # estimate is the upper edge of the bucket holding the
            # exact quantile -> within one bucket width above it
            assert x <= e + 1e-9 and e - x <= width + 1e-9

    def test_partitioning_invariance(self):
        from barks_ocr_ray.functions.quantiles import histogram_quantiles

        vals = np.linspace(0.0, 100.0, 5_000)
        t = pa.table({"x": pa.array(vals, pa.float64())})
        a = histogram_quantiles(
            rd.from_arrow(t), "x", [0.25, 0.5], n_buckets=64
        ).to_pydict()
        b = histogram_quantiles(
            rd.from_arrow(t).repartition(13), "x", [0.25, 0.5], n_buckets=64
        ).to_pydict()
        assert a == b

    def test_constant_column(self):
        from barks_ocr_ray.functions.quantiles import histogram_quantiles

        ds = rd.from_arrow(pa.table({"x": pa.array([5.0] * 100, pa.float64())}))
        out = histogram_quantiles(ds, "x", [0.5, 0.9], n_buckets=16).to_pydict()
        assert out["value_est"] == [5.0, 5.0]

    def test_empty(self):
        from barks_ocr_ray.functions.quantiles import histogram_quantiles

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
        out = histogram_quantiles(ds, "x", [0.5], n_buckets=16)
        assert out.num_rows == 0


class TestScd2History:
    def test_run_collapse_and_sentinel(self):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import q128_scd2_history

        # build a tiny corpus through a scratch dir the query reads
        import tempfile

        import pyarrow.parquet as pq

        ev = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        [
                            "2026-01-01 00:00:00",
                            "2026-01-01 01:00:00",
                            "2026-01-01 02:00:00",
                            "2026-01-01 00:30:00",
                            "2026-01-01 03:00:00",
                        ]
                    ).astype("datetime64[us]")
                ),
                "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
                "event_type": pa.array(
                    ["view", "view", "buy", "view", "buy"], pa.string()
                ),
                "value": pa.array([0.0] * 5, pa.float64()),
                "props": pa.array(["{}"] * 5, pa.string()),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(ev, f"{d}/events.parquet")
            out = (
                q128_scd2_history(d)
                .to_pandas()
                .sort_values(["user_id", "valid_from"])
                .reset_index(drop=True)
            )
        # user 1: view-run [00:00, 02:00), buy-run [02:00, 03:00) stays
        # open only until the next change... buy at 03:00 continues the
        # run -> ONE buy interval [02:00, sentinel)
        u1 = out[out.user_id == 1]
        assert list(u1.state) == ["view", "buy"]
        assert u1.iloc[0].valid_to == u1.iloc[1].valid_from
        assert str(u1.iloc[1].valid_to).startswith("9999-12-31")
        u2 = out[out.user_id == 2]
        assert len(u2) == 1 and str(u2.iloc[0].valid_to).startswith("9999")


class TestIncrementalDedup:
    def test_flags(self):
        from barks_ocr_ray.functions.curation import incremental_ingest_dedup

        span = "one two three four five six seven eight nine ten eleven"
        long_exact = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
        )
        docs = _docs(
            [0, 1, 7, 8, 9],
            [
                long_exact,  # prior
                span + " plus prior tail",  # prior (shares window)
                long_exact,  # new: exact dup (>= window tokens)
                span + " plus new tail",  # new: window dup only
                "completely fresh words here",  # new: clean
            ],
        )
        out = (
            incremental_ingest_dedup(docs, window=10)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [7, 8, 9]
        assert out.loc[7].dup_exact == 1  # identical text in prior
        # exact dup also shares every window with its prior copy
        assert out.loc[7].dup_window == 1
        assert (out.loc[8].dup_exact, out.loc[8].dup_window) == (0, 1)
        assert (out.loc[9].dup_exact, out.loc[9].dup_window) == (0, 0)

    def test_empty_prior_snapshot(self):
        from barks_ocr_ray.functions.curation import incremental_ingest_dedup

        docs = _docs([7, 17], ["same text", "same text"])
        out = incremental_ingest_dedup(docs, window=3).to_pandas()
        # no prior rows -> nothing can be a dup, but intra-new copies
        # must NOT flag each other (dedup is vs the PRIOR snapshot)
        assert sorted(out.doc_id) == [7, 17]
        assert out.dup_exact.sum() == 0 and out.dup_window.sum() == 0

    def test_null_text_never_matches(self):
        from barks_ocr_ray.functions.curation import incremental_ingest_dedup

        docs = _docs([0, 7], [None, None])
        out = incremental_ingest_dedup(docs, window=3).to_pandas()
        assert list(out.doc_id) == [7]
        assert out.dup_exact.sum() == 0 and out.dup_window.sum() == 0


class TestSnapshotDrift:
    def test_tv_distance_shape(self, tmp_path):
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q130_snapshot_drift

        t = pa.table(
            {
                "doc_id": pa.array(list(range(20)), pa.int64()),
                "text": pa.array(["x"] * 20, pa.string()),
                "lang": pa.array(["en"] * 10 + ["de"] * 10, pa.string()),
                "source": pa.array(["s"] * 20, pa.string()),
                "n_chars": pa.array([1] * 20, pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q130_snapshot_drift(str(tmp_path)).to_pydict()
        assert sorted(out["lang"]) == ["de", "en"]
        assert sum(out["n_prior"]) == 14 and sum(out["n_new"]) == 6
        # shares each sum to 1, tv in [0, 1]
        assert abs(sum(out["share_prior"]) - 1.0) < 1e-9
        assert abs(sum(out["share_new"]) - 1.0) < 1e-9
        tv = sum(out["tv_contrib"])
        assert 0.0 <= tv <= 1.0


class TestBpeTrain:
    def test_merge_kernel_non_overlapping(self):
        from barks_ocr_ray.functions.bpe import merge_pair_in_word

        # "aaa</w>" with merge (a, a): left-to-right non-overlapping
        assert merge_pair_in_word(["a", "a", "a", "</w>"], "a", "a") == [
            "aa",
            "a",
            "</w>",
        ]
        # merged symbol can participate in later merges
        assert merge_pair_in_word(["aa", "a", "</w>"], "aa", "a") == [
            "aaa",
            "</w>",
        ]

    def test_argmax_tiebreak_total_order(self):
        from collections import Counter

        from barks_ocr_ray.functions.bpe import best_pair

        c = Counter({("b", "x"): 5, ("a", "z"): 5, ("a", "y"): 5})
        assert best_pair(c) == (("a", "y"), 5)
        assert best_pair(Counter()) is None

    def test_matches_golden_and_partitioning_invariant(self):
        from barks_ocr_ray.functions.bpe import bpe_train
        from barks_ocr_ray.golden_dedup import golden_bpe_merges

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox",
            "lazy lazy lazy dogs dogs",
            None,
            "",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        def _pyd(ds):
            df = ds.to_pandas()
            return {k: list(df[k]) for k in df.columns}

        want = golden_bpe_merges(t, n_merges=8).to_pydict()
        got1 = _pyd(bpe_train(rd.from_arrow(t), n_merges=8))
        got2 = _pyd(bpe_train(rd.from_arrow(t).repartition(7), n_merges=8))
        assert got1 == want and got2 == want

    def test_exhausts_pairs_early(self):
        from barks_ocr_ray.functions.bpe import bpe_train

        # single 1-char word: only pair is (a, </w>); after merging it
        # there are no adjacencies left -> 1 row, not n_merges
        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["a"], pa.string()),
            }
        )
        df = bpe_train(rd.from_arrow(t), n_merges=5).to_pandas()
        assert list(df.merge_round) == [1]
        assert (list(df.lhs), list(df.rhs)) == (["a"], ["</w>"])


class TestBpeEncode:
    def test_encode_matches_golden_and_null_text(self):
        from barks_ocr_ray.functions.bpe import bpe_encode_stats, bpe_train
        from barks_ocr_ray.golden_dedup import golden_bpe_encode_stats

        texts = ["low lower lowest", "low low low", None, ""]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        want = golden_bpe_encode_stats(t, n_merges=6).to_pandas()
        g = bpe_train(rd.from_arrow(t), n_merges=6).to_pandas()
        merges = list(zip(g["lhs"], g["rhs"]))
        got = (
            bpe_encode_stats(rd.from_arrow(t), merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(want.sort_values("doc_id").reset_index(drop=True))
        # null/empty text encodes to (0, 0), not an error
        assert got.loc[2, "n_words"] == 0 and got.loc[2, "n_subwords"] == 0
        assert got.loc[3, "n_words"] == 0 and got.loc[3, "n_subwords"] == 0

    def test_merges_shrink_subword_count(self):
        from barks_ocr_ray.functions.bpe import encode_word_len

        # no merges: chars + EOW
        assert encode_word_len("low", []) == 4
        # ("l","o") then ("lo","w") then ("low","</w>") -> single symbol
        merges = [("l", "o"), ("lo", "w"), ("low", "</w>")]
        assert encode_word_len("low", merges) == 1


class TestGroupedHistogramQuantiles:
    def test_per_group_grids_are_independent(self):
        from barks_ocr_ray.functions.quantiles import (
            grouped_histogram_quantiles,
        )

        # group "narrow" spans [0, 1]; group "wide" spans [0, 1e6] — a
        # SHARED grid would give "narrow" a single bucket (useless
        # resolution); per-group grids keep its p50 near 0.5
        narrow = np.linspace(0.0, 1.0, 1001)
        wide = np.linspace(0.0, 1e6, 1001)
        t = pa.table(
            {
                "g": pa.array(["narrow"] * 1001 + ["wide"] * 1001),
                "x": pa.array(np.concatenate([narrow, wide]), pa.float64()),
            }
        )
        out = (
            grouped_histogram_quantiles(
                rd.from_arrow(t), "g", "x", [0.5], n_buckets=256
            )
            .to_pandas()
            .set_index("g")
        )
        assert abs(out.loc["narrow"].value_est - 0.5) <= 1.0 / 256 + 1e-9
        assert abs(out.loc["wide"].value_est - 5e5) <= 1e6 / 256 + 1e-9

    def test_empty_input(self):
        from barks_ocr_ray.functions.quantiles import (
            grouped_histogram_quantiles,
        )

        t = pa.table(
            {"g": pa.array([], pa.string()), "x": pa.array([], pa.float64())}
        )
        out = grouped_histogram_quantiles(
            rd.from_arrow(t), "g", "x", [0.5]
        ).to_pandas()
        assert len(out) == 0


class TestPsiDrift:
    def test_identical_distributions_give_near_zero_psi(self, tmp_path):
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q134_psi_drift

        # prices interleave across the snapshot split (key % 10 walks
        # the price ramp uniformly on both sides) -> PSI ~ 0
        n = 2000
        keys = np.arange(n, dtype=np.int64)
        prices = np.linspace(10.0, 1000.0, n)
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array(keys % 7, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([0] * n, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        out = q134_psi_drift(str(tmp_path)).to_pydict()
        assert out["bucket"] == list(range(10))
        assert sum(out["n_prior"]) + sum(out["n_new"]) == n
        assert abs(sum(out["psi_contrib"])) < 0.01

    def test_shifted_distribution_flags_drift(self, tmp_path):
        import pyarrow.parquet as pq

        from barks_ocr_ray.pipelines.queries import q134_psi_drift

        # prior uniform low, new uniform high -> large PSI
        n = 2000
        keys = np.arange(n, dtype=np.int64)
        pri = (keys % 10) < 7
        prices = np.where(pri, 100.0 + (keys % 50), 900.0 + (keys % 50))
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array(keys % 7, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([0] * n, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        out = q134_psi_drift(str(tmp_path)).to_pydict()
        # industry rule of thumb: PSI > 0.25 = significant shift
        assert sum(out["psi_contrib"]) > 0.25
        # new-side mass clamps into the top bucket of the PRIOR grid
        assert out["n_new"][9] == sum(out["n_new"])


class TestIncrementalMinhash:
    def test_cross_snapshot_only_and_best_match(self):
        from barks_ocr_ray.functions.dedupe import incremental_minhash_dedup

        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon "
        ) * 6
        other = (
            "completely different vocabulary nothing shared at all here "
            "with its own repeated phrasing and structure every time "
        ) * 6
        docs = _docs(
            [0, 7, 17, 8],
            [
                base,  # prior
                base + "tail variation one",  # new: near-dup of 0
                base + "tail variation two",  # new: near-dup of 0 AND 7
                other,  # new: no prior match
            ],
        )
        out = (
            incremental_minhash_dedup(docs, threshold=0.4)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc 8 matches nothing prior; docs 7/17 match prior doc 0 —
        # NOT each other (7 and 17 are both new, so their mutual
        # near-dup pair must not surface here)
        assert sorted(out.index) == [7, 17]
        assert out.loc[7].match_id == 0 and out.loc[17].match_id == 0
        assert (out.est_jaccard >= 0.4).all()


class TestTriangleCounts:
    def test_known_graph(self):
        from barks_ocr_ray.functions.graph import triangle_counts

        # K4 on {1,2,3,4} plus a pendant edge (4,5): each K4 node sits
        # in C(3,2)=3 triangles; node 5 in none
        edges = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
                    "b": pa.array([2, 3, 4, 3, 4, 4, 5], pa.int64()),
                }
            )
        )
        out = triangle_counts(edges).to_pandas().set_index("node")
        assert sorted(out.index) == [1, 2, 3, 4]
        assert (out.n_triangles == 3).all()

    def test_bipartite_graph_has_none(self):
        from barks_ocr_ray.functions.graph import triangle_counts

        # C4 cycle (bipartite): no triangles -> typed empty
        edges = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([1, 2, 1, 3], pa.int64()),
                    "b": pa.array([2, 4, 3, 4], pa.int64()),
                }
            )
        )
        df = triangle_counts(edges).to_pandas()
        assert len(df) == 0


class TestWeightedQuantiles:
    def test_equivalent_to_row_expansion(self):
        from barks_ocr_ray.functions.quantiles import (
            distributed_quantiles,
            weighted_quantiles,
        )

        rng = np.random.default_rng(3)
        vals = rng.normal(100.0, 15.0, size=400)
        wts = rng.integers(1, 6, size=400)
        t = pa.table(
            {
                "v": pa.array(vals, pa.float64()),
                "wt": pa.array(wts, pa.int64()),
            }
        )
        qs = [0.1, 0.5, 0.9]
        got = weighted_quantiles(
            rd.from_arrow(t), "v", "wt", qs, pull_cap=50
        ).to_pydict()
        # ground truth: expand each row weight times, unweighted disc
        expanded = pa.table(
            {"v": pa.array(np.repeat(vals, wts), pa.float64())}
        )
        want = distributed_quantiles(
            rd.from_arrow(expanded), "v", qs, pull_cap=50
        ).to_pydict()
        assert got["value"] == want["value"]

    def test_unit_weights_match_unweighted(self):
        from barks_ocr_ray.functions.quantiles import (
            distributed_quantiles,
            weighted_quantiles,
        )

        vals = np.linspace(0, 1, 500)
        t = pa.table(
            {
                "v": pa.array(vals, pa.float64()),
                "wt": pa.array(np.ones(500, np.int64), pa.int64()),
            }
        )
        qs = [0.25, 0.75]
        a = weighted_quantiles(rd.from_arrow(t), "v", "wt", qs).to_pydict()
        b = distributed_quantiles(rd.from_arrow(t), "v", qs).to_pydict()
        assert a["value"] == b["value"]
