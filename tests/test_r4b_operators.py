"""Session-9 operator tests: grouped exact quantiles (q145's
primitive), global ntile without a sort (q146), n-gram containment
(q148), largest-remainder allocation (q149). The oracle sweep pins
exact values vs DuckDB on the fixed corpus; these pin the semantic
edges the sweep can't reach (ragged/constant groups, n < k ntile,
directed containment asymmetry, allocation invariants)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


class TestGroupedDistributedQuantiles:
    def _data(self):
        rng = np.random.default_rng(11)
        grps, vals = [], []
        # ragged group sizes spanning the pull-cap boundary
        for g, n in [("a", 37), ("b", 4_000), ("c", 1), ("d", 900)]:
            grps += [g] * n
            vals += list(rng.gamma(2.0, 30.0, size=n))
        return pa.table(
            {
                "k": pa.array(grps, pa.string()),
                "x": pa.array(vals, pa.float64()),
            }
        )

    def test_matches_duckdb_quantile_disc(self):
        from barks_ocr_ray.functions.quantiles import (
            grouped_distributed_quantiles,
        )

        t = self._data()
        qs = [0.1, 0.5, 0.9]
        got = grouped_distributed_quantiles(
            rd.from_arrow(t), "k", "x", qs, pull_cap=200
        ).to_pydict()
        con = duckdb.connect()
        con.register("t", t)
        for grp, q, v in zip(got["grp"], got["q"], got["value"]):
            (exp,) = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM t WHERE k = ?", [grp]
            ).fetchone()
            assert v == exp, (grp, q, v, exp)
        assert len(got["grp"]) == 4 * len(qs)

    def test_partitioning_invariant_and_null_handling(self):
        from barks_ocr_ray.functions.quantiles import (
            grouped_distributed_quantiles,
        )

        t = self._data()
        # splice in NULL values and a NULL key: both must be ignored
        extra = pa.table(
            {
                "k": pa.array(["a", "a", None], pa.string()),
                "x": pa.array([None, None, 5.0], pa.float64()),
            }
        )
        t2 = pa.concat_tables([t, extra])
        a = grouped_distributed_quantiles(
            rd.from_arrow(t), "k", "x", [0.5], pull_cap=200
        ).to_pydict()
        b = grouped_distributed_quantiles(
            rd.from_arrow(t2).repartition(13), "k", "x", [0.5], pull_cap=200
        ).to_pydict()
        assert a == b


class TestGlobalNtile:
    def _check(self, tmp_path, n):
        from barks_ocr_ray.pipelines.queries import q146_global_ntile

        rng = np.random.default_rng(n)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "n_chars": pa.array(
                    rng.integers(10, 40, size=n).astype(np.int64), pa.int64()
                ),
            }
        )
        d = tmp_path / f"sf_ntile_{n}"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        got = (
            q146_global_ntile(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        exp = con.execute(
            "SELECT doc_id, ntile(100) OVER (ORDER BY n_chars, doc_id) "
            "AS bucket FROM documents ORDER BY doc_id"
        ).fetch_df()
        assert list(got["bucket"]) == list(exp["bucket"])

    def test_uneven_fill_rule(self, tmp_path):
        # n % k != 0: DuckDB gives the first n%k buckets one extra row
        self._check(tmp_path, 137)

    def test_fewer_rows_than_buckets(self, tmp_path):
        # n < k: each row its own bucket
        self._check(tmp_path, 57)


class TestNgramContainment:
    def test_directed_asymmetry(self):
        from barks_ocr_ray.functions.dedupe import ngram_containment_pairs

        inner = "alpha bravo charlie delta echo foxtrot"  # 6 toks, 2 5-grams
        outer = inner + " golf hotel india juliett kilo lima mike november"
        filler = "oscar papa quebec romeo sierra tango uniform victor"
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([inner, outer, filler], pa.string()),
                }
            )
        )
        rows = ngram_containment_pairs(
            docs, threshold=0.5, ngram=5, df_cap=20
        ).to_pandas()
        pairs = {
            (a, b): c
            for a, b, c in zip(rows.doc_a, rows.doc_b, rows.containment)
        }
        # every 5-gram of doc 1 appears in doc 2 -> containment 1.0
        assert pairs[(1, 2)] == 1.0
        # doc 2 is NOT contained in doc 1 (its extra grams are unique,
        # df=1, but its size still divides) -> below threshold, absent
        assert (2, 1) not in pairs
        assert not [p for p in pairs if 3 in p]

    def test_null_text_and_no_pairs(self):
        from barks_ocr_ray.functions.dedupe import ngram_containment_pairs

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([None, "lone words here"], pa.string()),
                }
            )
        )
        out = ngram_containment_pairs(docs)
        assert out.count() == 0
        # typed empty (to_pandas on a 0-row Dataset drops the schema)
        assert out.schema().names == ["doc_a", "doc_b", "containment"]


class TestProportionalSample:
    def test_allocation_invariants(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import q149_proportional_sample

        rng = np.random.default_rng(3)
        langs = rng.choice(["en", "de", "fr", "zz"], p=[0.7, 0.17, 0.12, 0.01], size=4_000)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(4_000, dtype=np.int64)),
                "lang": pa.array(langs.tolist(), pa.string()),
            }
        )
        d = tmp_path / "sf_prop"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        got = q149_proportional_sample(str(d)).to_pandas()
        # exactly the budget, no group over-allocated past quota+1
        assert len(got) == 100
        share = got.groupby("lang").size()
        for lang, n_lang in zip(*np.unique(langs, return_counts=True)):
            quota = 100.0 * n_lang / 4_000
            if lang in share.index:
                assert abs(share[lang] - quota) < 1.0 + 1e-9
        # alloc column echoes the group's allocation for every kept row
        assert (got.groupby("lang")["alloc"].nunique() == 1).all()
