"""Session-10 operator tests: compression-ratio gates (q159) and
character-entropy signal (q160)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / fname))
    return str(d)


class TestCompressionRatio:
    def test_gates_fire_on_constructed_docs(self, tmp_path):
        from barks_ocr_ray.functions.cleaning import (
            RANDOM_BP,
            REPETITIVE_BP,
            compression_bp,
        )
        from barks_ocr_ray.pipelines.queries import q159_compression_ratio

        rng = np.random.default_rng(11)
        # random printable ASCII (encoded-garbage payload): ~83% ratio,
        # above the RANDOM_BP gate
        rand_text = "".join(chr(33 + int(x)) for x in rng.integers(0, 90, 4000))
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "source": pa.array(["a", "a", "a", "b"], pa.string()),
                "text": pa.array(
                    ["xy" * 5000, rand_text, None, "a normal short sentence"],
                    pa.string(),
                ),
            }
        )
        assert compression_bp("xy" * 5000) <= REPETITIVE_BP
        assert compression_bp(rand_text) >= RANDOM_BP
        d = _write(tmp_path, "sf_comp", docs, "documents.parquet")
        got = (
            q159_compression_ratio(d).to_pandas().set_index("source").sort_index()
        )
        # null text excluded: source a has 2 docs (1 repetitive, 1 random)
        assert got.loc["a", "n_docs"] == 2
        assert got.loc["a", "n_repetitive"] == 1
        assert got.loc["a", "n_random"] == 1
        # source b's doc is under MIN_GATE_LEN: counted + summed, but
        # exempt from both gates (header overhead would mis-flag it)
        assert got.loc["b", "n_docs"] == 1
        assert got.loc["b", "n_repetitive"] == 0
        assert got.loc["b", "n_random"] == 0
        assert got.loc["b", "sum_ratio_bp"] == compression_bp(
            "a normal short sentence"
        )

    def test_golden_replay_matches_pipeline(self, tmp_path):
        from barks_ocr_ray.golden_dedup import golden_compression_stats
        from barks_ocr_ray.pipelines.queries import q159_compression_ratio

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "source", "text"],
        )
        d = _write(tmp_path, "sf_g", docs, "documents.parquet")
        got = (
            q159_compression_ratio(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        exp = (
            golden_compression_stats(docs)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert got[exp.columns.tolist()].equals(exp)


class TestCharEntropy:
    def test_matches_duckdb_and_flags_constant_text(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q160, q160_char_entropy

        rng = np.random.default_rng(5)
        texts = []
        for i in range(300):
            k = int(rng.integers(1, 60))
            texts.append(
                "".join(
                    chr(97 + int(c)) for c in rng.integers(0, 26, k)
                )
            )
        texts[0] = "aaaaaaaa"  # entropy 0 -> low-entropy gate
        texts[1] = ""  # excluded on both sides
        texts[2] = None
        docs = pa.table(
            {
                "doc_id": pa.array(range(300), pa.int64()),
                "source": pa.array(
                    [f"s{i % 3}" for i in range(300)], pa.string()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ent", docs, "documents.parquet")
        got = (
            q160_char_entropy(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q160 + " ORDER BY source").fetch_df()
        assert got["source"].tolist() == exp["source"].tolist()
        for c in ("n_docs", "n_low_entropy", "sum_entropy_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.set_index("source").loc["s0", "n_low_entropy"] >= 1

    def test_unicode_codepoints_counted_not_bytes(self, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q160, q160_char_entropy

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "source": pa.array(["u", "u"], pa.string()),
                "text": pa.array(["héllo wörld héllo", "日本語テキスト例"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_uni", docs, "documents.parquet")
        got = q160_char_entropy(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q160).fetch_df()
        assert (
            got["sum_entropy_micro"].tolist() == exp["sum_entropy_micro"].tolist()
        )


class TestLinkGraph:
    def test_kernel_resolves_and_normalizes(self):
        from barks_ocr_ray.functions.links import page_outlinks

        html = (
            b'<html><head><meta charset="utf-8"><title>t</title></head>'
            b'<body><a href="/news">Breaking  News</a>'
            b'<a href="https://other.example/x">Else<b>where</b></a>'
            b"</body></html>"
        )
        got = page_outlinks("https://host1.example/abc", html)
        assert got == [
            ("https://host1.example/news", "Breaking News"),
            ("https://other.example/x", "Else where"),
        ]
        assert page_outlinks("https://h.example/x", b"\x00\x01junk") == []

    def test_distinct_sources_vs_refs(self, tmp_path):
        import ray.data as rd

        from barks_ocr_ray.functions.links import link_graph_topk

        # page A links twice to /t, page B once -> n_refs 3, n_src 2
        mk = lambda body: f'<html><head><title>x</title></head><body>{body}</body></html>'.encode()
        pages = pa.table(
            {
                "url": pa.array(
                    ["https://h0.example/a", "https://h0.example/b"],
                    pa.string(),
                ),
                "html": pa.array(
                    [
                        mk('<a href="/t">one</a><a href="/t">two</a>'),
                        mk('<a href="/t">three</a><a href="/u">four</a>'),
                    ],
                    pa.binary(),
                ),
            }
        )
        got = link_graph_topk(rd.from_arrow(pages), k=5).to_pandas()
        row = got.set_index("target").loc["https://h0.example/t"]
        assert row["n_refs"] == 3
        assert row["n_src_pages"] == 2

    def test_pipeline_matches_golden(self):
        from barks_ocr_ray.datagen import pages_table
        from barks_ocr_ray.golden_dedup import (
            golden_anchor_terms,
            golden_link_graph,
        )
        from barks_ocr_ray.pipelines.queries import (
            q161_link_graph,
            q162_anchor_terms,
        )

        pages = pages_table(300)
        import ray.data as rd

        from barks_ocr_ray.functions.links import (
            anchor_term_index,
            link_graph_topk,
        )

        ds = rd.from_arrow(pages).select_columns(["url", "html"])
        got = link_graph_topk(ds, k=15).to_pandas()
        exp = golden_link_graph(pages, k=15).to_pandas()
        assert got.equals(exp)
        got2 = anchor_term_index(ds, k=25).to_pandas()
        exp2 = golden_anchor_terms(pages, k=25).to_pandas()
        assert got2.equals(exp2)


class TestHits:
    PAIRS = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("c", "a"), ("d", "c"), ("a", "b"),
    ]

    @staticmethod
    def _serial(pairs, iters):
        from barks_ocr_ray.functions.graph import HITS_SCALE

        nodes = sorted({x for p in pairs for x in p})
        idx = {n: i for i, n in enumerate(nodes)}
        edges = sorted({(idx[s], idx[d]) for s, d in pairs})
        n = len(nodes)
        h = np.full(n, HITS_SCALE // n, np.int64)
        a = np.zeros(n, np.int64)
        for _ in range(iters):
            ar = np.zeros(n, np.int64)
            for s, d in edges:
                ar[d] += h[s]
            a = ar // max(1, int(ar.sum()) // HITS_SCALE)
            hr = np.zeros(n, np.int64)
            for s, d in edges:
                hr[s] += a[d]
            h = hr // max(1, int(hr.sum()) // HITS_SCALE)
        return {nodes[i]: (int(h[i]), int(a[i])) for i in range(n)}

    def _table(self):
        return pa.table(
            {
                "src": pa.array([p[0] for p in self.PAIRS], pa.string()),
                "dst": pa.array([p[1] for p in self.PAIRS], pa.string()),
            }
        )

    def test_both_regimes_match_serial_replay(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.functions.graph import hits

        exp = self._serial(self.PAIRS, 4)
        got_bsp = {
            r["node"]: (r["hub"], r["auth"])
            for r in hits(
                rd.from_arrow(self._table()), 4, num_partitions=2
            ).take_all()
        }
        # broadcast_gate=0 forces the distributed join rounds
        got_join = {
            r["node"]: (r["hub"], r["auth"])
            for r in hits(
                rd.from_arrow(self._table()),
                4,
                num_partitions=2,
                broadcast_gate=0,
            ).take_all()
        }
        assert got_bsp == exp
        assert got_join == exp

    def test_empty_input_is_typed_empty(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.functions.graph import hits

        empty = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
        out = hits(rd.from_arrow(empty), 2)
        assert out.schema().names == ["node", "hub", "auth"]
        assert out.count() == 0

    def test_q163_matches_golden(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.datagen import pages_table
        from barks_ocr_ray.functions.graph import hits
        from barks_ocr_ray.functions.links import outlink_edges
        from barks_ocr_ray.golden_dedup import golden_hits

        pages_tbl = pages_table(300)
        pages = rd.from_arrow(pages_tbl).select_columns(["url", "html"])
        pairs = outlink_edges(pages).map_batches(
            lambda t: pa.table(
                {"src": t.column("src"), "dst": t.column("target")}
            ),
            batch_format="pyarrow",
        )
        got = (
            hits(pairs, iterations=5)
            .sort(["auth", "node"], descending=[True, False])
            .limit(25)
            .to_pandas()
        )
        exp = golden_hits(pages_tbl, iterations=5, k=25).to_pandas()
        assert got.equals(exp)


class TestCanonicalDedup:
    def test_kernel_alias_classes(self):
        from barks_ocr_ray.datagen import url_for, url_variant
        from barks_ocr_ray.functions.links import canonical_url

        u = url_for(37)
        for i in range(10):
            assert canonical_url(url_variant(u, i)) == u, i
        # param sorting + tracking strip + non-default port kept
        assert (
            canonical_url("https://Host.Example:8080/a/?b=2&a=1&utm_x=9#f")
            == "https://host.example:8080/a?a=1&b=2"
        )
        assert canonical_url("http://www.h.example:80/") == "http://h.example/"

    def test_pipeline_matches_golden(self, ray_session):
        from barks_ocr_ray.golden_dedup import golden_canonical_dedup
        from barks_ocr_ray.pipelines.queries import q164_canonical_dedup
        from barks_ocr_ray.datagen import pages_table
        from barks_ocr_ray.oracle_data import Q24_N

        got = q164_canonical_dedup("/root/testdata/sf0.001").to_pandas()
        exp = golden_canonical_dedup(pages_table(Q24_N)).to_pandas()
        assert got.equals(exp)
        # refetch rows (i%10==4) alias-collapse onto their original:
        # at least one canonical must show 2 fetches under 2 spellings
        multi = exp[exp["n_fetches"] >= 2]
        assert len(multi) > 0
        assert (multi["n_raw_urls"] >= 2).any()


class TestPhraseSearch:
    def test_overlapping_occurrences_count(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            Q165_PHRASES,
            _sql_q165,
            q165_phrase_search,
        )

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the the the the",  # 'the the' x3 (overlap)
                        "big order scan big order scan",
                        None,
                        "row column sort and row column sorting",
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_ph", docs, "documents.parquet")
        got = q165_phrase_search(d).to_pandas().set_index("phrase")
        assert got.loc["the the", "n_occurrences"] == 3
        assert got.loc["the the", "n_docs"] == 1
        assert got.loc["big order scan", "n_occurrences"] == 2
        assert got.loc["big order scan", "n_docs"] == 1
        # 'sorting' does not match 'sort' at pos 3 only once at pos 2
        assert got.loc["row column sort", "n_occurrences"] == 1
        assert got.loc["slow hash batch", "n_occurrences"] == 0
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q165()).fetch_df().set_index("phrase")
        assert got["n_occurrences"].tolist() == exp["n_occurrences"].tolist()
        assert got["n_docs"].tolist() == exp["n_docs"].tolist()


class TestIntervalOverlap:
    def _events(self):
        import pandas as pd

        # user 1: a[0,10m] overlaps b@5m (pair a->b) and c@10m boundary
        # (inclusive end: pair a->c) but b[5m,5m+0] does not reach c.
        # user 2: two events at the SAME instant -> event_id order.
        return pa.table(
            {
                "event_id": pa.array([1, 2, 3, 10, 11], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array(
                    [
                        pd.Timestamp("2024-01-01 00:00:00"),
                        pd.Timestamp("2024-01-01 00:05:00"),
                        pd.Timestamp("2024-01-01 00:10:00"),
                        pd.Timestamp("2024-01-01 09:00:00"),
                        pd.Timestamp("2024-01-01 09:00:00"),
                    ],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["A", "B", "C", "D", "E"], pa.string()),
                "value": pa.array([10.0, 0.0, 1.0, 0.0, -5.0], pa.float64()),
            }
        )

    def test_boundary_tie_and_negative_duration(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q166, q166_interval_overlap

        d = _write(tmp_path, "sf_iv", self._events(), "events.parquet")
        got = q166_interval_overlap(d).to_pandas()
        pairs = {
            (r.type_a, r.type_b): r.n_pairs for r in got.itertuples()
        }
        assert pairs == {("A", "B"): 1, ("A", "C"): 1, ("D", "E"): 1}
        con = duckdb.connect()
        con.register("events", self._events())
        exp = con.execute(SQL_Q166).fetch_df()
        assert got.equals(exp)

    def test_partition_invariant(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from barks_ocr_ray.functions.windows import interval_overlap_pairs
        import ray.data as rd

        docs = pq.read_table("/root/testdata/sf0.001/events.parquet")
        a = (
            interval_overlap_pairs(rd.from_arrow(docs), num_partitions=2)
            .sort(["type_a", "type_b"])
            .to_pandas()
        )
        b = (
            interval_overlap_pairs(
                rd.from_arrow(docs).repartition(7), num_partitions=5
            )
            .sort(["type_a", "type_b"])
            .to_pandas()
        )
        assert a.equals(b)


class TestRetentionMatrix:
    def test_cohort_and_offsets(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import SQL_Q167, q167_retention_matrix

        W = 7 * 86400
        base = pd.Timestamp("2024-01-01")
        rows = [
            # user 1: weeks 0, 1, 3 (retained at offsets 0, 1, 3)
            (1, base),
            (1, base + pd.Timedelta(seconds=W)),
            (1, base + pd.Timedelta(seconds=3 * W)),
            (1, base + pd.Timedelta(seconds=3 * W + 60)),  # same week dup
            # user 2: joins week 1, active week 1 only
            (2, base + pd.Timedelta(seconds=W + 3600)),
        ]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ret", ev, "events.parquet")
        got = q167_retention_matrix(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q167).fetch_df()
        assert got.equals(exp)
        m = {
            (r.cohort_week, r.week_offset): r.n_active
            for r in got.itertuples()
        }
        c1 = min(k[0] for k in m)
        # user 1's cohort: active at offsets 0,1,3 (same-week dup collapses);
        # user 2 joins one week later
        assert m[(c1, 0)] == 1 and m[(c1, 1)] == 1 and m[(c1, 3)] == 1
        assert m[(c1 + 1, 0)] == 1
        assert (c1, 2) not in m


class TestCrawlFrontier:
    def test_pipeline_matches_golden(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.datagen import pages_table
        from barks_ocr_ray.functions.links import frontier_by_host, url_host
        from barks_ocr_ray.golden_dedup import golden_frontier

        assert url_host("https://WWW.Host1.Example:443/x") == "www.host1.example"
        pages_tbl = pages_table(300)
        ds = rd.from_arrow(pages_tbl).select_columns(["url", "html"])
        got = frontier_by_host(ds, k=20).to_pandas()
        exp = golden_frontier(pages_tbl, k=20).to_pandas()
        assert got.equals(exp)
        assert len(got) > 0  # link farms spray uncrawled targets
        assert (got["n_refs"] >= got["n_uncrawled_urls"]).all()

    def test_crawled_targets_are_excluded(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.functions.links import frontier_by_host

        mk = lambda body: (
            "<html><head><title>x</title></head>"
            f"<body>{body}</body></html>"
        ).encode()
        pages = pa.table(
            {
                "url": pa.array(
                    ["https://h.example/a", "https://h.example/b"],
                    pa.string(),
                ),
                "html": pa.array(
                    [
                        # /b is crawled -> excluded; /c and /d are frontier
                        mk('<a href="/b">x</a><a href="/c">y</a><a href="/d">z</a><a href="/c">w</a>'),
                        mk('<a href="/a">x</a>'),
                    ],
                    pa.binary(),
                ),
            }
        )
        got = frontier_by_host(rd.from_arrow(pages), k=5).to_pandas()
        assert got["host"].tolist() == ["h.example"]
        assert got["n_uncrawled_urls"].tolist() == [2]  # /c, /d
        assert got["n_refs"].tolist() == [3]  # /c twice + /d once


class TestSourceDivergence:
    def test_identical_disjoint_and_symmetry_free(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q169, q169_source_divergence

        docs = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "source": pa.array(["a", "a", "b", "b", "c", "c"], pa.string()),
                "text": pa.array(
                    [
                        "x y z", "x y",          # a
                        "x y z", "x y",          # b: identical dist -> JS 0
                        "p q r", "p q",          # c: disjoint -> JS = ln(2)
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_js", docs, "documents.parquet")
        got = q169_source_divergence(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q169).fetch_df()
        assert got["js_micro"].tolist() == exp["js_micro"].tolist()
        assert got["source_a"].tolist() == exp["source_a"].tolist()
        m = {
            (r.source_a, r.source_b): r.js_micro for r in got.itertuples()
        }
        assert m[("a", "b")] == 0
        # disjoint vocabularies: JS = ln 2 (in micro-nats, +-term rounding)
        assert abs(m[("a", "c")] - 693147) <= 5
        assert set(m) == {("a", "b"), ("a", "c"), ("b", "c")}


class TestFkOrphanAudit:
    def test_orphans_and_null_exemption(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import SQL_Q170, q170_fk_orphan_audit

        d = tmp_path / "sf_fk"
        d.mkdir()
        tables = {
            "orders": pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 99, None], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * 3, pa.string()),
                    "o_totalprice": pa.array([1.0] * 3, pa.float64()),
                    "o_orderdate": pa.array(
                        [pd.Timestamp("2024-01-01")] * 3, pa.timestamp("us")
                    ),
                    "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
                }
            ),
            "customer": pa.table(
                {
                    "c_custkey": pa.array([10], pa.int64()),
                    "c_name": pa.array(["c"], pa.string()),
                    "c_nationkey": pa.array([0], pa.int32()),
                    "c_acctbal": pa.array([0.0], pa.float64()),
                    "c_mktsegment": pa.array(["B"], pa.string()),
                }
            ),
            "lineitem": pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 7], pa.int64()),
                    "l_partkey": pa.array([100, 200, 100], pa.int64()),
                    "l_suppkey": pa.array([5, 5, 5], pa.int64()),
                    "l_linenumber": pa.array([1, 2, 1], pa.int32()),
                    "l_quantity": pa.array([1.0] * 3, pa.float64()),
                    "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
                    "l_discount": pa.array([0.0] * 3, pa.float64()),
                    "l_tax": pa.array([0.0] * 3, pa.float64()),
                    "l_returnflag": pa.array(["N"] * 3, pa.string()),
                    "l_linestatus": pa.array(["O"] * 3, pa.string()),
                    "l_shipdate": pa.array(
                        [pd.Timestamp("2024-01-02")] * 3, pa.timestamp("us")
                    ),
                }
            ),
            "part": pa.table(
                {
                    "p_partkey": pa.array([100], pa.int64()),
                    "p_name": pa.array(["p"], pa.string()),
                    "p_brand": pa.array(["b"], pa.string()),
                    "p_type": pa.array(["t"], pa.string()),
                    "p_size": pa.array([1], pa.int32()),
                    "p_retailprice": pa.array([1.0], pa.float64()),
                }
            ),
            "supplier": pa.table(
                {
                    "s_suppkey": pa.array([5], pa.int64()),
                    "s_name": pa.array(["s"], pa.string()),
                    "s_nationkey": pa.array([0], pa.int32()),
                    "s_acctbal": pa.array([0.0], pa.float64()),
                }
            ),
        }
        for name, tbl in tables.items():
            pq.write_table(tbl, str(d / f"{name}.parquet"))
        got = q170_fk_orphan_audit(str(d)).to_pandas().set_index("fk_edge")
        # l_orderkey=7 is an orphan; l_partkey=200 orphan; suppkeys fine;
        # o_custkey=99 orphan, NULL custkey exempt
        assert got.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
        assert got.loc["lineitem.l_partkey->part", "n_orphans"] == 1
        assert got.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 0
        assert got.loc["orders.o_custkey->customer", "n_orphans"] == 1
        assert got.loc["orders.o_custkey->customer", "n_rows"] == 3
        con = duckdb.connect()
        for name, tbl in tables.items():
            con.register(name, tbl)
        exp = con.execute(SQL_Q170).fetch_df().set_index("fk_edge")
        assert got["n_orphans"].tolist() == exp["n_orphans"].tolist()
        assert got["n_rows"].tolist() == exp["n_rows"].tolist()


class TestSubnormalHistogramRange:
    def test_histogram_quantiles_subnormal_range_takes_constant_path(
        self, ray_session
    ):
        """hi != lo but (hi - lo) / B underflows to 0.0 — the hypothesis
        counterexample [0.0, 5e-324]. The guard on the computed width
        must route this to the constant-column path instead of emitting
        NaN buckets."""
        import ray.data as rd

        from barks_ocr_ray.functions.quantiles import histogram_quantiles

        t = pa.table({"v": pa.array([0.0, 5e-324], pa.float64())})
        out = histogram_quantiles(
            rd.from_arrow(t), "v", qs=(0.5, 0.9), n_buckets=1024
        ).to_pandas()
        assert out["value_est"].tolist() == [0.0, 0.0]


class TestLengthBucketing:
    def test_multi_batch_waste_matches_duckdb(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q171, q171_length_bucketing

        rng = np.random.default_rng(3)
        texts = []
        for i in range(2500):
            k = int(rng.integers(1, 40))
            texts.append(" ".join(["w"] * k))
        texts[5] = None
        texts[6] = ""
        docs = pa.table(
            {
                "doc_id": pa.array(range(2500), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_lb", docs, "documents.parquet")
        got = q171_length_bucketing(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q171).fetch_df()
        for c in ("bucket", "n_docs", "n_batches", "padding_waste"):
            assert got[c].tolist() == exp[c].tolist(), c
        # at least one bucket must overflow into a second batch
        assert (got["n_batches"] >= 2).any()
        assert got["n_docs"].sum() == 2498  # null + empty excluded

    def test_sorted_batching_beats_random_on_waste(self, ray_session, tmp_path):
        """The point of the report: length-sorted batches waste less
        padding than the unbucketed single-stream upper bound."""
        from barks_ocr_ray.pipelines.queries import q171_length_bucketing

        rng = np.random.default_rng(9)
        lens = rng.integers(1, 200, 600)
        docs = pa.table(
            {
                "doc_id": pa.array(range(600), pa.int64()),
                "text": pa.array(
                    [" ".join(["w"] * int(k)) for k in lens], pa.string()
                ),
            }
        )
        d = _write(tmp_path, "sf_lb2", docs, "documents.parquet")
        got = q171_length_bucketing(d).to_pandas()
        total_waste = got["padding_waste"].sum()
        # naive single batch-of-all padding waste
        naive = lens.max() * len(lens) - lens.sum()
        assert total_waste < naive


class TestSourceOverlap:
    def test_shared_trigrams_and_grid_zeros(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q172,
            q172_source_overlap,
        )

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "source": pa.array(["a", "b", "c"], pa.string()),
                # a: {x y z, y z w}; b: {x y z}; c: {p q r}
                "text": pa.array(["x y z w", "x y z", "p q r"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ov", docs, "documents.parquet")
        got = q172_source_overlap(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q172()).fetch_df()
        for c in ("source_a", "source_b", "n_shared", "jaccard_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = {
            (r.source_a, r.source_b): (r.n_shared, r.jaccard_micro)
            for r in got.itertuples()
        }
        assert m[("a", "b")] == (1, 500000)  # 1 shared of union 2
        assert m[("a", "c")] == (0, 0)  # grid keeps the zero pair
        assert m[("b", "c")] == (0, 0)


class TestCalibrationReport:
    def test_matches_sql_and_counts_every_doc(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q173,
            q173_calibration_report,
        )

        texts = [None, "short.", "the of and a to in is it for was. " * 8]
        texts += [f"word{i} spam eggs " * (i + 1) for i in range(9)]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "lang": pa.array(
                    ["en", "zh", "en"] + ["en", "de", "fr"] * 3, pa.string()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_cal", docs, "documents.parquet")
        got = q173_calibration_report(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q173()).fetch_df()
        for c in ("bin", "n_docs", "n_en", "sum_score_bp"):
            assert got[c].tolist() == exp[c].tolist(), c
        # null text scores as empty text: every doc lands in some bin
        assert got["n_docs"].sum() == len(texts)
        assert (got["n_en"] <= got["n_docs"]).all()


class TestZipfSlope:
    def test_parity_and_negative_slope(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q174, q174_zipf_slope

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "source": pa.array(["s", "s"], pa.string()),
                "text": pa.array(
                    ["aa aa aa aa bb bb cc", "aa aa bb dd"], pa.string()
                ),
            }
        )
        d = _write(tmp_path, "sf_zipf", docs, "documents.parquet")
        got = q174_zipf_slope(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q174()).fetch_df()
        for c in ("n_words", "sx", "sy", "sxy", "sxx", "slope_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got["n_words"].iloc[0] == 4
        assert got["slope_micro"].iloc[0] < 0  # frequency falls with rank

    def test_single_word_vocab_returns_typed_empty(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q174_zipf_slope

        docs = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "source": pa.array(["s"], pa.string()),
                "text": pa.array(["aa aa aa"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_zipf1", docs, "documents.parquet")
        got = q174_zipf_slope(d)
        assert got.num_rows == 0
        assert got.column_names == [
            "n_words", "sx", "sy", "sxy", "sxx", "slope_micro",
        ]


class TestDiscriminativeTerms:
    def test_source_unique_word_ranks_first(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q175,
            q175_discriminative_terms,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "source": pa.array(["a"] * 3 + ["b"] * 3, pa.string()),
                "text": pa.array(
                    [
                        "zebra common stuff",
                        "zebra common other",
                        "zebra common stuff",
                        "common stuff other",
                        "common other words",
                        "common stuff words",
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_disc", docs, "documents.parquet")
        got = q175_discriminative_terms(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q175()).fetch_df()
        for c in ("source", "word", "score_micro", "rk"):
            assert got[c].tolist() == exp[c].tolist(), c
        top_a = got[(got.source == "a") & (got.rk == 1)]["word"].iloc[0]
        top_b = got[(got.source == "b") & (got.rk == 1)]["word"].iloc[0]
        assert top_a == "zebra"  # only source a says zebra
        assert top_b == "words"  # only source b says words


class TestHybridRrf:
    def test_both_legs_beat_single_leg(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q176, q176_hybrid_rrf

        n = 10
        texts = ["plain words only"] * n
        texts[3] = "spark join spark join spark"   # strong lexical hit
        texts[5] = "spark appears once here"       # weak lexical hit
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array(["s"] * n, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        rng = np.random.default_rng(3)
        base = rng.normal(size=(n, 8)).astype(np.float32)
        base[3] = base[7] + 0.01 * base[3]  # vec 3 nearly parallel to query 7
        emb = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in base], pa.list_(pa.float32())
                ),
            }
        )
        d = tmp_path / "sf_rrf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        pq.write_table(emb, str(d / "embeddings.parquet"))
        got = q176_hybrid_rrf(str(d)).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        con.register("embeddings", emb)
        exp = con.execute(_sql_q176()).fetch_df()
        for c in ("doc_id", "lex_rank", "vec_rank", "rrf_micro", "final_rank"):
            assert got[c].tolist() == exp[c].tolist(), c
        # doc 3 scores on BOTH legs -> fused winner
        top = got[got.final_rank == 1].iloc[0]
        assert top.doc_id == 3 and top.lex_rank >= 1 and top.vec_rank >= 1
        # single-leg docs still appear but below the dual-leg doc
        assert 5 in got.doc_id.tolist()


class TestLengthPercentile:
    def test_ties_share_rank_and_singleton_source(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q178,
            q178_length_percentile,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "source": pa.array(["a"] * 5 + ["b"], pa.string()),
                "text": pa.array(
                    # lengths a: 1, 2, 2, 3, and one null (dropped)
                    ["w", "w w", "x x", "w w w", None, "solo doc"],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_pct", docs, "documents.parquet")
        got = (
            q178_length_percentile(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        exp = (
            con.execute(_sql_q178())
            .fetch_df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ("doc_id", "source", "L", "pct_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        by_id = got.set_index("doc_id")["pct_micro"]
        assert by_id[1] == by_id[2]  # tied lengths share the rank
        assert by_id[0] == 0 and by_id[3] == 1000000
        assert by_id[5] == 0  # singleton source: percent_rank 0
        assert 4 not in by_id.index  # null text dropped


class TestHeapsLaw:
    def test_vocab_grows_with_fresh_words(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q179, q179_heaps_law

        # doc k introduces one brand-new word alongside old ones
        texts = [
            " ".join(f"w{j}" for j in range(k + 1)) for k in range(10)
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "source": pa.array(["s"] * 10, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_heaps", docs, "documents.parquet")
        got = q179_heaps_law(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q179()).fetch_df()
        for c in ("checkpoint", "doc_lt", "cum_tokens", "vocab_size"):
            assert got[c].tolist() == exp[c].tolist(), c
        v = got["vocab_size"].tolist()
        assert v == sorted(v) and v[-1] == 10  # monotone, all words seen
        assert got["cum_tokens"].tolist()[-1] == sum(range(1, 11))


class TestPostingCompression:
    def test_varint_ladder_and_gap_encoding(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q180,
            q180_posting_compression,
        )

        # word 'rare' appears at doc ids 0 and 200 (gap 200 -> 2 bytes);
        # word 'hot' at 0,1,2 (gaps 1,1,1 -> 1 byte each)
        ids = [0, 1, 2, 200]
        texts = ["hot rare", "hot", "hot", "rare"]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(["s"] * 4, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_post", docs, "documents.parquet")
        got = q180_posting_compression(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q180()).fetch_df()
        for c in ("word", "n_postings", "bytes_delta", "bytes_raw"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = got.set_index("word")
        assert m.loc["hot", "bytes_delta"] == 3   # gaps 1,1,1
        assert m.loc["rare", "bytes_delta"] == 3  # gap 1 (0-(-1)) + gap 200
        assert m.loc["rare", "bytes_raw"] == 16


class TestMarketBasket:
    def test_lift_separates_coupled_and_independent(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q181,
            q181_market_basket,
        )

        # users 0-3: {buy, ship} always together; users 4-7: {view} only;
        # user 8: all three -> lift(buy,ship) high, lift(buy,view) low
        rows = []
        for u in range(4):
            rows += [(u, "buy"), (u, "ship"), (u, "buy")]  # dup collapses
        for u in range(4, 8):
            rows += [(u, "view")]
        rows += [(8, "buy"), (8, "ship"), (8, "view")]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        [f"2026-01-01 00:{i:02d}:00" for i in range(len(rows))]
                    ),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_basket", ev, "events.parquet")
        got = q181_market_basket(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q181).fetch_df()
        for c in ("type_a", "type_b", "n_ab", "n_a", "n_b", "lift_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = {(r.type_a, r.type_b): r.lift_micro for r in got.itertuples()}
        # buy+ship: 5 of 9 users have both, 5 have each -> lift 9/5
        assert m[("buy", "ship")] == 1800000
        assert m[("buy", "view")] < 1000000  # anti-correlated


class TestMmrDiversified:
    def test_diversification_skips_clone_and_matches_golden(
        self, ray_session, tmp_path
    ):
        import ray.data as rd

        from barks_ocr_ray.functions.ann import mmr_topk
        from barks_ocr_ray.golden_dedup import golden_mmr_topk

        rng = np.random.default_rng(5)
        d = 16
        q = rng.normal(size=d)
        a = q + 0.001 * rng.normal(size=d)      # id 1: near-clone of q
        a2 = a + 0.0001 * rng.normal(size=d)    # id 2: near-clone of a
        b = rng.normal(size=d)                  # id 3: distinct
        c = rng.normal(size=d)                  # id 4: distinct
        mat = np.stack([q, a, a2, b, c]).astype(np.float32)
        emb = pa.table(
            {
                "vec_id": pa.array(range(5), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in mat], pa.list_(pa.float32())
                ),
            }
        )
        got = mmr_topk(
            rd.from_arrow(emb), [0], pool_k=4, k=4, lam=0.5
        ).to_pandas()
        exp = golden_mmr_topk(emb, [0], pool_k=4, k=4, lam=0.5).to_pandas()
        for col in ("query_id", "rank", "neighbor_id", "rel_cosine", "mmr_score"):
            assert got[col].tolist() == exp[col].tolist(), col
        picks = got["neighbor_id"].tolist()
        assert picks[0] == 1  # most relevant first
        # rank 2 must NOT be the clone of the rank-1 pick
        assert picks[1] != 2
        assert set(picks) == {1, 2, 3, 4}


class TestJoinSkewAudit:
    def test_uniform_vs_hot_key(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import (
            SQL_Q183,
            q183_join_skew_audit,
        )

        def _orders(custkeys):
            n = len(custkeys)
            return pa.table(
                {
                    "o_orderkey": pa.array(range(n), pa.int64()),
                    "o_custkey": pa.array(custkeys, pa.int64()),
                    "o_orderstatus": pa.array(["O"] * n, pa.string()),
                    "o_totalprice": pa.array([1.0] * n, pa.float64()),
                    "o_orderdate": pa.array(
                        pd.to_datetime(["2026-01-01"] * n), pa.timestamp("us")
                    ),
                    "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
                }
            )

        uniform = _orders([i % 10 for i in range(100)])
        hot = _orders([0] * 91 + list(range(1, 10)))
        ginis = {}
        for name, t in (("uni", uniform), ("hot", hot)):
            d = _write(tmp_path, f"sf_skew_{name}", t, "orders.parquet")
            got = q183_join_skew_audit(d).to_pandas()
            con = duckdb.connect()
            con.register("orders", t)
            exp = con.execute(SQL_Q183).fetch_df()
            for c in ("n_keys", "n_rows", "max_key_rows",
                      "p99_key_rows", "gini_micro"):
                assert got[c].tolist() == exp[c].tolist(), (name, c)
            ginis[name] = got["gini_micro"].iloc[0]
        assert ginis["uni"] == 0  # perfectly balanced keys
        assert ginis["hot"] > 800000  # one key holds 91% of rows
        # hot-key table: max key carries 91 rows
        assert exp["max_key_rows"].iloc[0] == 91


class TestMinhashErrorAudit:
    def test_identical_docs_have_zero_error(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q184_minhash_error_audit

        # two identical docs -> est_jaccard 1.0 and exact 1.0: zero error
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "source": pa.array(["s"] * 3, pa.string()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon zeta",
                        "alpha beta gamma delta epsilon zeta",
                        "totally different words here now",
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_mherr", docs, "documents.parquet")
        got = q184_minhash_error_audit(d).to_pandas()
        assert got["n_pairs"].iloc[0] == 1
        assert got["sum_abs_err_micro"].iloc[0] == 0
        assert got["max_abs_err_micro"].iloc[0] == 0
        assert got["n_over"].iloc[0] == 0

    def test_empty_pair_set_single_zero_row(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q184_minhash_error_audit

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "source": pa.array(["s", "s"], pa.string()),
                "text": pa.array(
                    ["nothing shared here at all", "完全 不同 的 词"],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_mherr0", docs, "documents.parquet")
        got = q184_minhash_error_audit(d).to_pandas()
        assert got["n_pairs"].iloc[0] == 0
        assert len(got) == 1


class TestIvfRecallAudit:
    def test_recall_bounds_and_consistency(self, ray_session):
        from barks_ocr_ray.pipelines.queries import q186_ivf_recall_audit

        got = q186_ivf_recall_audit("/root/testdata/sf0.001").to_pandas()
        assert len(got) == 8
        assert ((got.n_hits >= 0) & (got.n_hits <= 10)).all()
        # recall_micro is exactly the rounded hit ratio
        import numpy as np

        from barks_ocr_ray.functions.relational import round_like_duckdb

        expect = [
            int(round_like_duckdb((1e6 * h) / 10, 0)) for h in got.n_hits
        ]
        assert got.recall_micro.tolist() == expect


class TestAttritionReport:
    def test_funnel_monotone_and_matches_sql(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q187,
            q187_attrition_report,
        )

        # srcA: 10 unique docs + 5 duplicated texts (dedup losses);
        # srcB: includes a repetitive doc (Gopher gate loss)
        texts, src = [], []
        for i in range(10):
            texts.append(f"unique document number {i} with plain words")
            src.append("srcA")
        for i in range(5):
            texts.append("this exact duplicated text appears twice here")
            texts.append("this exact duplicated text appears twice here")
            src.extend(["srcA", "srcA"])
        texts.append("spam " * 60)  # dup_token_frac ~ 1 -> repetition gate
        src.append("srcB")
        texts.append("a normal srcb document with several distinct words")
        src.append("srcB")
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "source": pa.array(src, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_attr", docs, "documents.parquet")
        got = q187_attrition_report(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q187()).fetch_df()
        for c in ("source", "n_total", "n_train", "n_dedup",
                  "n_rep_ok", "n_clean"):
            assert got[c].tolist() == exp[c].tolist(), c
        # funnel is monotone per source
        for _, r in got.iterrows():
            assert (
                r.n_total >= r.n_train >= r.n_dedup
                >= r.n_rep_ok >= r.n_clean >= 0
            )
        a = got.set_index("source").loc["srcA"]
        assert a.n_dedup < a.n_train  # duplicate texts collapsed


class TestBurstWindows:
    def test_sliding_beats_tumbling_and_ties_count(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import SQL_Q188, q188_burst_windows

        # user 0: 3 events straddling an hour boundary within 10 min of
        # each other (tumbling hours would see max 2); user 1 has two
        # events at the SAME instant (RANGE peers both count)
        ts = pd.to_datetime(
            [
                "2026-01-01 00:55:00", "2026-01-01 01:00:00",
                "2026-01-01 01:05:00", "2026-01-01 09:00:00",
                "2026-02-01 00:00:00", "2026-02-01 00:00:00",
            ]
        )
        ev = pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([0, 0, 0, 0, 1, 1], pa.int64()),
                "event_type": pa.array(["view"] * 6, pa.string()),
                "value": pa.array([1.0] * 6, pa.float64()),
                "props": pa.array(["{}"] * 6, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_burst", ev, "events.parquet")
        got = q188_burst_windows(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q188).fetch_df()
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["max_burst"].tolist() == exp["max_burst"].tolist()
        m = got.set_index("user_id")["max_burst"]
        assert m[0] == 3  # sliding window catches the straddle
        assert m[1] == 2  # equal-timestamp peers both in frame


class TestTwoHopReach:
    def test_path_graph_reach(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import (
            _sql_q189,
            q189_two_hop_reach,
        )

        # path C1 - S1 - C2 - S2: reach(C1) = {S1, C2} = 2,
        # reach(S1) = {C1, C2, S2} = 3 (2 hops), etc.
        orders = pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 2, 2], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3, pa.string()),
                "o_totalprice": pa.array([1.0] * 3, pa.float64()),
                "o_orderdate": pa.array(
                    pd.to_datetime(["2026-01-01"] * 3), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
            }
        )
        lineitem = pa.table(
            {
                "l_orderkey": pa.array([10, 11, 12], pa.int64()),
                "l_suppkey": pa.array([1, 1, 2], pa.int64()),
                "l_partkey": pa.array([1, 1, 1], pa.int64()),
                "l_quantity": pa.array([1.0] * 3, pa.float64()),
                "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
                "l_discount": pa.array([0.0] * 3, pa.float64()),
                "l_returnflag": pa.array(["N"] * 3, pa.string()),
                "l_linestatus": pa.array(["O"] * 3, pa.string()),
            }
        )
        d = tmp_path / "sf_2hop"
        d.mkdir()
        pq.write_table(orders, str(d / "orders.parquet"))
        pq.write_table(lineitem, str(d / "lineitem.parquet"))
        got = q189_two_hop_reach(str(d)).to_pandas()
        con = duckdb.connect()
        con.register("orders", orders)
        con.register("lineitem", lineitem)
        exp = con.execute(_sql_q189()).fetch_df()
        assert got["node"].tolist() == exp["node"].tolist()
        assert got["n_reach"].tolist() == exp["n_reach"].tolist()
        m = got.set_index("node")["n_reach"]
        assert m["C1"] == 2 and m["S1"] == 3 and m["C2"] == 3 and m["S2"] == 2


class TestReshardChurn:
    def test_rendezvous_moves_about_one_in_nine(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q190,
            _sql_q191,
            q190_reshard_churn,
            q191_shard_balance,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(range(400), pa.int64()),
                "source": pa.array(["s"] * 400, pa.string()),
                "text": pa.array(["t"] * 400, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_shard", docs, "documents.parquet")
        got = q190_reshard_churn(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q190()).fetch_df()
        for c in ("n_keys", "moved_modulo", "moved_rendezvous"):
            assert got[c].tolist() == exp[c].tolist(), c
        # modulo reshuffles ~8/9 of keys; rendezvous ~1/9
        assert got.moved_modulo.iloc[0] > 300
        assert got.moved_rendezvous.iloc[0] < 100
        bal = q191_shard_balance(d).to_pandas()
        exp_b = con.execute(_sql_q191()).fetch_df()
        assert bal["shard"].tolist() == exp_b["shard"].tolist()
        assert bal["n_keys"].tolist() == exp_b["n_keys"].tolist()
        assert bal["n_keys"].sum() == 400
        assert len(bal) == 9  # every shard populated at n=400


def _events_table(rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    import pandas as pd

    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                pd.to_datetime([r[1] for r in rows]), pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


class TestLastTouchAttribution:
    def test_tie_rule_and_unattributed(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q192,
            q192_last_touch_attribution,
        )

        rows = [
            # user 0: purchase BEFORE any click -> unattributed; then
            # click, then purchase -> attributed
            (0, "2026-01-01 00:00:00", 0, "purchase", 10.0),
            (1, "2026-01-01 01:00:00", 0, "click", 0.0),
            (2, "2026-01-01 02:00:00", 0, "purchase", 20.0),
            # user 1: click and purchase at the SAME ts — click has the
            # smaller event_id, so it counts (ROWS-frame tie rule)
            (3, "2026-01-02 00:00:00", 1, "click", 0.0),
            (4, "2026-01-02 00:00:00", 1, "purchase", 5.0),
            # user 2: purchase then click at same ts but click has the
            # LARGER event_id -> NOT counted
            (6, "2026-01-03 00:00:00", 2, "click", 0.0),
            (5, "2026-01-03 00:00:00", 2, "purchase", 7.0),
        ]
        ev = _events_table(rows)
        d = _write(tmp_path, "sf_attr_lt", ev, "events.parquet")
        got = q192_last_touch_attribution(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q192).fetch_df()
        for c in ("user_id", "n_purchases", "n_attributed",
                  "attributed_cents"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = got.set_index("user_id")
        assert m.loc[0, "n_attributed"] == 1
        assert m.loc[0, "attributed_cents"] == 2000
        assert m.loc[1, "n_attributed"] == 1  # same-ts, smaller id
        assert m.loc[2, "n_attributed"] == 0  # same-ts, larger id


class TestDailyPeriodicity:
    def test_perfect_24h_cycle_scores_high(self, ray_session, tmp_path):
        import pandas as pd

        from barks_ocr_ray.pipelines.queries import (
            _sql_q193,
            q193_daily_periodicity,
        )

        # 6 days of a perfect 24h pattern: busy at hour 0, quiet else
        # (some hours EMPTY -> exercises the dense-spine zeros)
        rows = []
        eid = 0
        for day in range(6):
            for k in range(5):  # 5 events at midnight
                rows.append(
                    (eid, f"2026-01-0{day+1} 00:{k:02d}:00", 0, "view", 1.0)
                )
                eid += 1
            rows.append((eid, f"2026-01-0{day+1} 12:00:00", 0, "view", 1.0))
            eid += 1
        ev = _events_table(rows)
        d = _write(tmp_path, "sf_period", ev, "events.parquet")
        got = q193_daily_periodicity(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(_sql_q193()).fetch_df()
        for c in ("n_hours", "n_pairs", "autocorr_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got["autocorr_micro"].iloc[0] == 1000000  # perfect cycle


class TestQualityDedup:
    def test_best_copy_wins_not_first(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q194_quality_dedup

        # docs 0 and 1 share the same token set (identical MinHash
        # signature -> same cluster); doc 1 carries punctuation and
        # stopwords, so the q64 model scores it higher than doc 0
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "source": pa.array(["s"] * 3, pa.string()),
                "text": pa.array(
                    [
                        "the cat sat on the mat today and the sun is warm",
                        "The cat sat on the mat today and the sun is warm.",
                        "completely unrelated other topic entirely here",
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_qdedup", docs, "documents.parquet")
        got = q194_quality_dedup(d).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r.kept_doc == 1        # higher-quality copy, NOT min id
        assert r.n_members == 2
        assert r.score_gain_bp > 0    # policy beat min-id


class TestRerank:
    def test_matches_sql_and_penalizes_length(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q195, q195_rerank

        n = 12
        rng = np.random.default_rng(9)
        base = rng.normal(size=(n, 8)).astype(np.float32)
        base[3] = base[7] + 0.01 * base[3]  # vec 3 near query 7
        texts = ["plain filler words"] * n
        texts[3] = "spark join relevant"
        texts[5] = ("spark join " * 300).strip()  # huge doc: length penalty
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": pa.array(["s"] * n, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        emb = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in base], pa.list_(pa.float32())
                ),
            }
        )
        d = tmp_path / "sf_rerank"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        pq.write_table(emb, str(d / "embeddings.parquet"))
        got = q195_rerank(str(d)).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        con.register("embeddings", emb)
        exp = con.execute(_sql_q195()).fetch_df()
        for c in ("doc_id", "rerank_score", "final_rank"):
            assert got[c].tolist() == exp[c].tolist(), c
        ranks = got.set_index("doc_id")["final_rank"]
        assert ranks[3] == 1  # dual-signal doc wins
        # the 600-token doc ranks below the short lexical doc despite
        # identical BM25 terms (length penalty applied)
        assert 5 not in ranks.index or ranks[5] > ranks[3]


class TestQualityPercentileGate:
    def test_equal_selectivity_across_sources(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q196,
            q196_quality_percentile_gate,
        )

        # srcClean: uniformly high-quality docs; srcSpam: uniformly
        # low-quality. An absolute gate would keep all of one and none
        # of the other; the percentile gate keeps ~30% of EACH.
        texts, src = [], []
        for i in range(10):
            texts.append(
                f"The number {i} item is on the list. It was fine! " * (i + 2)
            )
            src.append("srcClean")
        for i in range(10):
            texts.append(f"tok{i} " * (i + 1))
            src.append("srcSpam")
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "source": pa.array(src, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_pctgate", docs, "documents.parquet")
        got = q196_quality_percentile_gate(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q196()).fetch_df()
        for c in ("source", "n_docs", "n_kept", "kept_score_bp"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = got.set_index("source")["n_kept"]
        assert m["srcClean"] == m["srcSpam"] == 3  # same selectivity


class TestDatasetCard:
    def test_card_accounting(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q197, q197_dataset_card

        docs = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "source": pa.array(["a", "a", "b", "b", "c", "c"], pa.string()),
                "lang": pa.array(["en", "en", "zh", "en", "de", "de"], pa.string()),
                "text": pa.array(
                    [
                        "alpha beta gamma",
                        "alpha beta gamma",   # exact dup
                        "delta epsilon",
                        None,                 # null text: its own group
                        "zeta eta theta iota",
                        "",                   # empty text: distinct from null
                    ],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_card", docs, "documents.parquet")
        got = q197_dataset_card(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q197()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.iloc[0]
        assert r.n_docs == 6 and r.n_sources == 3 and r.n_langs == 3
        assert r.n_exact_dups == 1  # only the alpha-beta-gamma pair
        assert r.vocab_size == 9 and r.n_tokens == 3 + 3 + 2 + 4


class TestHardNegatives:
    def test_near_miss_wins_and_margin(self, ray_session, tmp_path):
        import ray.data as rd

        from barks_ocr_ray.functions.ann import hard_negative_pairs

        emb = pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [
                        [1.0, 0.0, 0.0],
                        [0.9, 0.1, 0.0],   # same label: the positive
                        [0.95, 0.05, 0.0],  # other label, CLOSER: hard neg
                        [0.0, 1.0, 0.0],   # other label, far
                    ],
                    pa.list_(pa.float64()),
                ),
                "label": pa.array([0, 0, 1, 1], pa.int64()),
            }
        )
        got = hard_negative_pairs(rd.from_arrow(emb), [0]).to_pandas()
        assert got.query_id.tolist() == [0]
        assert got.pos_id.tolist() == [1] and got.neg_id.tolist() == [2]
        # the hard negative is CLOSER than the positive: negative margin
        assert got.margin.iloc[0] < 0
        v = np.array([[1, 0, 0], [0.9, 0.1, 0], [0.95, 0.05, 0]], float)
        u = v / np.linalg.norm(v, axis=1)[:, None]
        assert got.pos_cosine.iloc[0] == round(float(u[0] @ u[1]), 6)
        assert got.neg_cosine.iloc[0] == round(float(u[0] @ u[2]), 6)

    def test_anchor_without_other_label_drops(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.functions.ann import hard_negative_pairs

        emb = pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.8, 0.2]], pa.list_(pa.float64())
                ),
                "label": pa.array([0, 0], pa.int64()),
            }
        )
        got = hard_negative_pairs(rd.from_arrow(emb), [0]).to_pandas()
        assert len(got) == 0


class TestPaddingWaste:
    def _docs(self):
        # bimodal lengths: short 2-token docs and long 40-token docs
        texts = []
        for i in range(160):
            texts.append("w " * (40 if i % 2 else 2))
        return pa.table(
            {
                "doc_id": pa.array(range(160), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    def test_sorted_batching_beats_arrival(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q199,
            q199_padding_waste,
        )

        docs = self._docs()
        d = _write(tmp_path, "sf_pad", docs, "documents.parquet")
        got = q199_padding_waste(d).to_pandas().set_index("strategy")
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q199()).fetch_df().set_index("strategy")
        for c in ("n_batches", "useful_tokens", "padded_tokens", "waste_bp"):
            assert got[c].tolist() == exp[c].tolist(), c
        # useful tokens are policy-invariant; padding is not — in the
        # alternating corpus arrival order pads every short doc to 40
        assert got.useful_tokens["sorted"] == got.useful_tokens["arrival"]
        assert got.padded_tokens["sorted"] < got.padded_tokens["arrival"]

    def test_fast_hash_path_preserves_useful_tokens(
        self, ray_session, tmp_path
    ):
        from barks_ocr_ray.pipelines.queries import q199_padding_waste

        d = _write(tmp_path, "sf_pad_fast", self._docs(), "documents.parquet")
        md5 = q199_padding_waste(d, hash_method="md5").to_pandas()
        fast = q199_padding_waste(d, hash_method="splitmix64").to_pandas()
        # shard membership differs, corpus accounting does not
        assert md5.useful_tokens.tolist() == fast.useful_tokens.tolist()
        assert (fast.waste_bp >= 0).all() and (fast.n_batches > 0).all()


class TestPerplexityBuckets:
    def test_predictable_docs_land_in_head(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q200,
            q200_perplexity_buckets,
        )

        # 9 scorable docs: 3 of pure corpus-dominant words (low xent),
        # 3 mixed, 3 of singleton rare words (high xent), 1 empty (drops)
        texts = (
            ["the the the the"] * 3
            + [f"the the mid{i} mid{i}" for i in range(3)]
            + [f"zq{i}a zq{i}b zq{i}c zq{i}d" for i in range(3)]
            + [""]
        )
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ppl", docs, "documents.parquet")
        got = q200_perplexity_buckets(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q200()).fetch_df()
        for c in ("bucket", "n_docs", "n_tokens", "avg_xent"):
            assert got[c].tolist() == exp[c].tolist(), c
        g = got.set_index("bucket")
        # the empty doc drops: 9 scorable docs split 3/3/3 at tertiles
        assert int(g.n_docs.sum()) == 9
        assert g.n_docs.tolist() == [3, 3, 3]
        # head is the predictable third, tail the surprising third
        assert g.avg_xent["head"] < g.avg_xent["middle"] < g.avg_xent["tail"]

    def test_empty_corpus_returns_typed_empty(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q200_perplexity_buckets

        docs = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([""], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ppl_empty", docs, "documents.parquet")
        got = q200_perplexity_buckets(d)
        assert isinstance(got, pa.Table) and got.num_rows == 0
        assert got.column_names == ["bucket", "n_docs", "n_tokens", "avg_xent"]


class TestLexicalDiversity:
    def test_template_farm_scores_low_distinct2(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q201,
            q201_lexical_diversity,
        )

        # 'farm' repeats one template; 'fresh' is all-unique tokens;
        # 'tiny' has a 1-token doc (no bigrams) and an empty doc
        texts, srcs = [], []
        for _ in range(5):
            texts.append("click here to win a prize click here")
            srcs.append("farm")
        for i in range(5):
            texts.append(f"u{i}a u{i}b u{i}c u{i}d")
            srcs.append("fresh")
        texts += ["solo", ""]
        srcs += ["tiny", "tiny"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_lex", docs, "documents.parquet")
        got = q201_lexical_diversity(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q201()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        g = got.set_index("source")
        assert g.distinct2["farm"] < g.distinct2["fresh"] == 1.0
        # the 1-token source has unigram mass but zero bigrams
        assert g.bigrams["tiny"] == 0 and g.distinct2["tiny"] == 0.0
        assert g.unigrams["tiny"] == 1


class TestSyndicationMatrix:
    def test_cross_and_within_source_pairs(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q202,
            q202_syndication_matrix,
        )

        # content X: 2 copies in a, 3 in b -> (a,b)=6, (a,a)=1, (b,b)=3
        # content Y: 1 copy in a, 1 in c -> (a,c)=1
        # unique docs + two null-text docs in b and c -> (b,c)=1
        texts = ["X", "X", "X", "X", "X", "Y", "Y", "solo1", "solo2", None, None]
        srcs = ["a", "a", "b", "b", "b", "a", "c", "a", "b", "b", "c"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_synd", docs, "documents.parquet")
        got = q202_syndication_matrix(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q202()).fetch_df()
        for c in ("source_a", "source_b", "n_dup_pairs"):
            assert got[c].tolist() == exp[c].tolist(), c
        m = {(r.source_a, r.source_b): r.n_dup_pairs for r in got.itertuples()}
        assert m[("a", "b")] == 6 and m[("a", "a")] == 1 and m[("b", "b")] == 3
        assert m[("a", "c")] == 1
        # null-text docs form ONE content group (oracle coalesce key)
        assert m[("b", "c")] == 1

    def test_no_dups_returns_empty(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q202_syndication_matrix

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["p", "q"], pa.string()),
                "source": pa.array(["a", "b"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_synd2", docs, "documents.parquet")
        got = q202_syndication_matrix(d)
        assert isinstance(got, pa.Table) and got.num_rows == 0
        assert got.column_names == ["source_a", "source_b", "n_dup_pairs"]


class TestHllErrorAudit:
    def test_exact_leg_and_error_sign(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q203_hll_error_audit

        # 'click' has 50 distinct users, 'view' has 5 (each seen twice)
        types = ["click"] * 50 + ["view"] * 10
        users = list(range(50)) + [100 + (i % 5) for i in range(10)]
        ev = pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "user_id": pa.array(users, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_hll", ev, "events.parquet")
        got = q203_hll_error_audit(d).to_pandas().set_index("event_type")
        assert got.n_exact["click"] == 50 and got.n_exact["view"] == 5
        # at these cardinalities HLL p=12 is in linear-counting range:
        # estimates should be within 2% -> rel_err_micro within 20000
        assert abs(got.rel_err_micro["click"]) < 20000
        assert abs(got.rel_err_micro["view"]) < 20000
        # the golden replay shares the kernel: estimate equals a
        # sequential fold of the same registers
        from barks_ocr_ray.golden_dedup import golden_hll_grouped

        g = golden_hll_grouped(ev).to_pandas().set_index("event_type")
        assert got.n_distinct_est["click"] == g.n_distinct_est["click"]
        assert got.n_distinct_est["view"] == g.n_distinct_est["view"]


class TestMaxCoverage:
    def test_greedy_order_and_early_stop(self, ray_session, tmp_path):
        import ray.data as rd

        from barks_ocr_ray.functions.selection import (
            golden_max_coverage,
            max_coverage_select,
        )

        # doc0 covers 5 terms; doc1 covers 3 fresh; doc2 overlaps doc0
        # entirely; doc3 adds 1 fresh; doc4 empty. Greedy: 0, 1, 3, stop.
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "aa bb cc dd ee",
                        "ff gg hh",
                        "aa bb cc",
                        "ee ii",
                        "",
                    ],
                    pa.string(),
                ),
            }
        )
        got = max_coverage_select(rd.from_arrow(docs), k=10).to_pandas()
        assert got.doc_id.tolist() == [0, 1, 3]
        assert got.gain.tolist() == [5, 3, 1]
        assert got.covered_total.tolist() == [5, 8, 9]
        # the sequential golden shares the kernel bit-exactly
        g = golden_max_coverage(docs, k=10).to_pandas()
        assert g.equals(got)

    def test_tie_breaks_to_smaller_doc_id(self, ray_session):
        import ray.data as rd

        from barks_ocr_ray.functions.selection import max_coverage_select

        docs = pa.table(
            {
                "doc_id": pa.array([7, 3], pa.int64()),
                "text": pa.array(["xx yy", "pp qq"], pa.string()),
            }
        )
        got = max_coverage_select(rd.from_arrow(docs), k=1).to_pandas()
        assert got.doc_id.tolist() == [3]

    def test_partitioning_invariance(self, ray_session, tmp_path):
        import ray.data as rd

        from barks_ocr_ray.functions.selection import max_coverage_select

        texts = [f"common w{i}a w{i}b" for i in range(40)]
        docs = pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        one = max_coverage_select(rd.from_arrow(docs), k=5).to_pandas()
        many = max_coverage_select(
            rd.from_arrow(docs).repartition(8), k=5
        ).to_pandas()
        assert one.equals(many)


class TestKsDrift:
    def test_identical_sides_zero_and_disjoint_max(
        self, ray_session, tmp_path
    ):
        from barks_ocr_ray.pipelines.queries import _sql_q205, q205_ks_drift

        # ids 0-6 (prior) and 7-9 (new) per decade; give both sides the
        # SAME length distribution -> KS = 0
        ids = list(range(40))
        lens = [(i % 10) % 4 + 10 for i in ids]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(lens, pa.int64()),
                "text": pa.array(["x"] * 40, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ks0", docs, "documents.parquet")
        got = q205_ks_drift(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q205()).fetch_df()
        for c in ("n_prior", "n_new", "n_values", "ks_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        # prior decades contribute ids%10 in 0..6 -> same multiset as
        # new? not exactly -> just assert oracle parity above; now the
        # fully-disjoint case must hit KS = 1
        docs2 = pa.table(
            {
                "doc_id": pa.array([0, 1, 7, 8], pa.int64()),
                "n_chars": pa.array([5, 5, 100, 100], pa.int64()),
                "text": pa.array(["x"] * 4, pa.string()),
            }
        )
        d2 = _write(tmp_path, "sf_ks1", docs2, "documents.parquet")
        got2 = q205_ks_drift(d2).to_pandas()
        con2 = duckdb.connect()
        con2.register("documents", docs2)
        exp2 = con2.execute(_sql_q205()).fetch_df()
        for c in ("n_prior", "n_new", "n_values", "ks_micro"):
            assert got2[c].tolist() == exp2[c].tolist(), c
        assert got2.ks_micro.iloc[0] == 1_000_000


class TestLangSourceMi:
    def test_specialized_vs_mixed(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q206, q206_lang_source_mi

        def corpus(specialized):
            langs, srcs = [], []
            for i in range(120):
                if specialized:  # lang fully determined by source
                    srcs.append(f"s{i % 3}")
                    langs.append(f"l{i % 3}")
                else:  # independent
                    srcs.append(f"s{i % 3}")
                    langs.append(f"l{(i // 3) % 3}")
            return pa.table(
                {
                    "doc_id": pa.array(range(120), pa.int64()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(srcs, pa.string()),
                }
            )

        for tag, spec in (("spec", True), ("mix", False)):
            docs = corpus(spec)
            d = _write(tmp_path, f"sf_mi_{tag}", docs, "documents.parquet")
            got = q206_lang_source_mi(d).to_pandas()
            con = duckdb.connect()
            con.register("documents", docs)
            exp = con.execute(_sql_q206()).fetch_df()
            for c in got.columns:
                assert got[c].tolist() == exp[c].tolist(), (tag, c)
            if spec:  # MI == H(lang): lang is a function of source
                assert got.mi_micro.iloc[0] == got.h_lang_micro.iloc[0]
            else:  # independent -> MI ~ 0 (exactly 0 up to rounding)
                assert abs(got.mi_micro.iloc[0]) <= 9  # 9 cells x <=1 microunit


class TestVocabBandCoverage:
    def test_three_bands_with_boundary_ties(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q207,
            q207_vocab_band_coverage,
        )

        # 5 head terms x 50 occurrences; 20 terms x 3 occurrences that
        # straddle the B1=10 boundary (lexicographic tie-break decides);
        # 1200 singleton tail terms straddle B2=1000 the same way
        parts = []
        for i in range(5):
            parts.extend([f"head{i}"] * 50)
        for i in range(20):
            parts.extend([f"mid{i:02d}"] * 3)
        parts.extend(f"tail{i:04d}" for i in range(1200))
        # spread across 7 docs so block partials merge
        texts = [
            " ".join(parts[j::7]) for j in range(7)
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(range(7), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_band", docs, "documents.parquet")
        got = q207_vocab_band_coverage(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q207()).fetch_df()
        for c in ("band", "n_terms", "tokens", "share_bp"):
            assert got[c].tolist() == exp[c].tolist(), c
        g = got.set_index("band")
        assert g.n_terms.tolist() == [10, 990, 225]
        # top band: 5 head terms + first 5 'mid' terms by term asc
        assert g.tokens["a_top"] == 5 * 50 + 5 * 3
        assert int(g.share_bp.sum()) in (9999, 10000, 10001)  # rounding


class TestEmbeddingIsotropy:
    def test_aligned_vs_orthogonal(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q208,
            q208_embedding_isotropy,
        )

        def run(vectors, tag):
            emb = pa.table(
                {
                    "vec_id": pa.array(range(len(vectors)), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vectors],
                        pa.list_(pa.float32()),
                    ),
                }
            )
            d = _write(tmp_path, f"sf_iso_{tag}", emb, "embeddings.parquet")
            got = q208_embedding_isotropy(d).to_pandas()
            con = duckdb.connect()
            con.register("embeddings", emb)
            exp = con.execute(_sql_q208()).fetch_df()
            for c in got.columns:
                assert got[c].tolist() == exp[c].tolist(), (tag, c)
            return got.iloc[0]

        # all vectors identical direction -> mean pairwise cos == 1
        aligned = run([[2.0, 0.0, 0.0]] * 6, "aligned")
        assert aligned.avg_pairwise_cos_micro == 1_000_000
        assert aligned.avg_norm_micro == 2_000_000
        # orthogonal pair repeated: 4 vectors, cross pairs cos 0,
        # same-direction pairs cos 1 -> mean = (2*2)/(4*3) = 1/3
        ortho = run(
            [[1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0]], "ortho"
        )
        assert abs(ortho.avg_pairwise_cos_micro - 333_333) <= 1


class TestSlidingDistinctUsers:
    def test_window_semantics_and_gaps(self, ray_session, tmp_path):
        from datetime import datetime

        from barks_ocr_ray.pipelines.queries import (
            _sql_q209,
            q209_sliding_distinct_users,
        )

        # hour 0: users 1,2; hour 1: user 2; hour 30 (gap > 24h): user 3
        def ts(h, m=0):
            return datetime(2024, 1, 1 + h // 24, h % 24, m)

        ev = pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(
                    [ts(0), ts(0, 30), ts(1), ts(30)], pa.timestamp("us")
                ),
                "user_id": pa.array([1, 2, 2, 3], pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                "value": pa.array([0.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_slide", ev, "events.parquet")
        got = q209_sliding_distinct_users(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(_sql_q209()).fetch_df()
        assert got.wend.tolist() == exp.wend.tolist()
        assert got.n_users.tolist() == exp.n_users.tolist()
        # only PRESENT hours are window ends: 3 rows, not 31
        assert len(got) == 3
        # window ending hour 1 sees both hour-0 users and hour-1 user 2
        by = dict(zip(got.wend, got.n_users))
        h0 = int(pa.compute.min(ev.column("ts")).cast(pa.int64()).as_py()
                 // 3_600_000_000)
        assert by[h0] == 2 and by[h0 + 1] == 2 and by[h0 + 30] == 1


class TestQuantileSketchError:
    def test_bound_holds_and_oracle_parity(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q210,
            q210_quantile_sketch_error,
        )

        li = pa.table(
            {
                "l_extendedprice": pa.array(
                    [float(i) * 1.5 + 100 for i in range(5000)], pa.float64()
                )
            }
        )
        d = _write(tmp_path, "sf_qerr", li, "lineitem.parquet")
        got = q210_quantile_sketch_error(d).to_pandas()
        con = duckdb.connect()
        con.register("lineitem", li)
        exp = con.execute(_sql_q210()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert (got.within_bound == 1).all()
        assert (got.abs_err <= got.bound).all()


class TestSourceQualityCi:
    def test_tight_vs_noisy_source(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q211,
            q211_source_quality_ci,
        )

        # 'tight' docs are identical (zero variance); 'noisy' docs vary
        texts = ["the quick brown fox jumps. over the lazy dog."] * 30
        texts += ["x" * (20 * (i % 7 + 1)) + ("." if i % 2 else "")
                  for i in range(30)]
        texts += ["single doc source"]
        srcs = ["tight"] * 30 + ["noisy"] * 30 + ["solo"]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ci", docs, "documents.parquet")
        got = q211_source_quality_ci(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q211()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        g = got.set_index("source")
        assert g.ci95_bp["tight"] == 0.0  # identical docs -> zero CI
        assert g.ci95_bp["noisy"] > 0.0
        assert g.ci95_bp["solo"] == 0.0 and g.n_docs["solo"] == 1


class TestNeardupProvenance:
    def test_cross_source_template_pair(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q212_neardup_provenance

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        texts = [base, base + " extra", "totally different content here "
                 "about quantum flux capacitors and time travel machines"]
        srcs = ["mirror_b", "mirror_a", "indie"]
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_prov", docs, "documents.parquet")
        got = q212_neardup_provenance(d).to_pandas()
        # one near-dup pair, normalized (min, max) source order
        assert got.source_a.tolist() == ["mirror_a"]
        assert got.source_b.tolist() == ["mirror_b"]
        assert got.n_pairs.tolist() == [1]


class TestMarkovBacktest:
    def test_learned_pattern_beats_marginal(self, ray_session, tmp_path):
        from datetime import datetime

        from barks_ocr_ray.pipelines.queries import (
            _sql_q213,
            q213_markov_backtest,
        )

        # train users (id%10<7) and test users follow a->b, c->d chains;
        # marginal argmax can only pick one next type
        rows = []
        eid = 0
        for u in [1, 2, 11, 12, 7, 17]:  # 1,2,11,12 train; 7,17 test
            seq = ["a", "b", "c", "d", "a", "b"]
            for i, et in enumerate(seq):
                rows.append((eid, datetime(2024, 1, 1, 0, i), u, et))
                eid += 1
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_markov", ev, "events.parquet")
        got = q213_markov_backtest(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(_sql_q213()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.iloc[0]
        # deterministic chains: markov is perfect, marginal is not
        assert r.acc_markov_bp == 10000
        assert r.acc_marginal_bp < r.acc_markov_bp
        assert r.n_test == 10  # 2 test users x 5 transitions


class TestEntityCooccurrence:
    def test_pmi_ranks_exclusive_pair_first(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q214,
            q214_entity_cooccurrence,
        )

        # 'spark'+'merge' co-occur ONLY together (high PMI); 'table' is
        # everywhere (low PMI with anything); pad docs dilute marginals
        texts = (
            ["spark merge pipeline"] * 3
            + ["table row content here"] * 6
            + ["table spark something"] * 2
            + ["nothing relevant at all"] * 9
        )
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_ent", docs, "documents.parquet")
        got = q214_entity_cooccurrence(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q214()).fetch_df()
        for c in ("ea", "eb", "n_docs_both", "pmi_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        # the exclusive pair outranks the diluted one
        top = got.iloc[0]
        assert {top.ea, top.eb} == {"merge", "spark"}
        assert top.pmi_micro == got.pmi_micro.max()


class TestSplitLeakage:
    def test_leak_detected_and_counted_once(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.hashing import unit_fractions
        from barks_ocr_ray.pipelines.queries import (
            _sql_q215,
            q215_split_leakage,
        )

        # find ids that land in test (u>=0.9) and train (u<0.8)
        us = unit_fractions(list(range(3000)), method="md5")
        test_ids = [i for i in range(3000) if us[i] >= 0.9]
        train_ids = [i for i in range(3000) if us[i] < 0.8]
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight again")
        # two train near-dups of ONE test doc (leaked once, not twice),
        # plus clean test docs and unrelated train docs
        rows = [
            (test_ids[0], base),
            (train_ids[0], base + " extra"),
            (train_ids[1], base + " more"),
            (test_ids[1], "completely unrelated content about quantum "
                          "flux capacitors and ancient roman history"),
            (train_ids[2], "another unrelated training document talking "
                           "about gardening and watering tomato plants"),
        ]
        docs = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_leak", docs, "documents.parquet")
        got = q215_split_leakage(d).to_pandas()
        r = got.iloc[0]
        assert r.n_test == 2
        assert r.n_leaked == 1  # deduped across its two train partners
        assert r.leak_bp == 5000


class TestTermDrift:
    def test_injected_term_tops_the_delta(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import _sql_q216, q216_term_drift

        # prior docs (id%10<7) say 'stable words here'; new docs
        # (id%10>=7) inject 'viral' — it must top the |delta| rank
        texts, ids = [], []
        for i in range(40):
            ids.append(i)
            if i % 10 >= 7:
                texts.append("stable words here viral viral")
            else:
                texts.append("stable words here")
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_tdrift", docs, "documents.parquet")
        got = q216_term_drift(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q216()).fetch_df()
        for c in ("term", "n_prior", "n_new", "delta_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.term.iloc[0] == "viral"
        assert got.delta_micro.iloc[0] > 0
        assert got.n_prior.iloc[0] == 0


class TestShuffleQuality:
    def test_clustered_vs_interleaved_order(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q217,
            q217_shuffle_quality,
        )

        def _run(name, sources):
            docs = pa.table(
                {
                    "doc_id": pa.array(range(len(sources)), pa.int64()),
                    "source": pa.array(sources, pa.string()),
                }
            )
            d = _write(tmp_path, name, docs, "documents.parquet")
            got = q217_shuffle_quality(d).to_pandas()
            con = duckdb.connect()
            con.register("documents", docs)
            exp = con.execute(SQL_Q217).fetch_df()
            for c in got.columns:
                assert got[c].tolist() == exp[c].tolist(), (name, c)
            return got.iloc[0]

        # fully clustered: 30 'a' then 30 'b' -> 58/59 same-pairs,
        # expectation ~0.49 -> ratio far above 1e6
        clustered = _run("sf_clust", ["a"] * 30 + ["b"] * 30)
        assert clustered.clustering_micro > 1_500_000
        # perfectly interleaved: zero same-pairs -> ratio 0
        inter = _run("sf_inter", ["a", "b"] * 30)
        assert inter.n_same == 0
        assert inter.clustering_micro == 0
        assert inter.exp_micro == clustered.exp_micro


class TestNoveltyCurve:
    def test_repeat_batch_has_zero_novelty(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q218,
            q218_novelty_curve,
        )

        # batch 0 (ids 0-99): two distinct docs; batch 1 (ids 100-199):
        # exact repeats of batch 0 (zero novelty) plus one new doc
        texts, ids = [], []
        for i in range(6):
            ids.append(i)
            texts.append(
                "alpha beta gamma delta" if i % 2 else "one two three four"
            )
        for i in range(100, 106):
            ids.append(i)
            texts.append(
                "alpha beta gamma delta" if i % 2 else "one two three four"
            )
        ids.append(106)
        texts.append("totally fresh trigram content here")
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_novel", docs, "documents.parquet")
        got = q218_novelty_curve(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q218()).fetch_df()
        for c in ("batch_id", "n_docs", "n_grams", "n_novel", "novel_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.novel_micro.iloc[0] == 1_000_000  # batch 0 all novel
        b1 = got[got.batch_id == 1].iloc[0]
        assert b1.n_novel == 3  # only the fresh doc's 3 trigrams


class TestFilterKappa:
    def test_hand_counted_confusion_and_kappa(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q219,
            q219_filter_kappa,
        )

        # both_keep: 60 unique words (all bigrams unique, TTR=100%)
        both_keep = " ".join(f"w{i}" for i in range(60))
        # a_only: permutation + its reverse -> every bigram count 1
        # (top2 = 1/31 < 0.08) but TTR = 16/32 = 50% < 65%
        perm = [f"p{i}" for i in range(16)]
        a_only = " ".join(perm + perm[::-1])
        # b_only: short diverse doc (top2 = 1/9 > 0.08 -> flagged;
        # TTR = 100%)
        b_only = " ".join(f"v{i}" for i in range(10))
        # both_drop: pure repetition (flagged, TTR ~ 0)
        both_drop = " ".join(["spam"] * 40)
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [both_keep, a_only, b_only, both_drop, None, ""],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_kappa", docs, "documents.parquet")
        got = q219_filter_kappa(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q219()).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.iloc[0]
        assert r.n_docs == 4  # null + empty text excluded
        assert r.n_both_keep == 1 and r.n_a_only == 1
        assert r.n_b_only == 1 and r.n_both_drop == 1
        assert r.agree_micro == 500_000
        assert r.kappa_micro == 0  # chance-level agreement exactly


class TestPrefixAutocomplete:
    def test_rank_and_hot_prefix_cut(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q220,
            q220_prefix_autocomplete,
        )

        # prefix 's': sort(5) > scan(3) > spark(2) > slow(1) -> rank
        # cuts at 3; 'b' and a long tail of singleton prefixes fill the
        # top-10 hot set
        text = " ".join(
            ["sort"] * 5 + ["scan"] * 3 + ["spark"] * 2 + ["slow"]
            + ["batch"] * 4 + ["big"] * 2
            + ["merge", "hash", "join", "key", "data", "row", "agg",
               "line", "x"]  # 'x' is len-1: excluded by MIN_LEN
        )
        docs = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([text], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_auto", docs, "documents.parquet")
        got = q220_prefix_autocomplete(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q220()).fetch_df()
        for c in ("prefix", "rank", "term", "c"):
            assert got[c].tolist() == exp[c].tolist(), c
        s = got[got.prefix == "s"]
        assert s.term.tolist() == ["sort", "scan", "spark"]  # slow cut
        assert s.c.tolist() == [5, 3, 2]
        assert "x" not in set(got.term)


class TestMutualAlignment:
    def test_constructed_mutual_and_one_sided(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q221,
            q221_mutual_alignment,
        )

        # A side (even ids): 0 -> x-axis, 2 -> y-axis, 4 -> near-x
        # B side (odd ids):  1 -> near-x-axis, 3 -> y-axis
        # mutual: (0, 1) [0's top1 is 1; 1's top1 is 0 since 0 beats 4]
        # and (2, 3). 4's top1 is 1 but 1 prefers 0 -> not mutual.
        vecs = {
            0: [1.0, 0.0, 0.0],
            2: [0.0, 1.0, 0.0],
            4: [0.95, 0.05, 0.0],
            1: [0.99, 0.01, 0.0],
            3: [0.0, 1.0, 0.2],
        }
        emb = pa.table(
            {
                "vec_id": pa.array(sorted(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)],
                    pa.list_(pa.float32()),
                ),
            }
        )
        d = _write(tmp_path, "sf_mutual", emb, "embeddings.parquet")
        ds = q221_mutual_alignment(d)
        got = (
            ds.to_pandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", emb)
        exp = con.execute(SQL_Q221).fetch_df()
        assert got.vec_a.tolist() == exp.vec_a.tolist() == [0, 2]
        assert got.vec_b.tolist() == exp.vec_b.tolist() == [1, 3]
        assert got.cosine.tolist() == exp.cosine.tolist()
        # pair (0,1): second-best cos is exactly 0 -> margin NULL
        assert got.margin_micro.isna().tolist() == exp.margin_micro.isna().tolist() == [True, False]
        assert got.margin_micro.iloc[1] == exp.margin_micro.iloc[1]
        assert got.margin_micro.iloc[1] > 1_000_000  # cos1 > cos2 > 0


class TestGroupedTrend:
    def test_exact_slope_on_constructed_series(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q222,
            q222_grouped_trend,
        )

        # 'up': value = 2.00 * day over days 0..4 -> slope exactly 200
        # cents/day, intercept 0, r2 = 1. 'flat': constant -> slope 0,
        # r2 NULL (zero y-variance). 'oneday': b = 0 -> excluded.
        import datetime

        def ts(day):
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                days=day, hours=3
            )
        rows = []
        for d in range(5):
            rows.append(("up", ts(d), 2.0 * d))
            rows.append(("flat", ts(d), 7.0))
        rows.append(("oneday", ts(2), 1.0))
        rows.append(("oneday", ts(2), 3.0))
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_trend", ev, "events.parquet")
        got = q222_grouped_trend(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q222).fetch_df()
        assert got.event_type.tolist() == exp.event_type.tolist() == [
            "flat", "up",
        ]
        for c in ("n", "slope", "intercept"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.r2.isna().tolist() == exp.r2.isna().tolist() == [
            True, False,
        ]
        up = got[got.event_type == "up"].iloc[0]
        assert up.slope == 200.0 and up.intercept == 0.0 and up.r2 == 1.0
        flat = got[got.event_type == "flat"].iloc[0]
        assert flat.slope == 0.0 and flat.intercept == 700.0


class TestTrendingDecay:
    def test_recent_burst_outranks_larger_old_mass(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q223,
            q223_trending_decay,
        )

        import datetime

        def ts(day):
            return datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=day, hours=5
            )
        # 'old': 40 events 3 weeks before the anchor (weight 1/8 -> 5M)
        # 'hot': 10 events in the anchor week (weight 1 -> 10M): hot
        # must outrank old despite 4x fewer events
        rows = [("old", ts(0))] * 40 + [("hot", ts(21))] * 10
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_decay", ev, "events.parquet")
        got = q223_trending_decay(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q223).fetch_df()
        for c in ("event_type", "n", "decayed_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.event_type.tolist() == ["hot", "old"]
        assert got.decayed_micro.tolist() == [10_000_000, 5_000_000]


class TestClusterTerms:
    def test_exclusive_term_tops_its_cluster(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q224,
            q224_cluster_terms,
        )

        # cluster 0 docs share common filler; doc in cluster 1 injects
        # an exclusive token that must top cluster 1's c-TF-IDF rank
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "common words here common",
                        "common words here again",
                        "common words here zebra zebra",
                        "common words here",
                    ],
                    pa.string(),
                ),
            }
        )
        emb = pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 1.0]] * 4, pa.list_(pa.float32())
                ),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        )
        d = tmp_path / "sf_cterms"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        pq.write_table(emb, str(d / "embeddings.parquet"))
        got = (
            q224_cluster_terms(str(d))
            .to_pandas()
            .sort_values(["label", "score_micro", "term"],
                         ascending=[True, False, True])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        con.register("embeddings", emb)
        exp = con.execute(_sql_q224()).fetch_df()
        for c in ("label", "term", "tf", "score_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        c1 = got[got.label == 1]
        assert c1.term.iloc[0] == "zebra"
        assert c1.tf.iloc[0] == 2


def _events_daily(counts_by_type):
    """events table with `c` one-value events on each (type, day)."""
    import datetime

    eid, ts_l, et_l = [], [], []
    for et, day_counts in counts_by_type.items():
        for day, c in day_counts:
            for _ in range(c):
                eid.append(len(eid))
                ts_l.append(
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(days=day, hours=7)
                )
                et_l.append(et)
    n = len(eid)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts_l, pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(et_l, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )


class TestTheilSen:
    def test_outlier_day_cannot_drag_the_median_slope(
        self, ray_session, tmp_path
    ):
        from barks_ocr_ray.pipelines.queries import SQL_Q225, q225_theil_sen

        ev = _events_daily(
            {
                "lin": [(0, 10), (1, 20), (2, 30), (3, 40)],
                "out": [(0, 10), (1, 20), (2, 30), (3, 1000)],
                "oneday": [(2, 7)],
            }
        )
        d = _write(tmp_path, "sf_theil", ev, "events.parquet")
        got = q225_theil_sen(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q225).fetch_df()
        for c in ("event_type", "n_days", "n_pairs", "slope_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.event_type.tolist() == ["lin", "out"]  # oneday dropped
        # both medians are 10/day: the day-3 outlier is outvoted
        assert got.slope_micro.tolist() == [10_000_000, 10_000_000]
        assert got.n_pairs.tolist() == [6, 6]


class TestMadAnomalyDays:
    def test_spike_day_flagged_flat_type_clean(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q226,
            q226_mad_anomaly_days,
        )

        ev = _events_daily(
            {
                "spiky": [(d, 5) for d in range(6)] + [(6, 50)],
                "flat": [(d, 9) for d in range(7)],
            }
        )
        d = _write(tmp_path, "sf_mad", ev, "events.parquet")
        got = q226_mad_anomaly_days(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q226).fetch_df()
        for c in ("event_type", "day", "c", "dev", "mad"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.event_type.tolist() == ["spiky"]
        assert got.c.tolist() == [50]
        assert got.dev.tolist() == [45]
        assert got.mad.tolist() == [0]


class TestGroupPurity:
    def test_pure_and_mixed_sources(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q227,
            q227_group_purity,
        )

        docs = pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(["x"] * 10, pa.string()),
                "lang": pa.array(
                    ["en"] * 4  # pure source
                    + ["en", "en", "de", "fr"]  # mixed, en majority
                    + ["de", "en"],  # tie 1-1 -> 'de' wins (lang asc)
                    pa.string(),
                ),
                "source": pa.array(
                    ["pure"] * 4 + ["mixed"] * 4 + ["tie"] * 2, pa.string()
                ),
            }
        )
        d = _write(tmp_path, "sf_purity", docs, "documents.parquet")
        got = q227_group_purity(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q227).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.set_index("source").purity_micro.to_dict() == {
            "pure": 1_000_000, "mixed": 500_000, "tie": 500_000,
        }
        assert got.set_index("source").top_lang.to_dict() == {
            "pure": "en", "mixed": "en", "tie": "de",
        }


class TestLinearAttribution:
    def test_equal_split_and_rows_tie_rule(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q228,
            q228_linear_attribution,
        )

        import datetime

        base = datetime.datetime(2024, 3, 1)
        # user 1: click, view, view, then a $4 purchase -> k=3,
        # credit 1333 millicents x3 (one to click, two to view)
        # user 2: purchase with NO prior touch -> unattributed
        # user 3: touch at the SAME ts as the purchase with smaller
        # event_id -> counts (ROWS rule)
        rows = [
            (10, 1, base, "click", 0.0),
            (11, 1, base + datetime.timedelta(minutes=1), "view", 0.0),
            (12, 1, base + datetime.timedelta(minutes=2), "view", 0.0),
            (13, 1, base + datetime.timedelta(minutes=3), "purchase", 4.0),
            (20, 2, base, "purchase", 9.0),
            (30, 3, base, "signup", 0.0),
            (31, 3, base, "purchase", 2.0),
        ]
        ev = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_attr", ev, "events.parquet")
        got = q228_linear_attribution(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q228).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        g = got.set_index("event_type")
        assert g.loc["click"].credit_millicents == 133_333  # 400c/3
        assert g.loc["view"].credit_millicents == 266_666
        assert g.loc["signup"].credit_millicents == 200_000  # same-ts touch


class TestChurnLabels:
    def test_leakage_safe_windows(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q229,
            q229_churn_labels,
        )

        import datetime

        base = datetime.datetime(2024, 5, 1)
        # user 1: W1 activity + W2 activity -> retained
        # user 2: W1 activity only -> churned
        # user 3: W2 activity ONLY -> excluded (no W1 events)
        rows = [
            (1, 0, "click", 0.0),
            (1, 3, "purchase", 5.0),
            (1, 20, "view", 0.0),
            (2, 5, "purchase", 2.5),
            (3, 15, "click", 0.0),
        ]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(days=r[1], hours=2)
                     for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_churn", ev, "events.parquet")
        got = (
            q229_churn_labels(d)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(_sql_q229()).fetch_df()
        for c in ("user_id", "n_events", "n_purchases", "cents",
                  "last_day", "churned"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.user_id.tolist() == [1, 2]
        assert got.churned.tolist() == [False, True]
        assert got.cents.tolist() == [500, 250]
        assert got.last_day.tolist() == [3, 5]


class TestSearchSnippets:
    def test_clamped_window_and_k_cut(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q230,
            q230_search_snippets,
        )

        texts, ids = [], []
        # doc 0: term at position 1 -> left-clamped window
        ids.append(0)
        texts.append("data comes first here always")
        # doc 1: term mid-text -> full +-3 window
        ids.append(1)
        texts.append("one two three four data five six seven eight")
        # doc 2: no match
        ids.append(2)
        texts.append("nothing relevant in this doc")
        # docs 10..32: matches beyond the K=20 cut
        for i in range(10, 33):
            ids.append(i)
            texts.append(f"filler {i} data tail words")
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_kwic", docs, "documents.parquet")
        got = q230_search_snippets(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q230()).fetch_df()
        for c in ("doc_id", "pos", "snippet"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert len(got) == 20  # 24 matches cut to K
        assert got.doc_id.iloc[0] == 0 and got.pos.iloc[0] == 1
        assert got.snippet.iloc[0] == "data comes first here"  # clamped
        assert got.snippet.iloc[1] == "two three four data five six seven"


class TestWaterfillBudget:
    def test_cap_redistribution_hand_case(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q231,
            q231_waterfill_budget,
        )

        # tokens per source: a=10 b=20 c=40 d=130; total 200, budget 80
        # -> waterfill cap 25: alloc 10+20+25+25 = 80 exactly
        sizes = {"a": 10, "b": 20, "c": 40, "d": 130}
        ids, texts, srcs = [], [], []
        for i, (s, n) in enumerate(sorted(sizes.items())):
            ids.append(i)
            texts.append(" ".join(["w"] * n))
            srcs.append(s)
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_wfill", docs, "documents.parquet")
        got = q231_waterfill_budget(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q231()).fetch_df()
        for c in ("source", "tokens", "alloc", "capped"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.alloc.tolist() == [10, 20, 25, 25]
        assert got.capped.tolist() == [False, False, True, True]
        assert got.alloc.sum() == 80

    def test_budget_covers_everything_no_cap(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import q231_waterfill_budget
        import barks_ocr_ray.pipelines.queries as Q

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["w w", "w"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["a", "b"], pa.string()),
            }
        )
        d = _write(tmp_path, "sf_wfill2", docs, "documents.parquet")
        import sys
        import unittest.mock as mock

        # patch the DEFINING band module (the queries.py hub re-exports
        # a COPY of each global since the round-5 qband split)
        Qdef = sys.modules[q231_waterfill_budget.__module__]
        with mock.patch.object(Qdef, "Q231_BUDGET_PCT", 100):
            got = q231_waterfill_budget(d).to_pandas()
        assert got.alloc.tolist() == got.tokens.tolist()
        assert not got.capped.any()


class TestQQDrift:
    def test_shifted_distribution_reads_at_every_decile(
        self, ray_session, tmp_path
    ):
        from barks_ocr_ray.pipelines.queries import SQL_Q232, q232_qq_drift

        # prior side (id%10 < 7): n_chars = 100..; new side: same shape
        # shifted +50 -> every decile delta ~ +50
        ids, chars = [], []
        nxt = 0
        for i in range(200):
            if i % 10 >= 7:
                continue
            ids.append(i)
            chars.append(100 + (nxt % 40))
            nxt += 1
        nxt = 0
        for i in range(200):
            if i % 10 < 7:
                continue
            ids.append(i)
            chars.append(150 + (nxt % 40))
            nxt += 1
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_qq", docs, "documents.parquet")
        got = q232_qq_drift(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q232).fetch_df()
        for c in ("decile", "v_prior", "v_new", "delta"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.decile.tolist() == list(range(10, 100, 10))
        assert all(45 <= dl <= 55 for dl in got.delta)


class TestExactAuc:
    def test_separable_ties_and_random_cases(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import SQL_Q233, q233_exact_auc

        def run(name, scores_pos, scores_neg):
            n = len(scores_pos) + len(scores_neg)
            docs = pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "n_chars": pa.array(
                        scores_pos + scores_neg, pa.int64()
                    ),
                    "lang": pa.array(
                        ["en"] * len(scores_pos)
                        + ["de"] * len(scores_neg),
                        pa.string(),
                    ),
                }
            )
            d = _write(tmp_path, name, docs, "documents.parquet")
            got = q233_exact_auc(d).to_pandas()
            con = duckdb.connect()
            con.register("documents", docs)
            exp = con.execute(SQL_Q233).fetch_df()
            for c in ("n_pos", "n_neg", "auc_micro"):
                assert got[c].tolist() == exp[c].tolist(), (name, c)
            return got.auc_micro.iloc[0]

        # perfectly separable -> AUC 1
        assert run("sf_auc1", [10, 11, 12], [1, 2, 3]) == 1_000_000
        # all tied -> AUC exactly 0.5
        assert run("sf_auc2", [5, 5], [5, 5, 5]) == 500_000
        # hand case: pos {2,4}, neg {1,3}: pairs (2>1),(4>1),(4>3)=3
        # of 4 -> 0.75
        assert run("sf_auc3", [2, 4], [1, 3]) == 750_000


class TestFoldBalance:
    def test_full_grid_includes_zero_cells(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q234,
            q234_fold_balance,
        )

        # enough docs that all 5 folds materialize; two langs with a
        # skewed mapping so some (fold, lang) cells are zero
        ids = list(range(60))
        langs = ["en" if i % 3 else "de" for i in ids]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
            }
        )
        d = _write(tmp_path, "sf_folds", docs, "documents.parquet")
        got = q234_fold_balance(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q234()).fetch_df()
        for c in ("fold", "lang", "n", "chi2_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        # full grid: folds x langs rows, including any zero-count cells
        n_folds = got.fold.nunique()
        assert len(got) == n_folds * got.lang.nunique()
        assert (got.groupby("fold").n.sum() > 0).all()
        assert got.n.sum() == 60


class TestHostBudget:
    def test_hosts_partition_the_corpus(self, ray_session):
        from barks_ocr_ray.oracle_data import Q24_N
        from barks_ocr_ray.pipelines.queries import q235_host_budget
        from barks_ocr_ray.datagen import logical_urls

        got = q235_host_budget("unused").to_pandas()
        # every host rollup sums back to the post-dedup corpus
        assert got.n_pages.sum() == len(logical_urls(Q24_N))
        # some hosts extract zero chars (dead-letter/garbage pages)
        assert (got.n_pages > 0).all() and (got.chars >= 0).all()
        assert (got.chars > 0).any()
        assert got.host.str.match(r"host\d+\.example").all()
        # avg is exactly chars/n_pages rounded to cents
        import numpy as np
        from barks_ocr_ray.functions.relational import round_like_duckdb

        exp = [
            float(round_like_duckdb(float(c) / float(n), 2))
            for c, n in zip(got.chars, got.n_pages)
        ]
        assert got.avg_chars.tolist() == exp


class TestDeltaIndexMerge:
    def test_merge_equals_full_rebuild(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.text import word_index
        from barks_ocr_ray.pipelines.queries import (
            q236_delta_index_merge,
        )
        import barks_ocr_ray.pipelines.queries as Q
        import ray.data as rd

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 300, 301], pa.int64()),
                "text": pa.array(
                    ["old words here", "old stuff", "new words arrive",
                     "new new new"],
                    pa.string(),
                ),
            }
        )
        d = _write(tmp_path, "sf_dixm", docs, "documents.parquet")
        merged = (
            q236_delta_index_merge(d)
            .to_pandas()
            .sort_values("word")
            .reset_index(drop=True)
        )
        full = (
            word_index(rd.from_arrow(docs))
            .to_pandas()
            .sort_values("word")
            .reset_index(drop=True)
        )
        assert merged.word.tolist() == full.word.tolist()
        assert merged.n.tolist() == full.n.tolist()
        assert merged.set_index("word").n["new"] == 4
        assert merged.set_index("word").n["words"] == 2  # spans the split


class TestConformalCoverage:
    def test_rank_pick_and_coverage(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q237,
            q237_conformal_coverage,
        )

        # calibration side (id%10 < 7): scores 1..70 shuffled across
        # ids; rank = ceil(71*0.9) = 64 -> threshold 64.
        # test side: scores 60..89 -> covered = 60..64 -> 5/30
        ids, chars = [], []
        nxt = 1
        for i in range(100):
            if i % 10 < 7:
                ids.append(i)
                chars.append(nxt)
                nxt += 1
        nxt = 60
        for i in range(100):
            if i % 10 >= 7:
                ids.append(i)
                chars.append(nxt)
                nxt += 1
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_conf", docs, "documents.parquet")
        got = q237_conformal_coverage(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q237()).fetch_df()
        for c in ("n_cal", "n_test", "threshold", "cov_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        r = got.iloc[0]
        assert r.n_cal == 70 and r.n_test == 30
        assert r.threshold == 64
        assert r.cov_micro == 166_667  # 5/30


class TestMultiBlockDeterminism:
    """The q218/q221 exchanges rely on keyed repartition co-locating
    whole key groups into whole-block batches: force MANY input blocks
    and pin the results against single-process DuckDB."""

    def test_novelty_curve_across_many_blocks(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q218,
            q218_novelty_curve,
        )

        rng = np.random.default_rng(7)
        ids = list(range(1200))
        vocab = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(vocab, size=12).tolist()) for _ in ids
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        d = tmp_path / "sf_nblocks"
        d.mkdir()
        # 12 row groups -> many read blocks
        pq.write_table(docs, str(d / "documents.parquet"), row_group_size=100)
        got = q218_novelty_curve(str(d)).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(_sql_q218()).fetch_df()
        for c in ("batch_id", "n_docs", "n_grams", "n_novel", "novel_micro"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert len(got) == 12

    def test_mutual_alignment_across_many_blocks(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q221,
            q221_mutual_alignment,
        )

        rng = np.random.default_rng(11)
        n, dim = 400, 8
        emb = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    rng.normal(size=(n, dim)).astype("float32").tolist(),
                    pa.list_(pa.float32()),
                ),
            }
        )
        d = tmp_path / "sf_mblocks"
        d.mkdir()
        pq.write_table(emb, str(d / "embeddings.parquet"), row_group_size=50)
        got = (
            q221_mutual_alignment(str(d))
            .to_pandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", emb)
        exp = con.execute(SQL_Q221).fetch_df()
        assert got.vec_a.tolist() == exp.vec_a.tolist()
        assert got.vec_b.tolist() == exp.vec_b.tolist()
        assert got.cosine.tolist() == exp.cosine.tolist()
        gm = got.margin_micro.fillna(-1).tolist()
        em = exp.margin_micro.fillna(-1).tolist()
        assert gm == em
        assert len(got) > 10  # random normals produce plenty of mutuals


class TestConversionLatency:
    def test_first_signup_first_purchase_rule(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q238,
            q238_conversion_latency,
        )

        import datetime

        base = datetime.datetime(2024, 6, 1)

        def ts(m):
            return base + datetime.timedelta(minutes=m)

        # user 1: signup@0, purchase@10 -> 600 s (second purchase later
        # ignored; purchase BEFORE signup ignored)
        # user 2: signup@0 and @5 (first wins), purchase@7 -> 420 s
        # user 3: purchase only -> excluded; user 4: signup only -> excluded
        rows = [
            (1, 0, "purchase"), (1, 1, "signup"), (1, 11, "purchase"),
            (1, 60, "purchase"),
            (2, 0, "signup"), (2, 5, "signup"), (2, 7, "purchase"),
            (3, 2, "purchase"),
            (4, 3, "signup"),
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
        d = _write(tmp_path, "sf_convlat", ev, "events.parquet")
        got = q238_conversion_latency(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(_sql_q238()).fetch_df()
        assert got.q.tolist() == exp.q.tolist()
        assert got.value.tolist() == exp.value.tolist()
        # latencies multiset = {600, 420}: p25/p50 -> 420, p75 -> 600
        assert got.value.tolist() == [420.0, 420.0, 600.0]


class TestPeakConcurrency:
    def test_hand_sweep_with_zero_length_and_boundary(self, ray_session, tmp_path):
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q239,
            q239_peak_concurrency,
        )

        import datetime

        base = datetime.datetime(2024, 7, 1)

        def ts(m):
            return base + datetime.timedelta(minutes=m)

        # intervals (start_min, dur_min): three overlap in [10, 12);
        # one zero-length at 10 must NOT raise the peak; one touching
        # boundary (ends exactly when another starts) must NOT overlap
        rows = [(0, 12), (5, 10), (10, 2), (10, 0), (12, 5)]
        ev = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([ts(r[0]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        d = _write(tmp_path, "sf_peak", ev, "events.parquet")
        got = q239_peak_concurrency(d).to_pandas()
        con = duckdb.connect()
        con.register("events", ev)
        exp = con.execute(SQL_Q239).fetch_df()
        for c in ("n_intervals", "peak"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert got.peak.iloc[0] == 3
        assert got.n_intervals.iloc[0] == 5


class TestHtEstimate:
    def test_unbiased_weights_hand_case(self, ray_session, tmp_path):
        from barks_ocr_ray.functions.hashing import unit_fractions
        from barks_ocr_ray.pipelines.queries import (
            SQL_Q240,
            q240_ht_estimate,
        )

        ids = list(range(40))
        langs = ["en" if i % 2 else "de" for i in ids]
        chars = [100 + i for i in ids]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        )
        d = _write(tmp_path, "sf_ht", docs, "documents.parquet")
        got = q240_ht_estimate(d).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(SQL_Q240).fetch_df()
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        # replay the decisions by hand
        u = unit_fractions(ids, method="md5")
        w = [2 if l == "en" else 4 for l in langs]
        keep = [ui * wi < 1.0 for ui, wi in zip(u, w)]
        assert got.n_sampled.iloc[0] == sum(keep)
        assert got.ht_chars.iloc[0] == sum(
            c * wi for c, wi, k in zip(chars, w, keep) if k
        )
        assert got.exact_chars.iloc[0] == sum(chars)
