"""Session-17 operator tests: prefix-filter exact set-similarity join
(q267) and distributed multinomial Naive Bayes lang classification
(q268)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table, fname):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / fname))
    return str(d)


def _docs(texts, langs=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs or ["en"] * n, pa.string()),
            "source": pa.array([f"s{i % 2}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }
    )


class TestSetSimilarityJoin:
    def test_hand_pairs_exact_once(self, ray_session, tmp_path):
        """Completeness + verify-once: identical sets pair at J=1.0, a
        one-token-off pair clears tau=3/5, a disjoint doc pairs with
        nothing, and no pair is emitted twice (the min-order-common-token
        rule)."""
        from barks_ocr_ray.functions.dedupe import set_similarity_join
        from barks_ocr_ray.functions.relational import read_table

        texts = [
            "alpha beta gamma delta epsilon",   # 0
            "alpha beta gamma delta epsilon",   # 1: J(0,1)=1.0
            "alpha beta gamma delta zeta",      # 2: J(0,2)=4/6=0.667
            "completely different words here",  # 3
            None,                               # 4: no tokens, never pairs
        ]
        d = _write(tmp_path, "sf_ssj", _docs(texts), "documents.parquet")
        got = (
            set_similarity_join(
                read_table(d, "documents", ["doc_id", "text"]),
                tau_num=3,
                tau_den=5,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        pairs = list(zip(got.doc_a, got.doc_b))
        assert pairs == [(0, 1), (0, 2), (1, 2)]
        assert len(set(pairs)) == len(pairs)  # verify-once: no dup pairs
        assert got.jaccard.tolist() == [1.0, 0.6667, 0.6667]
        assert got.n_shared.tolist() == [5, 4, 4]

    def test_cross_source_pair_blocking_would_miss(self, ray_session, tmp_path):
        """The join is GLOBAL: a near-identical pair split across sources
        and length buckets (q21's blocking keys) is still found."""
        from barks_ocr_ray.functions.dedupe import set_similarity_join
        from barks_ocr_ray.functions.relational import read_table

        base = " ".join(f"tok{i}" for i in range(30))
        texts = [base, base + " " + base]  # same token SET, 2x length
        d = _write(tmp_path, "sf_ssj2", _docs(texts), "documents.parquet")
        got = set_similarity_join(
            read_table(d, "documents", ["doc_id", "text"]),
            tau_num=9,
            tau_den=10,
        ).to_pandas()
        assert list(zip(got.doc_a, got.doc_b)) == [(0, 1)]
        assert got.jaccard.tolist() == [1.0]

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q267,
            q267_set_similarity_join,
        )

        d = "/root/testdata/sf0.001"
        got = (
            q267_set_similarity_join(d)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        exp = (
            con.execute(_sql_q267())
            .fetch_df()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        for c in ["doc_a", "doc_b", "n_shared", "jaccard"]:
            assert got[c].tolist() == exp[c].tolist(), c


class TestNaiveBayesLang:
    def test_hand_confusion(self, ray_session, tmp_path):
        """Two cleanly separated vocabularies classify perfectly; a mixed
        doc labeled 'en' but dominated by 'fr' tokens is the single
        off-diagonal cell."""
        from barks_ocr_ray.pipelines.queries import q268_naive_bayes_lang

        texts = [
            "dog cat bird dog cat",
            "dog bird dog dog",
            "chien chat oiseau chien",
            "chat chat oiseau",
            "chien chat oiseau dog",  # labeled en, mostly fr tokens
        ]
        langs = ["en", "en", "fr", "fr", "en"]
        d = _write(tmp_path, "sf_nb", _docs(texts, langs), "documents.parquet")
        got = (
            q268_naive_bayes_lang(d)
            .to_pandas()
            .sort_values(["lang", "predicted"])
            .reset_index(drop=True)
        )
        cells = {
            (r.lang, r.predicted): r.n_docs for r in got.itertuples()
        }
        assert cells[("en", "en")] == 2
        assert cells[("fr", "fr")] == 2
        assert cells[("en", "fr")] == 1
        assert sum(cells.values()) == 5

    def test_matches_oracle_on_sf0001(self, ray_session):
        from barks_ocr_ray.pipelines.queries import (
            _sql_q268,
            q268_naive_bayes_lang,
        )

        d = "/root/testdata/sf0.001"
        got = (
            q268_naive_bayes_lang(d)
            .to_pandas()
            .sort_values(["lang", "predicted"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        exp = (
            con.execute(_sql_q268())
            .fetch_df()
            .sort_values(["lang", "predicted"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) > 0
        for c in ["lang", "predicted", "n_docs"]:
            assert got[c].tolist() == exp[c].tolist(), c
        # every tokenized doc lands in exactly one confusion cell
        con.execute(
            "CREATE VIEW docs2 AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        n_tokenized = con.execute(
            "SELECT count(*) FROM docs2 WHERE "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0"
        ).fetchone()[0]
        assert got.n_docs.sum() == n_tokenized
