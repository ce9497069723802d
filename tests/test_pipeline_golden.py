"""Golden-output tests: the distributed Ray pipeline must reproduce the
single-process reference extractor byte-identically per url (SURVEY.md §5
— our analog of the reference's dual-engine cross-validation,
/root/reference/src/barks_ocr/tools/compare.py:44-206), at any input
partitioning / shuffling."""

import pytest
import ray.data as rd

from barks_ocr_ray.datagen import pages_table
from barks_ocr_ray.extract.golden import golden_corpus
from barks_ocr_ray.pipelines.extraction import extraction_pipeline

N = 200


@pytest.fixture(scope="module")
def corpus():
    return pages_table(N)


@pytest.fixture(scope="module")
def gold():
    return golden_corpus(N)


def _pages_ds(tbl):
    return rd.from_arrow(tbl).select_columns(["url", "warc_ts", "html", "lang"])


def _check_against_golden(out_df, gold):
    assert len(out_df) == len(gold)
    assert set(out_df["url"]) == set(gold)
    for row in out_df.itertuples():
        g = gold[row.url]
        assert row.kind == g["kind"], row.url
        assert row.extracted_text == g["extracted_text"], row.url
        assert row.content_hash == g["content_hash"], row.url
        assert row.warc_ts.to_pydatetime() == g["warc_ts"], row.url
        assert row.n_blocks == g["n_blocks"], row.url
        got_spans = [(s["start"], s["end"]) for s in row.spans]
        assert got_spans == g["spans"], row.url


def test_pipeline_matches_golden(corpus, gold):
    out = extraction_pipeline(_pages_ds(corpus), num_partitions=8).to_pandas()
    _check_against_golden(out, gold)


def test_permutation_invariance(corpus, gold):
    """Shuffled input order + different partitioning -> identical output set
    (the determinism contract, SURVEY.md §7.3)."""
    ds = _pages_ds(corpus).random_shuffle(seed=7).repartition(7)
    out = extraction_pipeline(ds, num_partitions=5, batch_size=16).to_pandas()
    _check_against_golden(out, gold)


@pytest.mark.parametrize("strategy", ["join", "broadcast", "auto"])
def test_dedup_strategy_equivalence(corpus, gold, strategy):
    out = extraction_pipeline(
        _pages_ds(corpus), dedup_strategy=strategy, num_partitions=4
    ).to_pandas()
    _check_against_golden(out, gold)


def test_one_row_per_url(corpus):
    out = extraction_pipeline(_pages_ds(corpus), num_partitions=8).to_pandas()
    assert out["url"].is_unique


def test_oversized_rows_routed_and_extracted(corpus, gold):
    out = extraction_pipeline(
        _pages_ds(corpus), num_partitions=8
    ).to_pandas()
    big = out[out["html_len"] > 128 * 1024]
    assert len(big) > 0  # class-8 rows exist in a 200-row corpus
    for row in big.itertuples():
        assert row.extracted_text == gold[row.url]["extracted_text"]


def test_dead_letter_on_corrupt_payload():
    """A corrupt payload must become a dead-letter row (error column), not
    kill the batch — the reference's tolerant per-line parse (M19)."""
    import pyarrow as pa
    from datetime import datetime
    from barks_ocr_ray.datagen import PAGES_SCHEMA

    rows = [
        {"url": "ok", "warc_ts": datetime(2026, 1, 1),
         "html": page_html_ok(), "text": "", "lang": "en"},
        {"url": "bad", "warc_ts": datetime(2026, 1, 1),
         "html": b"%SPDF{not json", "text": "", "lang": ""},
    ]
    t = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    ds = rd.from_arrow(t).select_columns(["url", "warc_ts", "html", "lang"])
    out = extraction_pipeline(ds, num_partitions=2).to_pandas().set_index("url")
    assert out.loc["bad", "error"] is not None
    assert out.loc["bad", "extracted_text"] == ""
    assert out.loc["ok", "error"] is None
    assert len(out.loc["ok", "extracted_text"]) > 0


def page_html_ok() -> bytes:
    from barks_ocr_ray.datagen import page_record

    return page_record(0)["html"]


def test_extract_first_order_equivalence(corpus, gold):
    """The commuted pipeline (extract before dedup) is byte-identical."""
    out = extraction_pipeline(
        _pages_ds(corpus), num_partitions=8, order="extract_first"
    ).to_pandas()
    _check_against_golden(out, gold)


def test_compressed_exchange_equivalence(corpus, gold):
    """Payload compression through the exchange is invisible to output."""
    out = extraction_pipeline(
        _pages_ds(corpus), num_partitions=8, compress_payload=False
    ).to_pandas()
    _check_against_golden(out, gold)
