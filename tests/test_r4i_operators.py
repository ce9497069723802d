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
