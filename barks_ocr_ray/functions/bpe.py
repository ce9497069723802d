"""Distributed BPE tokenizer training (Sennrich-style merge learning)
— the tokenizer-construction step a pretraining pipeline runs over its
own corpus before tokenizing it (public algorithm: Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Reference ancestry: the reference engine ships a dictionary/tokenizer
state stage (T3, /root/reference/src/barks_ocr/pipeline/
spell_checkers.py — a loaded-once vocabulary consulted per token);
this is its training-time sibling at corpus scale.

Shape (and why it is 100-TB-safe):

* Pass 1 — word counts: the ONLY corpus-scale exchange. Per-block
  combiner partials (WordCountCombiner, one row per distinct word per
  block) into a word-keyed aggregation; everything after runs on the
  word-frequency table, which is vocabulary-scaled, never
  corpus-scaled (the standard BPE trick: a word's pairs count
  word_freq times without re-reading the corpus).
* Rounds — BSP raw-task waves (the q94/q126 pattern): the word table
  is decoded ONCE into object-store blocks (symbol sequences +
  counts); each round one task wave returns per-block symbol-pair
  counters and the driver merges them EXACTLY. The driver-side merge
  is legitimately bounded at any corpus scale: pairs are pairs of
  CURRENT SYMBOLS, and the symbol alphabet is at most
  |initial characters| + n_merges (~a few hundred) — so the pair
  table is alphabet²-bounded, NOT vocabulary- or corpus-scaled. The
  winning pair broadcasts back as one tuple; blocks rewrite their
  sequences locally.
* Determinism: argmax tie-break is (count DESC, (lhs, rhs) ASC) — a
  total order, so every round is bit-identical under any partitioning
  and to the sequential golden replay (golden_dedup.golden_bpe_merges
  shares the pure per-word kernels below, reimplementing the round
  loop as plain Python).

Partitioning assumption (documented per SURVEY custom-operator rule):
the word-frequency table fits the cluster's object store in blocks —
the same assumption every published BPE/WordPiece trainer makes.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from barks_ocr_ray.functions.text import TOKEN_RE

#: initial symbolization: characters of the (already-lowercased,
#: TOKEN_RE-matched) word, plus an explicit end-of-word marker so
#: merges can learn suffixes without crossing word boundaries.
EOW = "</w>"


def word_symbols(word: str) -> list[str]:
    """Pure per-word kernel shared with the golden: initial symbol
    sequence of a word."""
    return list(word) + [EOW]


def merge_pair_in_word(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """Pure per-word kernel shared with the golden: replace every
    non-overlapping (lhs, rhs) adjacency, left to right."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def pair_counts_of_word(syms: list[str], n: int) -> Counter:
    """Pure per-word kernel shared with the golden: adjacent-pair
    counts of one word's symbol sequence, weighted by its corpus
    frequency n."""
    c: Counter = Counter()
    for a, b in zip(syms, syms[1:]):
        c[(a, b)] += n
    return c


def best_pair(c: Counter) -> tuple[tuple[str, str], int] | None:
    """Deterministic argmax: highest count, ties to the
    lexicographically smallest (lhs, rhs). Shared with the golden."""
    if not c:
        return None
    pair = min(c, key=lambda p: (-c[p], p))
    return pair, c[pair]


def _decode_block(t: pa.Table) -> tuple[list[list[str]], np.ndarray]:
    # empty finalize partitions of the word aggregation arrive as
    # SCHEMA-LESS blocks (pa.table({}), the RefBundle-warning class) —
    # decode them to the empty state rather than KeyError
    if t.num_rows == 0 or "word" not in t.column_names:
        return [], np.zeros(0, np.int64)
    words = t.column("word").to_pylist()
    counts = t.column("n").to_numpy(zero_copy_only=False)
    return [word_symbols(w) for w in words], counts.astype(np.int64)


def _block_pair_counts(state) -> Counter:
    syms_list, counts = state
    c: Counter = Counter()
    for syms, n in zip(syms_list, counts):
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += int(n)
    return c


def _block_apply_merge(state, lhs: str, rhs: str):
    syms_list, counts = state
    return (
        [merge_pair_in_word(s, lhs, rhs) for s in syms_list],
        counts,
    )


def bpe_train(docs: Dataset, *, n_merges: int = 12) -> Dataset:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table (merge_round 1-based, lhs, rhs, pair_count) — fewer rows if
    the corpus runs out of adjacent pairs first."""
    import ray as _ray
    import ray.data as _rd

    from barks_ocr_ray.functions.text import word_index

    # pass 1 — the only corpus-scale exchange (A1 combiner partials)
    words = word_index(docs.select_columns(["text"]))

    prep = _ray.remote(num_cpus=1)(_decode_block)
    countf = _ray.remote(num_cpus=1)(_block_pair_counts)
    mergef = _ray.remote(num_cpus=1)(_block_apply_merge)

    state = [prep.remote(b) for b in words.to_arrow_refs()]

    rounds: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        total: Counter = Counter()
        pending = [countf.remote(s) for s in state]
        while pending:
            done, pending = _ray.wait(
                pending, num_returns=min(8, len(pending))
            )
            for c in _ray.get(done):
                total.update(c)
        top = best_pair(total)
        if top is None:
            break
        (lhs, rhs), n = top
        rounds.append((r, lhs, rhs, int(n)))
        state = [mergef.remote(s, lhs, rhs) for s in state]

    return _rd.from_arrow(
        pa.table(
            {
                "merge_round": pa.array([r[0] for r in rounds], pa.int64()),
                "lhs": pa.array([r[1] for r in rounds], pa.string()),
                "rhs": pa.array([r[2] for r in rounds], pa.string()),
                "pair_count": pa.array([r[3] for r in rounds], pa.int64()),
            }
        )
    )


def encode_word_len(word: str, merges: list[tuple[str, str]]) -> int:
    """Pure per-word kernel shared with the golden: subword count of a
    word after applying the learned merges ONCE EACH, in learned order
    (the training-time replay contract — deterministic and identical
    on both engines; the priority-queue re-application variant of
    inference-time encoders is intentionally not used here so the
    encode is the exact inverse view of training's merge sequence)."""
    syms = word_symbols(word)
    for lhs, rhs in merges:
        if len(syms) < 2:
            break
        syms = merge_pair_in_word(syms, lhs, rhs)
    return len(syms)


class BpeEncoder:
    """Warm tokenize-and-encode actor (T3 dictionary-state pattern:
    merges list + regex compiled once per actor in __init__, a
    word->length memo shared across batches — web text repeats words
    heavily, so the per-block cost is cache hits, not merge scans).
    Emits per-doc (doc_id, n_words, n_subwords) — integer partials,
    order-independent."""

    def __init__(self, merges: list[tuple[str, str]]):
        # TOKEN_RE imported at MODULE level — a `from barks_ocr_ray...`
        # import inside this worker-executed body fails under the
        # driver's by-value pickling (no sys.path on workers)
        import re

        self.token_re = re.compile(TOKEN_RE)
        self.merges = list(merges)
        self.cache: dict[str, int] = {}

    def _len(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            n = encode_word_len(w, self.merges)
            self.cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words: list[int] = []
        n_sub: list[int] = []
        for s in batch.column("text"):
            txt = s.as_py()
            toks = self.token_re.findall(txt.lower()) if txt else []
            n_words.append(len(toks))
            n_sub.append(sum(self._len(w) for w in toks))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_subwords": pa.array(n_sub, pa.int64()),
            }
        )


def bpe_encode_stats(
    docs: Dataset, merges: list[tuple[str, str]], *, concurrency: int = 4
) -> Dataset:
    """Corpus-scale tokenization under a learned merge table: one
    actor-pool map_batches pass, zero exchanges — the merge table is
    R-row tiny and ships once per actor via the constructor, never per
    batch."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
