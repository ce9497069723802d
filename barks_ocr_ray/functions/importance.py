"""DSIR-style importance resampling over hashed n-gram features
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method): score every raw document by how much its
hashed-unigram distribution looks like a TARGET subcorpus rather than
the RAW corpus, then keep the top-scoring docs.

Two-pass, zero doc-keyed exchange — the 100 TB shape:

  pass A  map_batches(BucketCountCombiner)   K-sized partials per block
          -> groupby(bucket).sum             K rows total (K = 64)
          -> driver computes the K-entry log-ratio weight table
  pass B  map_batches(BucketScorer)          weights ride in the actor
          -> sort + limit                    (top-k exchange only)

The only all-to-all is the final top-k sort; the feature aggregation
shuffles K-sized partials (bounded by the bucket count, not the
corpus), exactly the combiner discipline of word_index (text.py).

Exactness: per-token weights are int64 "micro" units (ln-ratio rounded
to 1e-6, `round_like_duckdb`), so per-doc scores are order-independent
integer sums the DuckDB oracle replays bit-exactly. The bucket hash is
md5-based (`hash_token`) for the same oracle-replayability reason
(text.py:208 rationale).

Reference analog: the score filter M3 family
(/root/reference/src/barks_ocr/pipeline/censorship_fixes.py:60-88
filters by a scored predicate); this operator generalizes it to a
corpus-level distribution-matching score.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from barks_ocr_ray.functions.relational import round_like_duckdb
from barks_ocr_ray.functions.text import Tokenizer, hash_token

#: hashed-feature bucket count (DSIR uses 10^4; the synthetic corpus
#: vocabulary is tiny, so 64 keeps every bucket populated at all SFs)
N_BUCKETS = 64


class _Bucketer(Tokenizer):
    """Tokenize + md5-bucket with a per-actor vocabulary cache (T3
    dictionary-state pattern: the cache is vocab-sized, built once per
    actor, shared across batches)."""

    def __init__(self, n_buckets: int = N_BUCKETS):
        super().__init__()
        self.n_buckets = n_buckets
        self._cache: dict[str, int] = {}

    def bucket_counts(self, text: str) -> np.ndarray:
        ids = []
        cache = self._cache
        for tok in self.tokens(text):
            b = cache.get(tok)
            if b is None:
                b = hash_token(tok) % self.n_buckets
                cache[tok] = b
            ids.append(b)
        if not ids:
            return np.zeros(self.n_buckets, dtype=np.int64)
        return np.bincount(
            np.asarray(ids, dtype=np.int64), minlength=self.n_buckets
        ).astype(np.int64)


class BucketCountCombiner(_Bucketer):
    """Pass A: per-block K-sized partials of raw and target token-bucket
    counts (one row per bucket per block, never one per token)."""

    def __init__(self, target_lang: str, n_buckets: int = N_BUCKETS):
        super().__init__(n_buckets)
        self.target_lang = target_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = np.zeros(self.n_buckets, dtype=np.int64)
        tgt = np.zeros(self.n_buckets, dtype=np.int64)
        langs = batch.column("lang").to_pylist()
        for s, lang in zip(batch.column("text"), langs):
            counts = self.bucket_counts(s.as_py() or "")
            raw += counts
            if lang == self.target_lang:
                tgt += counts
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(self.n_buckets, dtype=np.int64), pa.int64()
                ),
                "tf": pa.array(raw, pa.int64()),
                "tf_target": pa.array(tgt, pa.int64()),
            }
        )


class BucketScorer(_Bucketer):
    """Pass B: per-doc importance score = integer dot product of the
    doc's bucket counts with the broadcast micro-weight table."""

    def __init__(self, w_micro: np.ndarray, n_buckets: int = N_BUCKETS):
        super().__init__(n_buckets)
        self.w = np.asarray(w_micro, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, scores = [], []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            counts = self.bucket_counts(s.as_py() or "")
            n_tok = int(counts.sum())
            if n_tok == 0:  # tokenless docs carry no evidence; the SQL
                continue  # replay drops them the same way (no rows)
            ids.append(doc_id)
            scores.append(int(counts @ self.w))
        return pa.table(
            {
                "doc_id": pa.array(ids, batch.schema.field("doc_id").type),
                "score_micro": pa.array(scores, pa.int64()),
            }
        )


def importance_weights(
    docs: Dataset,
    target_lang: str,
    n_buckets: int = N_BUCKETS,
    concurrency: int = 4,
) -> np.ndarray:
    """Pass A: K-entry int64 micro-weight table
    w[b] = round(ln(((ct+1)*(Tr+K)) / ((cr+1)*(Tt+K))) * 1e6)
    with add-one smoothing — the log importance ratio of the target vs
    raw hashed-unigram distributions. K-sized driver state only."""
    partials = docs.map_batches(
        BucketCountCombiner,
        fn_constructor_kwargs={
            "target_lang": target_lang,
            "n_buckets": n_buckets,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    # bucket cardinality = n_buckets: 2 partitions keeps finalizes
    # non-empty (VOCAB_PARTITIONS rationale, text.py)
    agg = partials.groupby("bucket", num_partitions=2).aggregate(
        Sum("tf", alias_name="tf"),
        Sum("tf_target", alias_name="tf_target"),
    )
    t = pa.Table.from_pylist(agg.take_all())  # K rows — bounded
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct = np.zeros(n_buckets, dtype=np.int64)
    b = t.column("bucket").to_numpy(zero_copy_only=False)
    cr[b] = t.column("tf").to_numpy(zero_copy_only=False)
    ct[b] = t.column("tf_target").to_numpy(zero_copy_only=False)
    tr, tt = int(cr.sum()), int(ct.sum())
    ratio = ((ct + 1.0) * float(tr + n_buckets)) / (
        (cr + 1.0) * float(tt + n_buckets)
    )
    return round_like_duckdb(np.log(ratio) * 1e6, 0).astype(np.int64)


def importance_resample(
    docs: Dataset,
    target_lang: str,
    k: int,
    n_buckets: int = N_BUCKETS,
    concurrency: int = 4,
) -> Dataset:
    """Full DSIR selection: weight table from pass A, per-doc scores in
    pass B, top-k by (score desc, doc_id asc). ``docs`` needs columns
    doc_id, text, lang."""
    w = importance_weights(docs, target_lang, n_buckets, concurrency)
    scored = docs.map_batches(
        BucketScorer,
        fn_constructor_kwargs={"w_micro": w, "n_buckets": n_buckets},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    return scored.sort(
        ["score_micro", "doc_id"], descending=[True, False]
    ).limit(k)


def alias_table(terms, weights) -> pa.Table:
    """Walker/Vose alias table over an integer weight vector — the
    O(1)-per-draw production sampler that replaces q271's
    O(log V)-per-draw cumulative binary search (Walker 1977; Vose
    1991). ALL-INTEGER and order-DETERMINISTIC: slots are processed in
    input (term-ascending) order with FIFO worklists, p_i = w_i * V is
    compared against W = sum(w) exactly, and the donor's residual
    p_l -= (W - p_s) stays an exact int, so the distributed build
    (vocab agg -> driver construction) and the sequential golden are
    bit-identical. Every slot's final share of W is p_num/ (V*W)...
    emitted as prob_ppm = (p_num * 1e6) // W: the probability that a
    uniform slot draw KEEPS the slot's own term rather than its alias.
    Slots left over when one worklist drains (integer rounding) pin at
    prob_ppm = 1e6 with themselves as alias — the standard closure."""
    from collections import deque

    V = len(terms)
    w = np.asarray(weights, dtype=np.int64)
    W = sum(int(x) for x in w)  # exact: int64 .sum() could wrap too
    # Widen to Python ints BEFORE the w*V product — (w * V) in int64
    # can silently wrap at production scale (w ~ 1e6*cnt^0.75, V ~ 1e6
    # terms); residuals must stay exact.
    p = np.array([int(x) * V for x in w], dtype=object)
    prob_num = [0] * V
    alias = list(range(V))
    small = deque(i for i in range(V) if int(p[i]) < W)
    large = deque(i for i in range(V) if int(p[i]) >= W)
    while small and large:
        s = small.popleft()
        l = large.popleft()
        prob_num[s] = int(p[s])
        alias[s] = l
        p[l] = int(p[l]) - (W - int(p[s]))
        if int(p[l]) < W:
            small.append(l)
        else:
            large.append(l)
    for q in (large, small):
        while q:
            i = q.popleft()
            prob_num[i] = W
            alias[i] = i
    return pa.table(
        {
            "term": pa.array(list(terms), pa.string()),
            "prob_ppm": pa.array(
                [(n * 1_000_000) // W for n in prob_num], pa.int64()
            ),
            "alias_term": pa.array(
                [terms[a] for a in alias], pa.string()
            ),
        }
    )


def huffman_code_lengths(terms, counts) -> list[int]:
    """Optimal prefix-code lengths by the deterministic TWO-QUEUE
    Huffman construction (van Leeuwen 1976): leaves enter sorted by
    (count, term); merges always take the two smallest heads comparing
    (weight, kind, seq) with leaves-before-internals on weight ties and
    FIFO among internals — a TOTAL order, so the distributed vocab agg
    and the sequential golden produce identical lengths. All integer.
    Single-symbol vocab gets length 1 by convention."""
    order = sorted(range(len(terms)), key=lambda i: (counts[i], terms[i]))
    n = len(order)
    if n == 0:
        return []
    if n == 1:
        return [1]
    from collections import deque

    leaves = deque((int(counts[i]), ("L", i)) for i in order)
    internal: deque = deque()
    parents: dict = {}
    seq = 0

    def _pop_min():
        if leaves and (
            not internal or leaves[0][0] <= internal[0][0]
        ):
            return leaves.popleft()
        return internal.popleft()

    while len(leaves) + len(internal) > 1:
        a = _pop_min()
        b = _pop_min()
        node = ("I", seq)
        seq += 1
        parents[a[1]] = node
        parents[b[1]] = node
        internal.append((a[0] + b[0], node))

    depths = [0] * len(terms)
    for i in range(len(terms)):
        d = 0
        cur = ("L", i)
        while cur in parents:
            cur = parents[cur]
            d += 1
        depths[i] = d
    return depths
