"""Text analysis operators over a documents table: tokenization + inverted
word index (A1/M13 analog), per-doc token counting, quality scoring (M14
analog), n-gram language ID, and rolling-hash document fingerprinting.

Tokenizer contract shared with the DuckDB oracle: lowercase +
``[a-z0-9]+`` runs (both RE2 semantics), mirroring the reference's index
normalizer (/root/reference/experiments/make-word-index-from-gemini-ai-groups.py:251-265).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.functions.hashing import unit_fractions
from barks_ocr_ray.functions.relational import round_like_duckdb

TOKEN_RE = r"[a-z0-9]+"
STOPWORDS = (
    "the and of a to in is it that was for on are as with his they i at be "
    "this have from or had by not word but what some we can out other were "
    "all there when up use your how said an each she"
).split()


#: partition count for VOCABULARY-keyed exchanges (word/term groupbys
#: and idf/unigram joins). The exchange's key cardinality is the
#: vocabulary, not the corpus — this corpus has a fixed 31-word vocab at
#: every SF, and even web-scale text tops out at ~1e6 distinct terms —
#: so a handful of partitions is always enough; running them at the
#: corpus-scaled partition count leaves most partitions EMPTY, and every
#: empty finalize emits a schema-less block (RefBundle schema warnings,
#: the failure class behind round-1's join crashes).
VOCAB_PARTITIONS = 4


class Tokenizer:
    """Warm-tokenizer actor (T3/T5 pattern: compile once per actor in
    __init__, reuse per batch)."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)
        self.stop = frozenset(STOPWORDS)

    def tokens(self, text: str) -> list[str]:
        return self.token_re.findall(text.lower())


class WordCountCombiner(Tokenizer):
    """Per-batch partial aggregation (combiner): emits one (word, n) row
    per distinct word per batch, so the wide groupby shuffles partials,
    not one row per token (SURVEY.md 'pre-aggregate inside map_batches')."""

    def __init__(self, text_col: str = "text"):
        super().__init__()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for s in batch.column(self.text_col):
            txt = s.as_py()
            if txt:
                counts.update(self.tokens(txt))
        words = list(counts.keys())
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([counts[w] for w in words], pa.int64()),
            }
        )


def word_index(docs: Dataset, text_col: str = "text", concurrency: int = 4) -> Dataset:
    """Inverted-index word counts: tokenize + combine per batch, then a
    small groupby(word).sum over the partials (A1 analog)."""
    partials = docs.map_batches(
        WordCountCombiner,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    return partials.groupby("word", num_partitions=VOCAB_PARTITIONS).aggregate(
        Sum("n", alias_name="n")
    )


def doc_stats(docs: Dataset) -> Dataset:
    """Per-doc text statistics — fully vectorized pyarrow.compute kernels
    (count_substring_regex is RE2, matching the DuckDB oracle)."""

    def _stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        lower = pc.utf8_lower(text)
        n_tokens = pc.count_substring_regex(lower, TOKEN_RE).cast(pa.int64())
        n_punct = pc.count_substring_regex(text, r"[.!?]").cast(pa.int64())
        stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
        n_stop = pc.count_substring_regex(lower, stop_pat).cast(pa.int64())
        low_quality = pc.or_(
            pc.less(n_tokens, pa.scalar(10)), pc.equal(n_punct, pa.scalar(0))
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_len": pc.utf8_length(text).cast(pa.int64()),
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "n_stop": n_stop,
                "low_quality": low_quality,
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


# --- language ID (n-gram/stopword heuristic; no SQL oracle) ---------------

LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "with", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"},
    "fr": {"le", "la", "les", "et", "des", "est", "pas", "une", "que", "dans"},
    "es": {"el", "la", "los", "las", "es", "una", "que", "por", "con", "del"},
}


class LangId(Tokenizer):
    """Stopword-profile language classifier (stateful actor stage)."""

    def classify(self, text: str) -> tuple[str, float]:
        """(lang, raw score): first profile in sorted order achieving the
        max hit count wins (strict-improvement scan — the rule the SQL
        oracle mirrors)."""
        toks = self.tokens(text)
        best_lang, best = "und", 0
        for lang in sorted(LANG_PROFILES):
            hits = sum(1 for t in toks if t in LANG_PROFILES[lang])
            if hits > best:
                best_lang, best = lang, hits
        return best_lang, best / max(1, len(toks))

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        scores = []
        for s in batch.column("text"):
            lang, score = self.classify(s.as_py() or "")
            preds.append(lang)
            scores.append(score)
        # round_like_duckdb imported at MODULE level: worker-body package
        # imports fail under the driver's by-value cloudpickle shipping
        import numpy as _np

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
                # DuckDB-bit-identical rounding (pc.round is half-to-even)
                "lang_score": pa.array(
                    round_like_duckdb(_np.asarray(scores, _np.float64), 4),
                    pa.float64(),
                ),
            }
        )


def lang_id(docs: Dataset, concurrency: int = 4) -> Dataset:
    return docs.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, concurrency)
    )


# --- rolling-hash fingerprint (no SQL oracle) -----------------------------

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_fingerprint(tokens: list[str], window: int = 8) -> int:
    """Deterministic document fingerprint: min of polynomial rolling
    hashes over token w-shingles (winnowing-style)."""
    if not tokens:
        return 0
    hs = [hash_token(t) for t in tokens]
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc = (acc * _BASE + h) % _MOD
        return acc
    best = None
    acc = 0
    pw = pow(_BASE, window - 1, _MOD)
    for i, h in enumerate(hs):
        if i < window:
            acc = (acc * _BASE + h) % _MOD
            if i == window - 1 and (best is None or acc < best):
                best = acc
        else:
            acc = ((acc - hs[i - window] * pw) * _BASE + h) % _MOD
            if best is None or acc < best:
                best = acc
    return best


def hash_token(tok: str) -> int:
    """32-bit token hash = first 8 hex digits of md5 — chosen so the
    DuckDB oracle can reproduce it exactly:
    CAST('0x' || substring(md5(t), 1, 8) AS HUGEINT)."""
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)


class Fingerprinter(Tokenizer):
    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            rolling_fingerprint(self.tokens(s.as_py() or ""))
            for s in batch.column("text")
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # fits in 61 bits (the rolling-hash modulus) -> int64,
                # matching the oracle's BIGINT cast
                "fingerprint": pa.array(fps, pa.int64()),
            }
        )


def fingerprints(docs: Dataset, concurrency: int = 4) -> Dataset:
    return docs.map_batches(
        Fingerprinter, batch_format="pyarrow", concurrency=(1, concurrency)
    )


# --- heuristic issue predicates (M14 analog) ------------------------------


def doc_issues(docs: Dataset) -> Dataset:
    """Typed issue records from vectorized predicates, deduped by
    construction (one predicate -> at most one row per doc), mirroring
    the group-check registry (/root/reference/src/barks_ocr/utils/group_checks.py:60-110)."""

    def _issues(t: pa.Table) -> pa.Table:
        text = t.column("text")
        doc_id = t.column("doc_id")
        out_ids, out_types = [], []
        checks = [
            ("short_text", pc.less(pc.utf8_length(text), pa.scalar(100))),
            (
                "no_terminal_punct",
                pc.invert(pc.match_substring_regex(text, r"[.!?]\s*$")),
            ),
            (
                "all_caps",
                pc.and_(
                    pc.equal(pc.utf8_upper(text), text),
                    pc.greater(pc.utf8_length(text), pa.scalar(0)),
                ),
            ),
        ]
        for issue_type, mask in checks:
            ids = doc_id.filter(mask)
            out_ids.extend(ids.to_pylist())
            out_types.extend([issue_type] * len(ids))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "issue_type": pa.array(out_types, pa.string()),
            }
        )

    return docs.map_batches(_issues, batch_format="pyarrow")


# --- line-pattern re-wrap (M16 analog) ------------------------------------


def apply_line_pattern(source_text: str, pattern_text: str) -> str:
    """Re-wrap ``source_text`` so each output line carries the same word
    count as the corresponding line of ``pattern_text``; the LAST pattern
    line absorbs every remaining word, and lines past the end of the
    source are dropped (the reference's template-driven re-wrap,
    /root/reference/src/barks_ocr/tools/ocr_check.py:156-182)."""
    counts = [len(ln.split()) for ln in pattern_text.rstrip("\n").split("\n")]
    if not counts:
        return source_text
    words = source_text.split()
    if not words:
        return ""
    lines: list[str] = []
    pos = 0
    for idx, count in enumerate(counts):
        if idx == len(counts) - 1:
            lines.append(" ".join(words[pos:]))
            break
        if pos >= len(words):
            break
        lines.append(" ".join(words[pos : pos + count]))
        pos += count
    return "\n".join(lines)


def line_pattern_repair(
    ds: Dataset,
    *,
    source_col: str = "text",
    pattern_col: str = "pattern",
    out_col: str = "rewrapped",
    keep: list[str] | None = None,
) -> Dataset:
    """Per-row (source, pattern) -> re-wrapped text as a streaming batch
    transform; ``keep`` selects the passthrough columns."""

    def _wrap(t: pa.Table) -> pa.Table:
        srcs = t.column(source_col).to_pylist()
        pats = t.column(pattern_col).to_pylist()
        out = [
            apply_line_pattern(s or "", p or "") for s, p in zip(srcs, pats)
        ]
        cols = {c: t.column(c) for c in (keep or [c for c in t.column_names if c not in (source_col, pattern_col)])}
        cols[out_col] = pa.array(out, pa.string())
        return pa.table(cols)

    return ds.map_batches(_wrap, batch_format="pyarrow")


# --- deterministic stratified sampling ------------------------------------


def stratified_sample(
    docs: Dataset,
    *,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_method: str = "md5",
) -> Dataset:
    """Per-stratum deterministic sampling: a row is kept iff its id's
    deterministic unit fraction falls below its stratum's rate — a pure
    function of the row (reproducible across runs, cluster sizes and
    partitionings; no RNG state anywhere), and on the default md5 path
    exactly replayable in SQL, unlike ``Dataset.random_sample``. The
    standard rebalancing step for a training corpus (downsample
    dominant languages / sources).

    ``hash_method``: "md5" (default) is the oracle-parity path — a
    per-row C call (~1 µs/row) that DuckDB's md5() replays exactly.
    "splitmix64" is the vectorized production path for corpus-scale
    runs (same keep RATE, different individual decisions; see
    functions/hashing.py and the BASELINE.md throughput table)."""

    def _keep(t: pa.Table) -> pa.Table:
        us = unit_fractions(t.column(id_col).to_pylist() if hash_method == "md5"
                            else t.column(id_col).to_numpy(zero_copy_only=False),
                            method=hash_method)
        strata = t.column(strata_col).to_pylist()
        cuts = np.asarray(
            [rates.get(s, default_rate) for s in strata], np.float64
        )
        return t.filter(pa.array(us < cuts, pa.bool_()))

    return docs.map_batches(_keep, batch_format="pyarrow")


# --- TF-IDF top terms ------------------------------------------------------


class DocTermCounts(Tokenizer):
    """(doc_id, term, tf) rows — one row per distinct term per doc, so
    downstream exchanges move per-doc partials, never one row per
    token occurrence."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        out_d, out_t, out_n = [], [], []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            counts = _Counter(self.tokens(s.as_py() or ""))
            out_d.extend([doc_id] * len(counts))
            out_t.extend(counts.keys())
            out_n.extend(counts.values())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "tf": pa.array(out_n, pa.int64()),
            }
        )


def tfidf_top_terms(
    docs: Dataset,
    *,
    k: int = 3,
    concurrency: int = 4,
    num_partitions: int = 16,
) -> Dataset:
    """Top-k characteristic terms per document by tf-idf
    (tf x ln(N/df)): per-doc term counts from an actor-pool tokenizer,
    document frequencies from ONE keyed aggregation over those partials,
    idf joined back term-wise (distributed hash join — the df table
    scales with the vocabulary, not the corpus), then a grouped top-k.
    Scores are rounded DuckDB-style and ranked on the ROUNDED value
    (ties -> term asc) so rank order is oracle-stable."""
    from ray.data.aggregate import Count as _Count

    from barks_ocr_ray.functions.relational import (
        grouped_topk,
        round_like_duckdb,
    )

    n_docs = docs.count()
    tf_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        DocTermCounts, batch_format="pyarrow", concurrency=(1, concurrency)
    )
    df_tbl = tf_rows.groupby("term", num_partitions=VOCAB_PARTITIONS).aggregate(
        _Count(alias_name="df")
    )
    # term-keyed join: key cardinality = vocabulary (VOCAB_PARTITIONS note)
    joined = tf_rows.join(
        df_tbl,
        join_type="inner",
        num_partitions=VOCAB_PARTITIONS,
        on=("term",),
    )

    def _score(t: pa.Table) -> pa.Table:
        import numpy as _np

        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(_np.float64)
        df = t.column("df").to_numpy(zero_copy_only=False).astype(_np.float64)
        score = tf * _np.log(float(n_docs) / df)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "tfidf": pa.array(round_like_duckdb(score, 4), pa.float64()),
            }
        )

    scored = joined.map_batches(_score, batch_format="pyarrow")
    return grouped_topk(
        scored, "doc_id", "tfidf", k, tie_col="term",
        num_partitions=num_partitions,
    )


def unigram_logprob(
    docs: Dataset,
    *,
    concurrency: int = 4,
    num_partitions: int = 16,
) -> Dataset:
    """Per-document mean negative log-probability under the corpus's own
    unigram model (the CCNet-style perplexity-filter primitive, with the
    n-gram LM reduced to unigrams):

        score(d) = sum_t tf(d,t) * -ln(n(t)/N) / len(d)

    Two keyed aggregations (term counts; per-doc reduce) and one
    term-wise join — the unigram table scales with the vocabulary, the
    per-doc rows with the corpus; nothing lands on the driver but the
    token-total scalar. Rounded DuckDB-style for the value-exact oracle.
    Documents with no tokens have no unigram contributions and are
    absent from the output (the SQL's inner-join semantics)."""
    import numpy as _np
    from ray.data.aggregate import Sum as _Sum

    from barks_ocr_ray.functions.relational import round_like_duckdb

    tf_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        DocTermCounts, batch_format="pyarrow", concurrency=(1, concurrency)
    ).materialize()  # reused: unigram totals + per-doc scoring
    unigrams = tf_rows.groupby("term", num_partitions=VOCAB_PARTITIONS).aggregate(
        _Sum("tf", alias_name="n")
    )
    total_tokens = int(tf_rows.sum("tf") or 0)

    # term-keyed join: key cardinality = vocabulary (VOCAB_PARTITIONS note)
    joined = tf_rows.join(
        unigrams,
        join_type="inner",
        num_partitions=VOCAB_PARTITIONS,
        on=("term",),
    )

    def _contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(_np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(_np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "nll": pa.array(
                    tf * -_np.log(n / float(max(1, total_tokens))),
                    pa.float64(),
                ),
                "tf": t.column("tf"),
            }
        )

    per_doc = (
        joined.map_batches(_contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            _Sum("nll", alias_name="sum_nll"), _Sum("tf", alias_name="n_tokens")
        )
    )

    def _score(t: pa.Table) -> pa.Table:
        s = t.column("sum_nll").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(_np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "logprob_score": pa.array(
                    round_like_duckdb(s / _np.maximum(n, 1.0), 4), pa.float64()
                ),
            }
        )

    return per_doc.map_batches(_score, batch_format="pyarrow")


class DocBigramCounts(Tokenizer):
    """(doc_id, w1, w2, tf) rows — one row per distinct bigram per doc
    (the bigram analog of DocTermCounts; exchanges move per-doc
    partials, never one row per token position)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter as _Counter

        out_d, out_1, out_2, out_n = [], [], [], []
        for doc_id, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("text")
        ):
            ws = self.tokens(s.as_py() or "")
            counts = _Counter(zip(ws, ws[1:]))
            out_d.extend([doc_id] * len(counts))
            out_1.extend(w1 for w1, _ in counts)
            out_2.extend(w2 for _, w2 in counts)
            out_n.extend(counts.values())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "w1": pa.array(out_1, pa.string()),
                "w2": pa.array(out_2, pa.string()),
                "tf": pa.array(out_n, pa.int64()),
            }
        )


def bigram_logprob(
    docs: Dataset,
    *,
    concurrency: int = 4,
) -> Dataset:
    """Per-document mean negative log-probability under the corpus's own
    BIGRAM model (conditional MLE — the next rung of the CCNet-style
    perplexity ladder above ``unigram_logprob``):

        score(d) = sum_b tf(d,b) * -ln(n(w1,w2) / n(w1·)) / bigrams(d)

    where n(w1·) counts bigrams whose first word is w1 (so every
    observed bigram has probability <= 1 and the score is >= 0). Shape:
    one tokenizing pass emits per-doc bigram partials (materialized,
    reused three ways); TWO vocabulary-sized aggregations (bigram
    totals, first-word totals); the denominators attach by a w1-keyed
    join and the numerators by a (w1, w2)-keyed join; one per-doc
    reduce. Docs with < 2 tokens have no bigrams and are absent (the
    SQL's inner-join semantics)."""
    import numpy as _np
    from ray.data.aggregate import Sum as _Sum

    from barks_ocr_ray.functions.relational import round_like_duckdb

    bf = docs.select_columns(["doc_id", "text"]).map_batches(
        DocBigramCounts, batch_format="pyarrow", concurrency=(1, concurrency)
    ).materialize()
    n12 = bf.groupby(["w1", "w2"], num_partitions=VOCAB_PARTITIONS).aggregate(
        _Sum("tf", alias_name="n12")
    )
    n1 = bf.groupby("w1", num_partitions=VOCAB_PARTITIONS).aggregate(
        _Sum("tf", alias_name="n1")
    )
    joined = bf.join(
        n12,
        join_type="inner",
        num_partitions=VOCAB_PARTITIONS,
        on=("w1", "w2"),
    ).join(
        n1,
        join_type="inner",
        num_partitions=VOCAB_PARTITIONS,
        on=("w1",),
    )

    def _contrib(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(_np.float64)
        a = t.column("n12").to_numpy(zero_copy_only=False).astype(_np.float64)
        b = t.column("n1").to_numpy(zero_copy_only=False).astype(_np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "nll": pa.array(tf * -_np.log(a / b), pa.float64()),
                "tf": t.column("tf"),
            }
        )

    per_doc = (
        joined.map_batches(_contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            _Sum("nll", alias_name="sum_nll"), _Sum("tf", alias_name="n_bigrams")
        )
    )

    def _score(t: pa.Table) -> pa.Table:
        s = t.column("sum_nll").to_numpy(zero_copy_only=False)
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(_np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bigram_score": pa.array(
                    round_like_duckdb(s / _np.maximum(n, 1.0), 4), pa.float64()
                ),
            }
        )

    return per_doc.map_batches(_score, batch_format="pyarrow")


def chunk_documents(
    docs: Dataset,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Sliding token-window chunking (the RAG / context-window prep
    shape): split each document on whitespace and emit windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``,
    the last window clipped to the document end. Chunk text is the
    window's tokens joined by single spaces (the canonical re-join;
    original inter-token whitespace is not preserved).

    Execution shape: a pure per-block pass, ZERO exchanges — the
    explode is bounded (~1/(1-overlap/chunk) rows per chunk_tokens
    input tokens) and chunk ids are (doc_id, chunk_idx), so output
    partitioning inherits input partitioning. Fully vectorized: one
    regex split kernel, flat token filtering through offset
    arithmetic, chunk windows as concatenated ``arange`` gathers, and
    one ``binary_join`` kernel to build every chunk string in the
    block at once — no per-document Python.

    Tokenizer contract (shared with the q73 oracle):
    ``regexp_extract_all(text, '\\S+')`` — RE2-ASCII whitespace runs;
    docs with zero tokens (empty/whitespace/null text) emit no chunks.
    """
    import numpy as np

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    empty = pa.table(
        {
            doc_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    def _chunks_block(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column(text_col), "").combine_chunks()
        lst = pc.split_pattern_regex(text, pattern=r"\s+")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        values = lst.flatten()
        offsets = lst.offsets.to_numpy(zero_copy_only=False)
        # split emits '' for leading/trailing whitespace runs — drop
        # empty tokens through offset arithmetic (extract_all semantics)
        keep = pc.not_equal(values, pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        kcum = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        n_tok = kcum[offsets[1:]] - kcum[offsets[:-1]]
        tokens = values.filter(pa.array(keep))
        doc_off = np.concatenate(([0], np.cumsum(n_tok)))[:-1]

        has = n_tok > 0
        if not has.any():
            return empty
        # chunks per doc: starts 0, stride, ... while start <= n-O-1
        n_chunks = np.where(
            has, (np.maximum(n_tok - overlap, 1) - 1) // stride + 1, 0
        )
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(n_tok)), n_chunks)
        chunk_cum = np.concatenate(([0], np.cumsum(n_chunks)))
        ci = np.arange(total, dtype=np.int64) - chunk_cum[doc_idx]
        s = ci * stride
        e = np.minimum(s + chunk_tokens, n_tok[doc_idx])
        lens = e - s
        # concatenated aranges: flat token indices of every chunk
        lcum = np.concatenate(([0], np.cumsum(lens)))
        flat = (
            np.repeat(doc_off[doc_idx] + s, lens)
            + np.arange(int(lcum[-1]), dtype=np.int64)
            - np.repeat(lcum[:-1], lens)
        )
        chunk_list = pa.ListArray.from_arrays(
            pa.array(lcum, pa.int32()), tokens.take(pa.array(flat))
        )
        chunk_text = pc.binary_join(chunk_list, " ")
        return pa.table(
            {
                doc_col: t.column(doc_col).take(pa.array(doc_idx)),
                "chunk_idx": pa.array(ci, pa.int64()),
                "chunk_text": chunk_text,
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return docs.map_batches(_chunks_block, batch_format="pyarrow")


def flesch_readability(docs: Dataset) -> Dataset:
    """Flesch reading-ease per doc with the vowel-group syllable proxy
    (syllables ~ non-overlapping [aeiouy]+ runs). Everything is a
    vectorized RE2 kernel (`pc.count_substring_regex`), which matches
    the DuckDB oracle's regexp_extract_all counts exactly; the score is
    per-row float arithmetic (no sums), so rounding to 4 decimals is
    bit-stable under any partitioning."""
    import numpy as np

    from barks_ocr_ray.functions.relational import round_like_duckdb

    def _score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))
        text = t.column("text")
        lower = pc.utf8_lower(text)
        words = pc.count_substring_regex(lower, TOKEN_RE).cast(pa.int64())
        sents = pc.max_element_wise(
            pc.count_substring_regex(text, r"[.!?]+").cast(pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        syll = pc.count_substring_regex(lower, r"[aeiouy]+").cast(
            pa.int64()
        )
        keep = pc.greater(words, pa.scalar(0, pa.int64()))
        t2 = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": words,
                "n_sentences": sents,
                "n_syllables": syll,
            }
        ).filter(keep)
        w = t2.column("n_words").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s = t2.column("n_sentences").to_numpy(zero_copy_only=False)
        y = t2.column("n_syllables").to_numpy(zero_copy_only=False)
        flesch = round_like_duckdb(
            206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4
        )
        return t2.append_column(
            "flesch", pa.array(flesch, pa.float64())
        )

    return docs.map_batches(_score, batch_format="pyarrow")


def corpus_profile(docs: Dataset) -> Dataset:
    """One-pass corpus profiler (shared scan): a SINGLE read of the
    corpus produces many aggregates at once — doc count, token total,
    null-text count, per-language doc counts — as long-format
    (stat, value) rows. At 100 TB the scan dominates every per-doc
    aggregate, so fusing N profile questions into one map_batches pass
    costs one corpus read instead of N; the exchange ships only the
    per-block partial rows (a handful per block). The shared-scan idea
    is classic systems work (cooperative scans / DataPath); this is its
    Ray Data expression."""

    def _partials(t: pa.Table) -> pa.Table:
        text = t.column("text")
        valid = pc.is_valid(text)
        n_null = t.num_rows - pc.sum(valid).as_py()
        lower = pc.utf8_lower(text)
        n_tokens = pc.sum(
            pc.count_substring_regex(lower, TOKEN_RE).cast(pa.int64())
        ).as_py() or 0
        stats = [
            ("n_docs", t.num_rows),
            ("n_tokens", int(n_tokens)),
            ("null_text", int(n_null)),
        ]
        langs = pa.table(
            {"lang": t.column("lang")}
        ).group_by("lang").aggregate([("lang", "count")])
        for lang, n in zip(
            langs.column("lang").to_pylist(),
            langs.column("lang_count").to_pylist(),
        ):
            stats.append((f"lang:{lang}", int(n)))
        return pa.table(
            {
                "stat": pa.array([s for s, _ in stats], pa.string()),
                "value": pa.array([v for _, v in stats], pa.int64()),
            }
        )

    partials = docs.map_batches(_partials, batch_format="pyarrow")
    return partials.groupby("stat", num_partitions=2).aggregate(
        Sum("value", alias_name="value")
    )


# ---------------------------------------------------------------------------
# Positional index + phrase query (S11/S12 extension: exact phrase match)
# ---------------------------------------------------------------------------


def phrase_counts(
    docs: Dataset, phrases: list[str], num_partitions: int = 8
) -> pa.Table:
    """Exact phrase search with positional semantics — overlapping
    occurrences count ("w w w" contains "w w" twice), which substring
    replace-counting gets wrong. Documents arrive WHOLE inside a block,
    so phrase occurrence is a block-local vectorized token-window
    compare over dictionary-encoded token codes: ONE corpus pass, ZERO
    keyed exchanges, O(phrases) partials per block. (Replaces the
    chained positional-postings join plan, which paid len(phrase)-1
    hash joins of corpus-scale postings plus a per-phrase groupby for
    the same answer — measured 10.4 s -> ~2 s at sf0.1.) Positions are
    space-split ordinals, exactly the SQL oracle's
    string_split/generate_subscripts semantics. Block-local distinct
    doc counts sum to the global count because each doc lives in one
    block. Returns a driver-side phrase-count table (one row per
    phrase, zero-filled misses)."""
    import numpy as np

    words = [p.split() for p in phrases]

    def _scan(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        keep = pc.and_(pc.is_valid(text), pc.not_equal(text, pa.scalar("")))
        text = text.filter(keep)
        occ = np.zeros(len(phrases), np.int64)
        ndocs = np.zeros(len(phrases), np.int64)
        if len(text) > 0:
            toks = pc.split_pattern(text, " ")
            flat = toks.flatten()
            lengths = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            )
            did = np.repeat(np.arange(len(lengths)), lengths)
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab_idx = {
                w: i for i, w in enumerate(enc.dictionary.to_pylist())
            }
            n = len(codes)
            for pi, ws in enumerate(words):
                wcodes = [vocab_idx.get(w, -1) for w in ws]
                L = len(ws)
                if -1 in wcodes or n < L:
                    continue
                m = codes[: n - L + 1] == wcodes[0]
                for k in range(1, L):
                    m &= codes[k : n - L + 1 + k] == wcodes[k]
                m &= did[: n - L + 1] == did[L - 1 :]
                occ[pi] = int(m.sum())
                ndocs[pi] = len(np.unique(did[: n - L + 1][m]))
        return pa.table(
            {
                "phrase": pa.array(list(phrases), pa.string()),
                "n_occurrences": pa.array(occ, pa.int64()),
                "n_docs": pa.array(ndocs, pa.int64()),
            }
        )

    parts = docs.map_batches(_scan, batch_format="pyarrow").take_all()
    acc = {p: [0, 0] for p in phrases}
    for r in parts:
        a = acc[r["phrase"]]
        a[0] += int(r["n_occurrences"])
        a[1] += int(r["n_docs"])
    rows = sorted((p, v[0], v[1]) for p, v in acc.items())
    return pa.table(
        {
            "phrase": pa.array([r[0] for r in rows], pa.string()),
            "n_occurrences": pa.array([r[1] for r in rows], pa.int64()),
            "n_docs": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# --- LZ76 sequence complexity (q279) -----------------------------------------


def lz76_phrases(seq) -> int:
    """Lempel-Ziv 1976 production (phrase) count of a sequence via the
    Kaspar-Schuster exhaustive-history scan — the classical
    predictability/complexity gauge (a constant sequence has ~2
    phrases; an i.i.d. one approaches n/log n). Pure sequential kernel
    shared by the distributed per-user pass and the golden replay;
    elements compare by ==, so tuples of event-type strings work
    directly (no alphabet encoding step)."""
    n = len(seq)
    if n == 0:
        return 0
    i, c, u, v, vmax = 0, 1, 1, 1, 1
    while u + v <= n:
        if seq[i + v - 1] == seq[u + v - 1]:
            v += 1
        else:
            vmax = max(v, vmax)
            i += 1
            if i == u:
                c += 1
                u += vmax
                v = 1
                i = 0
                vmax = 1
            else:
                v = 1
    if v != 1:
        c += 1
    return c


def longest_repeated_run(tokens) -> int:
    """Length of the longest token window occurring at least twice
    within the sequence — the intra-document memorization/boilerplate
    gauge beside the Gopher dup-token FRACTIONS (a doc can pass the
    fraction gates yet still contain one giant verbatim self-repeat).
    Binary search on window length (dup-of-L implies dup-of-L-1, so
    the predicate is monotone); candidate windows compare by EXACT
    tuple equality via a set (a hash collision cannot produce a false
    positive). O(n log n) window probes. Pure sequential kernel shared
    by the distributed per-doc pass and the golden replay."""
    n = len(tokens)
    if n < 2:
        return 0

    def _has_dup(L: int) -> bool:
        seen = set()
        for i in range(n - L + 1):
            w = tuple(tokens[i : i + L])
            if w in seen:
                return True
            seen.add(w)
        return False

    lo, hi = 0, n - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _has_dup(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def longest_common_run(a, b) -> int:
    """Length of the longest token window shared verbatim by two
    sequences — the pairwise-alignment refinement of a binary near-dup
    verdict (two docs can share 40% of shingles via scattered phrases
    or via one long lifted passage; this tells them apart). Binary
    search on window length (a shared run of L implies one of L-1, so
    the predicate is monotone); windows of the SHORTER side go into a
    set of exact tuples, the longer side probes (no hash-collision
    false positives). O((|a|+|b|) log min(|a|,|b|)) window probes.
    Shared by the distributed per-pair pass and the golden replay."""
    if len(a) > len(b):
        a, b = b, a
    na, nb = len(a), len(b)
    if na == 0:
        return 0

    def _shared(L: int) -> bool:
        wins = {tuple(a[i : i + L]) for i in range(na - L + 1)}
        return any(tuple(b[j : j + L]) in wins for j in range(nb - L + 1))

    lo, hi = 0, na
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _shared(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo
