"""Web-corpus quality/cleaning operators: Gopher-style repetition
statistics, C4-style line filtering, and paragraph-level deduplication
— the standard cleaning passes a training-data pipeline runs after
main-content extraction (Rae et al. 2021 "Gopher" §A.1.1, Raffel et
al. 2020 "C4" §2.2, Penedo et al. 2023 "RefinedWeb" §3.3; all public
papers — no reference-repo counterpart, these extend SURVEY.md §2's
LLM-pipeline family).

Scale notes (100 TB): ``gopher_repetition`` and ``c4_line_filter`` are
pure per-row functions — zero exchanges, fully streaming, partition-
independent. ``paragraph_dedup`` costs one count aggregation over
paragraph hashes (combiner-style partials, so the exchange carries one
row per distinct (hash) per block, not per token), one distributed join
back to the exploded paragraphs, and one keyed reassembly per doc.
Every operator is SQL-replayable for the value-exact oracle.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from barks_ocr_ray.context import hash_partitions
from barks_ocr_ray.functions.relational import round_like_duckdb
from barks_ocr_ray.functions.text import TOKEN_RE

#: Gopher §A.1.1 repetition thresholds (top n-gram character fraction
#: simplified to token fraction; the oracle replays the same definition)
GOPHER_TOP2_MAX = 0.20
GOPHER_TOP3_MAX = 0.18


def gopher_repetition(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = GOPHER_TOP2_MAX,
    top3_max: float = GOPHER_TOP3_MAX,
) -> Dataset:
    """Per-doc repetition statistics: fraction of all 2-grams (3-grams)
    taken by the single most frequent 2-gram (3-gram), plus the Gopher
    keep/flag decision (thresholds default to the published Gopher
    values). Pure map_batches — no exchange."""
    token_re = re.compile(TOKEN_RE)

    def _stats(t: pa.Table) -> pa.Table:
        n_tokens, top2, top3 = [], [], []
        for s in t.column(text_col):
            raw = s.as_py()
            toks = token_re.findall(raw.lower()) if raw else []
            n = len(toks)
            n_tokens.append(n)
            for size, out in ((2, top2), (3, top3)):
                total = n - size + 1
                if total <= 0:
                    out.append(0.0)
                    continue
                counts = Counter(
                    " ".join(toks[i : i + size]) for i in range(total)
                )
                out.append(max(counts.values()) / total)
        top2_a = round_like_duckdb(np.asarray(top2, np.float64), 4)
        top3_a = round_like_duckdb(np.asarray(top3, np.float64), 4)
        flagged = (np.asarray(top2_a) > top2_max) | (
            np.asarray(top3_a) > top3_max
        )
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "top2_frac": pa.array(top2_a, pa.float64()),
                "top3_frac": pa.array(top3_a, pa.float64()),
                "flagged": pa.array(flagged, pa.bool_()),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


#: C4 §2.2 line rules: terminal punctuation + a minimum word count per
#: line, then a minimum surviving-line count per doc
C4_LINE_END_RE = r"[.!?]$"
C4_MIN_WORDS = 5
C4_MIN_LINES = 3


def c4_line_filter(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = C4_MIN_WORDS,
    min_lines: int = C4_MIN_LINES,
) -> Dataset:
    """C4-style line-level cleaning: keep lines with >= min_words words
    ending in terminal punctuation; drop docs with < min_lines
    surviving lines. Word = '\\S+' run and the end-test is an anchored
    regex on the raw line — both byte-identical to the SQL oracle.
    Pure map_batches — no exchange."""
    end_re = re.compile(C4_LINE_END_RE)
    word_re = re.compile(r"\S+")

    def _filter(t: pa.Table) -> pa.Table:
        ids, clean, n_lines, n_kept = [], [], [], []
        for did, s in zip(t.column(id_col), t.column(text_col)):
            raw = s.as_py()
            if raw is None:
                continue
            lines = raw.split("\n")
            kept = [
                l
                for l in lines
                if len(word_re.findall(l)) >= min_words and end_re.search(l)
            ]
            if len(kept) < min_lines:
                continue
            ids.append(did.as_py())
            clean.append("\n".join(kept))
            n_lines.append(len(lines))
            n_kept.append(len(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, t.column(id_col).type),
                "clean_text": pa.array(clean, pa.string()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
            }
        )

    return docs.map_batches(_filter, batch_format="pyarrow")


#: PII patterns (RE2 syntax — identical engine in pyarrow and DuckDB,
#: so the oracle replays byte-exact), applied in THIS order; each later
#: pattern runs over the previous stage's output, and the replacement
#: tokens contain no digits/@ so stages cannot re-match each other
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_STAGES = (
    ("n_emails", PII_EMAIL_RE, "<EMAIL>"),
    ("n_phones", PII_PHONE_RE, "<PHONE>"),
    ("n_ips", PII_IP_RE, "<IP>"),
)


def pii_redact(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """PII redaction (emails, NANP-style phone numbers, IPv4 addresses)
    with per-doc match counts — the standard scrubbing pass a training
    corpus runs before release. Three vectorized RE2 kernel passes per
    batch (``pc.count_substring_regex`` + ``pc.replace_substring_regex``
    — no per-row Python), zero exchanges, fully streaming."""

    def _redact(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        cols = {id_col: t.column(id_col)}
        for count_name, pattern, token in PII_STAGES:
            cols[count_name] = pc.count_substring_regex(
                text, pattern
            ).cast(pa.int64())
            text = pc.replace_substring_regex(text, pattern, token)
        cols["clean_text"] = text
        return pa.table(cols)

    return docs.map_batches(_redact, batch_format="pyarrow")


def paragraph_dedup(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    num_partitions: int = 16,
) -> Dataset:
    """Paragraph-level dedup (RefinedWeb §3.3 shape): drop repeat
    occurrences of a paragraph WITHIN a doc (keep the first), and drop
    entirely any paragraph shared by >= min_docs distinct docs. Output
    (doc_id, clean_text, n_paras, n_kept); docs left with zero
    paragraphs disappear.

    Distribution: the within-doc pass is per-row (free). The cross-doc
    count ships combiner partials — one (hash, n) row per distinct
    paragraph per block — through ONE aggregation; the exploded
    paragraphs then join the count table on the hash (distributed hash
    join, no broadcast of the corpus) and reassemble with ONE keyed
    exchange on doc_id. Paragraph hashes are md5 (SQL-replayable)."""

    def _explode(t: pa.Table) -> pa.Table:
        ids, idxs, paras, hs, totals = [], [], [], [], []
        for did, s in zip(t.column(id_col), t.column(text_col)):
            raw = s.as_py()
            if raw is None:
                continue
            d = did.as_py()
            seen: set[str] = set()
            lines = raw.split("\n")
            for i, p in enumerate(lines, start=1):
                h = hashlib.md5(p.encode("utf-8")).hexdigest()
                if h in seen:
                    continue  # within-doc repeat: keep first only
                seen.add(h)
                ids.append(d)
                idxs.append(i)
                paras.append(p)
                hs.append(h)
                totals.append(len(lines))
        return pa.table(
            {
                "doc_id": pa.array(ids, t.column(id_col).type),
                "idx": pa.array(idxs, pa.int64()),
                "para": pa.array(paras, pa.string()),
                "h": pa.array(hs, pa.string()),
                "n_paras": pa.array(totals, pa.int64()),
            }
        )

    exploded = docs.map_batches(_explode, batch_format="pyarrow")

    # combiner partials: after the within-doc pass each (doc, h) appears
    # once, so a per-block count of h is already a distinct-doc partial
    def _partials(t: pa.Table) -> pa.Table:
        c = Counter(t.column("h").to_pylist())
        return pa.table(
            {
                "h": pa.array(list(c.keys()), pa.string()),
                "n_part": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        exploded.select_columns(["h"])
        .map_batches(_partials, batch_format="pyarrow")
        .groupby("h", num_partitions=hash_partitions(num_partitions))
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )

    joined = exploded.join(
        counts,
        join_type="inner",
        on=("h",),
        num_partitions=hash_partitions(num_partitions),
    )

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("n_docs"), pa.scalar(min_docs)))

    kept = joined.map_batches(_keep, batch_format="pyarrow")

    def _reassemble(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("idx"))
        paras = g.column("para").take(order).to_pylist()
        return pa.table(
            {
                "doc_id": g.column("doc_id").slice(0, 1),
                "clean_text": pa.array(["\n".join(paras)], pa.string()),
                "n_paras": g.column("n_paras").slice(0, 1),
                "n_kept": pa.array([g.num_rows], pa.int64()),
            }
        )

    return (
        kept.select_columns(["doc_id", "idx", "para", "n_paras"])
        .groupby("doc_id", num_partitions=hash_partitions(num_partitions))
        .map_groups(_reassemble, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal
# --------------------------------------------------------------------------

#: zlib level for the ratio signal — fixed so the golden replay is
#: byte-deterministic (same zlib, same level, same container)
COMP_LEVEL = 6
#: documents compressing below 25% of raw size are template/repetition
#: farms; above 80% they are random/encoded-garbage-like (natural text
#: sits near 35-60%; random printable ASCII measures ~83%) — the
#: classic Dolma/RedPajama compression-ratio gates
REPETITIVE_BP = 2500
RANDOM_BP = 8000
#: below this raw size the zlib header/dictionary overhead dominates the
#: ratio (a 23-byte sentence measures >100%), so short docs are counted
#: and summed but exempt from both gates
MIN_GATE_LEN = 64


def compression_profile(text: str) -> tuple[int, int]:
    """Pure per-row kernel: (utf-8 raw size, zlib-compressed size as
    basis points of raw — floor division, integer, replayed exactly by
    the single-process golden). Deterministic for a fixed zlib level."""
    import zlib

    raw = text.encode("utf-8")
    return len(raw), len(zlib.compress(raw, COMP_LEVEL)) * 10000 // len(raw)


def compression_bp(text: str) -> int:
    return compression_profile(text)[1]


def compression_ratio_stats(docs: Dataset) -> Dataset:
    """Per-source compression-ratio profile: doc counts, how many fall
    in the repetitive/random gates, and the exact integer sum of ratio
    basis points. zlib runs at C speed per row (it IS the useful
    compute, unlike the hash-overhead family); partials are
    source-keyed int64 rows, so the one exchange is group-sized.
    Null/empty text is excluded (no ratio exists). Reference quality
    gates ancestor: /root/reference/src/barks_ocr/utils/group_checks.py
    (per-text heuristic predicates)."""

    def _partials(t: pa.Table) -> pa.Table:
        srcs = t.column("source").to_pylist()
        txts = t.column("text").to_pylist()
        agg: dict[str, list[int]] = {}
        for s, x in zip(srcs, txts):
            if not x:
                continue
            raw_len, bp = compression_profile(x)
            row = agg.setdefault(s, [0, 0, 0, 0])
            row[0] += 1
            if raw_len >= MIN_GATE_LEN:
                row[1] += bp <= REPETITIVE_BP
                row[2] += bp >= RANDOM_BP
            row[3] += bp
        keys = sorted(agg)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_repetitive": pa.array(
                    [agg[k][1] for k in keys], pa.int64()
                ),
                "n_random": pa.array([agg[k][2] for k in keys], pa.int64()),
                "sum_ratio_bp": pa.array(
                    [agg[k][3] for k in keys], pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(_partials, batch_format="pyarrow")
        .groupby("source", num_partitions=2)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_repetitive", alias_name="n_repetitive"),
            Sum("n_random", alias_name="n_random"),
            Sum("sum_ratio_bp", alias_name="sum_ratio_bp"),
        )
    )
