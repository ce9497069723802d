"""Batched model inference over a documents table: the quality-
classifier filter shape (fastText/DCLM-style model-scored quality,
Li et al. 2024 "DataComp-LM" §4.4; public papers — no reference-repo
counterpart, extends SURVEY.md §2's LLM-pipeline family).

The model here is a deterministic linear scorer over vectorized text
features — small on purpose, so the score is bit-replayable in SQL
(every multiply-add in a fixed association order; IEEE doubles match
between numpy and DuckDB). The PATTERN is the deliverable and is real:
weights load once per actor in ``__init__`` (the model-load slot — a
real classifier would mmap its embedding matrix here and request
``num_gpus`` in ``map_batches``), inference is one vectorized pass per
batch, the corpus streams with zero exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from barks_ocr_ray.functions.relational import round_like_duckdb
from barks_ocr_ray.functions.text import STOPWORDS, TOKEN_RE

#: linear quality model: score = b + w·(text_len, n_tokens, n_punct,
#: n_stop, stop_ratio). Signs follow the published heuristics (length
#: and stopword density up-weight; punctuation-free walls of tokens
#: down-weight). Frozen so the SQL oracle replays bit-exact.
QUALITY_WEIGHTS = {
    "b": -2.0,
    "text_len": 0.004,
    "n_tokens": 0.02,
    "n_punct": 0.15,
    "n_stop": 0.05,
    "stop_ratio": 3.0,
}
QUALITY_KEEP_THRESHOLD = 0.5


class QualityModel:
    """Actor-pool inference stage: model state built once per actor
    (T1/T5 pattern), one vectorized scoring pass per batch."""

    def __init__(self, weights: dict | None = None):
        self.w = dict(QUALITY_WEIGHTS if weights is None else weights)
        self.stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null text scores as empty text (the oracle coalesces too) —
        # NaN-vs-NULL divergence is the q21-class latent-null trap
        text = batch.column("text").combine_chunks().fill_null("")
        lower = pc.utf8_lower(text)

        def f(arr) -> np.ndarray:
            return (
                arr.cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )

        text_len = f(pc.utf8_length(text))
        n_tokens = f(pc.count_substring_regex(lower, TOKEN_RE))
        n_punct = f(pc.count_substring_regex(text, r"[.!?]"))
        n_stop = f(pc.count_substring_regex(lower, self.stop_pat))
        stop_ratio = n_stop / np.maximum(n_tokens, 1.0)
        # fixed association order — term by term, left to right — so
        # the SQL oracle's + chain produces bit-identical doubles
        w = self.w
        score = w["b"] + w["text_len"] * text_len
        score = score + w["n_tokens"] * n_tokens
        score = score + w["n_punct"] * n_punct
        score = score + w["n_stop"] * n_stop
        score = score + w["stop_ratio"] * stop_ratio
        rounded = round_like_duckdb(score, 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "quality_score": pa.array(rounded, pa.float64()),
                "keep": pa.array(
                    rounded > QUALITY_KEEP_THRESHOLD, pa.bool_()
                ),
            }
        )


def quality_model_score(docs: Dataset, concurrency: int = 4) -> Dataset:
    """Model-scored quality over (doc_id, text): actor pool so the
    model loads once per actor, streams with zero exchanges."""
    return docs.map_batches(
        QualityModel, batch_format="pyarrow", concurrency=(1, concurrency)
    )
