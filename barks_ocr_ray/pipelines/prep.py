"""Training-data preparation pipeline: the composition a real corpus
run chains after extraction — quality scoring, language ID, exact
dedup, per-language rebalancing — as ONE streaming Dataset pipeline.

Shape (the scale-relevant property): every per-row derivation (stats,
language, content hash) is FUSED into a single actor-pool pass, so the
whole prep costs exactly one keyed exchange (the dedup) end to end:

    read -> enrich (one map_batches: stats + lang + md5)
         -> filter (quality + language confidence)
         -> exact dedup on content hash (hash partition, min doc_id)
         -> stratified sample (pure row function, md5-fraction)

Value-exact DuckDB oracle (q51): every step is SQL-replayable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from barks_ocr_ray.functions.relational import round_like_duckdb
from barks_ocr_ray.functions.text import TOKEN_RE, LangId


class PrepEnricher(LangId):
    """One fused per-row pass: text statistics (vectorized kernels),
    language classification (warm profile state from LangId), and the
    dedup content hash. Emitting them together avoids two extra
    full-corpus passes and two doc_id joins."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        # round_like_duckdb is imported at MODULE level: a runtime import
        # of the package inside a worker body fails under the driver's
        # by-value cloudpickle shipping (no package on worker sys.path)
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        n_tokens = pc.count_substring_regex(lower, TOKEN_RE).cast(pa.int64())
        preds, scores, hashes = [], [], []
        for s in text:
            raw = s.as_py()
            lang, score = self.classify(raw or "")
            preds.append(lang)
            scores.append(score)
            hashes.append(
                hashlib.md5((raw or "").encode("utf-8")).hexdigest()
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_hash": pa.array(hashes, pa.string()),
                "lang_pred": pa.array(preds, pa.string()),
                "lang_score": pa.array(
                    round_like_duckdb(np.asarray(scores, np.float64), 4),
                    pa.float64(),
                ),
                "n_tokens": n_tokens,
                "text_len": pc.utf8_length(text).cast(pa.int64()),
            }
        )


def training_prep(
    docs: Dataset,
    *,
    rates: dict[str, float],
    default_rate: float = 1.0,
    min_lang_score: float = 0.2,
    min_tokens: int = 10,
    num_partitions: int = 16,
    concurrency: int = 4,
    stateful: bool = False,
) -> Dataset:
    """documents -> deduplicated, quality- and confidence-filtered,
    per-language rebalanced corpus. Output: (doc_id, lang_pred,
    lang_score, n_tokens, text_len).

    ``stateful`` picks the enricher's execution vehicle, mirroring the
    extract stages' choice (extraction.py): the default TASK pool keeps
    the stage fusable with upstream task/actor stages at full width —
    a class argument would force the whole fused chain into ONE actor
    pool, which Ray 2.49 caps at ~8 dispatched tasks in multi-op
    pipelines (measured: the q56 arc ran 6x slower that way). The
    enricher's warm state (compiled regex + profile sets) is cheap
    enough to ship per task."""
    from barks_ocr_ray.functions.relational import exact_dedup
    from barks_ocr_ray.functions.text import stratified_sample

    projected = docs.select_columns(["doc_id", "text"])
    if stateful:
        enriched = projected.map_batches(
            PrepEnricher, batch_format="pyarrow", concurrency=(1, concurrency)
        )
    else:
        enriched = projected.map_batches(
            PrepEnricher(), batch_format="pyarrow"
        )

    def _keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("n_tokens"), pa.scalar(min_tokens)),
            pc.greater_equal(t.column("lang_score"), pa.scalar(min_lang_score)),
        )
        return t.filter(mask)

    filtered = enriched.map_batches(_keep, batch_format="pyarrow")
    deduped = exact_dedup(
        filtered, "text_hash", tie_break_col="doc_id",
        num_partitions=num_partitions,
    )
    sampled = stratified_sample(
        deduped, rates=rates, strata_col="lang_pred", default_rate=default_rate
    )
    return sampled.select_columns(
        ["doc_id", "lang_pred", "lang_score", "n_tokens", "text_len"]
    )
