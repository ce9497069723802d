"""Benchmark decontamination: flag training documents that share any
k-token shingle with a (small) held-out evaluation set — the standard
train/test-overlap scrub (Brown et al. 2020 "GPT-3" §C, Chowdhery et
al. 2022 "PaLM" §8; public papers — no reference-repo counterpart,
extends SURVEY.md §2's LLM-pipeline family).

Scale shape (100 TB): the eval side is benchmark-sized by definition
(MBs, not TBs), so its shingle-hash set is built once and broadcast
with ``ray.put`` — the training corpus streams through ONE map_batches
with a vectorized ``pc.is_in`` membership test per batch; zero
exchanges, no join, no state growth with corpus size. Shingle hashes
are md5 over the space-joined lowercase token window, chosen (over a
faster rolling hash — see ``text.fingerprint_docs`` for that) because
DuckDB has ``md5()``: the oracle replays the exact decision.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from barks_ocr_ray.functions.text import TOKEN_RE

#: default shingle width (tokens); 8 is the GPT-3-style 13-gram scrub
#: scaled to this corpus's short synthetic docs
DEFAULT_SHINGLE_K = 8


def _doc_shingle_hashes(text: str | None, k: int, token_re) -> list[str]:
    toks = token_re.findall(text.lower()) if text else []
    return [
        hashlib.md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()
        for i in range(len(toks) - k + 1)
    ]


def eval_shingle_set(
    eval_docs: Dataset,
    *,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
    pre=None,
) -> pa.Array:
    """Distinct shingle hashes of the eval set, as one Arrow array.
    Collected to the driver: the eval set is benchmark-sized (the whole
    point of decontamination), so this is a bounded, small structure —
    NOT corpus-scaled state. ``pre`` (an optional pa.Table -> pa.Table
    row filter) runs INSIDE this UDF rather than as an upstream
    map_batches: a selective upstream filter empties most blocks, and a
    later fused map over an empty block emits a schema-less table (the
    RefBundle warning class)."""
    token_re = re.compile(TOKEN_RE)

    def _shingles(t: pa.Table) -> pa.Table:
        if pre is not None:
            t = pre(t)
        hs: set[str] = set()
        for s in t.column(text_col):
            hs.update(_doc_shingle_hashes(s.as_py(), k, token_re))
        return pa.table({"h": pa.array(sorted(hs), pa.string())})

    parts = eval_docs.map_batches(
        _shingles, batch_format="pyarrow"
    ).take_all()
    return pa.array(sorted({r["h"] for r in parts}), pa.string())


def decontaminate(
    train_docs: Dataset,
    eval_hashes: pa.Array,
    *,
    k: int = DEFAULT_SHINGLE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre=None,
) -> Dataset:
    """Per-doc contamination statistics against the broadcast eval
    shingle set: (doc_id, n_shingles, n_hits, contaminated). Shingle
    positions (not distinct shingles) are counted on the training side
    — mirrored exactly by the SQL oracle. The eval set rides the object
    store once (``ray.put``), never re-shipped per batch; the per-batch
    membership test is one vectorized ``pc.is_in`` over all shingles in
    the batch with a segment-sum back to docs. ``pre`` fuses an optional
    row filter into this UDF (see ``eval_shingle_set``)."""
    ref = ray.put(eval_hashes)
    token_re = re.compile(TOKEN_RE)

    def _scan(t: pa.Table) -> pa.Table:
        if pre is not None:
            t = pre(t)
        ev = ray.get(ref)
        all_hashes: list[str] = []
        counts = np.empty(t.num_rows, np.int64)
        for i, s in enumerate(t.column(text_col)):
            hs = _doc_shingle_hashes(s.as_py(), k, token_re)
            counts[i] = len(hs)
            all_hashes.extend(hs)
        if all_hashes:
            hits = pc.is_in(
                pa.array(all_hashes, pa.string()), value_set=ev
            ).to_numpy(zero_copy_only=False)
            bounds = np.concatenate(([0], np.cumsum(counts)))
            n_hits = np.add.reduceat(
                np.concatenate((hits.astype(np.int64), [0])), bounds[:-1]
            )
            # reduceat on an empty segment repeats the element AT the
            # boundary; zero empty segments explicitly
            n_hits[counts == 0] = 0
        else:
            n_hits = np.zeros(t.num_rows, np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_shingles": pa.array(counts, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )

    return train_docs.map_batches(_scan, batch_format="pyarrow")
