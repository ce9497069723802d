"""Greedy max-coverage document selection (submodular coreset pick).

Select k documents that together cover the most distinct terms — the
lazy-greedy facility-location selection used to build small
high-coverage subsets of a pretraining corpus (classic (1-1/e) greedy
max-coverage; cf. Nemhauser et al. 1978, public). The reference engine
has no selection stage; this extends the curation family (SURVEY §2.9)
the same way SemDeDup (`ann.py`) extends dedup.

Execution shape (the q94/q126 BSP raw-task pattern — SURVEY
custom-operator rule (c)): documents tokenize ONCE into per-block
(doc_ids, sorted distinct 64-bit term fingerprints, offsets) codes held
in the object store; each of the k rounds broadcasts the covered-set
array (ray.put — grows by at most one doc's vocabulary per round),
runs one wave of pure-numpy tasks that return each block's local
champion (gain desc, doc_id asc) plus that champion's uncovered
fingerprints, and the driver closes the global argmax and unions the
winner's terms. Round cost = one searchsorted over the coded corpus;
driver state = the covered set (k x doc-vocab-bounded) — never a
doc-keyed exchange.

Coverage is defined over 64-bit md5 term fingerprints (the golden
shares the kernel, so both engines agree bit-exactly; at 64 bits
collisions are ~n^2/2^65 — negligible, and by construction identical
on both sides)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from barks_ocr_ray.functions.text import Tokenizer

__all__ = ["max_coverage_select", "golden_max_coverage"]


def _term_fp(term: str, _memo: dict | None = None) -> int:
    """First 8 bytes of md5(term) as uint64 (big-endian hex slice)."""
    if _memo is not None:
        v = _memo.get(term)
        if v is not None:
            return v
    v = int(hashlib.md5(term.encode("utf-8")).hexdigest()[:16], 16)
    if _memo is not None:
        _memo[term] = v
    return v


def _code_block(t: pa.Table) -> tuple | None:
    """(doc_ids int64[n], fps uint64[total], offsets int64[n+1]) with
    per-doc DISTINCT sorted fingerprints; None for an empty block."""
    if t.num_rows == 0:
        return None
    tok = Tokenizer()
    memo: dict = {}
    ids, chunks, offs = [], [], [0]
    for doc_id, s in zip(t.column("doc_id").to_pylist(), t.column("text")):
        terms = set(tok.tokens(s.as_py() or ""))
        fps = np.sort(
            np.fromiter(
                (_term_fp(w, memo) for w in terms),
                dtype=np.uint64,
                count=len(terms),
            )
        )
        ids.append(doc_id)
        chunks.append(fps)
        offs.append(offs[-1] + len(fps))
    return (
        np.asarray(ids, np.int64),
        np.concatenate(chunks) if chunks else np.empty(0, np.uint64),
        np.asarray(offs, np.int64),
    )


def _block_champion(code, covered: np.ndarray):
    """Local winner under the current covered set: (gain, doc_id,
    uncovered fingerprints of that doc); None if no positive gain."""
    if code is None:
        return None
    ids, fps, offs = code
    if covered.size:
        pos = np.searchsorted(covered, fps)
        pos[pos == covered.size] = 0  # safe index; equality re-checked
        new = covered[pos] != fps
    else:
        new = np.ones(fps.shape, bool)
    # segment sums via cumsum-diff: exact for empty segments (reduceat
    # cannot index past the array when a trailing doc has no terms)
    csum = np.concatenate(([0], np.cumsum(new.astype(np.int64))))
    gains = csum[offs[1:]] - csum[offs[:-1]]
    if not len(ids) or gains.max() <= 0:
        return None
    best = np.lexsort((ids, -gains))[0]
    lo, hi = offs[best], offs[best + 1]
    seg = fps[lo:hi]
    return int(gains[best]), int(ids[best]), seg[new[lo:hi]]


def _select_rounds(champion_of_block, k: int) -> pa.Table:
    """Driver loop shared by the distributed and golden paths:
    ``champion_of_block(covered) -> list of (gain, doc_id, new_fps)``."""
    covered = np.empty(0, np.uint64)
    rank, out_r, out_d, out_g, out_c = 0, [], [], [], []
    while rank < k:
        cands = champion_of_block(covered)
        cands = [c for c in cands if c is not None]
        if not cands:
            break  # every remaining doc adds nothing
        gains = np.array([c[0] for c in cands], np.int64)
        ids = np.array([c[1] for c in cands], np.int64)
        w = np.lexsort((ids, -gains))[0]
        gain, doc_id, new_fps = cands[w]
        covered = np.union1d(covered, new_fps)
        rank += 1
        out_r.append(rank)
        out_d.append(doc_id)
        out_g.append(gain)
        out_c.append(int(covered.size))
    return pa.table(
        {
            "rank": pa.array(out_r, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "gain": pa.array(out_g, pa.int64()),
            "covered_total": pa.array(out_c, pa.int64()),
        }
    )


def max_coverage_select(docs, k: int = 10) -> pa.Table:
    """Distributed greedy max-coverage over a (doc_id, text) Dataset;
    returns (rank, doc_id, gain, covered_total), one row per selection,
    stopping early when no document adds a new term."""
    import ray as _ray

    prep = _ray.remote(num_cpus=1)(_code_block)
    stepf = _ray.remote(num_cpus=1)(_block_champion)
    coded = [
        prep.remote(b)
        for b in docs.select_columns(["doc_id", "text"]).to_arrow_refs()
    ]

    def _champions(covered: np.ndarray):
        cref = _ray.put(covered)
        out, pending = [], [stepf.remote(cb, cref) for cb in coded]
        while pending:
            done, pending = _ray.wait(
                pending, num_returns=min(8, len(pending))
            )
            out.extend(_ray.get(done))
        return out

    return _select_rounds(_champions, k)


def golden_max_coverage(docs: pa.Table, k: int = 10) -> pa.Table:
    """Sequential replay sharing `_code_block`/`_block_champion`
    verbatim (one 'block' = the whole corpus), so the distributed
    selection is pinned bit-exactly."""
    code = _code_block(docs)
    return _select_rounds(lambda cov: [_block_champion(code, cov)], k)
