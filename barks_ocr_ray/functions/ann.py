"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is
  broadcast ONCE (``ray.put``), each batch does one vectorized float64
  matmul and emits only its local top-k per query, and a final per-query
  merge reduces (batches x k) candidates to the global top-k. Exact ->
  has a DuckDB oracle (list_cosine_similarity + QUALIFY).
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets restrict
  each query to candidates sharing its bucket (multi-probe over the
  query's nearby buckets); approximate, rows-only check.

Ranking determinism: candidates are ordered by (round(cosine, 6) desc,
neighbor_id asc) on BOTH the Ray side and the SQL oracle, so float
last-ulp differences cannot flip ranks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from barks_ocr_ray.functions.hashing import splitmix64
from barks_ocr_ray.functions.relational import round_like_duckdb


def _round_half_away(x: np.ndarray, nd: int = 6) -> np.ndarray:
    """DuckDB-bit-identical rounding (see relational.round_like_duckdb)."""
    return round_like_duckdb(x, nd)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in batch.column("embedding").to_pylist()]
    )


def _query_rows(embeddings: Dataset, query_ids: list[int]) -> pd.DataFrame:
    idset = pa.array(query_ids, pa.int64())

    def _sel(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("vec_id"), value_set=idset))

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_sel, batch_format="pyarrow")
        .to_pandas()
    )


def brute_force_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    concurrency: int = 4,
) -> Dataset:
    """(query_id, neighbor_id, cosine) for the exact top-k neighbors of
    each query vector (self excluded)."""
    q_rows = _query_rows(embeddings, query_ids)
    q_ids = q_rows["vec_id"].to_numpy()
    q_mat = _unit(np.stack([np.asarray(v, np.float64) for v in q_rows["embedding"]]))
    q_ref = ray.put((q_ids, q_mat))

    def _local_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(q_ref)
        emb = _unit(_emb_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())
        sims = emb @ mat_q.T  # (batch, Q)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            col = sims[:, qi]
            mask = vec_ids != qid
            cand_ids = vec_ids[mask]
            cand_sims = col[mask]
            if len(cand_ids) == 0:
                continue
            take = min(k, len(cand_ids))
            # local top-k by (rounded sim desc, id asc)
            order = np.lexsort((cand_ids, -_round_half_away(cand_sims)))[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[order].tolist())
            out_s.extend(_round_half_away(cand_sims[order]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        # arrow in, arrow out: pandas groups emit PandasBlockSchema
        # bundles that clash with typed-empty arrow bundles in the
        # executor's schema check (and pandas-block schemas are
        # unhashable downstream — CLAUDE.md)
        order = pc.sort_indices(
            g,
            sort_keys=[("cosine", "descending"), ("neighbor_id", "ascending")],
        )
        return g.take(order[: min(k, g.num_rows)])

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_local_topk, batch_format="pyarrow", batch_size=1024)
        # one group per query (a handful): 2 partitions keeps every
        # shuffle partition non-empty; the exchange carries only local
        # top-k rows (<= k * n_blocks per query), so this is cheap at
        # any corpus scale
        .groupby("query_id", num_partitions=2)
        .map_groups(_merge, batch_format="pyarrow")
    )


def mmr_greedy(
    cand_ids: np.ndarray,
    rel6: np.ndarray,
    pair6: np.ndarray,
    k: int,
    lam: float,
) -> list[tuple[int, int, float, float]]:
    """Maximal-marginal-relevance greedy selection over a candidate
    pool (Carbonell & Goldstein 1998): pick argmax of
    lam*rel - (1-lam)*max_sim_to_selected, ties by smallest id. Inputs
    are ROUND-6 similarities, so the selection is deterministic across
    engines (the repo's ranking-determinism contract). Pure driver
    kernel shared verbatim by the sequential golden — what the oracle
    then pins is the distributed pool retrieval."""
    n = len(cand_ids)
    picked: list[int] = []
    max_to_sel = np.zeros(n, dtype=np.float64)
    taken = np.zeros(n, dtype=bool)
    out = []
    for rank in range(1, min(k, n) + 1):
        mmr = lam * rel6 - (1.0 - lam) * max_to_sel
        mmr[taken] = -np.inf
        best = np.flatnonzero(mmr == mmr.max())
        i = best[np.argmin(cand_ids[best])]
        taken[i] = True
        picked.append(i)
        out.append(
            (
                int(cand_ids[i]),
                rank,
                float(rel6[i]),
                float(round_like_duckdb(np.array([mmr[i]]), 6)[0]),
            )
        )
        max_to_sel = np.maximum(max_to_sel, pair6[:, i])
    return out


def mmr_topk(
    embeddings: Dataset,
    query_ids: list[int],
    *,
    pool_k: int = 25,
    k: int = 10,
    lam: float = 0.7,
) -> pa.Table:
    """Diversified top-k retrieval: the exact-cosine top-``pool_k``
    candidate pool per query comes from the DISTRIBUTED brute-force
    kernel (broadcast query matrix, per-block top-k, global merge);
    the MMR re-rank then runs on the (queries x pool_k)-bounded driver
    pool (candidate vectors fetched once via a broadcast is_in
    filter). Returns (query_id, rank, neighbor_id, rel_cosine,
    mmr_score)."""
    pool = brute_force_topk(embeddings, query_ids, k=pool_k).take_all()
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rel_cosine": pa.array([], pa.float64()),
            "mmr_score": pa.array([], pa.float64()),
        }
    )
    if not pool:
        return empty
    by_q: dict[int, list] = {}
    need = set()
    for r in pool:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["cosine"]), int(r["neighbor_id"]))
        )
        need.add(int(r["neighbor_id"]))
    rows = _query_rows(embeddings, sorted(need))
    vid = rows["vec_id"].to_numpy()
    mat = _unit(
        np.stack([np.asarray(v, np.float64) for v in rows["embedding"]])
    )
    pos = {int(v): i for i, v in enumerate(vid)}
    out_q, out_r, out_n, out_c, out_m = [], [], [], [], []
    for qid in sorted(by_q):
        cand = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))
        cand_ids = np.array([c[1] for c in cand], np.int64)
        rel6 = np.array([c[0] for c in cand], np.float64)
        cm = mat[[pos[int(c)] for c in cand_ids]]
        pair6 = _round_half_away(cm @ cm.T)
        for nid, rank, rel, mmr in mmr_greedy(
            cand_ids, rel6, pair6, k, lam
        ):
            out_q.append(qid)
            out_r.append(rank)
            out_n.append(nid)
            out_c.append(rel)
            out_m.append(mmr)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "rel_cosine": pa.array(out_c, pa.float64()),
            "mmr_score": pa.array(out_m, pa.float64()),
        }
    )


#: typed empty result of the exact all-pairs join (schema contract)
ALL_PAIRS_EMPTY = pa.table(
    {
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def embedding_all_pairs_exact(
    embeddings: Dataset,
    *,
    threshold: float = 0.8,
    n_blocks: int = 4,
    num_partitions: int = 8,
) -> Dataset:
    """EXACT cosine similarity self-join (all pairs >= threshold) via
    block-nested-loop enumeration: row with id v goes to block
    b = v % n_blocks; every row is replicated to each block PAIR it
    participates in, one groupby co-locates a block pair, and the group
    computes its cross/triangular cosine matrix vectorized.

    Cost model (the documented tradeoff): replication factor = n_blocks,
    per-group memory = 2/n_blocks of the corpus, compute = the full
    O(n^2) — this is the exact baseline the LSH path (embedding_near_dups)
    trades recall against. No driver-side state, no broadcast of the
    corpus. Oracle: DuckDB cross join + list_cosine_similarity."""

    def _explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
        own = ids % n_blocks
        tables = []
        for other in range(n_blocks):
            lo = np.minimum(own, other)
            hi = np.maximum(own, other)
            tables.append(
                pa.table(
                    {
                        "vec_id": t.column("vec_id"),
                        "embedding": t.column("embedding"),
                        "own_block": pa.array(own, pa.int64()),
                        "pair_key": pa.array(lo * n_blocks + hi, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    def _pairs(g: pa.Table) -> pa.Table:
        key = int(g.column("pair_key")[0].as_py())
        lo, hi = key // n_blocks, key % n_blocks
        # each row appears once per (own, other) combination -> dedup
        # (first occurrence, like drop_duplicates)
        ids_all = g.column("vec_id").to_numpy(zero_copy_only=False)
        _, fi = np.unique(ids_all, return_index=True)
        fi.sort()
        ids = ids_all[fi].astype(np.int64)
        embs = g.column("embedding").to_pylist()
        emb = _unit(
            np.stack([np.asarray(embs[i], np.float64) for i in fi])
        )
        own = ids % n_blocks
        a_idx = np.where(own == lo)[0]
        b_idx = np.where(own == hi)[0]
        if lo == hi:
            i, j = np.triu_indices(len(a_idx), k=1)
            ia, ib = a_idx[i], a_idx[j]
        else:
            ia = np.repeat(a_idx, len(b_idx))
            ib = np.tile(b_idx, len(a_idx))
        if len(ia) == 0:
            sims = np.array([], np.float64)
        else:
            sims = np.einsum("ij,ij->i", emb[ia], emb[ib])
        keep = sims >= threshold  # threshold on the raw cosine
        va, vb = ids[ia][keep], ids[ib][keep]
        swap = va > vb
        va2 = np.where(swap, vb, va)
        vb2 = np.where(swap, va, vb)
        return pa.table(
            {
                "vec_a": pa.array(va2, pa.int64()),
                "vec_b": pa.array(vb2, pa.int64()),
                "cosine": pa.array(_round_half_away(sims[keep], 6), pa.float64()),
            }
        )

    out = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_explode, batch_format="pyarrow")
        .groupby("pair_key")
        .map_groups(_pairs, batch_format="pyarrow")
    )
    # All-empty group outputs lose the block schema through the shuffle
    # (Ray 2.49, same effect compact_nonempty documents); pin the typed
    # empty result so downstream schema/column checks hold at any scale.
    from barks_ocr_ray.functions.relational import compact_nonempty

    out, n = compact_nonempty(out, num_partitions)
    if n == 0:
        # Consistent return type (always a Dataset, composable with
        # join/map_batches); from_arrow keeps the typed empty schema.
        # The 0-row to_pandas schema loss is handled at the query layer.
        import ray.data as _rd

        return _rd.from_arrow(ALL_PAIRS_EMPTY)
    return out


MUTUAL_EMPTY = pa.table(
    {
        "vec_a": pa.array([], pa.int64()),
        "vec_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
        "margin_micro": pa.array([], pa.int64()),
    }
)


def mutual_top1_alignment(
    embeddings: Dataset,
    *,
    n_blocks: int = 4,
    num_partitions: int = 8,
) -> Dataset:
    """Margin-based mutual-nearest-neighbor mining (the bitext-mining
    primitive, Artetxe & Schwenk 2019): side A = even vec_id, side B =
    odd; keep pairs (a, b) where b is a's cosine top-1 AND a is b's
    top-1, with a's margin = cos1/cos2 reported for thresholding.

    Exact with NO corpus broadcast: (1) block-nested-loop candidate
    generation — each (A-block, B-block) pair co-locates via one
    groupby and emits per-vector LOCAL top-2 rows (global top-2 is a
    subset of the n_blocks local top-2s); (2) a query-keyed exchange
    (≤ 2·n_blocks candidate rows per vector) merges to global tops and
    emits one claim row per side; (3) a pair-keyed exchange (≤ 2 rows
    per vector) keeps pairs claimed by BOTH sides. Ranking ties break
    by (round-6 cosine desc, id asc) on both engines."""

    def _explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
        side = ids % 2
        blk = (ids // 2) % n_blocks
        tables = []
        for other in range(n_blocks):
            key = np.where(
                side == 0, blk * n_blocks + other, other * n_blocks + blk
            )
            tables.append(
                pa.table(
                    {
                        "vec_id": t.column("vec_id"),
                        "embedding": t.column("embedding"),
                        "key": pa.array(key, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    CAND_EMPTY = pa.table(
        {
            "q": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
            "side": pa.array([], pa.int64()),
        }
    )

    def _local_tops(g: pa.Table) -> pa.Table:
        ids_all = g.column("vec_id").to_numpy(zero_copy_only=False)
        _, fi = np.unique(ids_all, return_index=True)
        fi.sort()
        ids = ids_all[fi].astype(np.int64)
        a_idx = np.where(ids % 2 == 0)[0]
        b_idx = np.where(ids % 2 == 1)[0]
        if len(a_idx) == 0 or len(b_idx) == 0:
            return CAND_EMPTY
        embs = g.column("embedding").to_pylist()
        emb = _unit(
            np.stack([np.asarray(embs[i], np.float64) for i in fi])
        )
        sims = _round_half_away(emb[a_idx] @ emb[b_idx].T, 6)
        a_ids, b_ids = ids[a_idx], ids[b_idx]
        out_q, out_n, out_c, out_s = [], [], [], []
        for i, aid in enumerate(a_ids):
            order = np.lexsort((b_ids, -sims[i]))[:2]
            out_q.extend([aid] * len(order))
            out_n.extend(b_ids[order].tolist())
            out_c.extend(sims[i][order].tolist())
            out_s.extend([0] * len(order))
        for j, bid in enumerate(b_ids):
            order = np.lexsort((a_ids, -sims[:, j]))[:1]
            out_q.append(bid)
            out_n.append(int(a_ids[order[0]]))
            out_c.append(float(sims[order[0], j]))
            out_s.append(1)
        return pa.table(
            {
                "q": pa.array(out_q, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
                "side": pa.array(out_s, pa.int64()),
            }
        )

    def _merge_claims(t: pa.Table) -> pa.Table:
        """All candidates of a query id are co-located (q-keyed
        repartition): global top-2 per (q, side) from the local tops."""
        q = t.column("q").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        cos = t.column("cos").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -cos, side, q))
        q, n, cos, side = q[order], n[order], cos[order], side[order]
        new = np.ones(len(q), np.bool_)
        new[1:] = (q[1:] != q[:-1]) | (side[1:] != side[:-1])
        first = np.flatnonzero(new)
        va, vb, src, c1, c2 = [], [], [], [], []
        for pos, nxt in zip(
            first, np.append(first[1:], len(q))
        ):
            if side[pos] == 0:
                va.append(int(q[pos]))
                vb.append(int(n[pos]))
                src.append(0)
                c1.append(float(cos[pos]))
                c2.append(float(cos[pos + 1]) if nxt - pos > 1 else None)
            else:
                va.append(int(n[pos]))
                vb.append(int(q[pos]))
                src.append(1)
                c1.append(None)
                c2.append(None)
        return pa.table(
            {
                "vec_a": pa.array(va, pa.int64()),
                "vec_b": pa.array(vb, pa.int64()),
                "src": pa.array(src, pa.int64()),
                "cos1": pa.array(c1, pa.float64()),
                "cos2": pa.array(c2, pa.float64()),
            }
        )

    def _mutual(t: pa.Table) -> pa.Table:
        """Pairs claimed by both sides (pair-keyed repartition)."""
        va = t.column("vec_a").to_numpy(zero_copy_only=False)
        vb = t.column("vec_b").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        c1 = t.column("cos1").to_numpy(zero_copy_only=False)
        c2 = t.column("cos2").to_numpy(zero_copy_only=False)
        order = np.lexsort((src, vb, va))
        va, vb, src = va[order], vb[order], src[order]
        c1, c2 = c1[order], c2[order]
        both = np.zeros(len(va), np.bool_)
        if len(va) > 1:
            both[:-1] = (
                (va[:-1] == va[1:])
                & (vb[:-1] == vb[1:])
                & (src[:-1] == 0)
                & (src[1:] == 1)
            )
        idx = np.flatnonzero(both)
        margin = []
        for i in idx:
            cc2 = c2[i]
            margin.append(
                int(round_like_duckdb(1e6 * c1[i] / cc2, 0))
                if cc2 is not None and not np.isnan(cc2) and cc2 > 0
                else None
            )
        return pa.table(
            {
                "vec_a": pa.array(va[idx], pa.int64()),
                "vec_b": pa.array(vb[idx], pa.int64()),
                "cosine": pa.array(c1[idx], pa.float64()),
                "margin_micro": pa.array(margin, pa.int64()),
            }
        )

    from barks_ocr_ray.context import hash_partitions
    from barks_ocr_ray.functions.relational import compact_nonempty

    out = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_explode, batch_format="pyarrow")
        .groupby("key")
        .map_groups(_local_tops, batch_format="pyarrow")
        .repartition(hash_partitions(num_partitions), keys=["q"])
        .map_batches(_merge_claims, batch_format="pyarrow")
        .repartition(hash_partitions(num_partitions), keys=["vec_a", "vec_b"])
        .map_batches(_mutual, batch_format="pyarrow")
    )
    out, nrows = compact_nonempty(out, num_partitions)
    if nrows == 0:
        import ray.data as _rd

        return _rd.from_arrow(MUTUAL_EMPTY)
    return out


def lsh_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_planes: int = 8,
    seed: int = 7,
) -> Dataset:
    """Approximate top-k: only candidates in the query's LSH bucket (or a
    1-bit-flip neighbor bucket — multi-probe) are scored. Recall < 1 by
    construction; the bench pairs it with brute_force_topk to report
    recall@k."""
    first = embeddings.take(1)
    dim = len(first[0]["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    q_rows = _query_rows(embeddings, query_ids)
    q_ids = q_rows["vec_id"].to_numpy()
    q_mat = _unit(np.stack([np.asarray(v, np.float64) for v in q_rows["embedding"]]))
    q_signs = (q_mat @ planes) >= 0
    q_buckets = q_signs.dot(1 << np.arange(n_planes)).astype(np.int64)
    # multi-probe: the query's bucket plus every 1-bit flip of it
    probe_sets = [
        {int(b)} | {int(b) ^ (1 << p) for p in range(n_planes)} for b in q_buckets
    ]
    q_ref = ray.put((q_ids, q_mat, probe_sets))

    def _bucketed_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, probes = ray.get(q_ref)
        pl = ray.get(planes_ref)
        emb = _unit(_emb_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())
        signs = (emb @ pl) >= 0
        buckets = signs.dot(1 << np.arange(pl.shape[1])).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            mask = np.fromiter(
                (int(b) in probes[qi] for b in buckets), bool, len(buckets)
            )
            mask &= vec_ids != qid
            if not mask.any():
                continue
            cand_ids = vec_ids[mask]
            sims = emb[mask] @ mat_q[qi]
            take = min(k, len(cand_ids))
            order = np.lexsort((cand_ids, -_round_half_away(sims)))[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[order].tolist())
            out_s.extend(_round_half_away(sims[order]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g.column("neighbor_id").to_numpy(zero_copy_only=False),
                -g.column("cosine").to_numpy(zero_copy_only=False),
            )
        )[:k]
        return g.take(pa.array(order))

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_bucketed_topk, batch_format="pyarrow", batch_size=1024)
        .groupby("query_id")
        .map_groups(_merge, batch_format="pyarrow")
    )


def _train_sample_matrix(
    embeddings: Dataset, sample_cap: int = 2048
) -> np.ndarray:
    """BOUNDED deterministic training sample as a unit matrix
    (lowest-md5-hash vec_ids, order-independent). Sampling is a
    hash-threshold filter — keep rows whose md5 fraction falls below
    ~4x the target rate (a pure row function; no global sort, no
    shuffle) — then a local top-cap on the ~4x-cap survivors. The cap,
    not the corpus, bounds driver memory; at 100 TB the same cap holds
    and whatever trains on it is broadcast once. Shared by the IVF
    coarse quantizer and the PQ codebooks (and replayed sequentially
    by their goldens)."""
    import hashlib

    n_rows = embeddings.count()
    if n_rows == 0:
        # guard BEFORE the map: map_batches skips the UDF on empty
        # blocks (CLAUDE.md), so the sample_key column never appears
        # and to_pandas().sort_values would raise an opaque KeyError
        raise ValueError(
            "quantizer training: embeddings dataset is empty — no "
            "sample to train on"
        )
    # 4x oversampling margin: P(fewer than cap survivors) is negligible,
    # and the fallback below keeps correctness either way
    frac = min(1.0, 4.0 * sample_cap / max(1, n_rows))

    def _sample_keys(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_pylist()
        keys = [
            hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids
        ]
        keep = [int(k[:8], 16) / float(1 << 32) < frac for k in keys]
        return t.append_column(
            "sample_key", pa.array(keys, pa.string())
        ).filter(pa.array(keep, pa.bool_()))

    sample = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_sample_keys, batch_format="pyarrow")
        .to_pandas()
        .sort_values("sample_key", kind="mergesort")
        .head(sample_cap)
    )
    if len(sample) == 0:
        raise ValueError(
            "quantizer training: embeddings dataset is empty — no "
            "sample to train on"
        )
    return _unit(
        np.stack([np.asarray(v, np.float64) for v in sample["embedding"]])
    )


def _train_centroids(
    embeddings: Dataset, n_centroids: int, seed: int, sample_cap: int = 2048
) -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd's k-means on the bounded
    deterministic sample (see _train_sample_matrix)."""
    return _kmeans(
        _train_sample_matrix(embeddings, sample_cap), n_centroids, seed
    )


def _kmeans_l2(mat: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's k-means under EUCLIDEAN distance (no re-
    normalization) — the right objective for PQ subvectors, which are
    slices of unit vectors and not unit themselves. PURE kernel shared
    by the distributed encoder and the single-process golden."""
    rng = np.random.RandomState(seed)
    k = min(k, len(mat))
    centroids = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(10):  # fixed Lloyd iterations, deterministic
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def pq_codebooks(
    sample_mat: np.ndarray, m_subvectors: int, n_codes: int, seed: int
) -> np.ndarray:
    """(M, n_codes, D/M) product-quantization codebooks: one euclidean
    k-means per subspace over the bounded sample. Pure kernel (shared
    with the golden)."""
    d = sample_mat.shape[1] // m_subvectors
    return np.stack(
        [
            _kmeans_l2(
                sample_mat[:, i * d : (i + 1) * d], n_codes, seed + i
            )
            for i in range(m_subvectors)
        ]
    )


def _pq_encode(emb_unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, D) unit vectors -> (n, M) nearest-codeword indices. Pure
    vectorized kernel (shared with the golden)."""
    m, _k, d = books.shape
    codes = np.empty((len(emb_unit), m), np.int64)
    for i in range(m):
        sub = emb_unit[:, i * d : (i + 1) * d]
        b = books[i]
        d2 = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ b.T)
            + (b * b).sum(axis=1)[None, :]
        )
        codes[:, i] = d2.argmin(axis=1)
    return codes


def _pq_scores(q_vec: np.ndarray, codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """ADC: approximate inner product of the query with every encoded
    vector = sum over subspaces of LUT[m, code] where LUT[m, c] =
    q_m . books[m, c]. Pure kernel (shared with the golden)."""
    m, _k, d = books.shape
    lut = np.stack(
        [books[i] @ q_vec[i * d : (i + 1) * d] for i in range(m)]
    )  # (M, n_codes)
    return lut[np.arange(m)[:, None], codes.T].sum(axis=0)


def pq_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    m_subvectors: int = 8,
    n_codes: int = 16,
    seed: int = 7,
) -> Dataset:
    """Product-quantization approximate top-k (Jegou et al. 2011 — the
    memory-compression scale path next to LSH/IVF): vectors compress to
    M uint8 codes (64 floats -> 8 bytes here), queries score candidates
    through per-subspace lookup tables (ADC) without touching raw
    floats. At 100 TB the encoded corpus is ~32x smaller than float32
    embeddings — the difference between spilling and fitting. Codebooks
    train on the SAME bounded deterministic sample rule as IVF and
    broadcast once; encoding and scoring are vectorized per block; the
    per-query merge is the ivf_topk shape. Approximation error < 1
    recall by construction — paired with the brute-force recall test."""
    centroids_sample = _train_sample_matrix(embeddings)
    books = pq_codebooks(centroids_sample, m_subvectors, n_codes, seed)
    books_ref = ray.put(books)

    q_rows = _query_rows(embeddings, query_ids)
    q_ids = q_rows["vec_id"].to_numpy()
    q_mat = _unit(
        np.stack([np.asarray(v, np.float64) for v in q_rows["embedding"]])
    )
    q_ref = ray.put((q_ids, q_mat))

    def _local_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(q_ref)
        bks = ray.get(books_ref)
        emb = _unit(_emb_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())
        codes = _pq_encode(emb, bks)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            scores = _pq_scores(mat_q[qi], codes, bks)
            mask = vec_ids != qid
            cand_ids, cand_s = vec_ids[mask], scores[mask]
            take = min(k, len(cand_ids))
            order = np.lexsort((cand_ids, -_round_half_away(cand_s)))[
                :take
            ]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[order].tolist())
            out_s.extend(_round_half_away(cand_s[order]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g.column("neighbor_id").to_numpy(zero_copy_only=False),
                -g.column("score").to_numpy(zero_copy_only=False),
            )
        )[:k]
        return g.take(pa.array(order))

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_local_topk, batch_format="pyarrow", batch_size=1024)
        # query-cardinality-sized partitions: the merge key space is the
        # handful of query ids, and empty shuffle partitions finalize as
        # schema-less blocks (the RefBundle-warning class)
        .groupby(
            "query_id", num_partitions=max(1, min(4, len(query_ids)))
        )
        .map_groups(_merge, batch_format="pyarrow")
    )


def _kmeans(mat: np.ndarray, n_centroids: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's k-means over unit rows — a PURE kernel shared by
    the distributed quantizer and the single-process oracle golden
    (golden_dedup.py), so both sides train bit-identical centroids."""
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(mat))
    centroids = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(10):  # fixed Lloyd iterations, deterministic
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit(centroids)
    return centroids


def ivf_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> Dataset:
    """IVF approximate top-k (the inverted-file scale path next to LSH):
    a coarse quantizer (k-means on a bounded sample) partitions vectors
    into centroid lists; each query scores ONLY vectors whose nearest
    centroid is among its n_probe closest centroids. Compute shrinks by
    ~n_probe/n_centroids vs brute force; recall < 1 by construction —
    the recall test pairs it with brute_force_topk."""
    centroids = _train_centroids(embeddings, n_centroids, seed)
    cent_ref = ray.put(centroids)

    q_rows = _query_rows(embeddings, query_ids)
    q_ids = q_rows["vec_id"].to_numpy()
    q_mat = _unit(np.stack([np.asarray(v, np.float64) for v in q_rows["embedding"]]))
    probe = min(n_probe, len(centroids))
    q_probes = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :probe]
    q_ref = ray.put((q_ids, q_mat, q_probes))

    def _listed_topk(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, probes = ray.get(q_ref)
        cents = ray.get(cent_ref)
        emb = _unit(_emb_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())
        lists = (emb @ cents.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(ids_q):
            mask = np.isin(lists, probes[qi])
            mask &= vec_ids != qid
            if not mask.any():
                continue
            cand_ids = vec_ids[mask]
            sims = emb[mask] @ mat_q[qi]
            take = min(k, len(cand_ids))
            order = np.lexsort((cand_ids, -_round_half_away(sims)))[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[order].tolist())
            out_s.extend(_round_half_away(sims[order]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g.column("neighbor_id").to_numpy(zero_copy_only=False),
                -g.column("cosine").to_numpy(zero_copy_only=False),
            )
        )[:k]
        return g.take(pa.array(order))

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_listed_topk, batch_format="pyarrow", batch_size=1024)
        .groupby("query_id")
        .map_groups(_merge, batch_format="pyarrow")
    )


def semdedup(
    embeddings: Dataset,
    *,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 7,
    num_partitions: int = 8,
    pair_chunk: int = 1024,
) -> Dataset:
    """SemDeDup — semantic near-dedup via embedding clustering (Abbas
    et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication" — public paper): k-means clusters
    bound the candidate space, then WITHIN each cluster a vector is
    dropped when its cosine to any LOWER-id cluster member reaches
    ``threshold`` (keep-lowest-id representative — the deterministic
    keep-first rule every exact-dedup op here uses).

    Execution shape: the coarse quantizer is the IVF one
    (`_train_centroids`: bounded deterministic sample, broadcast once);
    assignment is one matmul per block; ONE keyed exchange on cluster
    co-locates members; the within-cluster pass runs per cluster
    segment, chunked (``pair_chunk`` rows vs all earlier members) so
    peak memory is pair_chunk x cluster_size, never cluster_size^2.
    Like all cluster-local methods, recall is bounded by the quantizer
    (near-dups straddling a cluster boundary are missed) — the exact
    sibling is `embedding_all_pairs_exact` (q44); at n_clusters=1 this
    reduces to the exact greedy rule (pinned by a unit test).

    Returns one row per vector: (vec_id, cluster, keep).
    100 TB note: cluster sizes must fit a block — raise n_clusters with
    corpus size (the paper uses ~10^5 clusters for ~10^9 docs) and
    re-shard any cluster that outgrows a block by a salt on vec_id
    ranges (only intra-salt dups are then caught within that cluster).
    """
    centroids = _train_centroids(embeddings, n_clusters, seed)
    cent_ref = ray.put(centroids)

    def _assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        emb = _unit(_emb_matrix(t))
        cl = (emb @ cents.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "embedding": t.column("embedding"),
                "cluster": pa.array(cl, pa.int64()),
            }
        )

    def _cluster_keep(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("cluster", "ascending"), ("vec_id", "ascending")]
        )
        t = t.take(idx)
        emb = _unit(_emb_matrix(t))
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        n = len(cl)
        keep = np.ones(n, bool)
        starts = np.flatnonzero(
            np.concatenate(([True], cl[1:] != cl[:-1]))
        )
        bounds = np.append(starts, n)
        # per-cluster segment; chunked lower-triangular max-sim scan
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = emb[s:e]
            m = e - s
            for c0 in range(1, m, pair_chunk):
                c1 = min(c0 + pair_chunk, m)
                sims = seg[c0:c1] @ seg[:c1].T  # rows c0..c1 vs all <= c1
                ii = np.arange(c0, c1)
                # strict lower triangle: only j < i counts
                mask = np.arange(c1)[None, :] < ii[:, None]
                hit = ((sims >= threshold) & mask).any(axis=1)
                keep[s + c0 : s + c1] = ~hit
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": t.column("cluster"),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(_assign, batch_format="pyarrow")
        .repartition(num_partitions, keys=["cluster"])
        .map_batches(_cluster_keep, batch_format="pyarrow", batch_size=None)
    )


# --- full-corpus distributed k-means (Lloyd's) -----------------------------


def micro_embed(flat: np.ndarray, n_rows: int) -> np.ndarray:
    """int64 micro-space (1e-6) quantization of an embedding matrix —
    the shared pure kernel of q123/q124/q126: all distance and centroid
    arithmetic happens on these integers, so distributed results are
    exact under any partitioning and bit-equal to sequential replays.
    NOTE: round_like_duckdb must be the MODULE-level import — this
    kernel runs inside workers, where a body-level package import
    fails under the driver's no-PYTHONPATH by-value shipping (the
    CLAUDE.md worker-import trap; caught by tools/driver_smoke.py)."""
    return round_like_duckdb(
        flat.astype(np.float64).reshape(n_rows, -1) * 1_000_000.0, 0
    ).astype(np.int64)


def kmeans_assign(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment in micro-int space: exact integer
    squared-L2 (|diff| <= ~1e6, 64-dim sums <= ~6.4e13 << 2^63), ties
    break to the lowest cluster id (np.argmin first-min)."""
    diff = E[:, None, :] - C[None, :, :]
    return np.argmin(np.einsum("nkd,nkd->nk", diff, diff), axis=1)


def _lowest_md5_init(
    embeddings: Dataset, k: int, id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic k-row init: the k lowest-md5-hash ids, pulled via
    the same bounded hash-threshold filter as _train_sample_matrix
    (driver memory bounded by ~4k rows, not the corpus)."""
    import hashlib

    n_rows = embeddings.count()
    frac = min(1.0, 4.0 * k / max(1, n_rows))

    def _sample_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        keys = [
            hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids
        ]
        keep = [int(x[:8], 16) / float(1 << 32) < frac for x in keys]
        return t.append_column(
            "sample_key", pa.array(keys, pa.string())
        ).filter(pa.array(keep, pa.bool_()))

    sample = (
        embeddings.select_columns([id_col, "embedding"])
        .map_batches(_sample_keys, batch_format="pyarrow")
        .to_pandas()
        .sort_values("sample_key", kind="mergesort")
        .head(k)
    )
    if len(sample) < k:
        raise ValueError(
            f"kmeans init: only {len(sample)} rows for k={k}"
        )
    flat = np.concatenate(
        [np.asarray(v, np.float64) for v in sample["embedding"]]
    )
    return micro_embed(flat, k)


def _kmeans_code_block(t: pa.Table):
    """One-time micro-int decode of an embedding block (the
    loop-invariant half of the old per-round pass, hoisted — rounds
    reuse the coded block from the object store instead of re-reading
    and re-decoding the parquet every round)."""
    if t.num_rows == 0:
        return None
    la = t.column("embedding")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    return micro_embed(
        la.flatten().to_numpy(zero_copy_only=False), t.num_rows
    )


def _kmeans_block_partials(E, C: np.ndarray):
    """One Lloyd round over one coded block: dense (k x d) int64 sum
    matrix + k-vector of counts (exact — integer scatter-add)."""
    if E is None:
        return None
    a = kmeans_assign(E, C)
    S = np.zeros(C.shape, dtype=np.int64)
    np.add.at(S, a, E)
    N = np.bincount(a, minlength=C.shape[0]).astype(np.int64)
    return S, N


def distributed_kmeans(
    embeddings: Dataset,
    *,
    k: int = 8,
    rounds: int = 5,
    id_col: str = "vec_id",
) -> Dataset:
    """Full-corpus distributed Lloyd's k-means — the iterative-ML
    sibling of q94's PageRank (the IVF/PQ quantizers train on a bounded
    SAMPLE; this one assigns and updates over EVERY row).

    BSP rounds as RAW RAY TASKS (the q94 pattern, SURVEY custom-
    operator rule (c)): the corpus is decoded ONCE into micro-int
    blocks held in the object store; each round broadcasts the k x d
    centroid matrix (ray.put), runs one wave of pure-numpy tasks that
    return dense (k x d) int64 partials, and the driver merges them
    exactly (integer sums commute). This replaces a per-round Dataset
    re-execution — which re-READ the parquet and re-spun a
    hash-aggregate pool every round — with round cost = assignment
    flops only. Centroid update = integer mean re-rounded in micro
    space (round_like_duckdb), so every round is bit-identical under
    any partitioning and to the sequential golden
    (golden_dedup.golden_kmeans). Empty clusters keep their previous
    centroid. int64 micro sums stay exact up to ~1e12 rows x |v|<=0.5
    (5e17 < 2^63); driver state is k x d only. Partitioning
    assumption: the coded corpus lives block-partitioned in the object
    store (spills to disk at scale, like any materialized Dataset).
    Output: (cluster, dim, centroid_micro, n) — n = the cluster's size
    at the final assignment."""
    import ray as _ray

    C = _lowest_md5_init(embeddings, k, id_col)
    dims = C.shape[1]
    emb = embeddings.select_columns([id_col, "embedding"])

    prep = _ray.remote(num_cpus=1)(_kmeans_code_block)
    stepf = _ray.remote(num_cpus=1)(_kmeans_block_partials)
    coded = [prep.remote(b) for b in emb.to_arrow_refs()]

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(rounds):
        cref = _ray.put(C)
        S = np.zeros((k, dims), dtype=np.int64)
        N = np.zeros(k, dtype=np.int64)
        pending = [stepf.remote(cb, cref) for cb in coded]
        while pending:
            done, pending = _ray.wait(
                pending, num_returns=min(8, len(pending))
            )
            for part in _ray.get(done):
                if part is not None:
                    S += part[0]
                    N += part[1]
        newC = C.copy()  # empty clusters keep their previous centroid
        nz = N > 0
        if nz.any():
            newC[nz] = round_like_duckdb(
                S[nz] / N[nz][:, None], 0
            ).astype(np.int64)
        C = newC
        counts = N

    import ray.data as _rd

    out = pa.table(
        {
            "cluster": pa.array(
                np.repeat(np.arange(k, dtype=np.int64), dims), pa.int64()
            ),
            "dim": pa.array(
                np.tile(np.arange(1, dims + 1, dtype=np.int64), k),
                pa.int64(),
            ),
            "centroid_micro": pa.array(C.reshape(-1), pa.int64()),
            "n": pa.array(
                np.repeat(counts, dims), pa.int64()
            ),
        }
    )
    return _rd.from_arrow(out)

def hard_negative_pairs(
    embeddings: Dataset, anchor_ids: list[int]
) -> Dataset:
    """Contrastive hard-negative mining: for each anchor vector, the
    most-similar SAME-label neighbor (the positive) and the
    most-similar DIFFERENT-label neighbor (the hard negative), with
    the round-6 margin between them — the pair-generation stage of
    contrastive embedding training, where the negatives that teach are
    the near-misses, not random draws (cf. dense-retrieval hard-negative
    sampling, Karpukhin et al. 2020, public).

    Scale shape mirrors ``brute_force_topk``: the anchor matrix +
    labels broadcast ONCE (`ray.put`), each batch does one float64
    matmul and emits at most TWO rows per anchor (its local best per
    side), and one tiny per-anchor merge closes the global argmax.
    Ranking determinism: (round(cosine, 6) desc, id asc) on both
    engines. Anchors missing a side (no same- or no other-label vector
    in the corpus) drop, matching the oracle's inner join.
    """
    idset = pa.array(anchor_ids, pa.int64())

    def _sel(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("vec_id"), value_set=idset))

    a_rows = (
        embeddings.select_columns(["vec_id", "embedding", "label"])
        .map_batches(_sel, batch_format="pyarrow")
        .to_pandas()
    )
    a_ids = a_rows["vec_id"].to_numpy()
    a_labels = a_rows["label"].to_numpy()
    a_mat = _unit(
        np.stack([np.asarray(v, np.float64) for v in a_rows["embedding"]])
    )
    a_ref = ray.put((a_ids, a_labels, a_mat))

    def _local_best(batch: pa.Table) -> pa.Table:
        ids_a, labels_a, mat_a = ray.get(a_ref)
        emb = _unit(_emb_matrix(batch))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist())
        labels = np.asarray(batch.column("label").to_pylist())
        sims = emb @ mat_a.T  # (batch, A)
        out_q, out_n, out_s, out_p = [], [], [], []
        for ai, aid in enumerate(ids_a):
            col = _round_half_away(sims[:, ai])
            not_self = vec_ids != aid
            for is_pos, side in ((1, labels == labels_a[ai]),
                                 (0, labels != labels_a[ai])):
                m = not_self & side
                if not m.any():
                    continue
                cand_ids, cand_sims = vec_ids[m], col[m]
                j = np.lexsort((cand_ids, -cand_sims))[0]
                out_q.append(aid)
                out_n.append(int(cand_ids[j]))
                out_s.append(float(cand_sims[j]))
                out_p.append(is_pos)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "cand_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
                "is_pos": pa.array(out_p, pa.int64()),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "pos_id": pa.array([], pa.int64()),
                "pos_cosine": pa.array([], pa.float64()),
                "neg_id": pa.array([], pa.int64()),
                "neg_cosine": pa.array([], pa.float64()),
                "margin": pa.array([], pa.float64()),
            }
        )
        order = pc.sort_indices(
            g, sort_keys=[("cosine", "descending"), ("cand_id", "ascending")]
        )
        g = g.take(order)
        pos = g.filter(pc.equal(g.column("is_pos"), 1))
        neg = g.filter(pc.equal(g.column("is_pos"), 0))
        if pos.num_rows == 0 or neg.num_rows == 0:
            return empty
        pc_, nc_ = pos.column("cosine")[0].as_py(), neg.column("cosine")[0].as_py()
        return pa.table(
            {
                "query_id": pa.array([g.column("query_id")[0].as_py()], pa.int64()),
                "pos_id": pa.array([pos.column("cand_id")[0].as_py()], pa.int64()),
                "pos_cosine": pa.array([pc_], pa.float64()),
                "neg_id": pa.array([neg.column("cand_id")[0].as_py()], pa.int64()),
                "neg_cosine": pa.array([nc_], pa.float64()),
                "margin": pa.array(
                    [float(round_like_duckdb(np.array([pc_ - nc_]), 6)[0])],
                    pa.float64(),
                ),
            }
        )

    return (
        embeddings.select_columns(["vec_id", "embedding", "label"])
        .map_batches(_local_best, batch_format="pyarrow", batch_size=1024)
        .groupby("query_id", num_partitions=2)
        .map_groups(_merge, batch_format="pyarrow")
        .sort("query_id")
    )


# --- int8 scalar quantization distortion (q247) -----------------------------

#: affine code range for scalar quantization (uint8)
QUANT_LEVELS = 255


def int8_cos_micro(
    mat: np.ndarray, mins: np.ndarray, maxs: np.ndarray
) -> np.ndarray:
    """Per-vector micro-rounded cosine between each float64 row and its
    int8 scalar-quantized reconstruction (per-dim affine codes 0..255,
    round half away from zero — the FAISS SQ8 layout). Pure elementwise
    math + fixed-order per-row reductions: identical under any row
    partitioning, so the distributed pass and the sequential golden
    share this kernel verbatim. Degenerate cases pinned: a constant
    dimension reconstructs exactly (code 0 -> min), a zero vector
    scores cosine 1.0 (its reconstruction is also zero)."""
    rng = maxs - mins
    safe = np.where(rng > 0, rng, 1.0)
    codes = round_like_duckdb((mat - mins) / safe * QUANT_LEVELS, 0)
    codes = np.clip(codes, 0, QUANT_LEVELS)
    deq = np.where(rng > 0, mins + codes * (safe / QUANT_LEVELS), mins)
    num = (mat * deq).sum(axis=1)
    denom = np.sqrt((mat * mat).sum(axis=1)) * np.sqrt(
        (deq * deq).sum(axis=1)
    )
    cos = np.where(denom > 0, num / np.where(denom > 0, denom, 1.0), 1.0)
    return round_like_duckdb(1e6 * cos, 0).astype(np.int64)


# --- distributed PCA top component (q249) -----------------------------------

#: fixed-point scale for exact integer scatter sums
PCA_SCALE = 1 << 20
PCA_ITERS = 100


def quantize_micro_matrix(mat: np.ndarray) -> np.ndarray:
    """float64 -> int64 fixed point at 2^20 (round half away from
    zero): every downstream scatter sum becomes EXACT integer
    arithmetic, so block partials merge associatively and the golden
    replay is bit-identical regardless of partitioning."""
    return round_like_duckdb(mat * PCA_SCALE, 0).astype(np.int64)


def pca_top_component(
    n: int, s: np.ndarray, c: np.ndarray, iters: int = PCA_ITERS
) -> tuple[np.ndarray, float]:
    """Power iteration on the exact scatter matrix M = n*C - s s^T
    (built in Python-int arithmetic from the int64 partials, converted
    to float64 ONCE). Returns (unit loading vector, explained-variance
    share lambda/trace). Sign-normalized: the largest-|component| entry
    is positive. Runs driver-side on a d x d matrix in both engines,
    so float behavior is identical by construction."""
    d = len(s)
    s_int = [int(x) for x in s]
    m = np.empty((d, d), np.float64)
    for i in range(d):
        ci = c[i]
        si = s_int[i]
        for j in range(d):
            m[i, j] = float(n * int(ci[j]) - si * s_int[j])
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = m @ v
        norm = float(np.linalg.norm(w))
        if norm == 0.0:
            break
        v = w / norm
    lam = float(v @ (m @ v))
    trace = float(np.trace(m))
    share = lam / trace if trace > 0 else 0.0
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v, share


# --- Johnson-Lindenstrauss sign projection (q256) ----------------------------

#: JL target dimensionality
JL_K = 16


def jl_sign_matrix(d: int, k: int = JL_K) -> np.ndarray:
    """Deterministic +-1/sqrt(k) projection matrix (Achlioptas 2003
    database-friendly JL): the sign of splitmix64(i*k + j) bit 0 —
    a pure function of (d, k), so every block and the golden build the
    SAME matrix with no broadcast needed. NOTE: splitmix64 must stay a
    module-level import — this function runs inside worker UDFs, where
    a body-level package import fails under the driver's no-PYTHONPATH
    by-value pickling (test_driver_contract guards this)."""
    idx = np.arange(d * k, dtype=np.int64)
    bits = (splitmix64(idx) & np.uint64(1)).astype(np.float64)
    return ((bits * 2.0 - 1.0) / np.sqrt(k)).reshape(d, k)


def jl_pair_ratios(
    mat: np.ndarray, ids: np.ndarray, proj: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distortion kernel for consecutive-id pairs (2i, 2i+1) PRESENT in
    ``mat``: returns (pair_id, ratio_micro) where ratio = projected /
    original squared distance, micro-rounded per pair. Elementwise +
    per-pair fixed-order reductions only — partition-independent, so
    the distributed pass (pair-keyed exchange) and the sequential
    golden share it verbatim. Pairs with zero original distance are
    dropped (ratio undefined)."""
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    pid = ids // 2
    # a complete pair = adjacent rows with the same pid and even/odd ids
    adj = (pid[:-1] == pid[1:]) & (ids[:-1] % 2 == 0) & (ids[1:] % 2 == 1)
    a = mat[:-1][adj]
    b = mat[1:][adj]
    d_orig = ((a - b) ** 2).sum(axis=1)
    pa_ = a @ proj
    pb_ = b @ proj
    d_proj = ((pa_ - pb_) ** 2).sum(axis=1)
    keep = d_orig > 0
    ratio = round_like_duckdb(
        1e6 * d_proj[keep] / d_orig[keep], 0
    ).astype(np.int64)
    return pid[:-1][adj][keep], ratio


def silhouette_partials(
    E: np.ndarray, C: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-point SIMPLIFIED silhouette in micro-int space (the
    centroid-distance variant — a/b are distances to the own/nearest-
    other CENTROID, not mean pairwise distances, which keeps the pass
    O(n*k) instead of O(n^2)): exact int64 squared L2 to every
    centroid (kmeans_assign arithmetic), assignment = argmin
    (first-min tie rule), a = sqrt(d2_own), b = sqrt(min d2 over the
    other centroids), s_micro = round(1e6 * (b - a) / b) — b >= a by
    construction, so max(a, b) = b; b == 0 (point equal to two
    centroids) scores 0. The per-point IEEE sqrt/divide is a pure
    function of the point, so downstream int64 sums are order-free and
    the sequential golden replays bit-exactly. Shared by
    q282_cluster_silhouette and golden_dedup.golden_silhouette."""
    diff = E[:, None, :] - C[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    assign = np.argmin(d2, axis=1)
    n = E.shape[0]
    rows = np.arange(n)
    a2 = d2[rows, assign]
    d2m = d2.copy()
    d2m[rows, assign] = np.iinfo(np.int64).max
    b2 = d2m.min(axis=1)
    a = np.sqrt(a2.astype(np.float64))
    b = np.sqrt(b2.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(b > 0.0, 1e6 * (b - a) / b, 0.0)
    s_micro = round_like_duckdb(s, 0).astype(np.int64)
    return assign, s_micro
