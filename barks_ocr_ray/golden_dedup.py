"""Single-process goldens for the approximate / non-SQL query family.

The near-dup, ANN and sketch pipelines (q19/q20/q22/q23/q33/q35/q48/
q67/q75) are deterministic end to end — every hash is an explicit
blake2/crc/md5 construction, every RNG is seeded, every tie breaks on
the smallest id — but their semantics are not SQL-replayable (LSH
banding, seeded hyperplanes, k-means quantizers, HLL registers). Their
value-exact oracle is therefore the same dual-engine scheme the
flagship extraction arc uses (oracle_data.py / extract/golden.py,
reference second-opinion pattern
/root/reference/src/barks_ocr/pipeline/ocr_validate.py:40-85): a
sequential driver-side run over the raw parquet, sharing only the pure
PER-ROW kernels with the pipeline (MinHasher.signature, simhash64,
_kmeans, the tokenizer) while reimplementing all ORCHESTRATION —
bucketing, caps, joins, merges, label propagation — as plain loops.
What the comparison then pins is exactly the distributed machinery:
shuffles, candidate-pair generation, signature joins, per-block top-k
merges, convergence loops.

Everything here runs on pyarrow tables, never Datasets — no Ray import.
"""

from __future__ import annotations

import hashlib
from difflib import SequenceMatcher

import numpy as np
import pyarrow as pa

from barks_ocr_ray.functions.dedupe import (
    N_BANDS,
    ROWS_PER_BAND,
    MinHasher,
    simhash64,
)
from barks_ocr_ray.functions.relational import round_like_duckdb
from barks_ocr_ray.functions.text import Tokenizer


def _pairs_with_cap(
    buckets: dict, grp_of: dict, max_bucket: int = 1000
) -> set[tuple[int, int]]:
    """Replay of _bucket_pairs' per-bucket enumeration + hot-bucket
    guard (dedupe.py:_bucket_pairs): exact all-pairs up to max_bucket
    distinct docs; beyond it, identical-content docs (same grp) collapse
    to min-id star pairs and residual reps are capped ascending."""
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        uniq = sorted(set(ids))
        if len(uniq) < 2:
            continue
        if len(uniq) <= max_bucket:
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    pairs.add((uniq[i], uniq[j]))
            continue
        rep_of: dict = {}
        reps = []
        for d in uniq:  # ascending -> first of each grp is its min id
            g = grp_of[d]
            if g not in rep_of:
                rep_of[g] = d
                reps.append(d)
            else:
                pairs.add((rep_of[g], d))
        reps = reps[:max_bucket]
        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                pairs.add((reps[i], reps[j]))
    return pairs


def golden_minhash_pairs(docs: pa.Table, threshold: float = 0.4) -> pa.Table:
    """Sequential replay of minhash_near_dups: signature -> band hashes
    -> bucket pairs (with the hot-bucket star/cap rule) -> full-signature
    Jaccard estimate >= threshold."""
    hasher = MinHasher()
    ids = docs.column("doc_id").to_pylist()
    sigs: dict[int, np.ndarray] = {}
    grp_of: dict[int, str] = {}
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, s in zip(ids, docs.column("text")):
        sig = hasher.signature(s.as_py() or "")
        sigs[doc_id] = sig
        sig_bytes = sig.tobytes()
        grp_of[doc_id] = hashlib.blake2b(sig_bytes, digest_size=16).hexdigest()
        for band in range(N_BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            buckets.setdefault((band, bh), []).append(doc_id)
    out_a, out_b, out_e = [], [], []
    for a, b in sorted(_pairs_with_cap(buckets, grp_of)):
        est = float((sigs[a] == sigs[b]).mean())
        if est >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_e.append(est)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "est_jaccard": pa.array(
                round_like_duckdb(np.asarray(out_e, np.float64), 4), pa.float64()
            ),
        }
    )


def golden_simhash_pairs(docs: pa.Table, max_hamming: int = 6) -> pa.Table:
    """Sequential replay of simhash_near_dups: 64-bit simhash -> four
    16-bit bands -> bucket pairs -> Hamming verification."""
    tok = Tokenizer()
    hs: dict[int, int] = {}
    grp_of: dict[int, int] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, s in zip(
        docs.column("doc_id").to_pylist(), docs.column("text")
    ):
        h = simhash64(tok.tokens(s.as_py() or ""))
        hs[doc_id] = h
        grp_of[doc_id] = h
        for band in range(4):
            buckets.setdefault(
                (band, (h >> (16 * band)) & 0xFFFF), []
            ).append(doc_id)
    out_a, out_b, out_h = [], [], []
    for a, b in sorted(_pairs_with_cap(buckets, grp_of)):
        d = int(bin(hs[a] ^ hs[b]).count("1"))
        if d <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_h.append(d)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _emb_rows(emb: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(emb.column("vec_id").to_pylist(), np.int64)
    mat = np.stack(
        [np.asarray(v, np.float64) for v in emb.column("embedding").to_pylist()]
    )
    return ids, mat


def golden_embedding_pairs(
    emb: pa.Table, threshold: float = 0.8, n_planes: int = 12, seed: int = 7
) -> pa.Table:
    """Sequential replay of embedding_near_dups: seeded hyperplane
    buckets -> exact in-bucket cosine >= threshold."""
    ids, mat = _emb_rows(emb)
    planes = np.random.RandomState(seed).standard_normal((mat.shape[1], n_planes))
    bucket = ((mat @ planes) >= 0).dot(1 << np.arange(n_planes)).astype(np.int64)
    unit = _unit_rows(mat)
    out_a, out_b, out_s = [], [], []
    for bk in np.unique(bucket):
        members = np.flatnonzero(bucket == bk)
        members = members[np.argsort(ids[members])]
        sims = unit[members] @ unit[members].T
        for ii in range(len(members)):
            for jj in range(ii + 1, len(members)):
                s = sims[ii, jj]
                if s >= threshold:
                    out_a.append(int(ids[members[ii]]))
                    out_b.append(int(ids[members[jj]]))
                    out_s.append(float(s))
    return pa.table(
        {
            "vec_a": pa.array(out_a, pa.int64()),
            "vec_b": pa.array(out_b, pa.int64()),
            "cosine": pa.array(
                round_like_duckdb(np.asarray(out_s, np.float64), 4), pa.float64()
            ),
        }
    )


def _topk_table(
    ids: np.ndarray,
    unit: np.ndarray,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    cand_mask_of,
    k: int,
) -> pa.Table:
    """Global top-k per query by (rounded cosine desc, neighbor_id asc) —
    the fixed merge contract of lsh_topk / ivf_topk (local per-block
    top-k then merge selects exactly this set)."""
    out_q, out_n, out_s = [], [], []
    for qi, qid in enumerate(q_ids):
        mask = cand_mask_of(qi)
        mask &= ids != qid
        if not mask.any():
            continue
        cand_ids = ids[mask]
        sims = round_like_duckdb(unit[mask] @ q_mat[qi], 6)
        order = np.lexsort((cand_ids, -sims))[: min(k, len(cand_ids))]
        out_q.extend([int(qid)] * len(order))
        out_n.extend(cand_ids[order].tolist())
        out_s.extend(sims[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def golden_lsh_topk(
    emb: pa.Table,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
) -> pa.Table:
    """Sequential replay of ann.lsh_topk (multi-probe hyperplane LSH)."""
    ids, mat = _emb_rows(emb)
    planes = np.random.RandomState(seed).standard_normal((mat.shape[1], n_planes))
    unit = _unit_rows(mat)
    q_sel = np.isin(ids, query_ids)
    q_ids, q_mat = ids[q_sel], unit[q_sel]
    buckets = ((unit @ planes) >= 0).dot(1 << np.arange(n_planes)).astype(np.int64)
    q_buckets = buckets[q_sel]
    probe_sets = [
        {int(b)} | {int(b) ^ (1 << p) for p in range(n_planes)} for b in q_buckets
    ]
    return _topk_table(
        ids,
        unit,
        q_ids,
        q_mat,
        lambda qi: np.fromiter(
            (int(b) in probe_sets[qi] for b in buckets), bool, len(buckets)
        ),
        k,
    )


def golden_centroids(emb: pa.Table, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Sequential replay of ann._train_centroids' bounded deterministic
    sample (md5-keyed threshold + sort + cap), feeding the SHARED
    _kmeans kernel — bit-identical centroids to the distributed path."""
    from barks_ocr_ray.functions.ann import _kmeans

    sample_cap = 2048
    ids, mat = _emb_rows(emb)
    frac = min(1.0, 4.0 * sample_cap / max(1, len(ids)))
    keys = np.array(
        [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
    )
    keep = np.array([int(kk[:8], 16) / float(1 << 32) < frac for kk in keys])
    order = np.argsort(keys[keep], kind="stable")[:sample_cap]
    return _kmeans(_unit_rows(mat[keep][order]), n_centroids, seed)


def golden_ivf_topk(
    emb: pa.Table,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> pa.Table:
    """Sequential replay of ann.ivf_topk (k-means IVF, n_probe lists)."""
    cents = golden_centroids(emb, n_centroids, seed)
    ids, mat = _emb_rows(emb)
    unit = _unit_rows(mat)
    lists = (unit @ cents.T).argmax(axis=1)
    q_sel = np.isin(ids, query_ids)
    q_ids, q_mat = ids[q_sel], unit[q_sel]
    probe = min(n_probe, len(cents))
    q_probes = np.argsort(-(q_mat @ cents.T), axis=1)[:, :probe]
    return _topk_table(
        ids, unit, q_ids, q_mat, lambda qi: np.isin(lists, q_probes[qi]), k
    )


def golden_semdedup(
    emb: pa.Table,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 7,
) -> pa.Table:
    """Sequential replay of ann.semdedup (cluster-bounded keep-lowest-id
    cosine rule)."""
    cents = golden_centroids(emb, n_clusters, seed)
    ids, mat = _emb_rows(emb)
    unit = _unit_rows(mat)
    cl = (unit @ cents.T).argmax(axis=1).astype(np.int64)
    order = np.lexsort((ids, cl))
    # within each cluster, in ascending vec_id order, a vector is dropped
    # when any LOWER-id member (kept or dropped) reaches the threshold
    by_cluster: dict[int, list[int]] = {}
    for pos in order:
        by_cluster.setdefault(int(cl[pos]), []).append(pos)
    keep_of: dict[int, bool] = {}
    for members in by_cluster.values():
        seg = unit[members]
        sims = seg @ seg.T
        for i in range(len(members)):
            keep_of[members[i]] = not bool((sims[i, :i] >= threshold).any())
    return pa.table(
        {
            "vec_id": pa.array([int(ids[p]) for p in order], pa.int64()),
            "cluster": pa.array([int(cl[p]) for p in order], pa.int64()),
            "keep": pa.array([keep_of[int(p)] for p in order], pa.bool_()),
        }
    )


def golden_dup_clusters(pairs: pa.Table) -> pa.Table:
    """Union-find min-label over candidate pairs — the sequential
    contract of dedupe.dup_clusters (cluster = smallest reachable id)."""
    a = pairs.column("doc_a").to_pylist()
    b = pairs.column("doc_b").to_pylist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(a, b):
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = sorted({x for x in a if x is not None} | set(b))
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def golden_fuzzy_pairing(docs: pa.Table, min_ratio: float = 0.3) -> pa.Table:
    """Sequential replay of q33 (fuzzy_best_match over length buckets):
    best SequenceMatcher ratio for each src0 doc among same-bucket src1
    docs; unmatched lefts emitted with null right/ratio."""
    rows = sorted(
        zip(
            docs.column("doc_id").to_pylist(),
            docs.column("text").to_pylist(),
            docs.column("source").to_pylist(),
            docs.column("n_chars").to_pylist(),
        )
    )
    by_bucket: dict[int, dict[str, list]] = {}
    for doc_id, text, source, n_chars in rows:
        if source not in ("src0", "src1"):
            continue
        by_bucket.setdefault(n_chars // 100, {"l": [], "r": []})[
            "l" if source == "src0" else "r"
        ].append((doc_id, text))
    keys, lids, rids, ratios = [], [], [], []
    for bucket in sorted(by_bucket):
        sides = by_bucket[bucket]
        for lid, ltext in sides["l"]:
            best_id, best_ratio = None, min_ratio
            for rid, rtext in sides["r"]:
                r = SequenceMatcher(None, ltext, rtext).ratio()
                if r > best_ratio or (r == best_ratio and best_id is None):
                    if r >= min_ratio:
                        best_id, best_ratio = rid, r
            keys.append(bucket)
            lids.append(lid)
            # unmatched lefts (the reference's only_in_* records) carry
            # the -1/-1.0 sentinels q33 uses — every oracled column is
            # null-free by repo convention (hash-compare treats NaN as
            # unequal to itself)
            rids.append(best_id if best_id is not None else -1)
            ratios.append(round(best_ratio, 4) if best_id is not None else -1.0)
    return pa.table(
        {
            "key": pa.array(keys, pa.int64()),
            "left_id": pa.array(lids, pa.int64()),
            "right_id": pa.array(rids, pa.int64()),
            "ratio": pa.array(ratios, pa.float64()),
        }
    )


def golden_hll_distinct(docs: pa.Table, col: str = "text", p: int = 12) -> pa.Table:
    """Sequential replay of sketches.hll_count_distinct — HLL register
    state is a max per register, so merge order is irrelevant and the
    sequential fold reproduces the distributed estimate bit-exactly."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    for v in docs.column(col):
        s = v.as_py()
        if s is None:
            continue
        h = int.from_bytes(
            hashlib.blake2b(str(s).encode("utf-8"), digest_size=8).digest(),
            "big",
        )
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        rank = (64 - p) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return pa.table({"n_distinct_est": pa.array([float(est)], pa.float64())})


def golden_cms_counts(docs: pa.Table, col: str = "text") -> pa.Table:
    """Sequential replay of sketches.cms_token_counts — CMS registers
    merge by addition (order-independent), so the sequential fold
    reproduces the distributed estimate bit-exactly."""
    from barks_ocr_ray.functions.sketches import (
        CMS_DEPTH,
        CMS_PROBES,
        CMS_WIDTH,
        _cms_slot,
    )

    tok = Tokenizer()
    regs = np.zeros(CMS_DEPTH * CMS_WIDTH, np.int64)
    for v in docs.column(col):
        s = v.as_py()
        if s is None:
            continue
        for w in tok.tokens(s):
            for d in range(CMS_DEPTH):
                regs[_cms_slot(d, w)] += 1
    words = sorted(CMS_PROBES)
    ests = [
        int(min(regs[_cms_slot(d, w)] for d in range(CMS_DEPTH)))
        for w in words
    ]
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


def golden_hll_grouped(
    events: pa.Table,
    group_col: str = "event_type",
    col: str = "user_id",
    p: int = 12,
) -> pa.Table:
    """Sequential replay of sketches.hll_grouped_distinct — shares the
    per-value kernel and the estimator, reimplements the merge as a
    plain per-group fold (max-merge is order-independent, so the
    sequential fold reproduces the distributed estimate bit-exactly)."""
    from barks_ocr_ray.functions.sketches import _hll_estimate, _hll_idx_rank

    m = 1 << p
    regs: dict = {}
    for g, v in zip(events.column(group_col).to_pylist(), events.column(col)):
        s = v.as_py()
        if s is None or g is None:
            continue
        r = regs.setdefault(g, np.zeros(m, np.int64))
        idx, rank = _hll_idx_rank(s, p)
        if rank > r[idx]:
            r[idx] = rank
    groups = sorted(regs)
    return pa.table(
        {
            group_col: pa.array(groups, pa.string()),
            "n_distinct_est": pa.array(
                [_hll_estimate(regs[g]) for g in groups], pa.float64()
            ),
        }
    )


def golden_pq_sample(emb: pa.Table, sample_cap: int = 2048) -> np.ndarray:
    """Sequential replay of ann._train_sample_matrix (md5-keyed
    threshold + sort + cap) — bit-identical training sample."""
    ids, mat = _emb_rows(emb)
    frac = min(1.0, 4.0 * sample_cap / max(1, len(ids)))
    keys = np.array(
        [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
    )
    keep = np.array([int(kk[:8], 16) / float(1 << 32) < frac for kk in keys])
    order = np.argsort(keys[keep], kind="stable")[:sample_cap]
    return _unit_rows(mat[keep][order])


def golden_pq_topk(
    emb: pa.Table,
    query_ids: list[int],
    k: int = 10,
    m_subvectors: int = 8,
    n_codes: int = 16,
    seed: int = 7,
) -> pa.Table:
    """Sequential replay of ann.pq_topk — shares the pure kernels
    (pq_codebooks / _pq_encode / _pq_scores / rounding), reimplements
    the per-query merge as a plain sort."""
    from barks_ocr_ray.functions.ann import (
        _pq_encode,
        _pq_scores,
        _round_half_away,
        pq_codebooks,
    )

    books = pq_codebooks(golden_pq_sample(emb), m_subvectors, n_codes, seed)
    ids, mat = _emb_rows(emb)
    unit = _unit_rows(mat)
    codes = _pq_encode(unit, books)
    q_sel = np.isin(ids, query_ids)
    q_ids, q_mat = ids[q_sel], unit[q_sel]
    out_q, out_n, out_s = [], [], []
    for qi, qid in enumerate(q_ids):
        scores = _pq_scores(q_mat[qi], codes, books)
        mask = ids != qid
        cand_ids, cand_s = ids[mask], _round_half_away(scores[mask])
        order = np.lexsort((cand_ids, -cand_s))[: min(k, len(cand_ids))]
        out_q.extend([int(qid)] * len(order))
        out_n.extend(cand_ids[order].astype(int).tolist())
        out_s.extend(cand_s[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def golden_kmeans(
    emb: pa.Table, k: int = 8, rounds: int = 5
) -> pa.Table:
    """Sequential replay of ann.distributed_kmeans — shares the pure
    kernels (micro_embed, kmeans_assign, the md5-threshold init rule
    and the micro-int centroid update) while the orchestration is a
    plain per-round numpy loop over the full matrix. Bit-equal because
    every arithmetic step is int64 micro-space (assignment) or the
    identical float64 mean + duckdb-round (update)."""
    import hashlib

    from barks_ocr_ray.functions.ann import kmeans_assign, micro_embed
    from barks_ocr_ray.functions.relational import round_like_duckdb

    ids, mat = _emb_rows(emb)
    n_rows = ids.size
    E = micro_embed(mat.reshape(-1), n_rows)

    # init: same bounded hash-threshold rule as _lowest_md5_init
    frac = min(1.0, 4.0 * k / max(1, n_rows))
    keys = np.array(
        [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
    )
    keep = np.array(
        [int(x[:8], 16) / float(1 << 32) < frac for x in keys], bool
    )
    order = np.argsort(keys[keep], kind="stable")[:k]
    C = E[keep][order].copy()

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(rounds):
        a = kmeans_assign(E, C)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        newC = C.copy()
        for c in range(k):
            sel = a == c
            if counts[c] == 0:
                continue
            s = E[sel].sum(axis=0)
            newC[c] = np.array(
                [
                    np.int64(
                        round_like_duckdb(
                            np.array([si / counts[c]], np.float64), 0
                        )[0]
                    )
                    for si in s
                ],
                np.int64,
            )
        C = newC

    dims = C.shape[1]
    return pa.table(
        {
            "cluster": pa.array(
                np.repeat(np.arange(k, dtype=np.int64), dims), pa.int64()
            ),
            "dim": pa.array(
                np.tile(np.arange(1, dims + 1, dtype=np.int64), k),
                pa.int64(),
            ),
            "centroid_micro": pa.array(C.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, dims), pa.int64()),
        }
    )


def golden_bpe_merges(docs: pa.Table, n_merges: int = 12) -> pa.Table:
    """Sequential replay of bpe.bpe_train — shares the pure per-word
    kernels (word_symbols, merge_pair_in_word, pair_counts_of_word,
    best_pair) while the word counting and round loop are plain
    Python over the whole corpus. Bit-equal because pair counts are
    integers (sums commute) and the argmax tie-break is a total order."""
    from collections import Counter

    from barks_ocr_ray.functions.bpe import (
        best_pair,
        merge_pair_in_word,
        word_symbols,
    )
    from barks_ocr_ray.functions.text import Tokenizer

    tok = Tokenizer()
    wc: Counter = Counter()
    for s in docs.column("text"):
        txt = s.as_py()
        if txt:
            wc.update(tok.tokens(txt))

    syms = {w: word_symbols(w) for w in wc}
    rounds = []
    for r in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, ss in syms.items():
            n = wc[w]
            for a, b in zip(ss, ss[1:]):
                pairs[(a, b)] += n
        top = best_pair(pairs)
        if top is None:
            break
        (lhs, rhs), n = top
        rounds.append((r, lhs, rhs, int(n)))
        syms = {w: merge_pair_in_word(ss, lhs, rhs) for w, ss in syms.items()}

    return pa.table(
        {
            "merge_round": pa.array([r[0] for r in rounds], pa.int64()),
            "lhs": pa.array([r[1] for r in rounds], pa.string()),
            "rhs": pa.array([r[2] for r in rounds], pa.string()),
            "pair_count": pa.array([r[3] for r in rounds], pa.int64()),
        }
    )


def golden_bpe_encode_stats(docs: pa.Table, n_merges: int = 12) -> pa.Table:
    """Sequential replay of bpe.bpe_encode_stats — learns the merges
    with golden_bpe_merges (itself bit-equal to the distributed
    trainer) then encodes every doc with the shared encode_word_len
    kernel in a plain loop."""
    from barks_ocr_ray.functions.bpe import encode_word_len
    from barks_ocr_ray.functions.text import Tokenizer

    g = golden_bpe_merges(docs, n_merges=n_merges)
    merges = list(zip(g.column("lhs").to_pylist(), g.column("rhs").to_pylist()))
    tok = Tokenizer()
    ids, n_words, n_sub = [], [], []
    cache: dict = {}
    for did, s in zip(docs.column("doc_id"), docs.column("text")):
        txt = s.as_py()
        toks = tok.tokens(txt) if txt else []
        ids.append(did.as_py())
        n_words.append(len(toks))
        total = 0
        for w in toks:
            n = cache.get(w)
            if n is None:
                n = encode_word_len(w, merges)
                cache[w] = n
            total += n
        n_sub.append(total)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_subwords": pa.array(n_sub, pa.int64()),
        }
    )


def golden_incremental_minhash(
    docs: pa.Table,
    threshold: float = 0.4,
    prior_mod: int = 10,
    prior_keep: int = 7,
) -> pa.Table:
    """Sequential replay of dedupe.incremental_minhash_dedup — builds
    on golden_minhash_pairs (the shared q19 pair semantics, including
    the cap/star rules), then filters to cross-snapshot pairs and
    takes each new doc's best prior match (max est, tie smallest
    prior id) in a plain loop."""
    pairs = golden_minhash_pairs(docs, threshold=threshold)
    best: dict[int, tuple[float, int]] = {}
    for a, b, est in zip(
        pairs.column("doc_a").to_pylist(),
        pairs.column("doc_b").to_pylist(),
        pairs.column("est_jaccard").to_pylist(),
    ):
        ap = (a % prior_mod) < prior_keep
        bp = (b % prior_mod) < prior_keep
        if ap == bp:
            continue
        new_id, match = (b, a) if ap else (a, b)
        cur = best.get(new_id)
        cand = (-est, match)
        if cur is None or cand < cur:
            best[new_id] = cand
    ids = sorted(best)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "match_id": pa.array([best[i][1] for i in ids], pa.int64()),
            "est_jaccard": pa.array([-best[i][0] for i in ids], pa.float64()),
        }
    )


def golden_compression_stats(docs: pa.Table) -> pa.Table:
    """Sequential replay of cleaning.compression_ratio_stats — shares
    only the pure per-row kernel (compression_bp); the per-source
    accumulation and gate counting are plain loops, pinning the
    distributed partial/Sum orchestration."""
    from barks_ocr_ray.functions.cleaning import (
        MIN_GATE_LEN,
        RANDOM_BP,
        REPETITIVE_BP,
        compression_profile,
    )

    agg: dict[str, list[int]] = {}
    for s, x in zip(
        docs.column("source").to_pylist(), docs.column("text").to_pylist()
    ):
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
            "n_repetitive": pa.array([agg[k][1] for k in keys], pa.int64()),
            "n_random": pa.array([agg[k][2] for k in keys], pa.int64()),
            "sum_ratio_bp": pa.array([agg[k][3] for k in keys], pa.int64()),
        }
    )


def golden_link_graph(pages: pa.Table, k: int = 20) -> pa.Table:
    """Sequential replay of links.link_graph_topk — shares only the pure
    per-row kernel (page_outlinks); pair counting, the distinct-source
    rollup and the top-k ordering are plain dict loops."""
    from collections import Counter

    from barks_ocr_ray.functions.links import page_outlinks

    pair: Counter = Counter()
    for u, p in zip(
        pages.column("url").to_pylist(), pages.column("html").to_pylist()
    ):
        for tgt, _anchor in page_outlinks(u, p):
            pair[(tgt, u)] += 1
    refs: Counter = Counter()
    srcs: Counter = Counter()
    for (tgt, _src), n in pair.items():
        refs[tgt] += n
        srcs[tgt] += 1
    top = sorted(refs, key=lambda t: (-refs[t], t))[:k]
    return pa.table(
        {
            "target": pa.array(top, pa.string()),
            "n_refs": pa.array([refs[t] for t in top], pa.int64()),
            "n_src_pages": pa.array([srcs[t] for t in top], pa.int64()),
        }
    )


def golden_anchor_terms(pages: pa.Table, k: int = 30) -> pa.Table:
    """Sequential replay of links.anchor_term_index (same kernel-sharing
    contract as golden_link_graph; tokenization is the shared
    TOKEN_RE findall)."""
    import re as _re
    from collections import Counter

    from barks_ocr_ray.functions.links import page_outlinks
    from barks_ocr_ray.functions.text import TOKEN_RE

    token_re = _re.compile(TOKEN_RE)
    pair: Counter = Counter()
    for u, p in zip(
        pages.column("url").to_pylist(), pages.column("html").to_pylist()
    ):
        for tgt, anchor in page_outlinks(u, p):
            for w in token_re.findall(anchor.lower()):
                pair[(w, tgt)] += 1
    links: Counter = Counter()
    tgts: Counter = Counter()
    for (w, _tgt), n in pair.items():
        links[w] += n
        tgts[w] += 1
    top = sorted(links, key=lambda t: (-links[t], t))[:k]
    return pa.table(
        {
            "term": pa.array(top, pa.string()),
            "n_links": pa.array([links[t] for t in top], pa.int64()),
            "n_targets": pa.array([tgts[t] for t in top], pa.int64()),
        }
    )


def golden_hits(pages: pa.Table, iterations: int = 5, k: int = 25) -> pa.Table:
    """Sequential replay of graph.hits over the outlink graph — shares
    the per-row edge kernel (page_outlinks) and replays the documented
    integer recurrence verbatim (h0 = SCALE//n; raw gather-sum per
    half-round; L1 renorm by max(1, sum // SCALE)); top-k by authority
    (tie: node ascending)."""
    import numpy as np

    from barks_ocr_ray.functions.graph import HITS_SCALE
    from barks_ocr_ray.functions.links import page_outlinks

    edges = set()
    for u, p in zip(
        pages.column("url").to_pylist(), pages.column("html").to_pylist()
    ):
        for tgt, _anchor in page_outlinks(u, p):
            edges.add((u, tgt))
    nodes = sorted({x for e in edges for x in e})
    if not nodes:
        return pa.table(
            {
                "node": pa.array([], pa.string()),
                "hub": pa.array([], pa.int64()),
                "auth": pa.array([], pa.int64()),
            }
        )
    idx = {u: i for i, u in enumerate(nodes)}
    src = np.array([idx[s] for s, _ in edges], np.int64)
    dst = np.array([idx[d] for _, d in edges], np.int64)
    n = len(nodes)
    h = np.full(n, HITS_SCALE // n, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iterations):
        ar = np.zeros(n, np.int64)
        np.add.at(ar, dst, h[src])
        a = ar // max(1, int(ar.sum()) // HITS_SCALE)
        hr = np.zeros(n, np.int64)
        np.add.at(hr, src, a[dst])
        h = hr // max(1, int(hr.sum()) // HITS_SCALE)
    order = sorted(range(n), key=lambda i: (-a[i], nodes[i]))[:k]
    return pa.table(
        {
            "node": pa.array([nodes[i] for i in order], pa.string()),
            "hub": pa.array([int(h[i]) for i in order], pa.int64()),
            "auth": pa.array([int(a[i]) for i in order], pa.int64()),
        }
    )


def golden_canonical_dedup(pages: pa.Table) -> pa.Table:
    """Sequential replay of links.canonical_url_dedup over the
    alias-decorated crawl (url_variant applied per physical row) —
    shares the canonical_url and url_variant kernels; grouping, winner
    selection (latest warc_ts, tie smallest raw url) and counting are
    plain dict loops. Sorted by canonical_url."""
    from barks_ocr_ray.datagen import url_variant
    from barks_ocr_ray.functions.links import canonical_url

    clusters: dict = {}
    for i, (u, ts) in enumerate(
        zip(
            pages.column("url").to_pylist(),
            pages.column("warc_ts").to_pylist(),
        )
    ):
        raw = url_variant(u, i)
        c = canonical_url(raw)
        row = clusters.setdefault(c, {"n": 0, "spellings": {}})
        row["n"] += 1
        prev = row["spellings"].get(raw)
        if prev is None or ts > prev:
            row["spellings"][raw] = ts
    keys = sorted(clusters)
    kept = []
    for c in keys:
        sp = clusters[c]["spellings"]
        kept.append(
            min(sp, key=lambda u: (-sp[u].timestamp(), u))
            if sp
            else None
        )
    return pa.table(
        {
            "canonical_url": pa.array(keys, pa.string()),
            "kept_url": pa.array(kept, pa.string()),
            "n_fetches": pa.array(
                [clusters[c]["n"] for c in keys], pa.int64()
            ),
            "n_raw_urls": pa.array(
                [len(clusters[c]["spellings"]) for c in keys], pa.int64()
            ),
        }
    )


def golden_frontier(pages: pa.Table, k: int = 30) -> pa.Table:
    """Sequential replay of links.frontier_by_host (shared kernels:
    page_outlinks, url_host; anti-join and rollup are plain loops)."""
    from collections import Counter

    from barks_ocr_ray.functions.links import page_outlinks, url_host

    refs: Counter = Counter()
    crawled = set(pages.column("url").to_pylist())
    for u, p in zip(
        pages.column("url").to_pylist(), pages.column("html").to_pylist()
    ):
        for tgt, _anchor in page_outlinks(u, p):
            refs[tgt] += 1
    n_urls: Counter = Counter()
    n_refs: Counter = Counter()
    for tgt, n in refs.items():
        if tgt not in crawled:
            h = url_host(tgt)
            n_urls[h] += 1
            n_refs[h] += n
    top = sorted(n_urls, key=lambda h: (-n_urls[h], h))[:k]
    return pa.table(
        {
            "host": pa.array(top, pa.string()),
            "n_uncrawled_urls": pa.array([n_urls[h] for h in top], pa.int64()),
            "n_refs": pa.array([n_refs[h] for h in top], pa.int64()),
        }
    )


def golden_mmr_topk(
    emb: pa.Table,
    query_ids: list[int],
    pool_k: int = 25,
    k: int = 10,
    lam: float = 0.7,
) -> pa.Table:
    """Sequential replay of ann.mmr_topk: full-scan exact top-pool_k
    per query (no blocks, no merges), then the SHARED mmr_greedy
    kernel. Pins the distributed pool retrieval and vector fetch."""
    from barks_ocr_ray.functions.ann import mmr_greedy

    ids, mat = _emb_rows(emb)
    unit = _unit_rows(mat)
    out_q, out_r, out_n, out_c, out_m = [], [], [], [], []
    for qid in sorted(query_ids):
        qi = int(np.flatnonzero(ids == qid)[0])
        sims = round_like_duckdb(unit @ unit[qi], 6)
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:pool_k]
        cand_ids = ids[mask][order]
        rel6 = sims[mask][order]
        cm = unit[[int(np.flatnonzero(ids == c)[0]) for c in cand_ids]]
        pair6 = round_like_duckdb(cm @ cm.T, 6)
        for nid, rank, rel, mmr in mmr_greedy(cand_ids, rel6, pair6, k, lam):
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


def golden_int8_quant(emb: pa.Table) -> pa.Table:
    """Sequential replay of q247: full-matrix per-dim min/max, then the
    SHARED int8_cos_micro kernel per row, per-label integer
    accumulation. Pins the distributed min/max partial merge and the
    per-label (n, sum, min) aggregation."""
    from barks_ocr_ray.functions.ann import int8_cos_micro

    ids, mat = _emb_rows(emb)
    labels = emb.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    mins, maxs = mat.min(axis=0), mat.max(axis=0)
    cos = int8_cos_micro(mat, mins, maxs)
    out_l, out_n, out_mean, out_worst = [], [], [], []
    for lab in sorted(set(labels.tolist())):
        sel = labels == lab
        n = int(sel.sum())
        total = int(cos[sel].sum())
        out_l.append(int(lab))
        out_n.append(n)
        out_mean.append(int(round_like_duckdb(total * 1.0 / n, 0)))
        out_worst.append(int(cos[sel].min()))
    return pa.table(
        {
            "label": pa.array(out_l, pa.int64()),
            "n_vecs": pa.array(out_n, pa.int64()),
            "mean_cos_micro": pa.array(out_mean, pa.int64()),
            "worst_cos_micro": pa.array(out_worst, pa.int64()),
        }
    )


def golden_cdc_stats(docs: pa.Table) -> pa.Table:
    """Sequential replay of q248: the SHARED cdc_chunks kernel per doc,
    a plain dict for the global key -> min-size dedup. Pins the keyed
    exchange + block-local distinct of the distributed pass."""
    from barks_ocr_ray.functions.storage import cdc_chunks

    total, n_chunks = 0, 0
    uniq: dict[int, int] = {}
    for s in docs.column("text"):
        v = s.as_py()
        if v is None:
            continue
        keys, sizes = cdc_chunks(v.encode("utf-8"))
        n_chunks += len(keys)
        total += sum(sizes)
        for k, z in zip(keys, sizes):
            if k not in uniq or z < uniq[k]:
                uniq[k] = z
    ub = sum(uniq.values())
    ratio = (
        int(round_like_duckdb(1e6 * ub / total, 0)) if total > 0 else 0
    )
    return pa.table(
        {
            "total_bytes": pa.array([total], pa.int64()),
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_unique_chunks": pa.array([len(uniq)], pa.int64()),
            "unique_bytes": pa.array([ub], pa.int64()),
            "ratio_micro": pa.array([ratio], pa.int64()),
        }
    )


def golden_pca_top(emb: pa.Table) -> pa.Table:
    """Sequential replay of q249: one full-matrix quantize + exact
    integer scatter (n, s, X^T X), then the SHARED pca_top_component
    fold. Pins the distributed (i, j) triplet partial merge."""
    from barks_ocr_ray.functions.ann import (
        pca_top_component,
        quantize_micro_matrix,
    )

    _, mat = _emb_rows(emb)
    x = quantize_micro_matrix(mat)
    n = x.shape[0]
    s = x.sum(axis=0)
    c = x.T @ x
    v, share = pca_top_component(n, s, c)
    share_micro = int(round_like_duckdb(1e6 * share, 0))
    load = round_like_duckdb(1e6 * v, 0).astype(np.int64)
    return pa.table(
        {
            "dim": pa.array(np.arange(len(v), dtype=np.int64)),
            "loading_micro": pa.array(load, pa.int64()),
            "eig_share_micro": pa.array(
                [share_micro] * len(v), pa.int64()
            ),
        }
    )


def golden_jl_distortion(emb: pa.Table) -> pa.Table:
    """Sequential replay of q256: one full-matrix pass through the
    SHARED jl_sign_matrix + jl_pair_ratios kernels. Pins the
    distributed pair-keyed exchange and block-local pairing."""
    from barks_ocr_ray.functions.ann import jl_pair_ratios, jl_sign_matrix

    ids, mat = _emb_rows(emb)
    proj = jl_sign_matrix(mat.shape[1])
    pid, ratio = jl_pair_ratios(mat, ids.astype(np.int64), proj)
    order = np.argsort(pid, kind="stable")
    return pa.table(
        {
            "pair_id": pa.array(pid[order], pa.int64()),
            "ratio_micro": pa.array(ratio[order], pa.int64()),
        }
    )


def golden_span_corruption(docs: pa.Table) -> pa.Table:
    """Sequential replay of q277: tokenize every doc with the SHARED
    Tokenizer, run the SHARED span_plan greedy scan per doc (pure
    function of (doc_id, n_tokens)), emit the per-doc corruption stats.
    Pins that the distributed map produces identical plans under any
    partitioning."""
    from barks_ocr_ray.functions.curation import span_corruption_table
    from barks_ocr_ray.functions.text import Tokenizer

    tok = Tokenizer()
    ids, counts = [], []
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        ids.append(int(doc_id))
        counts.append(len(tok.tokens(text or "")))
    t = span_corruption_table(ids, counts)
    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
    return t.take(pa.array(order))


def golden_bpe_fertility(docs: pa.Table) -> pa.Table:
    """Sequential replay of q278: learn the merge table with
    golden_bpe_merges (bit-equal to the distributed BSP trainer),
    encode every doc with the SHARED encode_word_len kernel, roll the
    integer partials up per language, close the two micro-rounded
    ratios. Pins that the distributed actor-pool pass produces
    identical per-language totals under any partitioning."""
    from barks_ocr_ray.functions.bpe import encode_word_len
    from barks_ocr_ray.functions.text import Tokenizer

    g = golden_bpe_merges(docs, n_merges=12)
    merges = list(zip(g.column("lhs").to_pylist(), g.column("rhs").to_pylist()))
    tok = Tokenizer()
    agg: dict = {}
    cache: dict = {}
    for lang, s in zip(
        docs.column("lang").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = tok.tokens(s or "")
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(toks)
        for w in toks:
            n = cache.get(w)
            if n is None:
                n = encode_word_len(w, merges)
                cache[w] = n
            a[2] += n
            a[3] += len(w)
    langs = sorted(agg)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array([agg[g][0] for g in langs], pa.int64()),
            "n_words": pa.array([agg[g][1] for g in langs], pa.int64()),
            "n_subwords": pa.array([agg[g][2] for g in langs], pa.int64()),
            "fertility_micro": pa.array(
                [
                    int(round_like_duckdb(1e6 * agg[g][2] / agg[g][1], 0))
                    for g in langs
                ],
                pa.int64(),
            ),
            "chars_per_subword_micro": pa.array(
                [
                    int(round_like_duckdb(1e6 * agg[g][3] / agg[g][2], 0))
                    for g in langs
                ],
                pa.int64(),
            ),
        }
    )


def golden_lz_complexity(events: pa.Table) -> pa.Table:
    """Sequential replay of q279: per user, (ts, event_id)-sorted
    event-type sequence through the SHARED lz76_phrases kernel;
    complexity_micro = round(1e6 * c * ln(n) / n). Users with fewer
    than 2 events are dropped (a 1-event stream has no structure to
    gauge)."""
    import math

    from barks_ocr_ray.functions.text import lz76_phrases

    uid = events.column("user_id").to_numpy(zero_copy_only=False)
    us = events.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = events.column("event_id").to_numpy(zero_copy_only=False)
    typ = np.asarray(events.column("event_type").to_pylist(), dtype=object)
    order = np.lexsort((eid, us, uid))
    uid, typ = uid[order], typ[order]
    uu, idx = np.unique(uid, return_index=True)
    ends = np.append(idx[1:], len(uid))
    out_u, out_n, out_c, out_m = [], [], [], []
    for k in range(len(uu)):
        seq = tuple(typ[idx[k] : ends[k]])
        n = len(seq)
        if n < 2:
            continue
        c = lz76_phrases(seq)
        out_u.append(int(uu[k]))
        out_n.append(n)
        out_c.append(c)
        out_m.append(int(round_like_duckdb(1e6 * c * math.log(n) / n, 0)))
    return pa.table(
        {
            "user_id": pa.array(out_u, pa.int64()),
            "n_events": pa.array(out_n, pa.int64()),
            "n_phrases": pa.array(out_c, pa.int64()),
            "complexity_micro": pa.array(out_m, pa.int64()),
        }
    )


def golden_silhouette(emb: pa.Table) -> pa.Table:
    """Sequential replay of q282: centroids from golden_kmeans (itself
    bit-equal to the distributed trainer), per-point scores through the
    SHARED ann.silhouette_partials kernel over the full matrix, exact
    int64 per-cluster sums, micro-rounded means."""
    from barks_ocr_ray.functions.ann import micro_embed, silhouette_partials

    cent = golden_kmeans(emb, k=8, rounds=5)
    cl = cent.column("cluster").to_numpy()
    dim = cent.column("dim").to_numpy()
    k = int(cl.max()) + 1
    d = int(dim.max())
    C = np.zeros((k, d), np.int64)
    C[cl, dim - 1] = cent.column("centroid_micro").to_numpy()
    ids, mat = _emb_rows(emb)
    E = micro_embed(mat.reshape(-1), ids.size)
    assign, s = silhouette_partials(E, C)
    uu, inv, cnt = np.unique(assign, return_inverse=True, return_counts=True)
    sums = np.zeros(uu.size, np.int64)
    np.add.at(sums, inv, s)
    return pa.table(
        {
            "cluster": pa.array(uu.astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
            "mean_sil_micro": pa.array(
                round_like_duckdb(sums / cnt, 0).astype(np.int64)
            ),
        }
    )


def golden_self_repeat(docs: pa.Table) -> pa.Table:
    """Sequential replay of q284: tokenize with the SHARED Tokenizer,
    run the SHARED longest_repeated_run binary-search kernel per doc,
    integer basis-point share."""
    from barks_ocr_ray.functions.text import Tokenizer, longest_repeated_run

    tok = Tokenizer()
    ids, nt, ml, bp = [], [], [], []
    for did, s in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = tok.tokens(s or "")
        n = len(toks)
        L = longest_repeated_run(toks)
        ids.append(int(did))
        nt.append(n)
        ml.append(L)
        bp.append((10_000 * L) // n if n else 0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "max_repeat_len": pa.array(ml, pa.int64()),
            "repeat_share_bp": pa.array(bp, pa.int64()),
        }
    )


def golden_neardup_lcs(docs: pa.Table) -> pa.Table:
    """Sequential replay of q291: the golden_minhash_pairs pair set
    (threshold 0.4), each doc tokenized once with the SHARED Tokenizer,
    pairwise longest common run through the SHARED
    text.longest_common_run kernel."""
    from barks_ocr_ray.functions.text import Tokenizer, longest_common_run

    pairs = golden_minhash_pairs(docs, threshold=0.4)
    tok = Tokenizer()
    toks = {
        int(d): tok.tokens(t or "")
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    out_a, out_b, out_l, out_s = [], [], [], []
    for da, db in zip(
        pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()
    ):
        a, b = toks[int(da)], toks[int(db)]
        L = longest_common_run(a, b)
        m = min(len(a), len(b))
        out_a.append(int(da))
        out_b.append(int(db))
        out_l.append(L)
        out_s.append((10_000 * L) // m if m else 0)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "lcs_tokens": pa.array(out_l, pa.int64()),
            "lcs_share_bp": pa.array(out_s, pa.int64()),
        }
    )


def golden_alias_sampler(docs: pa.Table) -> pa.Table:
    """Sequential replay of q294: Counter over the SHARED Tokenizer,
    the q271 count^0.75 micro weights, the SHARED deterministic
    importance.alias_table construction."""
    from collections import Counter

    from barks_ocr_ray.functions.importance import alias_table
    from barks_ocr_ray.functions.text import Tokenizer

    tok = Tokenizer()
    counts: Counter = Counter()
    for s in docs.column("text").to_pylist():
        counts.update(tok.tokens(s or ""))
    if not counts:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "prob_ppm": pa.array([], pa.int64()),
                "alias_term": pa.array([], pa.string()),
            }
        )
    terms = sorted(counts)
    cnt = np.array([counts[t] for t in terms], dtype=np.int64)
    weight = round_like_duckdb(
        1e6 * cnt.astype(np.float64) ** 0.75, 0
    ).astype(np.int64)
    return alias_table(terms, weight)


def golden_huffman_lengths(docs: pa.Table) -> pa.Table:
    """Sequential replay of q304: Counter over the SHARED Tokenizer,
    the SHARED deterministic two-queue Huffman kernel
    (importance.huffman_code_lengths)."""
    from collections import Counter

    from barks_ocr_ray.functions.importance import huffman_code_lengths
    from barks_ocr_ray.functions.text import Tokenizer

    tok = Tokenizer()
    counts: Counter = Counter()
    for s in docs.column("text").to_pylist():
        counts.update(tok.tokens(s or ""))
    terms = sorted(counts)
    cnt = [counts[t] for t in terms]
    lens = huffman_code_lengths(terms, cnt)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "code_len": pa.array(lens, pa.int64()),
        }
    )
