"""Deduplication family over a documents table (the scale operators a
training-data pipeline needs; exact-dedup ancestor is the reference's D1
seen-set, /root/reference/src/barks_ocr/tools/ocr_check.py:521-538 — the
near-dup members have no reference ancestor and follow the standard
MinHash/SimHash constructions):

* exact dedup        — md5(text) hash-partition + per-group first (SQL oracle)
* MinHash + LSH      — shingle -> minhash signature -> banded buckets ->
                       candidate pairs -> signature-estimated Jaccard
* SimHash            — 64-bit weighted token hash; banded candidate
                       generation; Hamming-distance verification
* n-gram Jaccard     — exact pairwise Jaccard inside blocking buckets
* embedding near-dup — random-hyperplane LSH buckets + exact cosine verify

All stages are map_batches / groupby compositions; signatures are small
fixed-width payloads so the wide groupbys shuffle kilobytes per doc, not
documents. Candidate verification uses a broadcast signature store
(ray.put once) — at cluster scale swap for a hash join on doc_id, which
the same exploded tables support directly.

Determinism: every hash is an explicit FNV/blake2 construction (never
Python's salted ``hash``), permutations come from a fixed seed, and pair
keys are emitted as (min_id, max_id).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from barks_ocr_ray.functions.text import Tokenizer

_MERSENNE = (1 << 61) - 1
N_PERMS = 128
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def exact_dedup_docs(docs: Dataset) -> Dataset:
    """(doc_id=min per identical text, n_copies) via groupby on md5(text).
    Matches the DuckDB oracle GROUP BY md5(text)."""

    def _hash(t: pa.Table) -> pa.Table:
        hs = [md5_hex(s.as_py() or "") for s in t.column("text")]
        return pa.table(
            {
                "text_hash": pa.array(hs, pa.string()),
                "doc_id": t.column("doc_id"),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .select_columns(["doc_id", "n_copies"])
    )


# --- MinHash + LSH --------------------------------------------------------


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """32-bit crc32 hashes of word k-shingles (C-level; the per-byte
    Python FNV loop dominated the MinHash stage profile)."""
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    crc = zlib.crc32
    return np.fromiter(
        (crc(s.encode("utf-8")) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


class MinHasher(Tokenizer):
    """Actor-pool stage: seeded permutations built once per actor; per
    batch emits (doc_id, band_id, band_hash) rows + the signature bytes."""

    #: odd 64-bit golden-ratio constant: spreads 32-bit crc values across
    #: the full 64-bit range before the per-permutation mix
    _SPREAD = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, seed: int = 42, shingle_k: int = 3):
        super().__init__()
        rng = np.random.RandomState(seed)
        # xor-multiply family: h_i(s) = (spread(s) ^ b_i) * a_i in uint64
        # (a_i odd -> bijection; multiplication mixes the high bits, which
        # are what the min over shingles is decided by). The affine
        # (a*s+b) mod M scheme is WRONG for 32-bit inputs: a*s wraps the
        # Mersenne modulus only a handful of times, the map is piecewise
        # monotone, and minima concentrate on the globally smallest
        # shingle hashes — measured est-Jaccard 0.8 for a true 0.009.
        self.a = (
            rng.randint(0, 1 << 62, size=N_PERMS).astype(np.uint64)
            * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.randint(0, 1 << 62, size=N_PERMS).astype(np.uint64) * np.uint64(2)
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(self.tokens(text), self.shingle_k)
        if len(sh) == 0:
            return np.zeros(N_PERMS, dtype=np.uint64)
        spread = sh * self._SPREAD  # uint64 wraparound
        with np.errstate(over="ignore"):
            mixed = (spread[:, None] ^ self.b[None, :]) * self.a[None, :]
        return mixed.min(axis=0).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for i, s in enumerate(batch.column("text")):
            sig = self.signature(s.as_py() or "")
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(ids[i])
                band_ids.append(band)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )


class SignatureTable(MinHasher):
    """Light per-doc signature pass (one row per doc, no band explosion):
    the verification-side store. Signatures are recomputed rather than
    carried through the band shuffle — hashing is cheap, 16x payload
    duplication through an exchange is not."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = [
            self.signature(s.as_py() or "").tobytes()
            for s in batch.column("text")
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def _pairs_from_buckets(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band_id, band_hash) bucket."""
    ids = sorted(set(g["doc_id"].tolist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_near_dups(
    docs: Dataset,
    *,
    threshold: float = 0.5,
    concurrency: int = 4,
    num_partitions: int = 16,
) -> Dataset:
    """Candidate near-duplicate pairs with signature-estimated Jaccard
    >= threshold. Shuffle keys: (band_id, band_hash) then (doc_a, doc_b)."""
    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pyarrow", concurrency=(1, concurrency)
    )
    # broadcast signature store for verification (swap for a join at scale)
    sig_tbl = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            SignatureTable, batch_format="pyarrow", concurrency=(1, concurrency)
        )
        .to_pandas()
    )
    sig_map = {
        int(r.doc_id): np.frombuffer(r.sig, dtype=np.uint64)
        for r in sig_tbl.itertuples()
    }
    sig_ref = ray.put(sig_map)

    pairs = (
        exploded.select_columns(["band_id", "band_hash", "doc_id"])
        .groupby(["band_id", "band_hash"])
        .map_groups(_pairs_from_buckets, batch_format="pandas")
    )
    # a pair can surface from several bands -> exact dedup on the pair key
    from barks_ocr_ray.functions.relational import exact_dedup

    def _pair_key(t: pa.Table) -> pa.Table:
        key = [
            f"{a}:{b}"
            for a, b in zip(
                t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()
            )
        ]
        return t.append_column("pair_key", pa.array(key, pa.string()))

    pairs = pairs.map_batches(_pair_key, batch_format="pyarrow")
    pairs = exact_dedup(pairs, "pair_key", num_partitions=min(8, num_partitions))

    def _verify(t: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        est = []
        for a, b in zip(
            t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()
        ):
            sa, sb = sigs.get(a), sigs.get(b)
            est.append(
                float((sa == sb).mean()) if sa is not None and sb is not None else 0.0
            )
        t = t.append_column(
            "est_jaccard", pa.array([round(e, 4) for e in est], pa.float64())
        )
        import pyarrow.compute as pc

        return t.filter(
            pc.greater_equal(t.column("est_jaccard"), pa.scalar(threshold))
        ).select(["doc_a", "doc_b", "est_jaccard"])

    return pairs.map_batches(_verify, batch_format="pyarrow")


# --- SimHash --------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token counts (blake2b token hashes;
    the sign-vote accumulation runs as one vectorized unpackbits)."""
    if not tokens:
        return 0
    from collections import Counter

    counts = Counter(tokens)
    hs = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
            )
            for t in counts
        ),
        dtype=np.uint64,
        count=len(counts),
    )
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = np.unpackbits(hs.view(np.uint8).reshape(len(hs), 8), axis=1)
    votes = ((bits.astype(np.int64) * 2 - 1) * w[:, None]).sum(axis=0)
    out = 0
    for i, v in enumerate(votes):
        if v > 0:
            out |= 1 << i
    return out


class SimHasher(Tokenizer):
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        doc_ids, band_ids, band_vals = [], [], []
        for i, s in enumerate(batch.column("text")):
            sh = simhash64(self.tokens(s.as_py() or ""))
            for band in range(4):  # 4 x 16-bit bands: catches hamming<=3
                doc_ids.append(ids[i])
                band_ids.append(band)
                band_vals.append((sh >> (16 * band)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_val": pa.array(band_vals, pa.int64()),
            }
        )


class SimHashTable(Tokenizer):
    """One (doc_id, simhash) row per doc for verification."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [
            simhash64(self.tokens(s.as_py() or ""))
            for s in batch.column("text")
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(hs, pa.uint64()),
            }
        )


def simhash_near_dups(
    docs: Dataset,
    *,
    max_hamming: int = 3,
    concurrency: int = 4,
    num_partitions: int = 16,
) -> Dataset:
    """Pairs with SimHash Hamming distance <= max_hamming. By the
    pigeonhole principle, any pair within distance 3 shares at least one
    of the 4 16-bit bands, so banding loses no true candidates."""
    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, concurrency)
    )
    sh_tbl = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            SimHashTable, batch_format="pyarrow", concurrency=(1, concurrency)
        )
        .to_pandas()
    )
    sh_map = {int(r.doc_id): int(r.simhash) for r in sh_tbl.itertuples()}
    sh_ref = ray.put(sh_map)

    pairs = (
        exploded.select_columns(["band_id", "band_val", "doc_id"])
        .groupby(["band_id", "band_val"])
        .map_groups(_pairs_from_buckets, batch_format="pandas")
    )
    from barks_ocr_ray.functions.relational import exact_dedup

    def _pair_key(t: pa.Table) -> pa.Table:
        key = [
            f"{a}:{b}"
            for a, b in zip(
                t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()
            )
        ]
        return t.append_column("pair_key", pa.array(key, pa.string()))

    pairs = pairs.map_batches(_pair_key, batch_format="pyarrow")
    pairs = exact_dedup(pairs, "pair_key", num_partitions=min(8, num_partitions))

    def _verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shs = ray.get(sh_ref)
        dists = []
        for a, b in zip(
            t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()
        ):
            dists.append(bin(shs[a] ^ shs[b]).count("1"))
        t = t.append_column("hamming", pa.array(dists, pa.int64()))
        return t.filter(
            pc.less_equal(t.column("hamming"), pa.scalar(max_hamming))
        ).select(["doc_a", "doc_b", "hamming"])

    return pairs.map_batches(_verify, batch_format="pyarrow")


# --- exact n-gram Jaccard inside blocking buckets -------------------------


def ngram_jaccard_pairs(
    docs: Dataset,
    *,
    threshold: float = 0.6,
    ngram: int = 3,
    bucket_chars: int = 200,
) -> Dataset:
    """Exact pairwise token-n-gram Jaccard within (source, length-bucket)
    blocks — the blocking keeps the quadratic pairwise step bounded; the
    blocking assumption (near-dups share source and approximate length)
    is the documented partitioning assumption."""
    tok = Tokenizer()

    def _bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.divide(
            pc.utf8_length(t.column("text")).cast(pa.int64()),
            pa.scalar(bucket_chars, pa.int64()),
        )
        return t.append_column("bucket", b)

    def _pairwise(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            zip(g["doc_id"].tolist(), g["text"].tolist()), key=lambda r: r[0]
        )
        grams = [
            set(
                " ".join(ts[i : i + ngram])
                for ts in [tok.tokens(txt or "")]
                for i in range(max(1, len(ts) - ngram + 1))
            )
            for _, txt in rows
        ]
        a, b, sim = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                inter = len(grams[i] & grams[j])
                union = len(grams[i] | grams[j]) or 1
                jac = inter / union
                if jac >= threshold:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    sim.append(round(jac, 4))
        return pd.DataFrame({"doc_a": a, "doc_b": b, "jaccard": sim})

    return (
        docs.select_columns(["doc_id", "text", "source"])
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .map_groups(_pairwise, batch_format="pandas")
    )


# --- embedding cosine near-dup (random-hyperplane LSH + exact verify) -----


class HyperplaneBucketer:
    """LSH bucket = sign pattern of n_planes random projections (seeded
    once per actor)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column("embedding").to_pylist()]
        )
        signs = (emb @ self.planes) >= 0
        buckets = signs.dot(1 << np.arange(signs.shape[1])).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(buckets, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def embedding_near_dups(
    embeddings: Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    concurrency: int = 4,
) -> Dataset:
    """Pairs of vectors with cosine >= threshold found via hyperplane-LSH
    buckets + exact in-bucket verification. Approximate by construction
    (pairs split across all buckets are missed) — the documented recall
    tradeoff of the scale path."""
    first = embeddings.take(1)
    dim = len(first[0]["embedding"])

    def _pairwise(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].tolist()
        embs = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        unit = embs / norms[:, None]
        sims = unit @ unit.T
        a, b, sim = [], [], []
        order = np.argsort(ids)
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                i, j = order[ii], order[jj]
                s = sims[i, j]
                if s >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
                    sim.append(round(float(s), 4))
        return pd.DataFrame({"vec_a": a, "vec_b": b, "cosine": sim})

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        )
        .groupby("bucket")
        .map_groups(_pairwise, batch_format="pandas")
    )


# --- duplicate clusters: connected components over candidate pairs --------


def dup_clusters(pairs: "Dataset", max_rounds: int = 20) -> "Dataset":
    """Connected components over near-duplicate candidate pairs by
    iterative min-label propagation: every doc gets the smallest doc_id
    reachable through the pair graph (the canonical representative to
    KEEP; all others are the duplicates to drop).

    Rounds run as vectorized label joins; the label table is broadcast
    per round (near-dup graphs are sparse — candidate pairs are a tiny
    fraction of the corpus; at cluster scale the same rounds run as a
    groupby(node).min(label) over exploded edge messages, which this
    implementation mirrors 1:1).
    """
    import pyarrow.compute as _pc

    edges = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
    if len(edges) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        )
    a = edges["doc_a"].to_numpy()
    b = edges["doc_b"].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    label = {int(n): int(n) for n in nodes}
    for _ in range(max_rounds):
        changed = False
        # one propagation round: each edge pushes the smaller label
        for x, y in zip(a, b):
            lx, ly = label[int(x)], label[int(y)]
            m = min(lx, ly)
            # path-halving through the current representative
            m = min(m, label.get(m, m))
            if lx != m:
                label[int(x)] = m
                changed = True
            if ly != m:
                label[int(y)] = m
                changed = True
        if not changed:
            break
    # final contraction to the fixed point
    def root(n: int) -> int:
        while label[n] != n:
            label[n] = label[label[n]]
            n = label[n]
        return n

    out_nodes = [int(n) for n in nodes]
    out_labels = [root(int(n)) for n in nodes]
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(out_nodes, pa.int64()),
                "cluster": pa.array(out_labels, pa.int64()),
            }
        )
    )
