"""Distributed cardinality sketch: HyperLogLog approximate
count-distinct (Flajolet et al. 2007 — public paper; the canonical
scale answer where exact ``groupby().count()`` distinct would shuffle
every value).

Shape: each batch folds its values into 2^p max-rank registers and
emits only the NONZERO registers as (reg, rank) combiner partials; ONE
vocabulary-sized aggregation (at most 2^p keys, 4096 at p=12) merges
them with max; the driver holds exactly the final register array. The
estimate is a pure function of a deterministic value hash (blake2b —
never Python's salted ``hash``), so the result is identical across
runs, partitionings and cluster sizes; tests pin both the <2% typical
error at p=12 and partitioning-invariance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max

DEFAULT_P = 12  # 4096 registers, ~1.6% typical relative error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hll_idx_rank(s, p: int) -> tuple[int, int]:
    """Pure per-value HLL kernel (register index, rank) — shared by the
    global estimator, the grouped estimator and the sequential golden
    replay so all three are bit-identical by construction."""
    h = int.from_bytes(
        hashlib.blake2b(str(s).encode("utf-8"), digest_size=8).digest(),
        "big",
    )
    idx = h >> (64 - p)
    rest = h & ((1 << (64 - p)) - 1)
    return idx, (64 - p) - rest.bit_length() + 1


def _hll_estimate(regs: np.ndarray) -> float:
    """Registers -> estimate (with the standard linear-counting
    small-range correction); float ops in one fixed order."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_grouped_distinct(
    ds: Dataset, group_col: str, col: str, p: int = DEFAULT_P
) -> Dataset:
    """Approximate count-distinct PER GROUP — the mergeable-sketch-by-
    key pattern: per-block sparse (group, reg, rank) partials, ONE keyed
    max-merge (exchange volume is occupied registers x groups, bounded
    by m per group, never the raw rows), then a per-group estimate in
    map_groups. Register max-merges are order-independent, so the
    result is bit-exact under any partitioning and the sequential
    golden replays it exactly."""
    m = 1 << p

    def _partials(t: pa.Table) -> pa.Table:
        best: dict = {}
        for g, v in zip(t.column(group_col).to_pylist(), t.column(col)):
            s = v.as_py()
            if s is None or g is None:
                continue
            idx, rank = _hll_idx_rank(s, p)
            key = (g, idx)
            if rank > best.get(key, 0):
                best[key] = rank
        ks = sorted(best)
        return pa.table(
            {
                group_col: pa.array([k[0] for k in ks]),
                "reg": pa.array([k[1] for k in ks], pa.int64()),
                "rank": pa.array([best[k] for k in ks], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby([group_col, "reg"], num_partitions=2)
        .aggregate(Max("rank", alias_name="rank"))
    )

    def _est(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.int64)
        regs[t.column("reg").to_numpy(zero_copy_only=False)] = t.column(
            "rank"
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: t.column(group_col).slice(0, 1),
                "n_distinct_est": pa.array(
                    [_hll_estimate(regs)], pa.float64()
                ),
            }
        )

    # group cardinality is tiny relative to register rows; one finalize
    # partition keeps every block schema-ful (raise alongside the group
    # count at scale)
    return merged.groupby(group_col, num_partitions=1).map_groups(
        _est, batch_format="pyarrow"
    )


def hll_count_distinct(ds: Dataset, col: str, p: int = DEFAULT_P) -> pa.Table:
    """One-row (n_distinct_est,) HLL estimate of distinct values in
    ``ds[col]`` (nulls ignored). Per-value hashing is one blake2b C
    call per row (the stratified-sample tradeoff note applies: chosen
    for run-to-run determinism; swap a vectorized hash in if the
    column is numeric and the corpus makes this pass hot)."""
    m = 1 << p

    def _partials(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.int64)
        for v in t.column(col):
            s = v.as_py()
            if s is None:
                continue
            h = int.from_bytes(
                hashlib.blake2b(
                    str(s).encode("utf-8"), digest_size=8
                ).digest(),
                "big",
            )
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            # rank = position of the first 1-bit in the low 64-p bits
            rank = (64 - p) - rest.bit_length() + 1
            if rank > regs[idx]:
                regs[idx] = rank
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "reg": pa.array(nz, pa.int64()),
                "rank": pa.array(regs[nz], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby("reg", num_partitions=2)
        .aggregate(Max("rank", alias_name="rank"))
        .take_all()
    )
    regs = np.zeros(m, np.int64)
    for r in merged:
        regs[r["reg"]] = r["rank"]

    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # small-range (linear counting)
    return pa.table({"n_distinct_est": pa.array([float(est)], pa.float64())})


def exact_heavy_hitters(
    ds: Dataset,
    key_col: str,
    k: int = 200,
    *,
    broadcast_gate: int = 200_000,
    num_partitions: int = 8,
) -> Dataset:
    """All keys whose exact frequency exceeds n/(k+1) (phi = 1/(k+1)
    heavy hitters), via the classic two-pass candidate scheme (Misra &
    Gries 1982 / "mergeable summaries" lineage — public papers).

    Why not a plain ``groupby(key).count()``: when the key cardinality
    approaches the corpus size (URLs, shingles at 10^12 docs), the full
    aggregation exchanges one partial per distinct key per block. Here
    pass 1 emits AT MOST k candidate rows per block — the pigeonhole
    bound: any key with global frequency > n/(k+1) must exceed
    block_n/(k+1) in at least one block (sum of per-block thresholds
    equals the global threshold), and at most k keys per block can be
    over its local threshold — so the exchange carries O(blocks x k)
    rows no matter how many distinct keys exist. Pass 2 re-counts ONLY
    candidate keys exactly and applies the global threshold, so the
    result is EXACT (supersets verified; no approximation survives to
    the output).

    Execution shape: two streaming passes over ``ds`` (inherent to
    exact heavy hitters). Pass 1 is one vectorized ``value_counts``
    per block plus a sentinel row carrying the block's row count (the
    global n is the sum of sentinels — no third pass). The candidate
    set attaches to pass 2 through the measured broadcast gate
    (precedent: the signature-attach gate, BASELINE.md round 3): below
    ``broadcast_gate`` distinct candidates one ``ray.put`` array +
    ``pc.is_in`` per block; above it a distributed inner join of the
    pass-2 partials against the candidate table (never worse than the
    plain groupby's exchange, since partials are already block-level
    deduped). Null keys are excluded (mirror the SQL with
    ``WHERE key IS NOT NULL`` if the column is nullable).

    Returns (key_col, n) rows with n * (k + 1) > n_total — integer
    arithmetic both sides, so the threshold compare is bit-exact vs
    the SQL ``HAVING count(*) * (k+1) > (SELECT count(*) ...)``.
    """
    import ray
    from ray.data.aggregate import Sum

    from barks_ocr_ray.context import hash_partitions
    from barks_ocr_ray.functions.relational import (
        compact_nonempty,
        strip_schema_metadata,
    )

    def _local_hh(t: pa.Table) -> pa.Table:
        n_b = t.num_rows
        col = t.column(key_col).combine_chunks()
        vc = col.value_counts()
        keys = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        # local pigeonhole filter: count * (k+1) > block rows
        mask = pc.and_(
            pc.greater(pc.multiply(counts, pa.scalar(k + 1, pa.int64())),
                       pa.scalar(n_b, pa.int64())),
            pc.is_valid(keys),
        )
        cand = keys.filter(mask)
        # sentinel row (null key) carries the block's total row count
        out_keys = pa.concat_arrays([cand, pa.nulls(1, cand.type)])
        out_n = pa.concat_arrays(
            [
                pa.array(np.zeros(len(cand), np.int64)),
                pa.array([n_b], pa.int64()),
            ]
        )
        return pa.table({key_col: out_keys, "n": out_n})

    p1 = ds.map_batches(
        _local_hh, batch_format="pyarrow", batch_size=None
    ).materialize()
    n_total = p1.sum("n")
    def _drop_sentinels(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(key_col)))

    # candidate-keyed aggregate: cardinality is bounded by local heavy
    # hitters (<= k per block), not the corpus — corpus-scaled partition
    # counts here leave most finalizes EMPTY (schema-less blocks, the
    # RefBundle-warning class); 2 partitions is the tiny-cardinality
    # floor (VOCAB_PARTITIONS rationale, text.py)
    cand_ds = (
        p1.map_batches(_drop_sentinels, batch_format="pyarrow")
        .groupby(key_col, num_partitions=1)
        .count()
        .drop_columns(["count()"])
    )
    # the distinct aggregation leaves empty finalize blocks; compact so
    # the table is join-safe (schema-broadcast contract, see
    # compact_nonempty) — it is candidate-sized, never corpus-sized
    cand_ds, n_cand = compact_nonempty(cand_ds, num_partitions)
    if n_cand == 0:
        # no key exceeded any block's local threshold -> no global
        # heavy hitter can exist; return the TYPED empty result
        import ray.data as rd

        # p1 is materialized and never empty (sentinel rows), so its
        # schema carries the key type even when candidates are empty
        key_field = p1.schema().base_schema.field(key_col)
        return rd.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], key_field.type),
                    "n": pa.array([], pa.int64()),
                }
            )
        )

    cand_ref = None
    if n_cand <= broadcast_gate:
        cand_arr = pa.concat_tables(
            strip_schema_metadata(b) for b in cand_ds.iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).column(key_col).combine_chunks()
        cand_ref = ray.put(cand_arr)

    def _partials(t: pa.Table) -> pa.Table:
        col = t.column(key_col).combine_chunks()
        vc = col.value_counts()
        keys = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        mask = pc.is_valid(keys)
        if cand_ref is not None:
            # candidate restriction fused into the partials pass: one
            # vectorized is_in against the broadcast array (read once
            # per task from the object store)
            mask = pc.and_(mask, pc.is_in(keys, value_set=ray.get(cand_ref)))
        keys, counts = keys.filter(mask), counts.filter(mask)
        return pa.table({key_col: keys, "n": counts})

    p2 = ds.map_batches(_partials, batch_format="pyarrow", batch_size=None)
    if cand_ref is None:
        # distributed candidate restriction: inner-join the block
        # partials against the (already-distinct) candidate table
        p2 = p2.join(
            cand_ds,
            join_type="inner",
            num_partitions=hash_partitions(num_partitions),
            on=(key_col,),
        )
    # candidate-sized for the same reason as cand_ds above; a single
    # finalize partition can never be empty while candidates exist
    agg = p2.groupby(key_col, num_partitions=1).aggregate(
        Sum("n", alias_name="n")
    )

    thresh = int(n_total)

    def _global_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t.column("n"), pa.scalar(k + 1, pa.int64())),
            pa.scalar(thresh, pa.int64()),
        )
        return t.filter(keep)  # typed even at 0 rows (filter keeps schema)

    return agg.map_batches(_global_filter, batch_format="pyarrow")


def _splitmix_bits(vals: np.ndarray, n_hashes: int, m_bits: int) -> np.ndarray:
    """(n_hashes, n) bloom bit positions for integer keys — splitmix64
    avalanche (Steele et al., public domain constants), pure vectorized
    uint64 arithmetic, deterministic across runs and partitionings."""
    x = vals.astype(np.uint64)
    out = []
    for i in range(n_hashes):
        seed = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
        h = x + seed
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        out.append(h % np.uint64(m_bits))
    return np.stack(out)


def build_bloom_bits(
    ds: Dataset,
    col: str,
    *,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    num_partitions: int = 4,
) -> np.ndarray:
    """Distributed Bloom-filter build over an integer key column:
    each block emits its DISTINCT bit positions (<= n_hashes x rows,
    deduped per block), one small aggregation dedups globally, and the
    driver packs the <= m_bits distinct positions into a uint64 word
    array — driver state is bounded by m_bits (128 KiB at 2^20), never
    by the corpus."""

    def _bits(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        pos = np.unique(_splitmix_bits(v, n_hashes, m_bits).ravel())
        return pa.table({"bit": pa.array(pos.astype(np.int64), pa.int64())})

    bits = ds.map_batches(_bits, batch_format="pyarrow").unique("bit")
    words = np.zeros(m_bits // 64, np.uint64)
    # an EMPTY input surfaces as None / [None] from unique (the UDF is
    # never invoked on empty blocks); no set bits -> filter rejects all
    arr = np.asarray(
        [b for b in (bits or []) if b is not None], np.uint64
    )
    if arr.size:
        np.bitwise_or.at(
            words, arr // 64, np.uint64(1) << (arr % np.uint64(64))
        )
    return words


def bloom_semi_join(
    big: Dataset,
    small: Dataset,
    *,
    on: str,
    right_on: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    num_partitions: int = 16,
) -> Dataset:
    """Runtime-filtered EXACT semi join (the classic Bloom pushdown —
    e.g. Spark runtime filters / "sideways information passing"): a
    Bloom filter of the small side's keys is built distributedly,
    broadcast once (`ray.put`), and applied as a vectorized membership
    test per big-side block — rows whose key is DEFINITELY absent never
    enter the join exchange (the all-to-all ships only true matches
    plus the false-positive margin, ~0.1% at default sizing for 10^5
    keys). Survivors get the exact inner join against the small side,
    so false positives are eliminated and the result is EXACTLY
    `big WHERE on IN (SELECT right_on FROM small)`. Integer keys only
    (the vectorized hash path; string keys would need a per-row digest,
    see hll_count_distinct's tradeoff note)."""
    import ray

    from barks_ocr_ray.context import hash_partitions
    from barks_ocr_ray.functions.relational import compact_nonempty

    words = build_bloom_bits(
        small, right_on, m_bits=m_bits, n_hashes=n_hashes
    )
    words_ref = ray.put(words)

    def _bloom_pass(t: pa.Table) -> pa.Table:
        w = ray.get(words_ref)
        v = t.column(on).to_numpy(zero_copy_only=False)
        pos = _splitmix_bits(v, n_hashes, m_bits)
        hit = np.ones(len(v), bool)
        for row in pos:
            hit &= (w[row // 64] >> (row % np.uint64(64))) & np.uint64(1) != 0
        return t.filter(pa.array(hit))

    # small side as a (compact, join-safe) distinct key table
    def _keys_only(t: pa.Table) -> pa.Table:
        col = t.column(right_on).combine_chunks()
        vc = col.value_counts()
        return pa.table({right_on: vc.field("values")})

    keys_ds = small.map_batches(_keys_only, batch_format="pyarrow")
    from barks_ocr_ray.functions.relational import exact_dedup

    keys_ds = exact_dedup(keys_ds, right_on, num_partitions=4)
    keys_ds, n_keys = compact_nonempty(keys_ds, 4)
    filtered = big.map_batches(_bloom_pass, batch_format="pyarrow")
    if n_keys == 0:
        # empty small side: bloom has no set bits, nothing survives;
        # the filtered stream is already empty but keeps big's schema
        return filtered
    return filtered.join(
        keys_ds,
        join_type="inner",
        num_partitions=hash_partitions(num_partitions),
        on=(on,),
        right_on=(right_on,),
    )


# --- Count-Min sketch ------------------------------------------------------

from barks_ocr_ray.functions.text import Tokenizer as _SketchTokenizer

CMS_WIDTH = 1024
CMS_DEPTH = 4

#: fixed probe list for the q85 point-frequency query (mixed common /
#: rare / absent words; shared by the query, the golden and the tests)
CMS_PROBES = [
    "the", "a", "of", "to", "and", "data", "with", "for",
    "zyzzyva", "nonexistentword",
]


def _cms_slot(depth: int, value: str) -> int:
    """Deterministic register index for one hash row (blake2b keyed by
    the row id — never Python's salted hash)."""
    h = int.from_bytes(
        hashlib.blake2b(
            f"{depth}:{value}".encode("utf-8"), digest_size=8
        ).digest(),
        "big",
    )
    return depth * CMS_WIDTH + (h % CMS_WIDTH)


def cms_token_counts(
    ds: Dataset,
    text_col: str,
    probe_words: list[str],
    *,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> pa.Table:
    """Count-Min point-frequency estimates (Cormode & Muthukrishnan 2005
    — public paper) for ``probe_words`` over the token stream of
    ``ds[text_col]``: one (word, est_count) row per probe, est >= true
    count always (one-sided error; the q71 exact heavy hitters are the
    exact sibling).

    Shape mirrors the HLL op: each block folds its tokens into a local
    depth x width int64 register matrix and emits only the NONZERO
    registers as (slot, cnt) combiner partials; ONE register-sized
    aggregation (at most depth*width = 4096 keys) sums them — CMS
    registers merge by ADDITION, which is order-independent, so the
    estimate is identical across runs, partitionings and cluster sizes.
    The driver holds exactly the final register matrix, never a token.
    """
    m = depth * width

    class _Fold:
        """Warm tokenizer + per-actor slot cache (T3 pattern): the
        Zipfian vocabulary makes repeated slot derivations dict hits."""

        def __init__(self):
            # module-level Tokenizer import: __init__ runs on the worker,
            # where in-body barks_ocr_ray imports fail under by-value
            # pickling (CLAUDE.md corollary)
            self._tok = _SketchTokenizer()
            self._slots: dict[str, np.ndarray] = {}

        def _word_slots(self, w: str) -> np.ndarray:
            s = self._slots.get(w)
            if s is None:
                s = np.array(
                    [_cms_slot(d, w) for d in range(depth)], dtype=np.int64
                )
                if len(self._slots) < (1 << 20):
                    self._slots[w] = s
            return s

        def __call__(self, t: pa.Table) -> pa.Table:
            regs = np.zeros(m, np.int64)
            for v in t.column(text_col):
                s = v.as_py()
                if s is None:
                    continue
                for w in self._tok.tokens(s):
                    regs[self._word_slots(w)] += 1
            nz = np.nonzero(regs)[0]
            return pa.table(
                {
                    "slot": pa.array(nz, pa.int64()),
                    "cnt": pa.array(regs[nz], pa.int64()),
                }
            )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(_Fold, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("slot", num_partitions=2)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    regs = np.zeros(m, np.int64)
    for r in merged:
        regs[r["slot"]] = r["cnt"]
    words = sorted(probe_words)
    ests = [
        int(min(regs[_cms_slot(d, w)] for d in range(depth))) for w in words
    ]
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )
