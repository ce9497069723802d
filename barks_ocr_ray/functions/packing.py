"""Training-sequence packing and corpus mixing — the last mile of a
pre-training data pipeline: shuffle the corpus deterministically, pack
documents into fixed token-budget sequences, and mix corpora with
per-source epoch weights (Brown et al. 2020 §2.2's weighted sampling,
Raffel et al. 2020's mixture rates; public papers — no reference-repo
counterpart, extends SURVEY.md §2's LLM-pipeline family).

``sequence_pack`` is a DISTRIBUTED PREFIX SUM (two-level scan): the
global token-offset of every doc in md5-shuffled order is computed from
(a) per-range token totals — one vocabulary-small aggregation whose
result (one row per hash-prefix range) lands on the driver, is cumsum'd
there and broadcast — and (b) a within-range local sort + cumsum inside
``map_groups``. Nothing corpus-scaled touches the driver; range count
is a parameter (256 here, widen the prefix at 100 TB so each range
group stays block-sized). Every step is integer arithmetic on md5 keys
— value-exact replayable as a SQL window function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from barks_ocr_ray.functions.hashing import hash64, salt64, unit_fractions
from barks_ocr_ray.functions.text import TOKEN_RE

#: hash-prefix width (hex chars) defining the scan ranges: 2 -> 256
#: ranges. md5 prefixes are uniform, so ranges are balanced by
#: construction; at 100 TB widen to 4 (65k ranges) so a range group
#: (corpus/EXP) stays block-sized for the map_groups local scan.
RANGE_PREFIX_CHARS = 2


def sequence_pack(
    docs: Dataset,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
    hash_method: str = "md5",
) -> Dataset:
    """Assign every doc a training-sequence id: docs are ordered by
    a deterministic id hash (a deterministic global shuffle —
    reproducible across runs, cluster sizes and partitionings, unlike
    ``random_shuffle``), then packed contiguously into ``budget``-token
    sequences:

        seq_id  = floor(global_token_offset / budget)
        seq_pos = global_token_offset % budget

    Output: (doc_id, shuffle_key, n_tokens, seq_id, seq_pos).

    ``hash_method``: "md5" (default, oracle-parity — shuffle_key is the
    hex digest, SQL-replayable) or "splitmix64" (vectorized production
    path: shuffle_key is the mixed uint64, rng its top byte; same
    packing STRUCTURE — identical sequence count and fill — different
    doc order)."""

    def _key(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t.column(text_col))
        n_tokens = (
            pc.count_substring_regex(lower, TOKEN_RE)
            .cast(pa.int64())
            .fill_null(0)
        )
        if hash_method == "md5":
            keys = [
                hashlib.md5(str(d).encode("utf-8")).hexdigest()
                for d in t.column(id_col).to_pylist()
            ]
            key_arr = pa.array(keys, pa.string())
            rng_arr = pa.array(
                [k[:RANGE_PREFIX_CHARS] for k in keys], pa.string()
            )
        else:
            z = hash64(
                t.column(id_col).to_numpy(zero_copy_only=False),
                method=hash_method,
            )
            key_arr = pa.array(z, pa.uint64())
            # top byte = the 256-range analog of the 2-hex-char prefix
            # (sorting by z matches sorting hex digests of z)
            rng_arr = pa.array(z >> np.uint64(56), pa.uint64())
        return pa.table(
            {
                id_col: t.column(id_col),
                "shuffle_key": key_arr,
                "rng": rng_arr,
                "n_tokens": n_tokens,
            }
        )

    # keyed rows are ~50 B/doc (no text): materializing them once is far
    # cheaper than tokenizing the corpus twice, and spills if needed
    keyed = docs.map_batches(_key, batch_format="pyarrow").materialize()

    # level 1: per-range token totals -> driver cumsum over <=16^P rows
    totals = keyed.groupby(
        "rng", num_partitions=4
    ).aggregate(Sum("n_tokens", alias_name="range_tokens"))
    rows = sorted(
        (r["rng"], r["range_tokens"]) for r in totals.take_all()
    )
    offsets: dict[str, int] = {}
    acc = 0
    for rng, n in rows:
        offsets[rng] = acc
        acc += int(n)
    offsets_ref = ray.put(offsets)

    # level 2: within-range local scan (sort by shuffle_key + cumsum)
    def _scan(g: pa.Table) -> pa.Table:
        base = ray.get(offsets_ref)[g.column("rng")[0].as_py()]
        order = pc.sort_indices(g.column("shuffle_key"))
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        off = base + np.cumsum(n) - n
        return pa.table(
            {
                id_col: g.column(id_col),
                "shuffle_key": g.column("shuffle_key"),
                "n_tokens": g.column("n_tokens"),
                "seq_id": pa.array(off // budget, pa.int64()),
                "seq_pos": pa.array(off % budget, pa.int64()),
            }
        )

    return keyed.groupby("rng", num_partitions=num_partitions).map_groups(
        _scan, batch_format="pyarrow"
    )


def mix_corpora(
    corpora: list[tuple[str, Dataset, float]],
    *,
    id_col: str = "doc_id",
    seed: str = "mix",
    hash_method: str = "md5",
) -> Dataset:
    """Epoch-weighted corpus mixing: each (name, docs, weight) corpus
    contributes floor(weight) full epochs of every doc plus one extra
    epoch for the deterministic md5-fraction of docs selected at rate
    frac(weight) — the standard static-mixture oversampling (weight 2.3
    = every doc 2x, 30% of docs 3x). Keep decisions are pure row
    functions of (name, id, seed): reproducible across runs, cluster
    sizes and partitionings, and SQL-replayable. Per-corpus map + union
    — zero exchanges, fully streaming."""
    parts: list[Dataset] = []
    for name, docs, weight in corpora:
        base = int(weight)
        # re-round: (1.4 - 1) is 0.3999...9 in binary while the SQL
        # oracle's literal is exactly 0.4 — keep the threshold doubles
        # bit-identical on both sides
        frac = round(weight - base, 9)

        # fast-path salt: per-corpus 64-bit constant folded into the
        # vectorized hash (the md5 path keeps the exact f"{name}:{id}:
        # {seed}" digest the SQL oracle replays)
        corpus_salt = salt64(name, seed)

        def _epochs(
            t: pa.Table, _name=name, _base=base, _frac=frac,
            _salt=corpus_salt,
        ) -> pa.Table:
            ids = [str(i) for i in t.column(id_col).to_pylist()]
            reps = np.full(len(ids), _base, np.int64)
            if _frac > 0:
                if hash_method == "md5":
                    extra = np.asarray(
                        [
                            int(
                                hashlib.md5(
                                    f"{_name}:{i}:{seed}".encode("utf-8")
                                ).hexdigest()[:8],
                                16,
                            )
                            / float(1 << 32)
                            < _frac
                            for i in ids
                        ],
                        np.bool_,
                    )
                else:
                    us = unit_fractions(
                        t.column(id_col).to_numpy(zero_copy_only=False),
                        method=hash_method,
                        salt=_salt,
                    )
                    extra = us < _frac
                reps += np.asarray(extra, np.int64)
            idx = np.repeat(np.arange(len(ids)), reps)
            epochs = np.concatenate(
                [np.arange(r) for r in reps]
            ) if len(ids) else np.empty(0, np.int64)
            return pa.table(
                {
                    "corpus": pa.array(
                        np.full(len(idx), _name, object), pa.string()
                    ),
                    id_col: pa.array(
                        [ids[i] for i in idx], pa.string()
                    ),
                    "epoch": pa.array(epochs, pa.int64()),
                }
            )

        parts.append(
            docs.map_batches(_epochs, batch_format="pyarrow")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
