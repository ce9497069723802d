"""Deterministic unit-uniform keys for sampling / split / packing
decisions — two interchangeable implementations of "id -> uniform
fraction in [0, 1)":

* ``md5`` (default) — ``md5(str(id))`` first-8-hex / 2^32. A per-row C
  call (~1 µs/row): chosen because DuckDB ships ``md5()``, so the SQL
  oracle replays the exact keep decision bit-for-bit. This is the
  oracle-parity path; every oracle-compared query stays on it.
* ``splitmix64`` — the SplitMix64 finalizer (Steele, Lea & Flood,
  "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014; the
  seed-expander of Java's SplittableRandom and the xoshiro family)
  vectorized over the int64 ids directly with numpy uint64 arithmetic:
  no string conversion, no per-row Python, full avalanche. The
  PRODUCTION path for 100-TB runs — ~2 orders of magnitude faster
  (see BASELINE.md's hash-throughput table; `tools/bench_hash.py`
  reproduces it).

The two paths yield DIFFERENT uniforms for the same id but the SAME
keep *rate* for any threshold (both are uniform on [0, 1)), and both
are pure row functions: reproducible across runs, cluster sizes and
partitionings. ``tests/test_fast_hash.py`` pins rate equivalence,
uniformity and determinism.

Reference ancestor: the reference samples/splits nothing at corpus
scale (single-volume CLI runs); this family exists for the 100-TB
regime, and the md5 form is the oracle bridge.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_MIX1 = _U64(0xBF58476D1CE4E5B9)
_SM_MIX2 = _U64(0x94D049BB133111EB)
#: top-53-bits -> float64 in [0, 1): the standard uint64-to-double map
_INV_2_53 = 1.0 / float(1 << 53)

HASH_METHODS = ("md5", "splitmix64")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer over uint64 (wraps mod 2^64 by
    uint64 arithmetic — numpy integer overflow is defined wraparound).
    Input may be any integer dtype; negatives wrap to their two's-
    complement uint64 image, which is fine for hashing."""
    z = x.astype(np.int64).astype(_U64) + _SM_GAMMA
    z = (z ^ (z >> _U64(30))) * _SM_MIX1
    z = (z ^ (z >> _U64(27))) * _SM_MIX2
    return z ^ (z >> _U64(31))


def salt64(*parts) -> int:
    """Deterministic 64-bit salt from string parts (blake2b-8) — the
    driver-side constant that differentiates e.g. per-corpus keep
    decisions in ``mix_corpora``'s fast path."""
    h = hashlib.blake2b(
        ":".join(str(p) for p in parts).encode("utf-8"), digest_size=8
    )
    return int.from_bytes(h.digest(), "big")


def hash64(ids, method: str = "md5", salt: int = 0) -> np.ndarray:
    """id -> deterministic uint64 hash (the sortable-key form; the
    md5 method returns the first 16 hex digits as uint64, so its order
    matches sorting the hex digests lexicographically)."""
    if method == "md5":
        return np.asarray(
            [
                int(
                    hashlib.md5(
                        (f"{salt}:{i}" if salt else str(i)).encode("utf-8")
                    ).hexdigest()[:16],
                    16,
                )
                for i in ids
            ],
            dtype=np.uint64,
        )
    if method == "splitmix64":
        arr = np.asarray(ids)
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError(
                "splitmix64 fast path needs integer ids; got dtype "
                f"{arr.dtype} — use method='md5' for string ids"
            )
        return splitmix64(arr.astype(np.int64).astype(_U64) + _U64(salt & ((1 << 64) - 1)))
    raise ValueError(f"unknown hash method {method!r}; expected {HASH_METHODS}")


def unit_fractions(ids, method: str = "md5", salt: int = 0) -> np.ndarray:
    """id -> deterministic uniform float64 fraction in [0, 1).

    ``md5`` matches the historical ``int(md5(str(id))[:8], 16) / 2^32``
    form exactly (the one DuckDB oracles replay); ``splitmix64`` maps
    the mixed uint64's top 53 bits to a double."""
    if method == "md5":
        return np.asarray(
            [
                int(
                    hashlib.md5(
                        (f"{salt}:{i}" if salt else str(i)).encode("utf-8")
                    ).hexdigest()[:8],
                    16,
                )
                / float(1 << 32)
                for i in ids
            ],
            dtype=np.float64,
        )
    z = hash64(ids, method=method, salt=salt)
    return (z >> _U64(11)).astype(np.float64) * _INV_2_53
