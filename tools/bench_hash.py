"""Hash-throughput microbench: the oracle-parity per-row md5 unit
fraction vs the vectorized splitmix64 production path, over int64 ids.
Pure single-process numpy/hashlib — no Ray. Prints one JSON line;
numbers recorded in BASELINE.md (fast-path hashing table).

Usage: PYTHONPATH=. python tools/bench_hash.py [n_ids]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from barks_ocr_ray.functions.hashing import unit_fractions  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ids = np.arange(n, dtype=np.int64)

    t0 = time.perf_counter()
    unit_fractions(ids, method="md5")
    t_md5 = time.perf_counter() - t0

    # warm + min-of-5 for the fast path (sub-ms per call at small n)
    unit_fractions(ids, method="splitmix64")
    t_fast = min(
        _timed(lambda: unit_fractions(ids, method="splitmix64"))
        for _ in range(5)
    )

    print(
        json.dumps(
            {
                "metric": "hash_unit_fraction_throughput",
                "n_ids": n,
                "md5_sec": round(t_md5, 4),
                "md5_rows_per_s": round(n / t_md5),
                "splitmix64_sec": round(t_fast, 6),
                "splitmix64_rows_per_s": round(n / t_fast),
                "speedup": round(t_md5 / t_fast, 1),
            }
        )
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
