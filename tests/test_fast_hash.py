"""Vectorized fast-path hash (splitmix64) vs the oracle-parity md5
path: same keep RATES, valid uniformity, deterministic, and the
flagged operators behave identically in structure under either method.
(The md5 path stays the default everywhere an oracle replays the exact
decision; the fast path is for production corpus-scale runs.)"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from barks_ocr_ray.functions.hashing import (
    hash64,
    salt64,
    splitmix64,
    unit_fractions,
)

N = 50_000
IDS = np.arange(N, dtype=np.int64)


def test_splitmix64_uniform_and_deterministic():
    u = unit_fractions(IDS, method="splitmix64")
    assert u.min() >= 0.0 and u.max() < 1.0
    # decile occupancy within 5% relative of uniform
    counts, _ = np.histogram(u, bins=10, range=(0, 1))
    assert np.all(np.abs(counts - N / 10) < 0.05 * N / 10)
    # pure function: same input -> identical output
    assert np.array_equal(u, unit_fractions(IDS, method="splitmix64"))
    # salts decorrelate: the same ids under two salts agree ~ at chance
    a = unit_fractions(IDS, method="splitmix64", salt=salt64("a")) < 0.5
    b = unit_fractions(IDS, method="splitmix64", salt=salt64("b")) < 0.5
    agree = (a == b).mean()
    assert 0.45 < agree < 0.55


def test_rates_match_md5_path():
    for thr in (0.1, 0.5, 0.9):
        fast = (unit_fractions(IDS, method="splitmix64") < thr).mean()
        assert abs(fast - thr) < 0.01
    # md5 spot check on a smaller slice (per-row Python, keep it cheap)
    md5 = (unit_fractions(IDS[:5000], method="md5") < 0.5).mean()
    assert abs(md5 - 0.5) < 0.03


def test_hash64_rejects_string_ids_on_fast_path():
    with pytest.raises(TypeError, match="integer ids"):
        hash64(np.asarray(["a", "b"]), method="splitmix64")
    with pytest.raises(ValueError, match="unknown hash method"):
        unit_fractions(IDS, method="crc32")


def _docs(n=4000):
    langs = ["en", "de", "fr"]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "lang": pa.array([langs[i % 3] for i in range(n)], pa.string()),
                "text": pa.array(
                    [f"tok{i % 97} alpha beta gamma delta" for i in range(n)],
                    pa.string(),
                ),
                "n_chars": pa.array(np.full(n, 30, dtype=np.int64)),
            }
        )
    )


def test_stratified_sample_fast_rate_and_determinism():
    from barks_ocr_ray.functions.text import stratified_sample

    docs = _docs()
    rates = {"en": 0.5, "de": 0.2, "fr": 1.0}
    out = stratified_sample(
        docs, rates=rates, hash_method="splitmix64"
    ).to_pandas()
    by_lang = out.groupby("lang").size()
    assert abs(by_lang["en"] / (4000 / 3) - 0.5) < 0.06
    assert abs(by_lang["de"] / (4000 / 3) - 0.2) < 0.06
    # rate 1.0 keeps every fr doc
    assert by_lang["fr"] == sum(1 for i in range(4000) if i % 3 == 2)
    # deterministic across runs
    again = stratified_sample(
        docs, rates=rates, hash_method="splitmix64"
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_hash_split_fast_proportions():
    from barks_ocr_ray.functions.curation import hash_split_stats

    stats = hash_split_stats(
        _docs(), hash_method="splitmix64"
    ).to_pandas()
    totals = stats.groupby("split")["n_docs"].sum()
    assert abs(totals["train"] / 4000 - 0.8) < 0.03
    assert abs(totals["val"] / 4000 - 0.1) < 0.03
    assert abs(totals["test"] / 4000 - 0.1) < 0.03


def test_token_budget_fast_budget_respected():
    from barks_ocr_ray.functions.curation import token_budget_sample

    out = token_budget_sample(
        _docs(600), budget=300, hash_method="splitmix64"
    ).to_pandas()
    per_lang = out.groupby("lang")["n_tokens"].sum()
    assert (per_lang <= 300).all()
    # the budget walk fills close to the cap (docs are 5 tokens each)
    assert (per_lang > 290).all()


def test_sequence_pack_fast_structure_matches_md5():
    from barks_ocr_ray.functions.packing import sequence_pack

    docs = _docs(500)
    slow = sequence_pack(docs, budget=64, num_partitions=4).to_pandas()
    fast = sequence_pack(
        docs, budget=64, num_partitions=4, hash_method="splitmix64"
    ).to_pandas()
    # same docs, same token counts, same SEQUENCE STRUCTURE (count +
    # fill are functions of total tokens only), different order
    assert sorted(fast["doc_id"]) == sorted(slow["doc_id"])
    assert fast["n_tokens"].sum() == slow["n_tokens"].sum()
    assert fast["seq_id"].nunique() == slow["seq_id"].nunique()
    assert fast["seq_pos"].max() < 64 and (fast["seq_pos"] >= 0).all()
    # deterministic
    again = sequence_pack(
        docs, budget=64, num_partitions=4, hash_method="splitmix64"
    ).to_pandas()
    assert fast.sort_values("doc_id")["seq_id"].tolist() == again.sort_values(
        "doc_id"
    )["seq_id"].tolist()


def test_mix_corpora_fast_rate():
    from barks_ocr_ray.functions.packing import mix_corpora

    docs = _docs(3000)
    out = mix_corpora(
        [("c1", docs, 1.4)], hash_method="splitmix64"
    ).to_pandas()
    # every doc >= 1 epoch; ~40% get a second
    per_doc = out.groupby("doc_id").size()
    assert len(per_doc) == 3000 and per_doc.min() >= 1
    assert abs((per_doc - 1).mean() - 0.4) < 0.04


def test_fast_path_is_faster():
    """Lenient wall-clock sanity (the real number lives in BASELINE.md
    via tools/bench_hash.py): the vectorized path must beat per-row md5
    by a wide margin even on a noisy host."""
    import time

    ids = np.arange(200_000, dtype=np.int64)
    t0 = time.perf_counter()
    unit_fractions(ids, method="md5")
    t_md5 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        unit_fractions(ids, method="splitmix64")
    t_fast = (time.perf_counter() - t0) / 5
    assert t_md5 / t_fast > 5
