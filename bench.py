"""Bench harness (driver contract): run the headline extraction pipeline
plus a query suite over $GRAFT_SF_DIR (default /root/testdata/sf0.1) and
print ONE JSON line. ``--scaling`` runs the headline pipeline in two
fresh processes (num_cpus=8 and 32) on the same input and reports both
throughputs plus the scaling efficiency.

The headline input is the deterministically synthesized Common-Crawl-style
pages corpus (BASELINE.json input_hint shape) scaled to the sf, generated
once in parallel and cached under /tmp (generation is setup, not timed;
one untimed warm read precedes the timed run so the measurement is
compute + shuffle, not cold page cache).

Scaling-vs-size reproduction (BASELINE.md round-3): the corpus size is
parsed from the sf in GRAFT_SF_DIR's name and nothing else is read from
it, so `GRAFT_SF_DIR=/tmp/sf0.8 BENCH_TRIALS=2 python bench.py
--scaling` runs the 8-vs-32 legs on an 8x (720k-page) corpus — raw
efficiency rises monotonically with input size (0.55 -> 0.68 -> 0.74 at
1x/4x/8x) as the fixed barrier cost amortizes.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

METRIC = (
    "end-to-end extraction throughput (documents/sec) on Common-Crawl-style "
    "Parquet pages with byte-identical per-url text vs reference"
)

#: query suite timed after the headline run (names from the registry)
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q04_segment_revenue",
    "q08_word_index",
    "q12_events_hourly",
    "q13_sessions",
    "q14_top3_orders_per_customer",
    "q16_ann_cosine_topk",
    "q19_minhash_near_dups",
    "q20_simhash_near_dups",
    "q25_multimodal_features",
    "q47_tfidf_top_terms",
    "q51_training_prep",
    "q60_decontaminate",
    "q62_sequence_pack",
    "q64_quality_model",
    "q71_heavy_hitters",
    "q78_bloom_semi_join",
    "q94_pagerank",
    "q95_importance_resample",
    "q98_sorted_neighborhood",
    "q102_hll_grouped",
    "q105_cdc_merge",
    "q107_pq_topk",
    "q110_boilerplate_ngrams",
    "q111_repetition_filter",
    "q115_clean_corpus",
    "q116_token_budget",
    "q126_distributed_kmeans",
    "q127_sketch_quantiles",
    "q129_incremental_dedup",
    "q131_bpe_train",
    "q145_robust_outliers",
    "q148_ngram_containment",
    "q159_compression_ratio",
    "q160_char_entropy",
    "q163_hits_authorities",
    "q165_phrase_search",
    "q166_interval_overlap",
    "q167_retention_matrix",
    "q172_source_overlap",
    "q176_hybrid_rrf",
    "q177_personalized_pagerank",
    "q180_posting_compression",
    "q182_mmr_diversified",
    "q184_minhash_error_audit",
    "q196_quality_percentile_gate",
    "q200_perplexity_buckets",
    "q217_shuffle_quality",
    "q218_novelty_curve",
    "q221_mutual_alignment",
    "q243_event_debounce",
    "q245_spearman_length_tokens",
    "q248_cdc_dedup",
    "q249_pca_top_component",
    "q267_set_similarity_join",
    "q269_time_weighted_value",
    "q270_degree_assortativity",
    "q272_kendall_tau",
    "q273_adamic_adar",
    "q279_lz_complexity",
    "q281_markov_stationary",
    "q284_longest_self_repeat",
]


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def corpus_rows(sf: float) -> int:
    return max(1000, int(sf * 1_000_000))


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # keep worker/raylet log forwarding off STDOUT: the driver
        # parses this process's stdout as ONE JSON line, and raylet
        # WARNINGs (e.g. worker-count notices) otherwise interleave
        log_to_driver=False,
    )
    from barks_ocr_ray.context import configure

    configure()
    import ray.data as rd

    from barks_ocr_ray.datagen import write_pages_corpus_ray
    from barks_ocr_ray.pipelines.extraction import extraction_pipeline, read_pages

    sf = _sf_of(sf_dir)
    n = corpus_rows(sf)
    corpus_dir = f"/tmp/barks_pages_corpus_{n}"
    write_pages_corpus_ray(corpus_dir, n)

    # untimed warm read (OS page cache)
    read_pages(corpus_dir).count()

    out_dir = "/tmp/barks_bench_out"
    # measured sweet spot (BASELINE.md round-2): ~2 partitions/CPU at EVERY
    # leg; the old max(32, ...) floor silently put the 8-CPU scaling leg at
    # 4/CPU, the regime where aggregators sat 70% idle
    num_partitions = max(16, num_cpus * 2)
    order = os.environ.get("GRAFT_ORDER", "dedup_first")
    # min-of-3 by default: identical code measured 13.5-24.9 s across one
    # afternoon on this shared VM (BASELINE.md round-3 session-2) — the
    # headline needs more than 2 draws from that distribution
    trials = max(1, int(os.environ.get("BENCH_TRIALS", "3")))
    wall = None
    for _ in range(trials):  # min-of-N: single-run walls swing ±20% here
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        ds = extraction_pipeline(
            read_pages(corpus_dir), num_partitions=num_partitions, order=order
        )
        ds.write_parquet(out_dir)
        trial_wall = time.time() - t0
        wall = trial_wall if wall is None else min(wall, trial_wall)
    import pyarrow.dataset as pads

    n_docs = pads.dataset(out_dir).count_rows()
    return {
        "sec": round(wall, 2),
        "docs": n_docs,
        "input_rows": n,
        "docs_per_sec": round(n_docs / wall, 1),
    }


def run_arc(sf_dir: str, num_cpus: int) -> dict:
    """The composed corpus arc (q56 shape) over the SCALED pages corpus:
    extraction -> training prep as one streaming job, two keyed
    exchanges total. Reuses the cached corpus from run_headline."""
    from barks_ocr_ray.context import configure

    configure()
    from barks_ocr_ray.pipelines.extraction import extraction_pipeline, read_pages
    from barks_ocr_ray.pipelines.prep import training_prep

    sf = _sf_of(sf_dir)
    n = corpus_rows(sf)
    corpus_dir = f"/tmp/barks_pages_corpus_{n}"
    num_partitions = max(16, num_cpus * 2)
    import pyarrow as pa

    def _as_docs(t: pa.Table) -> pa.Table:
        return t.select(["url", "extracted_text"]).rename_columns(
            ["doc_id", "text"]
        )

    out_dir = "/tmp/barks_bench_arc_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    extracted = extraction_pipeline(
        read_pages(corpus_dir), num_partitions=num_partitions
    )
    docs = extracted.map_batches(_as_docs, batch_format="pyarrow")
    prepped = training_prep(
        docs,
        rates={"und": 0.5, "en": 0.25},
        default_rate=1.0,
        min_lang_score=0.0,
        num_partitions=num_partitions,
        concurrency=num_cpus,
    )
    prepped.write_parquet(out_dir)
    wall = time.time() - t0
    import pyarrow.dataset as pads

    rows = pads.dataset(out_dir).count_rows()
    return {
        "sec": round(wall, 2),
        "rows": rows,
        "input_rows": n,
        "docs_per_sec": round(n / wall, 1),
        "keyed_exchanges": 2,
    }


def run_queries(sf_dir: str) -> dict:
    from barks_ocr_ray.pipelines.queries import build_registry

    qs, _ = build_registry()
    import pyarrow as pa
    import ray.data as rd

    def _run_one(name: str) -> float:
        t0 = time.time()
        res = qs[name](sf_dir)
        if isinstance(res, rd.Dataset):
            res.count()
        return time.time() - t0

    times = {}
    for name in BENCH_QUERIES:
        times[name] = _run_one(name)
    # single-trial walls on this host swing ~2x (hypervisor steal —
    # BASELINE.md variance policy); re-draw the slowest 5 once and take
    # the min so one contended window can't fabricate a regression row
    for name in sorted(times, key=times.get, reverse=True)[:5]:
        times[name] = min(times[name], _run_one(name))
    return {name: round(t, 2) for name, t in times.items()}


def _cli_sf_dir() -> str | None:
    """--sf-dir PATH: same as GRAFT_SF_DIR (the flag wins). The sf is
    parsed from the name (e.g. /tmp/sf0.8 -> 8x headline corpus), so
    larger-regime benches need no pre-generated table dir."""
    if "--sf-dir" in sys.argv:
        return sys.argv[sys.argv.index("--sf-dir") + 1]
    return None


def main() -> None:
    sf_dir = _cli_sf_dir() or os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    headline_only = "--headline-only" in sys.argv

    if "--scaling" in sys.argv:
        scaling(sf_dir)
        return

    import ray

    headline = run_headline(sf_dir, num_cpus)
    queries = {"extraction": headline["sec"]}
    arc = None
    if not headline_only:
        arc = run_arc(sf_dir, num_cpus)
        queries["corpus_arc"] = arc["sec"]
        # the query suite needs the sf_dir's parquet tables; a
        # name-only sf_dir (e.g. --sf-dir /tmp/sf0.8, where only the
        # synthesized pages corpus exists) benches headline + arc
        if os.path.exists(os.path.join(sf_dir, "orders.parquet")):
            queries.update(run_queries(sf_dir))
    ray.shutdown()

    # scaling fields in EVERY bench JSON (VERDICT r4 §6): one fresh
    # 8-CPU headline leg against the in-process num_cpus leg above.
    # GRAFT_SKIP_SCALING=1 opts out (e.g. nested invocations).
    scaling_fields = {}
    if not headline_only and os.environ.get("GRAFT_SKIP_SCALING") != "1":
        lo_cpus = max(1, num_cpus // 4)
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(lo_cpus),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_SKIP_SCALING="1",
            BENCH_TRIALS=os.environ.get("BENCH_TRIALS", "2"),
        )
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "bench.py"),
                    "--headline-only",
                ],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                timeout=1800,
            ).stdout
            lo = json.loads(out.strip().splitlines()[-1])
            from barks_ocr_ray.bench_util import platform_ceiling

            ceiling = platform_ceiling()
            eff = (headline["docs_per_sec"] / lo["docs_per_sec"]) / (
                num_cpus / lo_cpus
            )
            scaling_fields = {
                "scaling_num_cpus": [lo_cpus, num_cpus],
                "docs_per_sec_lo": lo["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                **ceiling,
                "efficiency_vs_platform_ceiling": round(
                    eff / ceiling["platform_ceiling"], 3
                ),
            }
        except Exception as e:  # never fail the bench line for this
            scaling_fields = {"scaling_error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": headline["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": _sf_of(sf_dir),
                "num_cpus": num_cpus,
                "docs": headline["docs"],
                "docs_per_sec": headline["docs_per_sec"],
                **(
                    {
                        "arc_docs_per_sec": arc["docs_per_sec"],
                        "arc_rows": arc["rows"],
                        "arc_keyed_exchanges": arc["keyed_exchanges"],
                    }
                    if arc
                    else {}
                ),
                **scaling_fields,
            }
        )
    )


def scaling(sf_dir: str) -> None:
    """Two fresh processes, same input, num_cpus=8 vs 32 (the sanctioned
    stand-in for the N vs 4N node criterion — BASELINE.md note)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # run the 32-cpu leg first: it is the noise-sensitive one (the 8-cpu
    # leg leaves 24 idle cores that absorb background load); settle
    # between legs so one session's teardown doesn't bleed into the next
    hi = run(32)
    time.sleep(10)
    lo = run(8)
    # embarrassingly-parallel reference point on the same host: plain
    # multiprocessing of the same kernel at the same two process counts
    # (no Ray, no shuffle) — the scaling number any implementation could
    # reach here at best
    from barks_ocr_ray.bench_util import platform_ceiling

    ceiling = platform_ceiling()
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency, num_cpus 8 -> 32, same input",
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "docs_per_sec_8": lo["docs_per_sec"],
                "docs_per_sec_32": hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "sf": lo["sf"],
                "docs": lo["docs"],
                **ceiling,
                "efficiency_vs_platform_ceiling": round(
                    eff / ceiling["platform_ceiling"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
