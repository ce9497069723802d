"""Driver-contract smoke in the driver's EXACT conditions: a fresh
process where ray.init happens before __ray_entry__ is imported, with NO
PYTHONPATH — workers can only resolve our code through the cloudpickle
by-value registration. Guards against worker-body runtime imports of the
package (which fail only under this condition, not under the
PYTHONPATH-ful pytest session)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import ray, sys, os, importlib.util
os.environ.pop("PYTHONPATH", None)
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, {repo!r})
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", os.path.join({repo!r}, "__ray_entry__.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
assert m.entry().count() > 0
qs, osql = m.queries(), m.oracle_sql()
assert set(osql) <= set(qs)
import ray.data as rd
# q22 has no pairs >= threshold at sf0.001: runs clean, 0 rows is valid
for name, min_rows in (("q01_pricing_summary", 1),
                        ("q24_extraction_pipeline", 1),
                        ("q17_lang_id", 1), ("q21_ngram_jaccard", 1),
                        ("q22_embedding_near_dups", 0),
                        ("q51_training_prep", 1),
                        ("q53_shared_window_dups", 1),
                        ("q56_corpus_arc", 1),
                        ("q59_paragraph_dedup", 1),
                        ("q60_decontaminate", 1),
                        ("q62_sequence_pack", 1),
                        ("q63_mix_corpora", 1),
                        ("q70_asof_join", 1),
                        ("q71_heavy_hitters", 1),
                        ("q73_chunk_documents", 1),
                        ("q75_semdedup", 1),
                        ("q78_bloom_semi_join", 1),
                        ("q80_global_rank", 1),
                        ("q81_corr_moments", 1),
                        ("q82_source_intersect", 1),
                        ("q83_cube", 1),
                        ("q84_weighted_mean", 1),
                        ("q85_cms_counts", 1),
                        ("q86_grouped_zscore", 1),
                        ("q87_bigram_logprob", 1),
                        ("q88_quantile_cut", 1),
                        ("q89_local_supplier_volume", 1),
                        ("q90_normalize_text", 1),
                        ("q91_token_counts", 1),
                        ("q92_event_pattern", 1),
                        ("q93_pmi_collocations", 1),
                        ("q94_pagerank", 1),
                        ("q95_importance_resample", 1),
                        ("q96_evolving_schema_union", 1),
                        ("q97_compaction", 1),
                        ("q98_sorted_neighborhood", 1),
                        ("q99_returned_item_revenue", 1),
                        ("q100_readability", 1),
                        ("q101_corpus_profile", 1),
                        ("q102_hll_grouped", 1),
                        ("q103_k_anonymity", 1),
                        ("q104_expectations", 1),
                        ("q105_cdc_merge", 1),
                        ("q106_fk_audit", 1),
                        ("q107_pq_topk", 1),
                        ("q108_json_props", 1),
                        ("q109_watermark_late_events", 1),
                        ("q110_boilerplate_ngrams", 1),
                        ("q111_repetition_filter", 1),
                        ("q112_decontaminate", 1),
                        ("q113_hash_split", 1),
                        ("q114_unpivot_lineitem", 1),
                        ("q115_clean_corpus", 1),
                        ("q116_token_budget", 1),
                        ("q117_source_quota", 1),
                        ("q118_numeric_profile", 1),
                        ("q119_jsonl_roundtrip", 1),
                        ("q120_hourly_gap_audit", 1),
                        ("q121_except_all", 1),
                        ("q122_key_skew_profile", 1),
                        ("q123_label_centroids", 1),
                        ("q124_nearest_centroid", 1),
                        ("q125_source_similarity", 1),
                        ("q126_distributed_kmeans", 1),
                        ("q127_sketch_quantiles", 1),
                        ("q128_scd2_history", 1),
                        ("q129_incremental_dedup", 1),
                        ("q130_snapshot_drift", 1),
                        ("q131_bpe_train", 1),
                        ("q132_bpe_encode", 1),
                        ("q133_grouped_sketch_quantiles", 1),
                        ("q134_psi_drift", 1),
                        ("q135_temperature_mix", 1),
                        ("q136_incremental_minhash", 1),
                        ("q137_content_drift", 1),
                        ("q138_triangle_counts", 1),
                        ("q139_schema_drift", 1),
                        ("q140_weighted_quantiles", 1),
                        ("q141_zorder_layout", 1),
                        ("q142_group_ksample", 1),
                        ("q143_adoption_curve", 1),
                        ("q144_event_path_bigrams", 1),
                        ("q145_robust_outliers", 1),
                        ("q146_global_ntile", 1),
                        ("q147_recency_score", 1),
                        ("q148_ngram_containment", 1),
                        ("q149_proportional_sample", 1),
                        ("q150_grouped_heavy_terms", 1),
                        ("q151_funnel_steps", 1),
                        ("q152_rollup_quantity", 1),
                        ("q153_weighted_sample", 1),
                        ("q154_grouped_correlation", 1),
                        ("q155_daily_trailing_average", 1),
                        ("q156_gap_quantiles", 1),
                        ("q157_rfm_segments", 1),
                        ("q158_dup_cluster_sizes", 1),
                        ("q159_compression_ratio", 1),
                        ("q160_char_entropy", 1),
                        ("q163_hits_authorities", 1),
                        ("q164_canonical_dedup", 1),
                        ("q165_phrase_search", 1),
                        ("q166_interval_overlap", 1),
                        ("q167_retention_matrix", 1),
                        ("q168_crawl_frontier", 1),
                        ("q169_source_divergence", 1),
                        ("q170_fk_orphan_audit", 1),
                        ("q171_length_bucketing", 1),
                        ("q172_source_overlap", 1),
                        ("q173_calibration_report", 1),
                        ("q174_zipf_slope", 1),
                        ("q175_discriminative_terms", 1),
                        ("q176_hybrid_rrf", 1),
                        ("q177_personalized_pagerank", 1),
                        ("q178_length_percentile", 1),
                        ("q179_heaps_law", 1),
                        ("q180_posting_compression", 1),
                        ("q181_market_basket", 1),
                        ("q182_mmr_diversified", 1),
                        ("q183_join_skew_audit", 1),
                        ("q184_minhash_error_audit", 1),
                        ("q185_kcore", 1),
                        ("q186_ivf_recall_audit", 1),
                        ("q187_attrition_report", 1)):
    r = qs[name]("/root/testdata/sf0.001")
    n = r.count() if isinstance(r, rd.Dataset) else len(r)
    assert n >= min_rows, name
ray.shutdown()
print("DRIVER-CONTRACT-OK")
"""


def test_entry_and_queries_without_pythonpath():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
        cwd="/tmp",
    )
    assert "DRIVER-CONTRACT-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
