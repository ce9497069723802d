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
for name, min_rows in (('q01_pricing_summary', 1),
                        ('q14_top3_orders_per_customer', 1),
                        ('q24_extraction_pipeline', 1),
                        ('q56_corpus_arc', 1),
                        ('q08_word_index', 1),
                        ('q17_lang_id', 1),
                        ('q45_line_rewrap', 1),
                        ('q19_minhash_near_dups', 1),
                        ('q21_ngram_jaccard', 1),
                        ('q22_embedding_near_dups', 0),
                        ('q53_shared_window_dups', 1),
                        ('q98_sorted_neighborhood', 1),
                        ('q129_incremental_dedup', 1),
                        ('q16_ann_cosine_topk', 1),
                        ('q23_lsh_topk', 1),
                        ('q48_ivf_topk', 1),
                        ('q75_semdedup', 1),
                        ('q107_pq_topk', 1),
                        ('q126_distributed_kmeans', 1),
                        ('q67_hll_distinct', 1),
                        ('q71_heavy_hitters', 1),
                        ('q85_cms_counts', 1),
                        ('q102_hll_grouped', 1),
                        ('q13_sessions', 1),
                        ('q70_asof_join', 1),
                        ('q109_watermark_late_events', 1),
                        ('q60_decontaminate', 1),
                        ('q62_sequence_pack', 1),
                        ('q63_mix_corpora', 1),
                        ('q111_repetition_filter', 1),
                        ('q113_hash_split', 1),
                        ('q115_clean_corpus', 1),
                        ('q116_token_budget', 1),
                        ('q64_quality_model', 1),
                        ('q95_importance_resample', 1),
                        ('q94_pagerank', 1),
                        ('q138_triangle_counts', 1),
                        ('q163_hits_authorities', 1),
                        ('q66_quantiles', 1),
                        ('q68_grouped_quantiles', 1),
                        ('q140_weighted_quantiles', 1),
                        ('q96_evolving_schema_union', 1),
                        ('q105_cdc_merge', 1),
                        ('q119_jsonl_roundtrip', 1),
                        ('q108_json_props', 1),
                        ('q168_crawl_frontier', 1),
                        ('q169_source_divergence', 1),
                        ('q170_fk_orphan_audit', 1),
                        ('q171_length_bucketing', 1),
                        ('q172_source_overlap', 1),
                        ('q174_zipf_slope', 1),
                        ('q175_discriminative_terms', 1),
                        ('q177_personalized_pagerank', 1),
                        ('q179_heaps_law', 1),
                        ('q180_posting_compression', 1),
                        ('q181_market_basket', 1),
                        ('q182_mmr_diversified', 1),
                        ('q183_join_skew_audit', 1),
                        ('q185_kcore', 1),
                        ('q186_ivf_recall_audit', 1),
                        ('q187_attrition_report', 1),
                        ('q188_burst_windows', 1),
                        ('q189_two_hop_reach', 1),
                        ('q190_reshard_churn', 1),
                        ('q191_shard_balance', 1),
                        ('q192_last_touch_attribution', 1),
                        ('q193_daily_periodicity', 1),
                        ('q194_quality_dedup', 1),
                        ('q195_rerank', 1),
                        ('q196_quality_percentile_gate', 1),
                        ('q197_dataset_card', 1),
                        ('q198_hard_negatives', 1),
                        ('q199_padding_waste', 1),
                        ('q200_perplexity_buckets', 1),
                        ('q201_lexical_diversity', 1),
                        ('q202_syndication_matrix', 0),  # dup-free at sf0.001
                        ('q203_hll_error_audit', 1),
                        ('q204_max_coverage', 1),
                        ('q205_ks_drift', 1),
                        ('q206_lang_source_mi', 1),
                        ('q207_vocab_band_coverage', 1),
                        ('q208_embedding_isotropy', 1),
                        ('q209_sliding_distinct_users', 1),
                        ('q210_quantile_sketch_error', 1),
                        ('q211_source_quality_ci', 1),
                        ('q212_neardup_provenance', 1),
                        ('q213_markov_backtest', 1),
                        ('q214_entity_cooccurrence', 1),
                        ('q215_split_leakage', 1),
                        ('q216_term_drift', 1),
                        ('q217_shuffle_quality', 1),
                        ('q218_novelty_curve', 1),
                        ('q219_filter_kappa', 1),
                        ('q220_prefix_autocomplete', 1),
                        ('q221_mutual_alignment', 1),
                        ('q222_grouped_trend', 1),
                        ('q223_trending_decay', 1),
                        ('q224_cluster_terms', 1),
                        ('q225_theil_sen', 1),
                        ('q226_mad_anomaly_days', 1),
                        ('q227_group_purity', 1),
                        ('q228_linear_attribution', 1),
                        ('q229_churn_labels', 1),
                        ('q230_search_snippets', 1),
                        ('q231_waterfill_budget', 1),
                        ('q232_qq_drift', 1),
                        ('q233_exact_auc', 1),
                        ('q234_fold_balance', 1),
                        ('q235_host_budget', 1),
                        ('q236_delta_index_merge', 1),
                        ('q237_conformal_coverage', 1),
                        ('q238_conversion_latency', 1),
                        ('q239_peak_concurrency', 1),
                        ('q240_ht_estimate', 1),
                        ('q241_gini_concentration', 1),
                        ('q242_capture_recapture', 1),
                        ('q243_event_debounce', 1),
                        ('q244_benford_audit', 1),
                        ('q245_spearman_length_tokens', 1),
                        ('q246_ewma_backtest', 1),
                        ('q247_int8_quant_distortion', 1),
                        ('q248_cdc_dedup', 1),
                        ('q249_pca_top_component', 1),
                        ('q250_new_returning_users', 1),
                        ('q251_transition_entropy', 1),
                        ('q252_hill_tail_index', 1),
                        ('q253_ab_ztest', 1),
                        ('q254_weighted_reservoir', 1),
                        ('q255_interarrival_dispersion', 1),
                        ('q256_jl_distortion', 1),
                        ('q257_bounce_rate', 1),
                        ('q258_neyman_allocation', 1),
                        ('q259_km_retention', 1),
                        ('q260_winsorized_mean', 1),
                        ('q261_effective_sample_size', 1),
                        ('q262_charset_profile', 1),
                        ('q263_order_reconciliation', 1),
                        ('q264_part_price_dispersion', 1),
                        ('q265_nation_share_trend', 1),
                        ('q266_return_rate_wilson', 1),
                        ('q267_set_similarity_join', 1),
                        ('q268_naive_bayes_lang', 1),
                        ('q269_time_weighted_value', 1),
                        ('q270_degree_assortativity', 1),
                        ('q271_negative_sampling', 1),
                        ('q272_kendall_tau', 1),
                        ('q273_adamic_adar', 1),
                        ('q274_pareto_frontier', 1),
                        ('q275_diff_in_diff', 1),
                        ('q276_embedding_frechet_drift', 1),
                        ('q277_span_corruption', 1),
                        ('q278_bpe_fertility', 1),
                        ('q279_lz_complexity', 1),
                        ('q280_cusum_changepoint', 1),
                        ('q281_markov_stationary', 1),
                        ('q282_cluster_silhouette', 1),
                        ('q283_ks_length_shift', 1),
                        ('q284_longest_self_repeat', 1),
                        ('q285_chi_square_independence', 1),
                        ('q286_poisson_bootstrap_ci', 1),
                        ('q287_dp_count_release', 1),
                        ('q288_theil_sen_trend', 1),
                        ('q289_chao1_vocabulary', 1),
                        ('q290_heaps_law', 1),
                        ('q291_neardup_lcs_audit', 1),
                        ('q292_power_analysis', 1),
                        ('q293_mixture_waterfill', 1),
                        ('q294_alias_sampler', 1),
                        ('q295_sprt_monitor', 1)):
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
        timeout=800,
        cwd="/tmp",
    )
    assert "DRIVER-CONTRACT-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
