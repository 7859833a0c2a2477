"""Regenerate PLANS.md: formatted physical plans of the headline queries."""
from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded
from collect_mobile_devices_datalake_spark.plans.explain import formatted_plan
from collect_mobile_devices_datalake_spark.session import get_spark

HEADLINE = [
    "resume_pending", "q01_pricing_summary", "q05_region_revenue",
    "dedup_minhash_lsh_pairs", "knn_lsh_probe", "events_session_windows",
    "q02_min_cost_supplier", "q21_lone_returner", "split_contamination",
    "cdc_snapshot_diff", "zorder_manifest", "scd2_event_type_history",
    "boilerplate_removal", "dedup_incremental", "curriculum_bins",
    "knn_nsw_probe", "nsw_graph_delta", "doc_containment_pairs",
    "resume_bloom_prefilter", "dsir_importance_score", "dup_substring_spans",
    "knn_self_join", "decontam_bloom_report",
    "hybrid_search_rrf", "rollup_reuse_hierarchy", "order_overlap_stats",
    "source_token_drift", "event_rate_anomalies", "ivm_nation_revenue",
    "priority_sample_topk", "priority_sample_per_source", "doc_zipf_slope",
    "doc_winnowing", "winnowing_overlap_pairs", "nsw_graph_edges",
    "source_quality_calibration", "media_wav_silence_runs",
    "unigram_corpus_encoding",
    "hll_register_sketch", "wordpiece_corpus_encoding",
    "watermark_lateness_sweep", "embedding_dq_audit",
    "warc_container_records", "hll_precision_sweep",
]
_ensure_loaded()
spark = get_spark("plans"); spark.sparkContext.setLogLevel("ERROR")
with open("PLANS.md", "w") as f:
    f.write("# Physical plans (sf0.001) — regenerate with `python scripts_gen_plans.py`\n\n")
    f.write("What to look for: PushedFilters/ReadSchema on every scan, "
            "BroadcastHashJoin for small dims, partial_sum before each "
            "exchange, single Exchange in the resume plan.\n")
    for name in HEADLINE:
        df = REGISTRY[name].spark(spark, "/root/testdata/sf0.001")
        f.write(f"\n## {name}\n\n```\n{formatted_plan(df)}\n```\n")
print("PLANS.md written")
