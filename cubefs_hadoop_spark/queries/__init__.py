"""Query catalog: importing this package populates the registry."""

from cubefs_hadoop_spark.registry import ORACLE, QUERIES, register, reorder

# Modules self-register on import.
from cubefs_hadoop_spark.queries import relational  # noqa: E402,F401
from cubefs_hadoop_spark.queries import functions_extra  # noqa: E402,F401

# Import loudly: a swallowed ImportError here would silently drop whole
# query families from the driver's correctness gate.
from cubefs_hadoop_spark.queries import streaming_twins  # noqa: E402,F401
from cubefs_hadoop_spark.queries import tpch_shapes  # noqa: E402,F401
from cubefs_hadoop_spark.queries import udfs  # noqa: E402,F401
from cubefs_hadoop_spark import extensions  # noqa: E402,F401
from cubefs_hadoop_spark.plans import zorder  # noqa: E402,F401

# The driver's t2 gate checks the FIRST 50 registry entries only
# (CORRECTNESS_r01.json stops at entry 50 of 103).  CORRECTNESS_r10 was
# 50/50 green.  Round-11 window per the r10-declared rotation plan
# (stalest-first): the round-11-new operators lead (first driver rows
# in their own round — the standing policy since r9), then the
# remaining 39 r07 greens in CORRECTNESS_r07 order (the stalest pool:
# their last driver rows are 4 rounds old), topped up to 50 with the
# stalest r08 greens in CORRECTNESS_r08 order.  Displaced to r12: the
# rest of the r08 window, then r09/r10.  Every displaced entry still
# hash-checks against DuckDB in pytest (test_oracle.py) each run and
# in the committed SWEEP_r{N}.json.
_R11_NEW = [
    # round-11-new operators: first driver rows
    "x73b_containment_production", "x75_lsh_preflight",
    "x76_stratified_eval_split", "x77_cluster_purity",
    "x78_collocation_lift", "x79_ngram_dup_curve",
    "x80_label_separation", "x81_neardup_pagerank",
    "x82_centrality_canonical", "x83_tfidf_keywords",
    "x84_source_vocabulary", "x85_event_transitions",
    "x86_pair_arrival_curve", "x87_rfm_segments",
    "x88_value_percentiles",
]
_R07_REMAINING = [
    # the 39 r07 greens displaced from the r10 window, r07 order
    "s08_running_max_twin", "s09_interval_join_twin",
    "s13_dedup_watermark_twin", "t10_returned_items",
    "t12_priority_shipping", "u02_grouped_map_zscore",
    "u03_grouped_agg_mean", "u04_udtf_wordsplit", "u04b_python_udtf",
    "u05_row_udf", "x02c_simhash", "x03b_embedding_neardup",
    "x03e_int8_ann", "x04_text_stats", "x28_canonical_dedup",
    "x29_ngram_novelty", "x30_chunk_documents", "x31_label_centroids",
    "x31b_incremental_centroids", "x32_prototype_selection",
    "x33_dsir_weights", "x33b_incremental_dsir", "x34_sessionize",
    "x35_binary_metadata", "x36_ncm_classify", "q19_correlated_subquery",
    "q19b_correlated_sql", "q36_sample_twin", "q30b_array_funcs2",
    "q29b_bitwise_funcs", "q30c_collect_sorted", "q30d_higher_order_funcs",
    "s02_tumbling_window", "s04_sessionization", "t04_order_priority",
    "t07_volume_shipping", "t08_market_share", "t22_sales_opportunity",
    "t06_forecast_revenue",
]
_R08_STALEST = [
    # stalest r08 greens, CORRECTNESS_r08 order (top-up pool)
    "x37_subword_tokenize", "x37b_subword_tokenize_arrow",
    "x17b_subword_budget", "x14b_subword_pack", "x35b_blob_inventory",
    "x12b_semantic_dedup_auto", "x13c_srp_lsh_auto", "x38_dup_spans",
    "x38b_dup_span_removal", "x39_bpe_train", "x39b_bpe_encode",
]
_R11_WINDOW = (_R11_NEW + _R07_REMAINING + _R08_STALEST)[:50]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# NOTE: with 13 r11-new operators the [:50] trim displaces the last
# two r07 entries (t22_sales_opportunity, t06_forecast_revenue) AND
# the whole r08 top-up pool — all still sweep-green in SWEEP_r11.json.
#
# r12 rotation plan (stalest-first): any r12-new operators first, then
# t22_sales_opportunity + t06_forecast_revenue (displaced here), then
# the r08 greens in CORRECTNESS_r08 order, then the r09 window becomes
# the stale pool.
assert len(_R11_WINDOW) == 50, len(_R11_WINDOW)
reorder(_R11_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
