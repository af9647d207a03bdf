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
# (CORRECTNESS_r01.json stops at entry 50 of 103).  CORRECTNESS_r11 was
# 50/50 green.  Round-12 window per the r11-declared rotation plan
# (stalest-first), with the ADVICE r11 correction: _R11_NEW had 15
# operators (not 13), so the r11 [:50] trim displaced the last FOUR
# r07 entries (t07_volume_shipping, t08_market_share,
# t22_sales_opportunity, t06_forecast_revenue) — all four re-enter
# here.  Every displaced entry still hash-checks against DuckDB in
# pytest (test_oracle.py) each run and in the committed SWEEP_r{N}.json.
_R12_NEW = [
    # round-12-new operators: first driver rows
    "x89_type_share_drift", "x90_session_percentiles",
    "x91_purchase_interarrival", "x92_revenue_concentration",
    "x93_doclen_percentiles", "x94_copurchase_affinity",
    "x95_weekly_revenue", "x96_dup_quality_interaction",
    "x97_funnel_rates", "x98_event_path_trigrams",
    # r12 PLAN CHANGES (VERDICT r11 #2/#3 de-funnels): fresh driver
    # rows for the new plans even though their r11 rows were green
    "x87_rfm_segments", "x88_value_percentiles",
]
_R07_DISPLACED = [
    # the four r07 greens the r11 trim displaced (ADVICE r11: the old
    # note undercounted — all four, not just the last two)
    "t07_volume_shipping", "t08_market_share",
    "t22_sales_opportunity", "t06_forecast_revenue",
]
_R08_STALEST = [
    # stalest r08 greens, CORRECTNESS_r08 order
    "x37_subword_tokenize", "x37b_subword_tokenize_arrow",
    "x17b_subword_budget", "x14b_subword_pack", "x35b_blob_inventory",
    "x12b_semantic_dedup_auto", "x13c_srp_lsh_auto", "x38_dup_spans",
    "x38b_dup_span_removal", "x39_bpe_train", "x39b_bpe_encode",
]
_R09_STALEST = [
    # the r09 window becomes the stale pool (last driver rows 3 rounds
    # old), CORRECTNESS_r09 order
    "x16_segment_dedup", "x17_token_budget", "x18_curriculum_order",
    "x19_stratified_sample", "x20_unigram_logprob", "x21_bm25_search",
    "x22_zorder_key", "x23_gapfill_locf", "x24_range_join",
    "x25_funnel", "x26_lifecycle", "x27_series_similarity",
    "x34b_sessionize_skewsafe", "x52_skew_profile",
    "x53_lsh_bucket_audit", "x54_temperature_mixture",
    "x55_quality_canonical_dedup", "x56_ivfpq_topk", "x56b_ivfpq_rerank",
    "x57_pack_boundaries", "x43_jl_project", "x39c_bpe_train_batched",
    "x58_tokenizer_fertility", "x59_dim_truncation_recall",
    "x60_ivf_list_balance", "x61_lsh_quality_audit",
    "x62_filter_agreement", "q01_scan_count",
]
_R12_WINDOW = (_R12_NEW + _R07_DISPLACED + _R08_STALEST + _R09_STALEST)[:50]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# Composition: 12 (10 r12-new + 2 replanned) + 4 (r07 tail) + 11 (r08)
# + 28 (r09 head) = 55 -> the [:50] trim displaces FIVE r09 entries:
# x59_dim_truncation_recall, x60_ivf_list_balance,
# x61_lsh_quality_audit, x62_filter_agreement, q01_scan_count (all
# still sweep-green every round).
#
# r13 rotation plan (stalest-first): any r13-new operators first, then
# the five displaced r09 entries above, then the remaining 22 r09
# entries (q03_filter_conjunctive onward in CORRECTNESS_r09 order),
# then the r10 window becomes the stale pool.
assert len(_R12_WINDOW) == 50, len(_R12_WINDOW)
assert len(set(_R12_WINDOW)) == 50, "duplicate entry in the driver window"
reorder(_R12_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
