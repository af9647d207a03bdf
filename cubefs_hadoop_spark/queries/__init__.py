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
# (CORRECTNESS_r01.json stops at entry 50 of 103).  CORRECTNESS_r12 was
# 50/50 green.  Round-13 window per the r12-declared rotation plan
# (stalest-first): the 16 r13-new operators, then the FIVE r09 entries
# the r12 [:50] trim displaced, then the remaining r09 window
# (q03_filter_conjunctive onward, CORRECTNESS_r09 order), then the r10
# window becomes the stale pool.  Every displaced entry still
# hash-checks against DuckDB in pytest (test_oracle.py) each run and in
# the committed SWEEP_r{N}.json.
_R13_NEW = [
    # round-13-new operators: first driver rows
    "x94b_copurchase_capped", "x99_user_type_diversity",
    "x100_fulfillment_latency", "x101_segment_loyalty",
    "x102_peak_hours", "x103_source_lang_matrix",
    "x104_nation_trade_balance", "x105_conversion_latency",
    "x106_supplier_concentration", "x107_weekly_active_users",
    "x108_source_dup_rate", "x109_part_type_revenue_mix",
    "x110_session_depth", "x111_engagement_concentration",
    "x112_revenue_spikes", "x113_catalog_turnover",
]
_R09_DISPLACED = [
    # the five r09 greens the r12 trim displaced
    "x59_dim_truncation_recall", "x60_ivf_list_balance",
    "x61_lsh_quality_audit", "x62_filter_agreement", "q01_scan_count",
]
_R09_REMAINING = [
    # the rest of the r09 window (last driver rows 4 rounds old),
    # CORRECTNESS_r09 order from q03 onward
    "q03_filter_conjunctive", "q05_case_projection", "q06_tpch_q1",
    "q06b_percentiles", "q06c_stats_aggs", "q06d_median",
    "q11_join_broadcast", "q12_tpch_q3", "q20_window_rank",
    "q22_window_frame", "q25_union_distinct", "q37_pivot",
    "q37b_unpivot", "t05_local_supplier_volume",
    "t13_customer_distribution", "t14_promo_revenue",
    "t15_top_supplier", "t16_supplier_relationship",
    "t17_small_quantity_revenue", "t18_large_volume_customer",
    "t19_discounted_revenue", "x03c_ivf_ann",
]
_R10_STALEST = [
    # the r10 window becomes the stale pool, CORRECTNESS_r10 order
    "x63_rejection_funnel", "x64_embedding_health",
    "x65_packing_forecast", "x66_vocab_growth", "x67_shard_balance",
    "x68_langid_mismatch", "x69_dedup_token_yield", "x70_mirror_matrix",
    "x71_banding_planner", "x72_oov_rate", "x73_containment_pairs",
    "x74_retention_cohorts", "q02_projection", "q04_filter_in_like",
    "q07_count_distinct", "q08_approx_distinct_twin", "q09_rollup",
    "q09b_cube", "q09c_grouping_sets", "q10_having",
]
_R13_WINDOW = (
    _R13_NEW + _R09_DISPLACED + _R09_REMAINING + _R10_STALEST
)[:50]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# Composition: 16 (r13-new) + 5 (displaced r09) + 22 (r09 tail) = 43,
# filled to 50 with the first 7 r10 entries (x63..x69) -> the [:50]
# trim drops the last THIRTEEN _R10_STALEST names (x70_mirror_matrix,
# x71_banding_planner, x72_oov_rate, x73_containment_pairs,
# x74_retention_cohorts, q02_projection, q04_filter_in_like,
# q07_count_distinct, q08_approx_distinct_twin, q09_rollup, q09b_cube,
# q09c_grouping_sets, q10_having — all still sweep-green every round).
#
# r14 rotation plan (stalest-first): any r14-new operators first, then
# those thirteen dropped r10 entries (x70_mirror_matrix onward), then
# the remaining r10 window (CORRECTNESS_r10 order), then the r11 window
# becomes the stale pool.
assert len(_R13_WINDOW) == 50, len(_R13_WINDOW)
assert len(set(_R13_WINDOW)) == 50, "duplicate entry in the driver window"
reorder(_R13_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
