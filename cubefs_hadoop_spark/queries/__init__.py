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
# (CORRECTNESS_r01.json stops at entry 50 of 103).  CORRECTNESS_r13 was
# 51/51 green.  Round-14 window per the r13-declared rotation plan
# (stalest-first): the 9 r14-new operators, then the THIRTEEN r10
# entries the r13 [:50] trim dropped (x70_mirror_matrix onward), then
# the remaining r10 window (q13_left_join onward, CORRECTNESS_r10
# order), then the r11 window becomes the stale pool.  Every displaced
# entry still hash-checks against DuckDB in pytest (test_oracle.py)
# each run and in the committed SWEEP_r{N}.json.
_R14_NEW = [
    # round-14-new operators: first driver rows
    "x46c_knn_graph_auto", "x114_discount_band_revenue",
    "x115_customer_order_gaps", "x116_returns_by_nation",
    "x117_order_size_histogram", "x118_hourly_seasonality",
    "x119_source_charclass_profile", "x120_acctbal_percentiles",
    "x121_brand_price_spread", "x122_prefix_dup_rate",
    "x123_head_coverage", "x124_embedding_dim_stats",
    "x125_user_lifespan", "x126_priority_status_matrix",
]
_R10_DROPPED = [
    # the thirteen r10 greens the r13 trim dropped
    "x70_mirror_matrix", "x71_banding_planner", "x72_oov_rate",
    "x73_containment_pairs", "x74_retention_cohorts", "q02_projection",
    "q04_filter_in_like", "q07_count_distinct",
    "q08_approx_distinct_twin", "q09_rollup", "q09b_cube",
    "q09c_grouping_sets", "q10_having",
]
_R10_REMAINING = [
    # the rest of the r10 window (last driver rows 4 rounds old),
    # CORRECTNESS_r10 order from q13 onward
    "q13_left_join", "q14_semi_join", "q15_anti_join", "q16_theta_join",
    "q17_cross_join", "q18_asof_join", "q20b_window_distribution",
    "q20c_window_value_funcs", "q21_window_lag", "q23_sort_limit",
    "q25_union_all", "q26_except", "q26_intersect", "q27_string_funcs",
    "q27b_string_funcs2", "q27c_string_funcs3", "q28_date_funcs",
    "t20_part_promotion", "t21_waiting_supplier", "q28b_date_funcs2",
    "q29_math_funcs", "q30_array_funcs", "q31_explode", "q32_map_funcs",
    "q33_json_funcs", "q34_conditional_funcs", "q35_distinct",
    "s03_sliding_window", "s06_dedup_twin",
    "s07_stream_static_join_twin",
]
_R14_WINDOW = (_R14_NEW + _R10_DROPPED + _R10_REMAINING)[:50]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# Composition: 14 (r14-new) + 13 (dropped r10) + 30 (r10 tail) = 57 ->
# the [:50] trim drops the last SEVEN _R10_REMAINING names
# (q33_json_funcs, q34_conditional_funcs, q35_distinct,
# s03_sliding_window, s06_dedup_twin, s07_stream_static_join_twin —
# and q32_map_funcs — all still sweep-green every round).
#
# r15 rotation plan (stalest-first): any r15-new operators first, then
# those seven dropped r10 entries (q32_map_funcs onward), then the r11
# window (CORRECTNESS_r11 order), then the r12 window becomes the
# stale pool.
assert len(_R14_WINDOW) == 50, len(_R14_WINDOW)
assert len(set(_R14_WINDOW)) == 50, "duplicate entry in the driver window"
reorder(_R14_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
