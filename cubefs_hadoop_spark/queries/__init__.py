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
# (CORRECTNESS_r01.json stops at entry 50 of 103).  CORRECTNESS_r09 was
# 50/50 green.  Round-10 window per the r9-declared rotation plan
# (stalest-first): the 12 round-10-new operators lead (first driver
# rows in their own round — the standing policy since r9), then the 27
# stalest r06 greens in CORRECTNESS_r06 order, then the first 11 of
# the 50 r07 greens in CORRECTNESS_r07 order (12 + 27 + 11 = 50).
# Displaced to r11: the remaining 39 r07 greens, then the r08/r09
# windows become the stale pool.  Every displaced entry still
# hash-checks against DuckDB in pytest (test_oracle.py) each run and
# in the committed SWEEP_r{N}.json.
_R10_WINDOW = [
    # round-10-new operators: first driver rows (12)
    "x63_rejection_funnel", "x64_embedding_health",
    "x65_packing_forecast", "x66_vocab_growth", "x67_shard_balance",
    "x68_langid_mismatch", "x69_dedup_token_yield",
    "x70_mirror_matrix", "x71_banding_planner", "x72_oov_rate",
    "x73_containment_pairs", "x74_retention_cohorts",
    # stalest r06 greens, CORRECTNESS_r06 order (27)
    "q02_projection", "q04_filter_in_like", "q07_count_distinct",
    "q08_approx_distinct_twin", "q09_rollup", "q09b_cube",
    "q09c_grouping_sets", "q10_having", "q13_left_join", "q14_semi_join",
    "q15_anti_join", "q16_theta_join", "q17_cross_join", "q18_asof_join",
    "q20b_window_distribution", "q20c_window_value_funcs",
    "q21_window_lag", "q23_sort_limit", "q25_union_all", "q26_except",
    "q26_intersect", "q27_string_funcs", "q27b_string_funcs2",
    "q27c_string_funcs3", "q28_date_funcs", "t20_part_promotion",
    "t21_waiting_supplier",
    # first 11 of the 50 r07 greens, CORRECTNESS_r07 order (11)
    "q28b_date_funcs2", "q29_math_funcs", "q30_array_funcs",
    "q31_explode", "q32_map_funcs", "q33_json_funcs",
    "q34_conditional_funcs", "q35_distinct", "s03_sliding_window",
    "s06_dedup_twin", "s07_stream_static_join_twin",
]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# r11 rotation plan (stalest-first): any r11-new operators first, then
# the remaining 39 r07 greens in CORRECTNESS_r07 order
# (s08_running_max_twin, s09_interval_join_twin,
# s13_dedup_watermark_twin, t10_returned_items,
# t12_priority_shipping, then u02_grouped_map_zscore ..
# t06_forecast_revenue), trimmed to 50 total with the stalest r08
# greens (CORRECTNESS_r08 order).
assert len(_R10_WINDOW) == 50, len(_R10_WINDOW)
reorder(_R10_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
