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
# (CORRECTNESS_r01.json stops at entry 50 of 103).  Round-6 window,
# stalest-first per VERDICT r5 item 2: the 24 entries whose last
# hash-green is r03 lead (the flagship TPC-H shapes — q01/q03/q05/
# q06 family/q11/q12/q20/q22/q25_distinct/q37+b, t05, t13–t21), then
# x03c_ivf_ann, which gained an exact oracle this round (centroids are
# pinned post-Lloyd and the probe is replicated in DuckDB SQL — its
# first-ever hash row), then 25 of the 49 r04-era entries in registry
# order.  Displaced to r07: the remaining 24 r04 entries (none older
# than 2 rounds after this window lands) and the 49 r05 greens; every
# displaced entry still hash-checks against DuckDB in pytest
# (test_oracle.py) each run.
_R6_WINDOW = [
    # last driver-checked in r03 (VERDICT r5 item 2's explicit list)
    "q01_scan_count", "q03_filter_conjunctive", "q05_case_projection",
    "q06_tpch_q1", "q06b_percentiles", "q06c_stats_aggs", "q06d_median",
    "q11_join_broadcast", "q12_tpch_q3", "q20_window_rank",
    "q22_window_frame", "q25_union_distinct", "q37_pivot", "q37b_unpivot",
    "t05_local_supplier_volume", "t13_customer_distribution",
    "t14_promo_revenue", "t15_top_supplier", "t16_supplier_relationship",
    "t17_small_quantity_revenue", "t18_large_volume_customer",
    "t19_discounted_revenue", "t20_part_promotion", "t21_waiting_supplier",
    # first hash-capable round for the IVF ANN (was rows-only r01–r05)
    "x03c_ivf_ann",
    # last driver-checked in r04 (first 25 in registration order)
    "q02_projection", "q04_filter_in_like", "q07_count_distinct",
    "q08_approx_distinct_twin", "q09_rollup", "q09b_cube",
    "q09c_grouping_sets", "q10_having", "q13_left_join", "q14_semi_join",
    "q15_anti_join", "q16_theta_join", "q17_cross_join", "q18_asof_join",
    "q20b_window_distribution", "q20c_window_value_funcs", "q21_window_lag",
    "q23_sort_limit", "q25_union_all", "q26_except", "q26_intersect",
    "q27_string_funcs", "q27b_string_funcs2", "q27c_string_funcs3",
    "q28_date_funcs",
]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
#
# r7 rotation plan (stalest-first): lead with the 24 r04-last-green
# entries this window displaced (q19/q19b, q21, q26-q37 families, q28b,
# q29/q29b, q30 family, q31-q36, u01-u06 — whichever the r6
# CORRECTNESS file shows as last green in r04), then the eleven r6-new
# entries (x28_canonical_dedup, x29_ngram_novelty, x30_chunk_documents,
# x31_label_centroids, x31b_incremental_centroids,
# x32_prototype_selection, x33_dsir_weights, x33b_incremental_dsir,
# x34_sessionize, x35_binary_metadata, x36_ncm_classify — first driver
# rows; all eleven are hash-green in late-r6 full local sweeps at both
# sf0.01 and sf0.1),
# then r05 greens in registration order.  Every displaced entry still
# hash-checks in pytest (test_oracle) each run.
assert len(_R6_WINDOW) == 50, len(_R6_WINDOW)
reorder(_R6_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
