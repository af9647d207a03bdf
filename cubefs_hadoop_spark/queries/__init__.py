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

# The driver's t2 gate checks the FIRST 50 registry entries only
# (CORRECTNESS_r01.json stops at entry 50 of 103).  Round-5 window
# (VERDICT r04 "Next round" #1): the stalest entries first — the six
# whose last green driver row is r02, then x03c_ivf_ann (rows-only by
# design, has never had a driver row at all), then the 43 oldest of the
# 49 entries last checked in r03.  The six r03 entries deferred to r06
# (q01_scan_count, q03_filter_conjunctive, q05_case_projection,
# q06b/q06c/q06d) all have independent pytest value oracles and q01/q06
# run in bench every round.  Rotated-out entries keep their r03/r04 greens.
_R5_WINDOW = [
    # last driver-checked in r02
    "x04b_lang_stats", "x05_quality_filter", "x06_fingerprint",
    "x08_redact", "x09_stopword_ratio", "x11_repetition_ratio",
    # never driver-checked (no oracle -> rows-only row)
    "x03c_ivf_ann",
    # last driver-checked in r03
    "q06_tpch_q1", "q11_join_broadcast", "q12_tpch_q3",
    "q19_correlated_subquery", "q19b_correlated_sql", "q20_window_rank",
    "q22_window_frame", "q25_union_distinct", "q29b_bitwise_funcs",
    "q30b_array_funcs2", "q30c_collect_sorted", "q30d_higher_order_funcs",
    "q36_sample_twin", "q37_pivot", "q37b_unpivot",
    "s02_tumbling_window", "s04_sessionization",
    "t04_order_priority", "t05_local_supplier_volume",
    "t06_forecast_revenue", "t07_volume_shipping", "t08_market_share",
    "t09_product_profit", "t13_customer_distribution", "t14_promo_revenue",
    "t15_top_supplier", "t16_supplier_relationship",
    "t17_small_quantity_revenue", "t18_large_volume_customer",
    "t19_discounted_revenue", "t20_part_promotion", "t21_waiting_supplier",
    "t22_sales_opportunity",
    "u01_scalar_pandas_udf", "u06_asof_merge_pandas",
    "x01_exact_dedup", "x02_minhash_lsh", "x02b_ngram_jaccard",
    "x02d_edit_distance_dedup", "x03_topk_cosine", "x03d_ivf_full_probe",
    "x07_train_test_split", "x10_decontaminate",
]
# the driver checks exactly the first 50 entries: a 51st name here would
# silently push the last one out of verification (ADVICE r03)
assert len(_R5_WINDOW) == 50, len(_R5_WINDOW)
reorder(_R5_WINDOW)

__all__ = ["QUERIES", "ORACLE", "register", "reorder"]
