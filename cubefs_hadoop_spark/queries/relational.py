"""Relational query surface Q01-Q37 (SURVEY §2B).

These are the operators the reference connector *enables* in its host
engines (reference README.md:61-88 — Spark/Hive/Presto/Flink run their full
query surface over CubeFS); here Spark computes them natively via the
DataFrame API and Catalyst supplies pushdown/pruning/join-planning
(SURVEY §4).  Each query has a DuckDB oracle twin for the t2 gate.

Scale notes are attached per-query: every plan here is shuffle-minimal
(partial aggregation map-side, broadcast for dimension tables, single
window scan instead of self-joins where semantics allow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register

# R2 numeric-normalization protocol: shared with extensions via the
# top-level module (import-cycle-free); re-exported here for the queries
# package's own modules.
from cubefs_hadoop_spark.oracle_compat import DEC, dec, r2, r2d  # noqa: F401


def _rev() -> Column:
    """Revenue expression l_extendedprice*(1-l_discount) over decimals."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# --------------------------------------------------------------------------
# Scans, filters, projections
# --------------------------------------------------------------------------


@register("q01_scan_count", "SELECT COUNT(*) AS c FROM lineitem")
def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q01 full-scan count.  Parquet footer row-counts let Spark answer this
    without reading data pages (metadata-only scan at 100 TB)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("c"))


@register(
    "q02_projection",
    """SELECT * FROM (SELECT l_orderkey, l_quantity FROM lineitem
       ORDER BY l_orderkey, l_quantity LIMIT 100) ORDER BY l_orderkey, l_quantity""",
)
def q02_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q02 projection pruning: ReadSchema should contain exactly 2 columns."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_quantity")
        .limit(100)
    )


@register(
    "q03_filter_conjunctive",
    """SELECT COUNT(*) AS c FROM lineitem
       WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def q03_filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q03 conjunctive filter — both predicates push to the parquet scan
    (row-group min/max skipping)."""
    t = load(spark, sf_dir, "lineitem")
    return t.filter(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    ).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q04_filter_in_like",
    """SELECT COUNT(*) AS c FROM part
       WHERE p_brand IN ('Brand#1','Brand#2') OR p_type LIKE '%DARD%'""",
)
def q04_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "part")
    return t.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2") | F.col("p_type").like("%DARD%")
    ).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q05_case_projection",
    f"""SELECT * FROM (
          SELECT l_orderkey,
                 CAST(ROUND({_REV_SQL}, 2) AS DECIMAL(18,2)) AS rev,
                 CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS ret
          FROM lineitem ORDER BY l_orderkey, rev, ret LIMIT 500
       ) ORDER BY l_orderkey, rev, ret""",
)
def q05_case_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q05 arithmetic + CASE projection (whole-stage-codegen expressions)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            r2(_rev()).alias("rev"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).cast("long").alias("ret"),
        )
        .orderBy("l_orderkey", "rev", "ret")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@register(
    "q06_tpch_q1",
    f"""SELECT l_returnflag, l_linestatus,
          CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS sum_qty,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS sum_base,
          CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS sum_disc,
          CAST(ROUND(AVG(l_quantity), 2) AS DECIMAL(18,2)) AS avg_qty,
          COUNT(*) AS cnt
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q06_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q06 TPC-H Q1-shape hash aggregate: multi-key groupBy with partial
    (map-side) aggregation — the canonical 100 TB-safe agg (6 groups total,
    so the shuffle moves ~6 rows per task regardless of input size).

    widen_for_cpu (r14): the decimal partial aggregation is the heavy
    map stage, and a small fixture arrives as one split — fan it out so
    every core aggregates (no-op at scale; measured 1.8 -> 0.9 s at
    sf0.1).  The fan-out hashes on l_extendedprice — already in the
    aggregate's input, so the scan stays pruned to the five needed
    columns (l_orderkey would widen ReadSchema)."""
    from cubefs_hadoop_spark.plans.parallelism import widen_for_cpu

    return (
        widen_for_cpu(load(spark, sf_dir, "lineitem"), "l_extendedprice")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum(dec("l_quantity"))).alias("sum_qty"),
            r2(F.sum(dec("l_extendedprice"))).alias("sum_base"),
            r2(F.sum(_rev())).alias("sum_disc"),
            r2d(F.avg("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q07_count_distinct",
    """SELECT COUNT(DISTINCT l_suppkey) AS s, COUNT(DISTINCT l_partkey) AS p
       FROM lineitem""",
)
def q07_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q07 multi-column distinct aggregate (Catalyst expands to two
    partial-distinct aggregations, shuffling only distinct keys)."""
    return load(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_suppkey").alias("s"),
        F.countDistinct("l_partkey").alias("p"),
    )


@register(
    "q08_approx_distinct_twin",
    "SELECT COUNT(DISTINCT o_custkey) AS c FROM orders",
)
def q08_approx_distinct_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q08 declared as the exact twin for hashing; ``approx_distinct`` below
    is the production path (HLL sketch — constant memory at 100 TB)."""
    return load(spark, sf_dir, "orders").agg(F.countDistinct("o_custkey").alias("c"))


def approx_distinct(spark: SparkSession, sf_dir: str, rsd: float = 0.02) -> DataFrame:
    """Q08 production form: approx_count_distinct (HyperLogLog++).
    Validated engine-side against the exact twin in tests (±3*rsd)."""
    return load(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd).alias("c")
    )


@register(
    "q09_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS f, COALESCE(l_linestatus, 'ALL') AS s,
          COUNT(*) AS c
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       ORDER BY f, s, c""",
)
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q09 ROLLUP (hierarchical grouping sets in one pass)."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("f"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("s"),
            "c",
        )
        .orderBy("f", "s", "c")
    )


@register(
    "q09b_cube",
    """SELECT COALESCE(l_returnflag, 'ALL') AS f, COALESCE(l_linestatus, 'ALL') AS s,
          COUNT(*) AS c
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY f, s, c""",
)
def q09b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q09b CUBE: all 2^k grouping sets in one pass (the expand-based plan
    multiplies map output by the set count — at 100 TB prefer explicit
    GROUPING SETS over full CUBE when only some combinations matter)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("f"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("s"),
            "c",
        )
        .orderBy("f", "s", "c")
    )


@register(
    "q09c_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS f, COALESCE(l_linestatus, 'ALL') AS s,
          COUNT(*) AS c
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
       ORDER BY f, s, c""",
)
def q09c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q09c explicit GROUPING SETS via SQL text — at 100 TB prefer naming
    exactly the set combinations needed: the Expand operator multiplies
    map-side output by the number of sets."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS f,
                  COALESCE(l_linestatus, 'ALL') AS s, COUNT(*) AS c
           FROM _li_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
           ORDER BY f, s, c"""
    )


@register(
    "q10_having",
    """SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
       HAVING COUNT(*) >= 2 ORDER BY o_custkey, c""",
)
def q10_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .orderBy("o_custkey", "c")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q11_join_broadcast",
    """SELECT n_name, COUNT(*) AS c FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name, c""",
)
def q11_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 dimension join: nation (25 rows) is explicitly broadcast, so the
    fact side never shuffles for the join — only the 25-group agg moves."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("n_name", "c")
    )


@register(
    "q12_tpch_q3",
    f"""SELECT * FROM (
          SELECT l_orderkey,
                 CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS rev
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY l_orderkey ORDER BY rev DESC, l_orderkey LIMIT 10
       ) ORDER BY l_orderkey, rev""",
)
def q12_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 TPC-H Q3-shape 3-way join + top-k.  The selective customer filter
    is applied *before* the join (Catalyst pushes it below); orders/lineitem
    join on their natural keys (sort-merge at scale, AQE may broadcast the
    filtered side); final top-10 is TakeOrderedAndProject — no global sort."""
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(r2(F.sum(_rev())).alias("rev"))
        .orderBy(F.col("rev").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q13_left_join",
    """SELECT c_custkey, COALESCE(cnt, 0) AS cnt FROM customer
       LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
       ON c_custkey = o_custkey ORDER BY c_custkey, cnt""",
)
def q13_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 left outer join against a pre-aggregated side (aggregate-below-
    join keeps the shuffled payload at one row per customer)."""
    customer = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .orderBy("c_custkey", "cnt")
    )


@register(
    "q14_semi_join",
    """SELECT COUNT(*) AS c FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q14_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 left-semi join (EXISTS): shuffles only the distinct keys of the
    probe side, never duplicates rows."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q15_anti_join",
    """SELECT COUNT(*) AS c FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q15_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q16_theta_join",
    """SELECT COUNT(*) AS c FROM part p JOIN supplier s
       ON p.p_retailprice > s.s_acctbal""",
)
def q16_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 theta (non-equi) join — BroadcastNestedLoop with the tiny
    supplier side broadcast.  At 100 TB the small side must stay broadcast-
    sized; for two large sides this becomes a range-bucketed join (see
    extensions.similarity for the banded pattern)."""
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    return part.join(
        F.broadcast(supplier), part.p_retailprice > supplier.s_acctbal
    ).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q17_cross_join",
    "SELECT COUNT(*) AS c FROM region CROSS JOIN nation",
)
def q17_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q18_asof_join",
    """SELECT e.event_id, MAX(CAST(c.ts AS TIMESTAMP)) AS asof_ts
       FROM events e LEFT JOIN events c
         ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
       GROUP BY e.event_id ORDER BY e.event_id, asof_ts""",
)
def q18_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 as-of join: latest 'click' at-or-before each event, per user.

    Declared (oracle) in range-join form; the Spark plan is a SINGLE window
    scan — a running MAX over a conditional column — which is O(n log n)
    with one shuffle on user_id, versus the oracle's O(n^2-per-user) range
    join.  This is the 100 TB-safe as-of strategy (no merge_asof UDF, no
    nested-loop join).  The default RANGE frame (UNBOUNDED PRECEDING ..
    CURRENT ROW) includes ties, matching the <= semantics exactly.
    """
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return (
        events.withColumn(
            "asof_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .select("event_id", "asof_ts")
        .orderBy("event_id", "asof_ts")
    )


@register(
    "q19_correlated_subquery",
    """SELECT c_custkey FROM customer c
       WHERE c_acctbal > (
         SELECT CAST(ROUND(AVG(c2.c_acctbal), 2) AS DECIMAL(18,2))
         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
       ORDER BY c_custkey""",
)
def q19_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 scalar correlated subquery, expressed pre-decorrelated (the exact
    rewrite Catalyst performs): aggregate-then-join.  The R2 on the average
    makes the comparison threshold bit-identical across engines."""
    customer = load(spark, sf_dir, "customer")
    nation_avg = customer.groupBy("c_nationkey").agg(
        r2d(F.avg("c_acctbal")).alias("nation_avg")
    ).withColumnRenamed("c_nationkey", "nk")
    return (
        customer.join(F.broadcast(nation_avg), customer.c_nationkey == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "q19b_correlated_sql",
    """SELECT c_custkey FROM customer c
       WHERE c_acctbal > (
         SELECT CAST(ROUND(AVG(c2.c_acctbal), 2) AS DECIMAL(18,2))
         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
       ORDER BY c_custkey""",
)
def q19b_correlated_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19b the same correlated scalar subquery as SQL TEXT, so Catalyst's
    own decorrelation rewrites it (RewriteCorrelatedScalarSubquery) — the
    engine-visible proof that the subquery surface works un-rewritten.
    Same declared oracle as Q19."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_cust_corr")
    return spark.sql(
        """SELECT c_custkey FROM _cust_corr c
           WHERE c_acctbal > (
             SELECT CAST(ROUND(AVG(c2.c_acctbal), 2) AS DECIMAL(18,2))
             FROM _cust_corr c2 WHERE c2.c_nationkey = c.c_nationkey)
           ORDER BY c_custkey"""
    )


@register(
    "q20_window_rank",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey,
                CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
         FROM orders) t
       WHERE rn <= 2 ORDER BY o_custkey, rn, o_orderkey""",
)
def q20_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 ranking window + filter.  Spark's WindowGroupLimit pushes the
    rn<=2 limit into the shuffle (partial top-k per map task) — this is why
    the window form beats a self-join at scale."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn", "o_orderkey")
    )


@register(
    "q21_window_lag",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey,
                LAG(o_orderkey) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
         FROM orders ORDER BY o_custkey, o_orderkey, prev LIMIT 500
       ) ORDER BY o_custkey, o_orderkey, prev""",
)
def q21_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.lag("o_orderkey").over(w).alias("prev"))
        .orderBy("o_custkey", "o_orderkey", "prev")
        .limit(500)
    )


@register(
    "q22_window_frame",
    """SELECT o_orderkey,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DECIMAL(18,2)) AS s
       FROM orders ORDER BY o_orderkey, s""",
)
def q22_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 framed window aggregate (sliding 3-row sum).  Decimal input keeps
    the frame sum exact regardless of evaluation order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", r2(F.sum(dec("o_totalprice")).over(w)).alias("s"))
        .orderBy("o_orderkey", "s")
    )


# --------------------------------------------------------------------------
# Sort / limit / set operations
# --------------------------------------------------------------------------


@register(
    "q23_sort_limit",
    """SELECT o_orderkey FROM (
         SELECT o_orderkey FROM orders
         ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey LIMIT 200
       ) ORDER BY o_orderkey""",
)
def q23_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23 multi-key sort + limit -> TakeOrderedAndProject (per-partition
    top-k then driver merge; never a global sort)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(200)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "q25_union_distinct",
    """SELECT COUNT(*) AS c FROM (
         SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey AS k FROM supplier)""",
)
def q25_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return customer.union(supplier).distinct().agg(F.count(F.lit(1)).alias("c"))


@register(
    "q25_union_all",
    """SELECT COUNT(*) AS c FROM (
         SELECT c_nationkey AS k FROM customer
         UNION ALL SELECT s_nationkey AS k FROM supplier)""",
)
def q25_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return customer.unionAll(supplier).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q26_intersect",
    """SELECT COUNT(*) AS c FROM (
         SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey AS k FROM supplier)""",
)
def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return customer.intersect(supplier).agg(F.count(F.lit(1)).alias("c"))


@register(
    "q26_except",
    """SELECT COUNT(*) AS c FROM (
         SELECT c_nationkey AS k FROM customer
         EXCEPT SELECT s_nationkey AS k FROM supplier)""",
)
def q26_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep surplus duplicates)
    return customer.subtract(supplier).agg(F.count(F.lit(1)).alias("c"))


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------


@register(
    "q27_string_funcs",
    """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 5)) AS u,
          CAST(LENGTH(p_name) AS BIGINT) AS l,
          p_brand || '-' || p_type AS bt
       FROM part ORDER BY p_partkey, u, l, bt""",
)
def q27_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("u"),
            F.length("p_name").cast("long").alias("l"),
            F.concat_ws("-", "p_brand", "p_type").alias("bt"),
        )
        .orderBy("p_partkey", "u", "l", "bt")
    )


@register(
    "q28_date_funcs",
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
          COUNT(*) AS c
       FROM orders GROUP BY 1, 2 ORDER BY y, m, c""",
)
def q28_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("y", "m", "c")
    )


@register(
    "q29_math_funcs",
    """SELECT * FROM (
         SELECT l_orderkey,
                CAST(ROUND(SQRT(l_quantity), 2) AS DECIMAL(18,2)) AS sq,
                CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
                CAST(ROUND(ABS(l_discount - 0.05), 2) AS DECIMAL(18,2)) AS ad
         FROM lineitem ORDER BY l_orderkey, sq, fl, ad LIMIT 500
       ) ORDER BY l_orderkey, sq, fl, ad""",
)
def q29_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            r2d(F.sqrt("l_quantity")).alias("sq"),
            F.floor("l_extendedprice").cast("long").alias("fl"),
            r2d(F.abs(F.col("l_discount") - 0.05)).alias("ad"),
        )
        .orderBy("l_orderkey", "sq", "fl", "ad")
        .limit(500)
    )


@register(
    "q30_array_funcs",
    """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS d,
          CAST(ROUND(embedding[1], 2) AS DECIMAL(18,2)) AS e0
       FROM embeddings ORDER BY vec_id, d, e0""",
)
def q30_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q30 array functions over the list<float> embedding column.
    (DuckDB arrays are 1-indexed; Spark element_at(,1) matches.)"""
    return (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("d"),
            r2d(F.element_at("embedding", 1).cast("double")).alias("e0"),
        )
        .orderBy("vec_id", "d", "e0")
    )


@register(
    "q31_explode",
    """SELECT doc_id, COUNT(*) AS words FROM (
         SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
         FROM documents WHERE doc_id < 10)
       GROUP BY doc_id ORDER BY doc_id, words""",
)
def q31_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31 explode / lateral view (UDTF shape): split-then-explode is the
    Spark-native UNNEST."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("words"))
        .orderBy("doc_id", "words")
    )


_JSON_K_SQL = """SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS c
    FROM events GROUP BY event_type ORDER BY event_type, k_sum, c"""


@register("q32_map_funcs", _JSON_K_SQL)
def q32_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q32 map functions: parse props JSON into map<string,string>, then
    element_at — exercises MapType end-to-end."""
    return (
        load(spark, sf_dir, "events")
        .withColumn("m", F.from_json("props", "map<string,string>"))
        .withColumn("k", F.element_at("m", "k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("c"))
        .orderBy("event_type", "k_sum", "c")
    )


@register("q33_json_funcs", _JSON_K_SQL)
def q33_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q33 JSON path extraction (get_json_object), same declared result as
    Q32 — two engine paths, one oracle."""
    return (
        load(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("c"))
        .orderBy("event_type", "k_sum", "c")
    )


@register(
    "q34_conditional_funcs",
    """SELECT * FROM (
         SELECT o_orderkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS t,
                COALESCE(NULLIF(o_orderstatus, 'O'), 'X') AS s,
                CAST(GREATEST(o_custkey, 100) AS BIGINT) AS g
         FROM orders ORDER BY o_orderkey, t, s, g LIMIT 300
       ) ORDER BY o_orderkey, t, s, g""",
)
def q34_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34 cast/coalesce/nullif/greatest.  FLOOR before the BIGINT cast:
    Spark truncates double->long but DuckDB rounds, so the declared form
    floors explicitly on both sides."""
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.floor("o_totalprice").cast("long").alias("t"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("X")).alias("s"),
            F.greatest("o_custkey", F.lit(100)).cast("long").alias("g"),
        )
        .orderBy("o_orderkey", "t", "s", "g")
        .limit(300)
    )


@register(
    "q35_distinct",
    "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
)
def q35_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
    )


@register(
    "q36_sample_twin",
    "SELECT COUNT(*) AS c FROM lineitem WHERE l_orderkey % 10 = 0",
)
def q36_sample_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q36 deterministic-sample twin (hash-mod filter); ``sample`` below is
    the production Bernoulli sampler, validated engine-side only (seeded
    sampling is not bit-stable across engines)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .agg(F.count(F.lit(1)).alias("c"))
    )


def sample(spark: SparkSession, sf_dir: str, fraction: float = 0.1) -> DataFrame:
    """Q36 production form: seeded Bernoulli sample."""
    return load(spark, sf_dir, "lineitem").sample(fraction=fraction, seed=42)


@register(
    "q37_pivot",
    """SELECT l_returnflag,
          CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DECIMAL(18,2)) AS o_qty,
          CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DECIMAL(18,2)) AS f_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag, o_qty, f_qty""",
)
def q37_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q37 pivot with an explicit value list (never let pivot scan for
    distinct values at 100 TB — pass the list)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec("l_quantity")), 2).cast(DEC))
        .select(
            "l_returnflag",
            F.col("O").alias("o_qty"),
            F.col("F").alias("f_qty"),
        )
        .orderBy("l_returnflag", "o_qty", "f_qty")
    )
