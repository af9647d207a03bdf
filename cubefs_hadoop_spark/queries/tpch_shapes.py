"""Adapted TPC-H query shapes T04-T22 over the simplified fixture schema.

The reference's documented purpose is to host full SQL engines (Spark, Hive,
Presto/Trino, Flink — reference README.md:61-88), whose canonical workload
is TPC-H.  SURVEY §2B covers each operator once (Q01-Q37); this module adds
the *composed* multi-operator shapes of the classic queries, adapted to the
columns the fixtures actually carry (no partsupp, no commit/receipt dates —
see FIXTURES.md): 4-6-way joins, semi-join with non-equi residual,
having-over-join, scalar-subquery + anti-join, ratio aggregates.

Scale notes: dimension sides (region, nation) are broadcast explicitly;
fact-fact joins shuffle on their natural keys and AQE picks SMJ/broadcast by
runtime size; every date filter sits directly above the scan so it is pushed
to parquet (min/max row-group skipping at 100 TB).  Money aggregates follow
the repo determinism contract: per-row DECIMAL(18,2) casts so sums are
exact and order-independent; double-typed ratios go through r2d().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.queries.registry import register
from cubefs_hadoop_spark.queries.relational import _REV_SQL, _rev, dec, r2, r2d


def _ts(s: str) -> Column:
    """Timestamp-NTZ literal matching the fixtures' timestamp columns."""
    return F.lit(s).cast("timestamp_ntz")


@register(
    "t04_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS c FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority ORDER BY o_orderpriority, c""",
)
def t04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority histogram of orders with a late-shipping
    line.  EXISTS becomes a left-semi join whose condition carries the
    non-equi residual (l_shipdate > o_orderdate); the date range is pushed
    to the orders scan, and the semi join shrinks output to one row per
    order before the aggregate."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (lineitem.l_orderkey == orders.o_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("o_orderpriority", "c")
    )


@register(
    "t05_local_supplier_volume",
    f"""SELECT n_name, CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY n_name, revenue""",
)
def t05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue by nation where the supplier is
    local to the customer.  region|nation are broadcast (tiny at any scale);
    the supplier join carries the locality condition; the big lineitem-
    orders join shuffles on the order key with the year filter already
    applied to orders (pushed to parquet)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    customer = (
        load(spark, sf_dir, "customer")
        .join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("rev")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(r2(F.sum("rev")).alias("revenue"))
        .orderBy("n_name", "revenue")
    )


@register(
    "t07_volume_shipping",
    f"""SELECT supp_nation, cust_nation, l_year,
               CAST(ROUND(SUM(volume), 2) AS DECIMAL(18,2)) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(YEAR(l_shipdate) AS INT) AS l_year,
                     {_REV_SQL} AS volume
              FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year, revenue""",
)
def t07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.  The
    two-nation filter is applied to the *dimension* sides before joining, so
    supplier and customer shrink to ~2/25 of their rows ahead of the fact
    joins; the OR pair condition runs on the tiny post-join rowset."""
    two = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
    )
    supplier = (
        load(spark, sf_dir, "supplier")
        .join(two, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    customer = (
        load(spark, sf_dir, "customer")
        .join(two, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("l_year"),
        _rev().alias("volume"),
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(r2(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year", "revenue")
    )


@register(
    "t08_market_share",
    f"""SELECT o_year,
               CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                        THEN volume ELSE 0 END) AS DOUBLE)
                          / CAST(SUM(volume) AS DOUBLE), 2)
                    AS DECIMAL(18,2)) AS mkt_share
        FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                     {_REV_SQL} AS volume, n1.n_name AS supp_nation
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region ON n2.n_regionkey = r_regionkey
              WHERE r_name = 'AMERICA')
        GROUP BY o_year ORDER BY o_year, mkt_share""",
)
def t08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of revenue from AMERICA-region
    customers, by order year.  Numerator and denominator come out of ONE
    aggregation pass (conditional sum), not two scans; the region filter
    shrinks the customer side before the fact joins."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation = load(spark, sf_dir, "nation")
    am_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("cn_key")
        )
    )
    customer = (
        load(spark, sf_dir, "customer")
        .join(am_nations, F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(
            nation.select(F.col("n_nationkey").alias("sn_key"), "n_name"),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("volume")
    )
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0))
    ).cast("double")
    den = F.sum("volume").cast("double")
    return (
        joined.groupBy("o_year")
        .agg(r2d(num / den).alias("mkt_share"))
        .orderBy("o_year", "mkt_share")
    )


@register(
    "t10_returned_items",
    f"""SELECT c_custkey, c_name, n_name, revenue FROM
        (SELECT c_custkey, c_name, n_name,
                CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20)
        ORDER BY c_custkey, c_name, n_name, revenue""",
)
def t10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter.  Both selective predicates (quarter, returnflag) sit directly
    on their scans; the top-20 is TakeOrderedAndProject (partial top-k per
    partition, no global sort); revenue is an exact decimal so the
    DESC-ordering tiebreak is engine-independent."""
    customer = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    top = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r2(F.sum(_rev())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
    return top.orderBy("c_custkey", "c_name", "n_name", "revenue")


@register(
    "t14_promo_revenue",
    f"""SELECT CAST(ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                              THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                         / CAST(SUM({_REV_SQL}) AS DOUBLE), 2)
                   AS DECIMAL(18,2)) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'""",
)
def t14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of revenue from PROMO parts in a half-year.
    Single join + single aggregation pass (conditional numerator); the
    shipdate window is pushed to the lineitem scan.  part joins on its key —
    broadcast at test SF, AQE-chosen at 100 TB where part is large."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-07-01"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))
    ).cast("double")
    den = F.sum(_rev()).cast("double")
    return joined.agg(r2d(F.lit(100.0) * num / den).alias("promo_revenue"))


@register(
    "t18_large_volume_customer",
    """SELECT c_custkey, o_orderkey,
              CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS total,
              CAST(ROUND(sum_qty, 2) AS DECIMAL(18,2)) AS sum_qty
       FROM orders
       JOIN customer ON c_custkey = o_custkey
       JOIN (SELECT l_orderkey,
                    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200) big
       ON o_orderkey = l_orderkey
       ORDER BY c_custkey, o_orderkey, total, sum_qty""",
)
def t18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 200.  The
    aggregate-with-having runs BELOW the joins, so only qualifying orders
    (~6% of orders) reach the customer join — aggregate-below-join is the
    100 TB-critical property here."""
    big = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            r2d(F.col("o_totalprice")).alias("total"),
            r2(F.col("sum_qty")).alias("sum_qty"),
        )
        .orderBy("c_custkey", "o_orderkey", "total", "sum_qty")
    )


@register(
    "t22_sales_opportunity",
    """SELECT c_nationkey, COUNT(*) AS numcust,
              CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                   AS DECIMAL(18,2)) AS totacctbal
       FROM customer
       WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01')
       GROUP BY c_nationkey ORDER BY c_nationkey, numcust, totacctbal""",
)
def t22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, by nation.  The scalar average broadcasts as a 1-row cross
    join; the NOT EXISTS is a left-anti join against the date-filtered
    orders (filter pushed to the orders scan, anti side shrunk before the
    shuffle)."""
    customer = load(spark, sf_dir, "customer")
    thr = F.broadcast(
        customer.filter(F.col("c_acctbal") > 0).agg(
            F.avg("c_acctbal").alias("thr")
        )
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    ).select("o_custkey")
    return (
        customer.crossJoin(thr)
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            r2(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("c_nationkey", "numcust", "totacctbal")
    )
