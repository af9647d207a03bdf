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
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register
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


@register(
    "t06_forecast_revenue",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_discount AS DECIMAL(18,2))), 2)
                   AS DECIMAL(18,2)) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def t06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.  All three
    predicates push to the parquet scan (shipdate min/max row-group skipping
    carries the year filter at 100 TB); the aggregate is a single partial+
    final sum over exact decimals."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return lineitem.agg(
        r2(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue")
    )


@register(
    "t09_product_profit",
    f"""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year, profit""",
)
def t09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp cost side in the fixtures, so
    profit = revenue): per-nation-per-year revenue on a part-name substring.
    The LIKE filter shrinks part BEFORE the fact join; supplier->nation is a
    broadcast chain; the lineitem-orders join shuffles on the order key."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_nation = F.broadcast(
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev().alias("rev")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "o_year")
        .agg(r2(F.sum("rev")).alias("profit"))
        .orderBy("nation", "o_year", "profit")
    )


@register(
    "t12_priority_shipping",
    """SELECT l_linestatus,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate > o_orderdate
         AND l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY l_linestatus ORDER BY l_linestatus, high_count, low_count""",
)
def t12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: fixtures carry no l_shipmode, so the group
    key is l_linestatus): priority mix of late-shipped lines in a year.
    The shipdate range is pushed to the lineitem scan; the late-shipping
    residual (l_shipdate > o_orderdate) rides the equi-join; the CASE
    counts come out of one aggregation pass."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    return (
        lineitem.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("l_linestatus", "high_count", "low_count")
    )


@register(
    "t13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey)
       GROUP BY c_count ORDER BY c_count, custdist""",
)
def t13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, including
    zero-order customers (the left join's NULL rows count as 0 via
    COUNT(column)).  Double aggregation: the first shuffles on c_custkey,
    the second on the tiny count domain (~dozens of values), so the second
    exchange is negligible at any scale."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy("c_count", "custdist")
    )


@register(
    "t15_top_supplier",
    f"""WITH revenue AS (
          SELECT l_suppkey,
                 CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey, s_name, total_revenue""",
)
def t15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The revenue aggregate is computed ONCE and reused for both the max
    scalar and the equality filter (Spark reuses the exchange; at scale,
    persist() would pin it).  Exact-decimal revenue makes the max-equality
    comparison engine-independent — never compare raw double aggregates."""
    revenue = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(r2(F.sum(_rev())).alias("total_revenue"))
    )
    best = F.broadcast(revenue.agg(F.max("total_revenue").alias("best")))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(best)
        .filter(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "t16_supplier_relationship",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY p_brand, p_type, p_size, supplier_cnt""",
)
def t16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem stands in for partsupp as the
    part<->supplier relation): distinct-supplier counts per part class,
    excluding suppliers from a NOT IN subquery.  The exclusion list is a
    broadcast anti-join (s_suppkey is non-null, so NOT IN == anti join);
    both part predicates push to the part scan before the fact join."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    lineitem = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy("p_brand", "p_type", "p_size", "supplier_cnt")
    )


@register(
    "t17_small_quantity_revenue",
    """SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                              AS DOUBLE) / 7.0, 2) AS DECIMAL(18,2)) AS avg_yearly
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand = 'Brand#1'
         AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                           WHERE l2.l_partkey = lineitem.l_partkey)""",
)
def t17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of below-one-fifth-of-average-quantity
    orders for one brand.  The correlated per-part average is an
    aggregate-below-join (groupBy l_partkey, then equi-join back), not a
    per-row subquery.  l_quantity holds integer values, so the per-part
    AVG over doubles is exact and order-independent — safe to compare
    across engines.  At 100 TB the avg aggregate would be semi-joined to
    the brand's parts first; here the agg input is already one scan."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    thr = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thr, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            r2d(
                F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "t19_discounted_revenue",
    f"""SELECT CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)""",
)
def t19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive predicates spanning both join sides.
    The OR cannot push through the join as-is, so each side gets its
    IMPLIED single-table disjunction pushed to its scan (brand in {1,2}
    with the size bound; quantity in the union range) — the classic Q19
    rewrite — and the full disjunction evaluates on the joined rows."""
    part = load(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25))
    ).select("p_partkey", "p_brand", "p_size")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 11) | F.col("l_quantity").between(10, 20)
    ).select("l_partkey", "l_quantity", _rev().alias("rev"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(r2(F.sum("rev")).alias("revenue"))
    )


@register(
    "t20_part_promotion",
    """SELECT s_suppkey, s_name FROM supplier
       WHERE s_suppkey IN (
         SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_name LIKE '%red%'
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_suppkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
       ORDER BY s_suppkey, s_name""",
)
def t20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: lineitem volume stands in for partsupp
    availability): suppliers who moved >100 units of red parts in a year.
    IN-subquery becomes a left-semi join against the HAVING aggregate;
    the part-name filter is broadcast into the fact scan side."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    movers = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey", "s_name")
    )


@register(
    "t21_waiting_supplier",
    """SELECT s_name, numwait FROM (
         SELECT s_name, COUNT(*) AS numwait
         FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 100)
       ORDER BY s_name, numwait""",
)
def t21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: l_shipdate > o_orderdate stands in for the
    receipt-after-commit lateness the fixtures don't carry): suppliers who
    were the SOLE late shipper on finished multi-supplier orders.  The
    doubly-correlated EXISTS / NOT EXISTS become a left-semi and a
    left-anti self-join on the order key; both self-join sides shuffle on
    l_orderkey, so at 100 TB all three lineitem passes co-partition and
    AQE reuses the exchange."""
    l1 = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l2 = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    base = l1.join(
        orders,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
    )
    candidates = base.join(
        l2,
        (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("k3") == F.col("l_orderkey"))
        & (F.col("s3") != F.col("l_suppkey"))
        & (F.col("d3") > F.col("o_orderdate")),
        "left_anti",
    )
    supplier = F.broadcast(
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    top = (
        candidates.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
    return top.orderBy("s_name", "numwait")


# -- r13 extensions over the TPC-H star (x100/x101/x104) ---------------------
#
# Three operational-analytics shapes the t04-t22 family doesn't cover:
# exact order-statistics at order grain (x100, the ranking machinery's
# first TPC-H-side caller), customer-loyalty shares (x101), and a
# two-role fact aggregation joined back through opposite dimension
# paths (x104).


_X100_ORACLE = """
WITH s AS (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
           FROM lineitem GROUP BY 1),
d AS (SELECT o_orderpriority,
             CAST(CAST(last_ship AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT) AS days
      FROM orders JOIN s ON l_orderkey = o_orderkey),
r AS (SELECT o_orderpriority, days,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY days) AS rn FROM d),
n AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM d GROUP BY 1)
SELECT o_orderpriority, n_orders,
       CAST(MAX(CASE WHEN rn = 1 + (n_orders - 1) * 50 // 100
                     THEN days END) AS BIGINT) AS p50_days,
       CAST(MAX(CASE WHEN rn = 1 + (n_orders - 1) * 90 // 100
                     THEN days END) AS BIGINT) AS p90_days
FROM r JOIN n USING (o_orderpriority)
GROUP BY o_orderpriority, n_orders
ORDER BY o_orderpriority, n_orders, p50_days, p90_days"""


@register("x100_fulfillment_latency", _X100_ORACLE)
def x100_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100 order fulfillment latency: exact discrete p50/p90 days from
    order date to the order's LAST line shipment, per order priority —
    the SLA table next to t04's late-line histogram.  One partial-agg'd
    groupBy(orderkey) over lineitem, an order-grain equi-join, then the
    shared banded percentile machinery (never an order-grain sort; the
    priority domain is 5 values but no task keys on it)."""
    from cubefs_hadoop_spark.extensions.ranking import (
        grouped_exact_percentiles,
    )

    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    d = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    return (
        grouped_exact_percentiles(
            d, "days", ["o_orderpriority"], quantiles=(50, 90)
        )
        .select(
            "o_orderpriority",
            F.col("n").alias("n_orders"),
            F.col("p50").alias("p50_days"),
            F.col("p90").alias("p90_days"),
        )
        .orderBy("o_orderpriority", "n_orders", "p50_days", "p90_days")
    )


_X101_ORACLE = """
WITH oc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1),
j AS (SELECT c_mktsegment, n_orders
      FROM customer JOIN oc ON c_custkey = o_custkey),
s AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_buyers,
             CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS repeat_buyers
      FROM j GROUP BY 1),
r AS (SELECT c_mktsegment, n_orders,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n_orders) AS rn FROM j)
SELECT c_mktsegment, n_buyers, repeat_buyers,
       CAST(1000 * repeat_buyers // n_buyers AS BIGINT)
           AS repeat_share_milli,
       CAST(MAX(CASE WHEN rn = 1 + (n_buyers - 1) * 50 // 100
                     THEN n_orders END) AS BIGINT) AS p50_orders,
       CAST(MAX(CASE WHEN rn = 1 + (n_buyers - 1) * 90 // 100
                     THEN n_orders END) AS BIGINT) AS p90_orders
FROM r JOIN s USING (c_mktsegment)
GROUP BY c_mktsegment, n_buyers, repeat_buyers, repeat_share_milli
ORDER BY c_mktsegment, n_buyers, repeat_buyers, repeat_share_milli,
         p50_orders, p90_orders"""


@register("x101_segment_loyalty", _X101_ORACLE)
def x101_segment_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101 customer loyalty by market segment: buyers, repeat buyers
    (>= 2 orders), exact milli repeat share, and exact p50/p90 orders
    per buyer — orders collapse to customer grain FIRST (one
    partial-agg'd groupBy), then one customer-grain equi-join against
    the segment column; percentiles on the shared banded machinery."""
    from cubefs_hadoop_spark.extensions.ranking import (
        grouped_exact_percentiles,
    )

    oc = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = cust.join(oc, cust.c_custkey == oc.o_custkey).select(
        "c_mktsegment", "n_orders"
    )
    s = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_buyers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("repeat_buyers"),
    )
    pct = grouped_exact_percentiles(
        j, "n_orders", ["c_mktsegment"], quantiles=(50, 90)
    ).select(
        "c_mktsegment",
        F.col("p50").alias("p50_orders"),
        F.col("p90").alias("p90_orders"),
    )
    return (
        s.join(pct, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_buyers",
            "repeat_buyers",
            F.expr("1000 * repeat_buyers div n_buyers")
            .cast("long")
            .alias("repeat_share_milli"),
            "p50_orders",
            "p90_orders",
        )
        .orderBy(
            "c_mktsegment",
            "n_buyers",
            "repeat_buyers",
            "repeat_share_milli",
            "p50_orders",
            "p90_orders",
        )
    )


_X104_ORACLE = f"""
WITH exp AS (
  SELECT s_nationkey AS nk,
         CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS export_rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1),
imp AS (
  SELECT c_nationkey AS nk,
         CAST(ROUND(SUM({_REV_SQL}), 2) AS DECIMAL(18,2)) AS import_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1)
SELECT n_name,
       COALESCE(export_rev, CAST(0 AS DECIMAL(18,2))) AS export_rev,
       COALESCE(import_rev, CAST(0 AS DECIMAL(18,2))) AS import_rev,
       CAST(COALESCE(export_rev, CAST(0 AS DECIMAL(18,2)))
            - COALESCE(import_rev, CAST(0 AS DECIMAL(18,2)))
            AS DECIMAL(18,2)) AS balance
FROM nation
LEFT JOIN exp ON nk = n_nationkey
LEFT JOIN imp ON imp.nk = n_nationkey
ORDER BY n_name, export_rev, import_rev, balance"""


@register("x104_nation_trade_balance", _X104_ORACLE)
def x104_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104 nation trade balance: each nation's revenue as SUPPLIER
    (export — lineitem through the supplier dimension) vs as CUSTOMER
    (import — lineitem through orders->customer), and the difference.
    The same fact table aggregated through two OPPOSITE dimension
    paths: both sides partial-agg to nation grain before the tiny
    broadcast join against nation; per-row DECIMAL casts keep the sums
    exact and order-independent.

    r15 family sweep: exp/imp are nation-grain (<= 25 rows at ANY
    corpus scale — nation is a fixed domain), so the left joins carry
    explicit broadcast hints instead of the size-estimated
    SortMergeJoin (guide §3.1).  widen_for_cpu on the lineitem passes
    was measured and REJECTED (1.06 -> 1.99 s: the fanned decimal map
    does not pay for shuffling 600k raw rows through two passes —
    unlike q06, whose agg shuffle is 6 rows)."""
    li = load(spark, sf_dir, "lineitem")
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
        "_rev"
    )
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    exp = (
        li.select("l_suppkey", rev)
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(r2(F.sum("_rev")).alias("export_rev"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    imp = (
        li.select("l_orderkey", rev)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(r2(F.sum("_rev")).alias("import_rev"))
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        nation.join(
            F.broadcast(exp), F.col("n_nationkey") == exp.nk, "left"
        )
        .drop("nk")
        .join(F.broadcast(imp), F.col("n_nationkey") == imp.nk, "left")
        .select(
            "n_name",
            F.coalesce("export_rev", zero).alias("export_rev"),
            F.coalesce("import_rev", zero).alias("import_rev"),
            (
                F.coalesce("export_rev", zero)
                - F.coalesce("import_rev", zero)
            )
            .cast("decimal(18,2)")
            .alias("balance"),
        )
        .orderBy("n_name", "export_rev", "import_rev", "balance")
    )


_X106_TIERS = (10, 100, 500)

_X106_ORACLE = f"""
WITH s AS (
  SELECT l_suppkey,
         CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS u
  FROM lineitem GROUP BY 1),
r AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u DESC, l_suppkey) AS rn
      FROM s),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(u) AS BIGINT)
          AS tot FROM s),
t AS (SELECT UNNEST([{', '.join(str(k) for k in _X106_TIERS)}])
          AS tier_milli),
j AS (SELECT t.tier_milli, n.ns, n.tot,
             CAST(COALESCE(SUM(CASE WHEN r.rn <= n.ns * t.tier_milli // 1000
                                    THEN r.u END), 0) AS BIGINT) AS rev_u
      FROM t CROSS JOIN n CROSS JOIN r
      GROUP BY 1, 2, 3)
SELECT CAST(tier_milli AS BIGINT) AS tier_milli,
       CAST(ns * tier_milli // 1000 AS BIGINT) AS suppliers,
       rev_u AS revenue_dmc,
       CASE WHEN tot = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(CAST(1000 AS HUGEINT) * rev_u // tot AS BIGINT)
       END AS share_milli
FROM j ORDER BY tier_milli, suppliers, revenue_dmc, share_milli"""


@register("x106_supplier_concentration", _X106_ORACLE)
def x106_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X106 supplier revenue concentration: exact milli revenue share
    of the top 1%/10%/50% of suppliers — x92's Pareto machinery on the
    TPC-H side.  Revenue in exact decimilli-cent integers (the scale-4
    DECIMAL sum scaled to an integer — no rounding ambiguity across
    engines); tier membership by the skew-proof distributed rank
    (revenue DESC, suppkey tiebreak); 128-bit share arithmetic.

    Scale: lineitem collapses to supplier grain in ONE partial agg; the
    rank is banded (never a single-task sort); the tier cut row counts
    ride as plan literals (the x52/x92 pattern)."""
    from cubefs_hadoop_spark.extensions.intmath import spark_exact_floordiv
    from cubefs_hadoop_spark.extensions.ranking import distributed_rank
    from cubefs_hadoop_spark.plans.materialize import barrier

    li = load(spark, sf_dir, "lineitem")
    s = (
        li.select(
            "l_suppkey",
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "_rev"
            ),
        )
        .groupBy("l_suppkey")
        .agg((F.sum("_rev") * 10000).cast("long").alias("u"))
    )
    s = barrier(s, eager=False)  # feeds the totals AND the rank
    ns, tot = s.agg(
        F.count(F.lit(1)), F.coalesce(F.sum("u"), F.lit(0))
    ).first()
    if int(ns) == 0:
        return spark.createDataFrame(
            [],
            "tier_milli long, suppliers long, revenue_dmc long,"
            " share_milli long",
        )
    ranked = distributed_rank(s, "u", "l_suppkey", descending=True)
    cuts = {k: (int(ns) * int(k)) // 1000 for k in _X106_TIERS}
    agg = ranked.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("rank") <= cuts[k], F.col("u"))),
                F.lit(0),
            ).cast("long").alias(f"c{k}")
            for k in _X106_TIERS
        ]
    )
    stack = ", ".join(
        f"CAST({int(k)} AS BIGINT), CAST({cuts[k]} AS BIGINT), c{k}"
        for k in _X106_TIERS
    )
    rows = agg.selectExpr(
        f"stack({len(_X106_TIERS)}, {stack})"
        " AS (tier_milli, suppliers, revenue_dmc)"
    )
    share = (
        F.lit(0).cast("long")
        if int(tot) == 0
        else F.expr(spark_exact_floordiv([1000, "revenue_dmc"], [int(tot)]))
    )
    return rows.select(
        "tier_milli", "suppliers", "revenue_dmc",
        share.alias("share_milli"),
    ).orderBy("tier_milli", "suppliers", "revenue_dmc", "share_milli")


_X109_ORACLE = f"""
WITH pk AS (
  SELECT l_partkey, CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS u
  FROM lineitem GROUP BY 1),
m AS (SELECT p_type, CAST(SUM(u) AS BIGINT) AS revenue_dmc
      FROM pk JOIN part ON l_partkey = p_partkey GROUP BY 1),
t AS (SELECT CAST(SUM(revenue_dmc) AS BIGINT) AS tot FROM m)
SELECT p_type, revenue_dmc,
       CAST(CAST(1000 AS HUGEINT) * revenue_dmc // t.tot AS BIGINT)
           AS share_milli
FROM m CROSS JOIN t
ORDER BY p_type, revenue_dmc, share_milli"""


@register("x109_part_type_revenue_mix", _X109_ORACLE)
def x109_part_type_revenue_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109 product-mix revenue: exact revenue (decimilli-cent
    integers) and milli share per part TYPE — the catalog composition
    table next to x103's corpus cross-tab.  Lineitem collapses to PART
    grain in one partial agg BEFORE the part join (the join input is
    catalog-sized, not fact-sized); the type rollup and share run on
    the ~150-row type frame; 128-bit share arithmetic.

    r15 family sweep: widen_for_cpu on the part-grain partial agg was
    measured and REJECTED (0.97 -> 1.08 s — the agg keeps ~200k part
    keys, so fanning the map stage just moves the full row set through
    an extra shuffle; q06's widen pays off only because its agg
    collapses to 6 groups)."""
    from cubefs_hadoop_spark.extensions.intmath import spark_exact_floordiv
    from cubefs_hadoop_spark.plans.materialize import barrier

    li = load(spark, sf_dir, "lineitem")
    pk = (
        li.select(
            "l_partkey",
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "_rev"
            ),
        )
        .groupBy("l_partkey")
        .agg((F.sum("_rev") * 10000).cast("long").alias("u"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    m = (
        pk.join(part, pk.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(F.sum("u").cast("long").alias("revenue_dmc"))
    )
    m = barrier(m, eager=False)  # feeds the total AND the output
    total = int(m.agg(F.coalesce(F.sum("revenue_dmc"), F.lit(0))).first()[0])
    if total == 0:
        return spark.createDataFrame(
            [], "p_type string, revenue_dmc long, share_milli long"
        )
    return m.select(
        "p_type",
        "revenue_dmc",
        F.expr(
            spark_exact_floordiv([1000, "revenue_dmc"], [total])
        ).alias("share_milli"),
    ).orderBy("p_type", "revenue_dmc", "share_milli")


# -- r14 extensions over the TPC-H star (x114-x117, x120, x121) --------------
#
# Pricing/fulfillment analytics the t04-t22 and x100-x113 families
# don't cover: the discount-band pricing curve (x114), customer
# reorder cadence (x115 — the TPC-H cousin of x91's event
# interarrival), the returns ledger by supplier nation (x116), the
# order-width histogram (x117), account-balance order statistics
# (x120), and the catalog price-spread table (x121).  All exact
# integer arithmetic; every fact-scale frame collapses in one partial
# agg before any join or window.


_X114_ORACLE = f"""
WITH b AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(l_quantity) AS BIGINT) AS quantity,
         CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS revenue_dmc
  FROM lineitem GROUP BY 1),
t AS (SELECT CAST(SUM(revenue_dmc) AS BIGINT) AS tot FROM b)
SELECT discount_pct, n_lines, quantity, revenue_dmc,
       CAST(CAST(1000 AS HUGEINT) * revenue_dmc // t.tot AS BIGINT)
           AS share_milli
FROM b CROSS JOIN t
ORDER BY discount_pct, n_lines, quantity, revenue_dmc, share_milli"""


@register("x114_discount_band_revenue", _X114_ORACLE)
def x114_discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114 discount-band pricing curve: per integer discount percent,
    line count, total quantity, exact decimilli-cent revenue, and milli
    revenue share — the table a pricing review reads before touching
    the discount ladder.  ONE partial-agg'd scan collapses the fact
    table to the <=101-row band frame; the share total is a
    driver-sized eager literal (the x109 pattern) feeding 128-bit
    exact floor division."""
    from cubefs_hadoop_spark.extensions.intmath import spark_exact_floordiv
    from cubefs_hadoop_spark.plans.materialize import barrier

    li = load(spark, sf_dir, "lineitem")
    b = (
        li.select(
            F.round(F.col("l_discount") * 100).cast("long").alias(
                "discount_pct"
            ),
            "l_quantity",
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "_rev"
            ),
        )
        .groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("quantity"),
            (F.sum("_rev") * 10000).cast("long").alias("revenue_dmc"),
        )
    )
    b = barrier(b, eager=False)  # feeds the total AND the output
    total = int(b.agg(F.coalesce(F.sum("revenue_dmc"), F.lit(0))).first()[0])
    if total == 0:
        return spark.createDataFrame(
            [],
            "discount_pct long, n_lines long, quantity long,"
            " revenue_dmc long, share_milli long",
        )
    return b.select(
        "discount_pct",
        "n_lines",
        "quantity",
        "revenue_dmc",
        F.expr(spark_exact_floordiv([1000, "revenue_dmc"], [total])).alias(
            "share_milli"
        ),
    ).orderBy(
        "discount_pct", "n_lines", "quantity", "revenue_dmc", "share_milli"
    )


_X115_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders),
g AS (SELECT CAST(CAST(o_orderdate AS DATE) - CAST(prev AS DATE) AS BIGINT)
          AS gap_days
      FROM o WHERE prev IS NOT NULL),
r AS (SELECT gap_days, ROW_NUMBER() OVER (ORDER BY gap_days) AS rn FROM g),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps FROM g)
SELECT n.n_gaps,
       CAST(MAX(CASE WHEN rn = 1 + (n_gaps - 1) * 50 // 100
                     THEN gap_days END) AS BIGINT) AS p50_days,
       CAST(MAX(CASE WHEN rn = 1 + (n_gaps - 1) * 90 // 100
                     THEN gap_days END) AS BIGINT) AS p90_days
FROM r CROSS JOIN n
GROUP BY n.n_gaps
ORDER BY n_gaps, p50_days, p90_days"""


@register("x115_customer_order_gaps", _X115_ORACLE)
def x115_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115 reorder cadence: exact discrete p50/p90 of the day gap
    between a customer's consecutive orders — the TPC-H cousin of
    x91's event interarrival (order-ledger grain, day resolution).
    ONE customer-keyed lag window (the sorted date sequence makes the
    gap multiset tie-order-independent), then the shared banded
    percentile machinery — no global sort at any grain."""
    from cubefs_hadoop_spark.extensions.ranking import (
        grouped_exact_percentiles,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d")
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = (
        o.withColumn("prev", F.lag("d").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.datediff("d", "prev").cast("long").alias("gap_days"))
    )
    return (
        grouped_exact_percentiles(g, "gap_days", (), quantiles=(50, 90))
        .select(
            F.col("n").alias("n_gaps"),
            F.col("p50").alias("p50_days"),
            F.col("p90").alias("p90_days"),
        )
        .orderBy("n_gaps", "p50_days", "p90_days")
    )


_X116_ORACLE = f"""
WITH s AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS returned_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_REV_SQL} ELSE 0 END)
              * 10000 AS BIGINT) AS returned_dmc
  FROM lineitem GROUP BY 1)
SELECT n_name,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(returned_lines) AS BIGINT) AS returned_lines,
       CAST(1000 * SUM(returned_lines) // SUM(n_lines) AS BIGINT)
           AS return_share_milli,
       CAST(SUM(returned_dmc) AS BIGINT) AS returned_dmc
FROM s JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name, n_lines, returned_lines, return_share_milli,
         returned_dmc"""


@register("x116_returns_by_nation", _X116_ORACLE)
def x116_returns_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X116 returns ledger by supplier nation: line counts, returned
    lines, exact milli return share, and returned revenue
    (decimilli-cents) — t10 locates WHO returns; x116 locates WHOSE
    SUPPLY comes back.  Lineitem collapses to SUPPLIER grain in one
    partial agg BEFORE the (broadcast) supplier and nation joins — the
    join input is dimension-sized at any corpus scale."""
    li = load(spark, sf_dir, "lineitem")
    ret = F.col("l_returnflag") == "R"
    s = (
        li.select(
            "l_suppkey",
            ret.alias("_r"),
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "_rev"
            ),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("_r").cast("long")).cast("long").alias(
                "returned_lines"
            ),
            (F.sum(F.when(F.col("_r"), F.col("_rev")).otherwise(F.lit(0)))
             * 10000).cast("long").alias("returned_dmc"),
        )
    )
    sup = F.broadcast(
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nat = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        s.join(sup, s.l_suppkey == sup.s_suppkey)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("returned_lines").cast("long").alias("returned_lines"),
            F.expr("1000 * sum(returned_lines) div sum(n_lines)")
            .cast("long")
            .alias("return_share_milli"),
            F.sum("returned_dmc").cast("long").alias("returned_dmc"),
        )
        .orderBy(
            "n_name", "n_lines", "returned_lines", "return_share_milli",
            "returned_dmc",
        )
    )


_X117_ORACLE = """
WITH o AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1),
h AS (SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM o GROUP BY 1),
t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tot FROM h)
SELECT n_items, n_orders,
       CAST(1000 * n_orders // t.tot AS BIGINT) AS share_milli
FROM h CROSS JOIN t
ORDER BY n_items, n_orders, share_milli"""


@register("x117_order_size_histogram", _X117_ORACLE)
def x117_order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X117 order-width histogram: how many line items an order carries
    (n_items, n_orders, milli share) — the basket-width companion to
    x110's session-depth histogram, at the order ledger's grain.  One
    partial-agg'd order-grain collapse, one histogram-sized rollup;
    the share total is a window over the <=10-row histogram frame
    (long-safe: it is a row count)."""
    li = load(spark, sf_dir, "lineitem")
    h = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .groupBy("n_items")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    return h.select(
        "n_items",
        "n_orders",
        F.expr("1000 * n_orders div sum(n_orders) over ()")
        .cast("long")
        .alias("share_milli"),
    ).orderBy("n_items", "n_orders", "share_milli")


_X120_ORACLE = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer),
r AS (SELECT c_mktsegment, cents,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents) AS rn FROM c),
n AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM c GROUP BY 1)
SELECT c_mktsegment, n_customers,
       CAST(MAX(CASE WHEN rn = 1 + (n_customers - 1) * 25 // 100
                     THEN cents END) AS BIGINT) AS p25_cents,
       CAST(MAX(CASE WHEN rn = 1 + (n_customers - 1) * 50 // 100
                     THEN cents END) AS BIGINT) AS p50_cents,
       CAST(MAX(CASE WHEN rn = 1 + (n_customers - 1) * 75 // 100
                     THEN cents END) AS BIGINT) AS p75_cents,
       CAST(MAX(CASE WHEN rn = 1 + (n_customers - 1) * 90 // 100
                     THEN cents END) AS BIGINT) AS p90_cents
FROM r JOIN n USING (c_mktsegment)
GROUP BY c_mktsegment, n_customers
ORDER BY c_mktsegment, n_customers, p25_cents, p50_cents, p75_cents,
         p90_cents"""


@register("x120_acctbal_percentiles", _X120_ORACLE)
def x120_acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 account-balance order statistics per market segment: exact
    discrete p25/p50/p75/p90 of customer balances in integer cents
    (negative balances included — the banded machinery floors
    negatives correctly) — x88's percentile profile pointed at the
    customer ledger.  One scan, the shared banded rank machinery, no
    customer-grain sort."""
    from cubefs_hadoop_spark.extensions.ranking import (
        grouped_exact_percentiles,
    )

    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (dec("c_acctbal") * 100).cast("long").alias("cents"),
    )
    return (
        grouped_exact_percentiles(
            c, "cents", ["c_mktsegment"], quantiles=(25, 50, 75, 90)
        )
        .select(
            "c_mktsegment",
            F.col("n").alias("n_customers"),
            F.col("p25").alias("p25_cents"),
            F.col("p50").alias("p50_cents"),
            F.col("p75").alias("p75_cents"),
            F.col("p90").alias("p90_cents"),
        )
        .orderBy(
            "c_mktsegment", "n_customers", "p25_cents", "p50_cents",
            "p75_cents", "p90_cents",
        )
    )


_X121_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS min_cents,
       CAST(MAX(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS max_cents,
       CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            // COUNT(*) AS BIGINT) AS avg_cents
FROM part GROUP BY p_brand
ORDER BY p_brand, n_parts, min_cents, max_cents, avg_cents"""


@register("x121_brand_price_spread", _X121_ORACLE)
def x121_brand_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X121 catalog price spread per brand: part count, exact
    min/max/floor-mean retail price in integer cents — the catalog
    pricing table next to x109's revenue mix.  ONE partial-agg'd
    catalog scan; exact integer mean via sum-div-count."""
    p = load(spark, sf_dir, "part").select(
        "p_brand", (dec("p_retailprice") * 100).cast("long").alias("cents")
    )
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
            F.expr("sum(cents) div count(1)").cast("long").alias(
                "avg_cents"
            ),
        )
        .orderBy("p_brand", "n_parts", "min_cents", "max_cents", "avg_cents")
    )


_X126_ORACLE = """
WITH m AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
p AS (SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS tot
      FROM m GROUP BY 1)
SELECT m.o_orderpriority, m.o_orderstatus, m.n,
       CAST(1000 * m.n // p.tot AS BIGINT) AS share_milli
FROM m JOIN p USING (o_orderpriority)
ORDER BY o_orderpriority, o_orderstatus, n, share_milli"""


@register("x126_priority_status_matrix", _X126_ORACLE)
def x126_priority_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126 priority x status cross-tab: order counts and exact milli
    WITHIN-priority shares — the operational backlog matrix beside
    t04's late-line counts (a priority whose open-status share grows is
    a fulfillment queue backing up).  One partial-agg'd rollup to the
    <=15-cell frame; the share window runs over that metadata frame."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return m.select(
        "o_orderpriority",
        "o_orderstatus",
        "n",
        F.expr("1000 * n div sum(n) over (partition by o_orderpriority)")
        .cast("long")
        .alias("share_milli"),
    ).orderBy("o_orderpriority", "o_orderstatus", "n", "share_milli")
