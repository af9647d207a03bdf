"""Extended function-family coverage (SURVEY §2B Q06/Q20/Q27-Q30 depth):
statistical aggregates, percentiles, additional window/string/date/array
functions.  Same determinism contract as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register
from cubefs_hadoop_spark.queries.relational import r2d


@register(
    "q06b_percentiles",
    """SELECT l_returnflag,
          CAST(ROUND(quantile_cont(l_quantity, 0.5), 2) AS DECIMAL(18,2)) AS p50,
          CAST(ROUND(quantile_cont(l_quantity, 0.9), 2) AS DECIMAL(18,2)) AS p90,
          CAST(MIN(l_quantity) AS DECIMAL(18,2)) AS mn,
          CAST(MAX(l_quantity) AS DECIMAL(18,2)) AS mx
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag, p50, p90, mn, mx""",
)
def q06b_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark `percentile` == DuckDB
    quantile_cont: linear interpolation).  For 100 TB use
    `approx_percentile` (t-digest sketch, constant memory) — exposed below,
    validated engine-side against the exact form."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            r2d(F.expr("percentile(l_quantity, 0.5)")).alias("p50"),
            r2d(F.expr("percentile(l_quantity, 0.9)")).alias("p90"),
            F.min("l_quantity").cast("decimal(18,2)").alias("mn"),
            F.max("l_quantity").cast("decimal(18,2)").alias("mx"),
        )
        .orderBy("l_returnflag", "p50", "p90", "mn", "mx")
    )


def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentile (scale path for q06b)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10000).alias("p50"),
            F.percentile_approx("l_quantity", 0.9, 10000).alias("p90"),
        )
    )


@register(
    "q06c_stats_aggs",
    """SELECT c_nationkey,
          CAST(ROUND(STDDEV_SAMP(c_acctbal), 2) AS DECIMAL(18,2)) AS sd,
          CAST(ROUND(VAR_SAMP(c_acctbal) / 1000, 2) AS DECIMAL(18,2)) AS vr_k,
          CAST(ROUND(CORR(c_acctbal, c_custkey), 2) AS DECIMAL(18,2)) AS cor,
          CAST(ROUND(COVAR_SAMP(c_acctbal, c_custkey) / 1000, 2) AS DECIMAL(18,2)) AS cov_k
       FROM customer GROUP BY c_nationkey
       ORDER BY c_nationkey, sd, vr_k, cor, cov_k""",
)
def q06c_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar, sample forms).
    Variance/covariance scaled by 1e3 before rounding so the R2 grid is
    meaningful for large magnitudes."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            r2d(F.stddev_samp("c_acctbal")).alias("sd"),
            r2d(F.var_samp("c_acctbal") / 1000).alias("vr_k"),
            r2d(F.corr("c_acctbal", "c_custkey")).alias("cor"),
            r2d(F.covar_samp("c_acctbal", "c_custkey") / 1000).alias("cov_k"),
        )
        .orderBy("c_nationkey", "sd", "vr_k", "cor", "cov_k")
    )


@register(
    "q20b_window_distribution",
    """SELECT o_orderkey,
          CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
          CAST(ROUND(PERCENT_RANK() OVER w, 2) AS DECIMAL(18,2)) AS pr,
          CAST(ROUND(CUME_DIST() OVER w, 2) AS DECIMAL(18,2)) AS cd,
          CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_k
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey, quartile, pr, cd, first_k""",
)
def q20b_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile, percent_rank, cume_dist,
    first_value — one shuffle on the partition key, single window pass."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            r2d(F.percent_rank().over(w)).alias("pr"),
            r2d(F.cume_dist().over(w)).alias("cd"),
            F.first("o_orderkey").over(w).cast("long").alias("first_k"),
        )
        .orderBy("o_orderkey", "quartile", "pr", "cd", "first_k")
    )


@register(
    "q27b_string_funcs2",
    """SELECT p_partkey,
          REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS rr,
          LPAD(p_brand, 12, '.') AS lp,
          REVERSE(p_type) AS rv,
          REPLACE(p_name, ' ', '-') AS tr,
          CAST(STRPOS(p_name, 'a') AS BIGINT) AS ps
       FROM part ORDER BY p_partkey, rr, lp, rv, tr, ps""",
)
def q27b_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: regexp_replace, lpad, reverse, replace,
    position-of-substring."""
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_replace("p_name", "[aeiou]", "_").alias("rr"),
            F.lpad("p_brand", 12, ".").alias("lp"),
            F.reverse("p_type").alias("rv"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("tr"),
            F.instr(F.col("p_name"), "a").cast("long").alias("ps"),
        )
        .orderBy("p_partkey", "rr", "lp", "rv", "tr", "ps")
    )


@register(
    "q28b_date_funcs2",
    """SELECT o_orderkey,
          CAST(QUARTER(o_orderdate) AS INT) AS q,
          CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
          CAST(LAST_DAY(o_orderdate) AS DATE) AS eom,
          CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus30,
          CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart
       FROM orders WHERE o_orderkey < 300
       ORDER BY o_orderkey, q, dow, eom, plus30, mstart""",
)
def q28b_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date family: quarter, dayofweek, last_day, interval
    arithmetic, month truncation.  DuckDB DAYOFWEEK is 0-based (Sunday=0)
    while Spark's is 1-based (Sunday=1); the oracle adds 1 to align.
    Likewise DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics (see q27b)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.quarter("o_orderdate").cast("int").alias("q"),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.last_day("o_orderdate").alias("eom"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus30"),
            F.date_trunc("month", "o_orderdate").alias("mstart"),
        )
        .orderBy("o_orderkey", "q", "dow", "eom", "plus30", "mstart")
    )


@register(
    "q30b_array_funcs2",
    """SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n,
          CAST(len(list_distinct(ws)) AS BIGINT) AS nd,
          CAST(list_contains(ws, 'spark') AS BOOLEAN) AS has_spark,
          list_sort(list_distinct(ws))[1] AS first_word,
          array_to_string(list_sort(list_distinct(ws))[1:3], ',') AS first3
       FROM (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents WHERE doc_id < 50)
       ORDER BY doc_id, n, nd, has_spark, first_word, first3""",
)
def q30b_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array family: size, array_distinct, array_contains,
    sort_array, slice, array_join — all JVM higher-order functions."""
    ws = F.split("text", " ")
    sorted_distinct = F.array_sort(F.array_distinct(ws))
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.size(ws).cast("long").alias("n"),
            F.size(F.array_distinct(ws)).cast("long").alias("nd"),
            F.array_contains(ws, "spark").alias("has_spark"),
            F.element_at(sorted_distinct, 1).alias("first_word"),
            F.array_join(F.slice(sorted_distinct, 1, 3), ",").alias("first3"),
        )
        .orderBy("doc_id", "n", "nd", "has_spark", "first_word", "first3")
    )


@register(
    "q20c_window_value_funcs",
    """SELECT o_custkey, o_orderkey,
          CAST(NTILE(4) OVER w AS INT) AS quartile,
          FIRST_VALUE(o_orderkey) OVER w AS first_ok,
          LAST_VALUE(o_orderkey) OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS last_ok,
          NTH_VALUE(o_orderkey, 2) OVER
              (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS second_ok
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_custkey, o_orderkey, quartile, first_ok, last_ok,
                second_ok NULLS FIRST LIMIT 500""",
)
def q20c_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions: ntile, first_value, last_value, nth_value.
    last/nth use an unbounded-both-ways frame (the default frame stops at
    CURRENT ROW, which would make last_value degenerate).  One shuffle on
    o_custkey serves all four windows."""
    running = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = running.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(running).cast("int").alias("quartile"),
            F.first("o_orderkey").over(running).alias("first_ok"),
            F.last("o_orderkey").over(full).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(full).alias("second_ok"),
        )
        .orderBy(
            "o_custkey", "o_orderkey", "quartile", "first_ok", "last_ok",
            F.col("second_ok").asc_nulls_first(),
        )
        .limit(500)
    )


@register(
    "q27c_string_funcs3",
    """SELECT p_partkey,
          md5(p_name) AS h,
          CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev,
          translate(p_type, 'AEO', 'aeo') AS tr,
          lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
          reverse(p_brand) AS rev,
          repeat(left(p_name, 2), 2) AS rep,
          CAST(ascii(p_name) AS INT) AS a0,
          CAST(strpos(p_name, '_') AS BIGINT) AS us
       FROM part WHERE p_partkey < 400
       ORDER BY p_partkey, h, lev, tr, pad, rev, rep, a0, us""",
)
def q27c_string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string family: md5 fingerprint, levenshtein, translate,
    lpad, reverse, repeat, left-slice, ascii, instr — all JVM built-ins
    (Spark `instr` == DuckDB `strpos`, both 1-based-0-if-absent)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.md5("p_name").alias("h"),
            F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("lev"),
            F.translate("p_type", "AEO", "aeo").alias("tr"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("pad"),
            F.reverse("p_brand").alias("rev"),
            F.repeat(F.substring("p_name", 1, 2), 2).alias("rep"),
            F.ascii("p_name").cast("int").alias("a0"),
            F.instr("p_name", "_").cast("long").alias("us"),
        )
        .orderBy("p_partkey", "h", "lev", "tr", "pad", "rev", "rep", "a0", "us")
    )


@register(
    "q29b_bitwise_funcs",
    """SELECT l_orderkey,
          CAST(l_orderkey & 255 AS BIGINT) AS band,
          CAST(l_orderkey | 4096 AS BIGINT) AS bor,
          CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS bxor,
          CAST(l_linenumber << 3 AS INT) AS shl,
          CAST(l_orderkey >> 2 AS BIGINT) AS shr,
          CAST(bit_count(l_orderkey) AS INT) AS bits
       FROM lineitem WHERE l_orderkey < 500
       ORDER BY l_orderkey, band, bor, bxor, shl, shr, bits""",
)
def q29b_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR, shifts, popcount — pure JVM arithmetic,
    stays inside whole-stage codegen (hash-bucketing building blocks for
    the dedup/split operators in extensions/)."""
    ok = F.col("l_orderkey")
    return (
        load(spark, sf_dir, "lineitem")
        .filter(ok < 500)
        .select(
            "l_orderkey",
            ok.bitwiseAND(F.lit(255)).cast("long").alias("band"),
            ok.bitwiseOR(F.lit(4096)).cast("long").alias("bor"),
            ok.bitwiseXOR(F.col("l_partkey")).cast("long").alias("bxor"),
            F.shiftleft(F.col("l_linenumber"), 3).cast("int").alias("shl"),
            F.shiftright(ok, 2).cast("long").alias("shr"),
            F.bit_count(ok).cast("int").alias("bits"),
        )
        .orderBy("l_orderkey", "band", "bor", "bxor", "shl", "shr", "bits")
    )


@register(
    "q06d_median",
    """SELECT l_returnflag,
          CAST(ROUND(MEDIAN(l_quantity), 2) AS DECIMAL(18,2)) AS med_qty,
          CAST(ROUND(MEDIAN(l_extendedprice), 2) AS DECIMAL(18,2)) AS med_price
       FROM lineitem GROUP BY l_returnflag
       ORDER BY l_returnflag, med_qty, med_price""",
)
def q06d_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median aggregate (both engines interpolate even-count
    middles identically; r2d absorbs the float midpoint)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            r2d(F.median("l_quantity")).alias("med_qty"),
            r2d(F.median("l_extendedprice")).alias("med_price"),
        )
        .orderBy("l_returnflag", "med_qty", "med_price")
    )


@register(
    "q30c_collect_sorted",
    """SELECT o_custkey,
          array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',') AS oks
       FROM orders WHERE o_custkey < 200
       GROUP BY o_custkey ORDER BY o_custkey, oks""",
)
def q30c_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list made deterministic: collection order varies with
    partitioning, so the list is sorted *inside* the aggregate row before
    serialization (array_sort ∘ collect_list ≡ array_agg ORDER BY)."""
    sorted_keys = F.array_sort(F.collect_list("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(sorted_keys, lambda c: c.cast("string")), ","
            ).alias("oks")
        )
        .orderBy("o_custkey", "oks")
    )


@register(
    "q37b_unpivot",
    """SELECT * FROM
       (SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
               CAST(p_size AS DOUBLE) AS p_size
        FROM part WHERE p_partkey < 300)
       UNPIVOT (v FOR k IN (p_retailprice, p_size))
       ORDER BY p_partkey, k, v""",
)
def q37b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of Q37's pivot; wide columns become
    (key, value) rows JVM-side (Expand node, no shuffle)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
            F.col("p_size").cast("double").alias("p_size"),
        )
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "k", "v")
        .orderBy("p_partkey", "k", "v")
    )


@register(
    "q30d_higher_order_funcs",
    """SELECT vec_id,
          CAST(ROUND(list_sum(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE))), 2)
               AS DECIMAL(18,2)) AS s,
          CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS npos
       FROM embeddings ORDER BY vec_id, s, npos""",
)
def q30d_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions head-on: aggregate (left fold), filter,
    transform — the JVM lambda path the similarity operators build on.
    Elements are cast to double before folding so both engines accumulate
    in the same precision and order (array order is preserved)."""
    return (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            r2d(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (acc, x) -> acc + CAST(x AS DOUBLE))"
                )
            ).alias("s"),
            F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("npos"),
        )
        .orderBy("vec_id", "s", "npos")
    )
