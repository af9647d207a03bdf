"""UDF/UDAF/UDTF surface U01-U05 (SURVEY §2B).

Idiomatic PySpark custom-code paths, per the public patterns catalogued in
SNIPPETS.md: Arrow-vectorized pandas UDFs (scalar + grouped-agg),
applyInPandas grouped-map, and mapInPandas as the UDTF shape.  Row-at-a-time
``udf()`` appears once (U05) as the documented slow-path fallback — never in
a hot path.

Each UDF's result is declared against a pure-SQL oracle, proving the Python
path computes exactly what the relational form computes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register
from cubefs_hadoop_spark.queries.relational import r2d


def _revenue_udf():
    # U01 scalar vectorized UDF: Arrow batches in, numpy math, Arrow out.
    # (Constructed lazily: pandas_udf type resolution needs a live session.)
    @pandas_udf("double")
    def rev(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return rev


@register(
    "u01_scalar_pandas_udf",
    """SELECT * FROM (
         SELECT l_orderkey,
                CAST(ROUND(l_extendedprice * (1 - l_discount), 2)
                     AS DECIMAL(18,2)) AS rev
         FROM lineitem ORDER BY l_orderkey, rev LIMIT 500
       ) ORDER BY l_orderkey, rev""",
)
def u01_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U01: revenue via scalar pandas_udf ≡ the Q05 SQL expression.  Both
    sides are IEEE double math, so the R2-rounded values are identical."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            r2d(_revenue_udf()("l_extendedprice", "l_discount")).alias("rev"),
        )
        .orderBy("l_orderkey", "rev")
        .limit(500)
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    # U02 grouped-map: per-nation z-score (pandas std is sample/ddof=1,
    # matching SQL STDDEV).
    std = pdf["c_acctbal"].std()
    mean = pdf["c_acctbal"].mean()
    z = (pdf["c_acctbal"] - mean) / std if std and std > 0 else pd.Series(
        [None] * len(pdf), dtype="float64"
    )
    return pd.DataFrame(
        {"c_custkey": pdf["c_custkey"], "z": z}
    )


@register(
    "u02_grouped_map_zscore",
    """SELECT c_custkey,
          CAST(ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
               / NULLIF(STDDEV(c_acctbal) OVER (PARTITION BY c_nationkey), 0),
               2) AS DECIMAL(18,2)) AS z
       FROM customer ORDER BY c_custkey, z""",
)
def u02_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U02: applyInPandas grouped-map ≡ SQL window twin."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .applyInPandas(_zscore, "c_custkey bigint, z double")
        .select("c_custkey", r2d(F.col("z")).alias("z"))
        .orderBy("c_custkey", "z")
    )


def _mean_udaf():
    # U03 grouped-agg pandas UDF (UDAF shape).  The mean is computed over
    # exact integer cents (inputs are 2-decimal values) so the result is
    # bit-identical to the oracle's SUM(DECIMAL)/COUNT — pandas' pairwise
    # float summation would otherwise differ in the last bit and flip the
    # 2-decimal rounding on exact .xx5 boundaries.
    @pandas_udf("double")
    def mean_agg(v: pd.Series) -> float:
        return float(v.mul(100).round().sum() / 100.0 / len(v))

    return mean_agg


@register(
    "u03_grouped_agg_mean",
    """SELECT c_nationkey,
          CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 2) AS DECIMAL(18,2)) AS m
       FROM customer GROUP BY c_nationkey ORDER BY c_nationkey, m""",
)
def u03_grouped_agg_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U03: grouped-agg pandas_udf ≡ AVG."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(r2d(_mean_udaf()("c_acctbal")).alias("m"))
        .orderBy("c_nationkey", "m")
    )


def _split_words(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # U04 UDTF shape via mapInPandas: one input row -> many output rows.
    for pdf in batches:
        words = pdf["text"].str.split(" ")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(words.str.len()),
                "w": [w for ws in words for w in ws],
            }
        )


@register(
    "u04_udtf_wordsplit",
    """SELECT doc_id, COUNT(*) AS words FROM (
         SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
         FROM documents WHERE doc_id < 10)
       GROUP BY doc_id ORDER BY doc_id, words""",
)
def u04_udtf_wordsplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U04: mapInPandas row-expanding transform ≡ Q31 explode.  Same oracle
    as q31_explode — two engine paths, one declared result."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", "text")
        .mapInPandas(_split_words, "doc_id bigint, w string")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("words"))
        .orderBy("doc_id", "words")
    )


@register(
    "u04b_python_udtf",
    """SELECT doc_id, COUNT(*) AS words FROM (
         SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
         FROM documents WHERE doc_id < 10)
       GROUP BY doc_id ORDER BY doc_id, words""",
)
def u04b_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U04b: a real Python UDTF (Spark >=3.5 `@udtf` class) registered and
    invoked through SQL LATERAL — the full table-function surface, same
    declared result as Q31/U04."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="w string")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w,)

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """SELECT doc_id, COUNT(*) AS words
           FROM _docs_udtf, LATERAL split_words(text) AS t(w)
           WHERE doc_id < 10
           GROUP BY doc_id ORDER BY doc_id, words"""
    )


def _asof_merge(pdf: pd.DataFrame) -> pd.DataFrame:
    # Bucket-level pandas merge_asof, vectorized ACROSS users via by=:
    # latest 'click' ts at-or-before each event, per user.  Both sides
    # must be sorted on the on-key; backward direction + exact matches
    # give the <= semantics of the declared range-join oracle.
    left = pdf[["event_id", "user_id", "ts"]].sort_values(
        "ts", kind="mergesort"
    )
    clicks = (
        pdf.loc[pdf["event_type"] == "click", ["user_id", "ts"]]
        .rename(columns={"ts": "asof_ts"})
        .sort_values("asof_ts", kind="mergesort")
    )
    out = pd.merge_asof(
        left,
        clicks,
        left_on="ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    return out[["event_id", "asof_ts"]]


@register(
    "u06_asof_merge_pandas",
    """SELECT e.event_id, MAX(CAST(c.ts AS TIMESTAMP)) AS asof_ts
       FROM events e LEFT JOIN events c
         ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
       GROUP BY e.event_id ORDER BY e.event_id, asof_ts""",
)
def u06_asof_merge_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U06: as-of join via applyInPandas ``pd.merge_asof`` — the grouped
    Arrow-batch alternative to Q18's single-window-scan plan, same oracle.

    Scale note: one shuffle on user_id, then O(n log n) sort + linear merge
    per group entirely in pandas.  Right for wide as-of joins where the
    window trick doesn't apply (e.g. nearest-by-value tolerance matches);
    Q18's pure-window form is preferred when expressible because it stays
    JVM-side.

    Two grouping decisions carry the scale story:
    - Groups are HASH BUCKETS of users, not single users:
      ``merge_asof(by='user_id')`` vectorizes across every user in the
      bucket, so the per-group Python-call overhead is paid ~4*cores
      times, not once per user (1500 per-user calls measured 4.2s at
      sf0.1; 128 bucket calls measure 2.8s — the rest is the Arrow
      round-trip of the events table itself).  Bucketing also bounds
      skew: a hot user shares a bucket instead of owning a straggler
      task.
    - The explicit hash repartition on the bucket key is load-bearing:
      AQE coalesces the pre-applyInPandas exchange by BYTES (a few MiB
      of events -> 3 partitions), but this stage's cost is per-row
      Python work.  A user-specified repartition is exempt from AQE
      coalescing and already satisfies the grouping distribution, so no
      second exchange is added."""
    ev = load(spark, sf_dir, "events")
    par = spark.sparkContext.defaultParallelism
    bucketed = ev.withColumn(
        "_b", F.pmod(F.xxhash64("user_id"), F.lit(par * 4))
    )
    return (
        bucketed.repartition(par, "_b")
        .groupBy("_b")
        .applyInPandas(_asof_merge, "event_id bigint, asof_ts timestamp_ntz")
        .orderBy("event_id", "asof_ts")
    )


@register(
    "u05_row_udf",
    """SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS pri, COUNT(*) AS c
       FROM orders GROUP BY 1 ORDER BY pri, c""",
)
def u05_row_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U05: row-at-a-time Python UDF — the documented fallback path.  Kept
    deliberately tiny; anything hot must use the vectorized forms above
    (10-100x faster: no per-row serialization)."""
    pri = F.udf(lambda s: int(s[0]), "int")
    return (
        load(spark, sf_dir, "orders")
        .select(pri("o_orderpriority").alias("pri"))
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("pri", "c")
    )
