"""Batch twins of the streaming surface S01-S08 (SURVEY §2B).

The reference enables Flink/Spark streaming over its storage contract
(reference README.md:85-88); the rebuild's Structured Streaming operators
live in ``cubefs_hadoop_spark.streaming.ops``.  Each streaming op is
validated two ways: (1) the batch twin here hash-matches the DuckDB oracle,
and (2) tests/test_streaming.py proves the streaming run over a file replay
of ``events`` produces exactly the batch twin's result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register
from cubefs_hadoop_spark.queries.relational import dec, r2, r2d


@register(
    "s02_tumbling_window",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w, COUNT(*) AS c,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS v
       FROM events GROUP BY 1 ORDER BY w, c, v""",
)
def s02_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S02 tumbling 1-hour window aggregate, batch form.  Uses the same
    ``window()`` expression the streaming job uses so the two plans share
    semantics (epoch-aligned windows)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("c"), r2(F.sum(dec("value"))).alias("v"))
        .select(F.col("win.start").alias("w"), "c", "v")
        .orderBy("w", "c", "v")
    )


@register(
    "s03_sliding_window",
    """SELECT w, COUNT(*) AS c,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS v
       FROM (
         SELECT UNNEST([
             make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000),
             make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000
                            - 1800000000)
           ]) AS w, value
         FROM events)
       GROUP BY w ORDER BY w, c, v""",
)
def s03_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S03 sliding window (1 hour every 30 minutes): each event lands in two
    windows.  The oracle expands the two epoch-aligned window starts
    explicitly; Spark's window() does the same internally."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("c"), r2(F.sum(dec("value"))).alias("v"))
        .select(F.col("win.start").alias("w"), "c", "v")
        .orderBy("w", "c", "v")
    )


@register(
    "s04_sessionization",
    """SELECT user_id, COUNT(*) AS sessions FROM (
         SELECT user_id, sess FROM (
           SELECT user_id,
                  SUM(CASE WHEN gap_us > 600000000 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
           FROM (
             SELECT user_id, ts, event_id,
                    COALESCE(epoch_us(CAST(ts AS TIMESTAMP))
                             - epoch_us(CAST(LAG(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts, event_id)
                               AS TIMESTAMP)), 1000000000000) AS gap_us
             FROM events) g)
         GROUP BY user_id, sess)
       GROUP BY user_id ORDER BY user_id, sessions""",
)
def s04_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S04 session-window batch twin: lag + gap>10min cumulative-sum
    sessionization — one shuffle on user_id, two window passes.  The
    streaming form uses session_window(ts, '10 minutes'); equality is
    asserted in tests/test_streaming.py."""
    events = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag("ts").over(wo).cast("timestamp"))
    gap = F.coalesce(us - lag_us, F.lit(1_000_000_000_000))
    sess = F.sum(F.when(gap > 600_000_000, 1).otherwise(0)).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("sess", sess)
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sessions"))
        .orderBy("user_id", "sessions")
    )


@register(
    "s06_dedup_twin",
    "SELECT COUNT(DISTINCT event_id) AS c FROM events",
)
def s06_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S06 stateful-dedup batch twin; the stream uses
    dropDuplicates(['event_id']) with state."""
    return (
        load(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "s13_dedup_watermark_twin",
    "SELECT COUNT(DISTINCT event_id) AS c FROM events",
)
def s13_dedup_watermark_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 bounded-state dedup twin: dropDuplicatesWithinWatermark equals
    exact dedup whenever duplicates arrive within the watermark horizon —
    true for the fixture replay, asserted stream-vs-twin in
    tests/test_streaming.py (which also proves the post-eviction
    re-emission that distinguishes S13 from S06)."""
    return (
        load(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "s07_stream_static_join_twin",
    """SELECT event_type, COUNT(*) AS c FROM events
       JOIN customer ON user_id = c_custkey
       GROUP BY event_type ORDER BY event_type, c""",
)
def s07_stream_static_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S07 stream-static join twin: the static (customer) side is broadcast,
    exactly what the streaming micro-batch planner does."""
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("event_type", "c")
    )


@register(
    "s08_running_max_twin",
    """SELECT event_id,
          CAST(ROUND(MAX(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2)
               AS DECIMAL(18,2)) AS run_max
       FROM events ORDER BY event_id, run_max""",
)
def s08_running_max_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S08 arbitrary-stateful-op twin: running max per user.  The streaming
    form is applyInPandasWithState (streaming/ops.py); equality asserted in
    tests."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select("event_id", r2d(F.max("value").over(w)).alias("run_max"))
        .orderBy("event_id", "run_max")
    )


@register(
    "s09_interval_join_twin",
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id
       FROM events c JOIN events p
         ON p.user_id = c.user_id AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
       WHERE c.event_type = 'click'
       ORDER BY click_id, purchase_id""",
)
def s09_interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S09 stream-stream interval-join twin: click->purchase pairs within a
    1-hour horizon per user, batch range-join form.  The streaming form
    (streaming/ops.py stream_stream_interval_join) bounds state with
    watermarks on BOTH sides; equality asserted in tests/test_streaming.py."""
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("click_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    )
