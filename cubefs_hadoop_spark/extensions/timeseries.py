"""Time-series resample + gap-fill (SURVEY §2C extension surface): the
hypertable `time_bucket_gapfill + locf` operator — bucket events on the
time axis, aggregate per (series, bucket), materialize the FULL bucket
grid, and forward-fill buckets with no observations.

Scale notes (100 TB):

* The observation aggregate is one (user, day) groupBy — a single
  shuffle with map-side partial aggregation.
* The bucket grid is series x buckets rows — the OUTPUT size, generated
  from a broadcast 1-row [min, max] bound frame + one explode per
  series, never by joining the raw corpus against a calendar.
* The forward fill is ``last(ignorenulls)`` under
  ``partitionBy(series)`` — per-series windows, fully parallel, no
  corpus-sized SinglePartition.

Determinism: per-bucket means are computed as exact DECIMAL sums divided
once (IEEE division, correctly rounded, identical across engines), so
partial-aggregation order can never change the hashed value (the
registry's money-sum convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.oracle_compat import r2d
from cubefs_hadoop_spark.registry import register

_X23_ORACLE = """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
                  CAST(value AS DECIMAL(18,2)) AS v
           FROM events),
obs AS (SELECT user_id, day,
               CAST(ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 2)
                    AS DECIMAL(18,2)) AS val
        FROM e GROUP BY user_id, day),
b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM e),
u AS (SELECT DISTINCT user_id FROM e),
grid AS (SELECT user_id, CAST(d AS DATE) AS day
         FROM u, b,
              UNNEST(generate_series(CAST(mn AS TIMESTAMP),
                                     CAST(mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS g(d))
SELECT user_id, day,
       CAST(LAST_VALUE(val IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(18,2)) AS val_filled,
       CAST(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS observed
FROM grid LEFT JOIN obs USING (user_id, day)
ORDER BY user_id, day, val_filled, observed"""


def gapfill_daily(
    events: DataFrame,
    series_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily resample of ``value_col`` per ``series_col`` over the full
    [min, max] day range of the table, mean-aggregated, gaps filled by
    last-observation-carried-forward.  Buckets before a series' first
    observation stay NULL (nothing to carry).  ``observed`` flags real
    buckets vs filled ones."""
    day = F.col(ts_col).cast("date")
    e = events.select(
        series_col,
        day.alias("day"),
        F.col(value_col).cast("decimal(18,2)").alias("v"),
    )
    obs = e.groupBy(series_col, "day").agg(
        r2d(F.sum("v").cast("double") / F.count("*")).alias("val")
    )
    bounds = e.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    grid = (
        e.select(series_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            series_col,
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    locf = (
        Window.partitionBy(series_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(obs, [series_col, "day"], "left").select(
        series_col,
        "day",
        F.last("val", ignorenulls=True).over(locf).alias("val_filled"),
        F.when(F.col("val").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("observed"),
    )


@register("x23_gapfill_locf", _X23_ORACLE)
def x23_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23 hypertable-style daily resample with LOCF gap-fill over the
    events table.  Grid = series x days (output-sized, broadcast-bounded);
    fill = per-series window; one shuffle for the observation agg."""
    return gapfill_daily(load(spark, sf_dir, "events")).orderBy(
        "user_id", "day", "val_filled", "observed"
    )
