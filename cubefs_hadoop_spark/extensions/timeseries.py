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


# -- x24: bucketed range join ----------------------------------------------

_X24_W_US = 30_000_000  # +/- 30 s

_X24_ORACLE = f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events)
SELECT a.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_near
FROM e a LEFT JOIN e b
  ON b.event_id <> a.event_id AND abs(a.us - b.us) <= {_X24_W_US}
GROUP BY a.event_id ORDER BY a.event_id, n_near"""


def range_join_near_count(
    events: DataFrame,
    window_us: int = _X24_W_US,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event count of OTHER events within +/- ``window_us`` — the
    interval/range self-join, in the bucketed form that survives scale.

    A naive ``|a.ts - b.ts| <= W`` theta join is a nested-loop cartesian
    (O(N^2) at 100 TB).  The classic rewrite bins timestamps into
    W-width buckets and equi-joins each probe against its OWN bucket +/-
    1 (explode of 3 bucket keys): any qualifying pair differs by at most
    one bucket, so the equi-join finds every pair EXACTLY once (a probe's
    3 keys contain the build row's single bucket iff |delta_bucket| <= 1),
    and the residual |dt| <= W filter runs on candidate pairs only —
    shuffle is O(3N) keys, pair work is O(sum bucket^2), never O(N^2).
    Hot seconds (bucket skew) are AQE skew-join territory, same as any
    hot join key."""
    e = events.select(
        id_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    w = F.lit(window_us)
    build = e.select(
        F.col(id_col).alias("bid"),
        F.col("us").alias("bus"),
        F.floor(F.col("us") / w).alias("bkt"),
    )
    probe = e.select(
        F.col(id_col).alias("pid"),
        F.col("us").alias("pus"),
        F.explode(
            F.array(
                F.floor(F.col("us") / w) - 1,
                F.floor(F.col("us") / w),
                F.floor(F.col("us") / w) + 1,
            )
        ).alias("bkt"),
    )
    counts = (
        probe.join(build, "bkt")
        .filter(
            (F.col("pid") != F.col("bid"))
            & (F.abs(F.col("pus") - F.col("bus")) <= w)
        )
        .groupBy("pid")
        .agg(F.count("*").alias("n_near"))
    )
    return (
        e.select(F.col(id_col), F.col("us"))
        .join(counts, e[id_col] == counts["pid"], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias(
                "n_near"
            ),
        )
    )


@register("x24_range_join", _X24_ORACLE)
def x24_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24 bucketed range self-join: events within +/-30 s of each other,
    counted per event.  Equi-join on time buckets + residual filter —
    zero nested loops (asserted in test_timeseries)."""
    return range_join_near_count(load(spark, sf_dir, "events")).orderBy(
        "event_id", "n_near"
    )


# -- x27: time-series similarity search ------------------------------------

_X27_PROBES = 5  # query series (broadcast side)
_X27_TOPK = 4

_X27_ORACLE = f"""
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
                  CAST(value AS DECIMAL(18,2)) AS v FROM events),
obs AS (SELECT user_id, day,
               CAST(ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 2)
                    AS DECIMAL(18,2)) AS val
        FROM e GROUP BY user_id, day),
b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM e),
u AS (SELECT DISTINCT user_id FROM e),
grid AS (SELECT user_id, CAST(dd AS DATE) AS day
         FROM u, b, UNNEST(generate_series(CAST(mn AS TIMESTAMP),
              CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS g(dd)),
filled AS (SELECT user_id, day,
       LAST_VALUE(val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
       FROM grid LEFT JOIN obs USING (user_id, day)),
vec AS (SELECT user_id,
               list(COALESCE(CAST(val * 100 AS BIGINT), 0) ORDER BY day) AS v
        FROM filled GROUP BY user_id),
pairs AS (
  SELECT q.user_id AS q_user, c.user_id AS user_id,
         CAST(ROUND(sqrt(list_sum(list_transform(
              list_zip(q.v, c.v),
              z -> (z[1] - z[2]) * (z[1] - z[2])))) / 100.0, 2)
              AS DECIMAL(18,2)) AS dist
  FROM vec q JOIN vec c
    ON q.user_id < {_X27_PROBES} AND c.user_id <> q.user_id)
SELECT q_user, user_id, dist FROM (
  SELECT q_user, user_id, dist,
         ROW_NUMBER() OVER (PARTITION BY q_user ORDER BY dist, user_id)
             AS rn
  FROM pairs) t WHERE rn <= {_X27_TOPK}
ORDER BY q_user, user_id, dist"""


def series_vectors(events: DataFrame) -> DataFrame:
    """(series, integer-cent daily vector) from the LOCF-filled daily
    grid — the alignment step of data-series similarity search.  Values
    are EXACT integer cents, so downstream distance sums are order-free
    and engine-independent (the same integer-first trick as x22's Morton
    ranks and x20's milli-logs); pre-first-observation days are 0."""
    filled = gapfill_daily(events)
    return filled.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "day",
                        F.coalesce(
                            (F.col("val_filled") * 100).cast("long"),
                            F.lit(0),
                        ).alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ).alias("v")
    )


def series_topk_similar(
    events: DataFrame,
    n_probes: int = _X27_PROBES,
    topk: int = _X27_TOPK,
) -> DataFrame:
    """Top-k most-similar series per probe series, exact Euclidean
    distance over aligned daily vectors (the REPOSE/Odyssey distributed
    data-series search shape, exact baseline form).

    Scale shape = x03's: the probe set broadcasts (bounded, like query
    trajectories), the corpus side streams once, the distance is a JVM
    zip_with/aggregate over EXACT integer cents (order-free sum; sqrt
    and the final /100 are IEEE-exact), and the rank filter compiles to
    WindowGroupLimit — top-k per probe reduced map-side.  The bucketed
    scale path for probe sets that outgrow a broadcast is SRP-LSH over
    these vectors (semantic.py), exactly as x03c is to x03."""
    from cubefs_hadoop_spark.plans.materialize import barrier

    # both join sides read the vector frame: barrier it so the
    # gapfill + vector-build pipeline runs ONCE, not once per side
    vec = barrier(series_vectors(events))
    probes = vec.filter(F.col("user_id") < n_probes).select(
        F.col("user_id").alias("q_user"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    pairs = (
        vec.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("q_user"))
        .select(
            "q_user",
            "user_id",
            r2d(F.sqrt(d2.cast("double")) / 100.0).alias("dist"),
        )
    )
    pick = Window.partitionBy("q_user").orderBy("dist", "user_id")
    return (
        pairs.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") <= topk)
        .select("q_user", "user_id", "dist")
    )


@register("x27_series_similarity", _X27_ORACLE)
def x27_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27 exact data-series similarity search: 5 broadcast probe series
    vs the corpus, integer-cent Euclidean, WindowGroupLimit top-4."""
    return series_topk_similar(load(spark, sf_dir, "events")).orderBy(
        "q_user", "user_id", "dist"
    )
