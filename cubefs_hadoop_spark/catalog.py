"""Fixture-table catalog: load driver-generated parquet tables.

The reference resolves ``cfs://volume/path`` through FileSystem.get +
listStatus (SURVEY §3 E1); here a "table" is a parquet file/directory under
a scale-factor directory (TESTDATA.md).  ``load`` is the N3 scan analog —
Spark's parquet reader supplies buffered/positional reads (N4/N5) and
footer-driven predicate pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _prep(spark: SparkSession) -> SparkSession:
    # Determinism contract (FIXTURES.md): UTC session timezone.  The driver
    # may hand us a session built without it, so set on every load.
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        # events.ts is parquet TIMESTAMP(NANOS); Spark 4 has no nanosecond
        # timestamp type, so read the raw int64 and truncate to micros in
        # load() (matches DuckDB's ns->us cast used by the oracle).
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (N3 analog: open -> FSDataInputStream
    becomes spark.read.parquet; CubefsFileSystem.java:134-144)."""
    _prep(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos -> microsecond TIMESTAMP_NTZ (floor division, exactly
        # DuckDB's CAST(ts_ns AS TIMESTAMP) truncation).  NTZ so collected
        # values are naive datetimes like the oracle's.
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
