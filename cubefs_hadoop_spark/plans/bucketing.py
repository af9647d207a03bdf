"""Bucketed tables: co-located, shuffle-free joins.

The reference fabricates 128 MiB block splits so host engines parallelize
(getFileBlockLocations, CubefsFileSystem.java:400-430) but offers no
co-location — every big join in a host engine shuffles both sides.  The
Spark-native engine can do better: hash-bucketed tables make repeated
fact-to-fact joins on the bucket key exchange-free, which at 100 TB is the
single biggest join optimization available (the shuffle IS the cost).

Bucketing requires the session catalog (bucket metadata lives in the table
catalog, not in the files), so these helpers use saveAsTable under the
Spark warehouse dir rather than path-based writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by
    ``bucket_col``.  Two tables bucketed the same way join with zero
    Exchange on either side (sort-merge directly over bucket files)."""
    if mode == "overwrite":
        # managed-table overwrite must also clear a stale location left by
        # a previous session (DROP alone only removes catalog metadata)
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{name.lower()}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(name)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
