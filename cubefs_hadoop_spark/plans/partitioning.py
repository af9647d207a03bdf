"""Hive-style partitioned tables: static and dynamic partition pruning.

The reference's only split story is synthetic 128 MiB blocks
(getFileBlockLocations, CubefsFileSystem.java:400-430) — every query scans
every byte.  Partitioned layout is the scale lever the rebuild adds on top:
a filter on the partition column prunes whole directories at planning time
(static pruning), and a selective dimension filter prunes fact partitions
at RUNTIME through a broadcast-reused subquery (dynamic partition pruning,
AQE).  At 100 TB a date-partitioned fact table turns "scan a month" into a
~3% directory listing instead of a full scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubefs_hadoop_spark.plans.audit import audit_plan


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Lay out ``df`` as path/col=value/... parquet directories (exactly the
    directory-of-parts table convention from SURVEY §1.2, one level per
    partition column)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition discovery: Spark derives the partition columns back from
    the directory names (the listStatus/N12 analog, recursively)."""
    return spark.read.parquet(path)


def partitions_on_disk(path: str) -> list[str]:
    """The physical partition directories (listing-level ground truth that
    tests compare against pruned scans)."""
    return sorted(
        d for d in os.listdir(path) if "=" in d and not d.startswith("_")
    )


def partition_filters(df: DataFrame) -> list[str]:
    """The scan's PartitionFilters lines from the formatted plan (static
    pruning happens exactly when these are non-trivial)."""
    out = []
    for line in audit_plan(df).text.splitlines():
        s = line.strip()
        if s.startswith("PartitionFilters:"):
            out.append(s.removeprefix("PartitionFilters:").strip())
    return out


def executed_scan_metrics(df: DataFrame) -> dict[str, int]:
    """Run ``df`` and return the file-scan leaf's SQL metrics (numFiles,
    numPartitions, filesSize, numOutputRows...).  ``numPartitions`` is the
    ground truth for partition pruning: it counts directories the scan
    actually touched, after both static and dynamic pruning."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    out: dict[str, int] = {}
    for i in range(leaves.length()):
        node = leaves.apply(i)
        if "Scan" not in node.nodeName():
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = int(kv._2().value())
        break
    return out


def has_dynamic_pruning(df: DataFrame) -> bool:
    """True when the plan contains a runtime partition-pruning subquery
    (dynamicpruningexpression on the fact scan)."""
    return "dynamicpruning" in audit_plan(df).text.lower()
