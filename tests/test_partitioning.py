"""Partitioned-table layout, static partition pruning, and dynamic
partition pruning (plans/partitioning.py) — the directory-pruning scale
levers on top of the reference's scan-everything block model."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.plans import partitioning as pt
from tests.conftest import SF_SMOKE


def _orders_by_month(spark, tmp_path):
    path = str(tmp_path / "orders_pt")
    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_month", F.month("o_orderdate")
    )
    pt.write_partitioned(orders, path, ["o_month"])
    return path, orders


def test_partitioned_layout_and_roundtrip(spark, tmp_path):
    path, orders = _orders_by_month(spark, tmp_path)
    dirs = pt.partitions_on_disk(path)
    assert dirs and all(d.startswith("o_month=") for d in dirs)
    back = pt.read_partitioned(spark, path)
    assert "o_month" in back.columns
    assert back.count() == orders.count()


def test_static_partition_pruning(spark, tmp_path):
    """A filter on the partition column must prune at planning time: the
    scan reads exactly 1 of the N month directories."""
    path, _ = _orders_by_month(spark, tmp_path)
    n_parts = len(pt.partitions_on_disk(path))
    assert n_parts > 1
    full = pt.read_partitioned(spark, path)
    pruned = full.filter(F.col("o_month") == 3)
    filters = pt.partition_filters(pruned)
    assert filters and "o_month" in filters[0], filters
    # runtime ground truth: the scan touched exactly 1 of the N directories
    assert pt.executed_scan_metrics(pruned)["numPartitions"] == 1
    assert pt.executed_scan_metrics(full)["numPartitions"] == n_parts


def test_dynamic_partition_pruning(spark, tmp_path):
    """A selective dim filter on the join key prunes fact partitions at
    runtime: the plan carries a dynamicpruningexpression on the fact scan."""
    path, _ = _orders_by_month(spark, tmp_path)
    fact = pt.read_partitioned(spark, path)
    dim = (
        spark.range(1, 13)
        .select(F.col("id").cast("int").alias("m"))
        .withColumn("quarter", F.floor((F.col("m") - 1) / 3) + 1)
        .filter(F.col("quarter") == 1)
    )
    joined = fact.join(dim, fact.o_month == dim.m)
    assert pt.has_dynamic_pruning(joined)
    # and the result is correct: only months 1-3 survive
    months = {r.o_month for r in joined.select("o_month").distinct().collect()}
    assert months == {1, 2, 3}
