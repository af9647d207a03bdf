"""Physical layout maintenance: compaction, range clustering, z-order.

The reference's block model (synthetic 128 MiB splits,
CubefsFileSystem.java:400-430) gives parallelism but no data organization:
every scan reads every row group.  These utilities shape the parquet layout
so Spark's scan skips data instead:

- compact: many small part files -> ~target-sized files.  At 100 TB the
  small-files problem is a *planning* bottleneck (listing + one task per
  tiny file); compaction restores the 128 MiB-split economics the block
  model assumes.
- cluster_by: range-partition + sort so each row group covers a narrow
  min/max range of the sort key; parquet footer stats then let a pushed
  predicate skip whole row groups/files.
- z-order: bit-interleaved key over two columns — row groups stay narrow in
  BOTH dimensions, so selective predicates on either column skip.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact(
    df: DataFrame, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite ``df`` at ``path`` with files sized toward
    ``target_file_bytes`` (the reference's 128 MiB block default,
    CubefsFileSystem.java:97).  Returns the file count written.  Uses a
    sampled on-disk size estimate — cheap relative to the rewrite."""
    import pyspark.sql

    spark = df.sparkSession
    # estimate bytes from the source scan when available, else via count
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        est = df.count() * 256
    n = max(1, math.ceil(est / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def zorder_key(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Bit-interleave two non-negative int columns into one z-order key
    (a0 b0 a1 b1 ... weave), clamping each input to ``bits`` bits.  The
    interleave itself is plans/zorder.zorder_key — ONE implementation of
    the Morton weave serves both the quantized parquet-footer layout here
    and the exact manifest-stats layout there."""
    from cubefs_hadoop_spark.plans.zorder import zorder_key as _interleave

    max_v = (1 << bits) - 1
    return _interleave(
        [
            F.least(col_a.cast("long"), F.lit(max_v)),
            F.least(col_b.cast("long"), F.lit(max_v)),
        ],
        bits,
    )


def cluster_by(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int = 8
) -> None:
    """Range-partition + in-partition sort on ``sort_cols`` and write: each
    output file (and row group within it) covers a narrow, near-disjoint
    key range, which parquet min/max footer stats turn into scan skipping."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def quantize(col: Column, lo, hi, bits: int) -> Column:
    """Min-max quantize ``col`` into [0, 2^bits): equal-width bins.
    Z-order REQUIRES equal bit-widths — interleaving raw values whose
    cardinalities differ lets the wider column's high bits dominate every
    split boundary and the narrow column never gets clustered."""
    n_bins = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / F.lit(max(hi - lo, 1e-300)) * n_bins
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(n_bins))


def zorder_key_n(cols: list[Column], bits: int = 8) -> Column:
    """N-column z-order key: round-robin bit-interleave over every column
    (column j contributes bit i at position i*N + j; the shared
    plans/zorder.zorder_key weave).  Reduces to zorder_key's layout for
    N=2.  Still one plain BIGINT expression — sortable, codegen'd,
    shuffle-free.  N*bits must fit in 63 bits."""
    from cubefs_hadoop_spark.plans.zorder import zorder_key as _interleave

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    max_v = (1 << bits) - 1
    return _interleave(
        [F.least(c.cast("long"), F.lit(max_v)) for c in cols], bits
    )


def cluster_by_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *more_cols: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Z-order variant of cluster_by for multi-column predicates: quantize
    every column to ``bits`` bins (one tiny min/max agg job), interleave,
    range-partition + sort on the key.  Two columns use the original
    a0 b0 a1 b1 layout; additional columns extend the round-robin weave."""
    names = [col_a, col_b, *more_cols]
    aggs = []
    for c in names:
        aggs.append(F.min(c).alias(f"{c}_lo"))
        aggs.append(F.max(c).alias(f"{c}_hi"))
    mm = df.select(*aggs).first()
    qcols = [
        quantize(F.col(c), mm[f"{c}_lo"], mm[f"{c}_hi"], bits) for c in names
    ]
    with_key = df.withColumn("__z", zorder_key_n(qcols, bits=bits))
    (
        with_key.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` for every parquet row group under ``path``
    — the footer stats the scan's skipping decisions read."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def overlap_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of row groups whose [min,max] intersects [lo,hi] — i.e.,
    the fraction of data a pushed range predicate must actually read."""
    if not ranges:
        return 1.0
    n = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return n / len(ranges)
