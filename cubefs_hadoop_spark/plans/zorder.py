"""Z-order (Morton) layout keys: multi-dimensional data clustering for
file skipping (SURVEY §2 data-layout surface; the OPTIMIZE ... ZORDER BY
verb of Delta/Iceberg table maintenance).

Sorting a table by a Z-curve key before writing makes per-file min/max
ranges tight in EVERY interleaved dimension at once, so manifest-stats
pruning (versioning.py ``stats_cols``/``predicates``) can skip files for
predicates on any of the Z columns — a linear sort gives that for the
leading column only.  At 100 TB the mechanics are: compute the key
map-side (pure JVM integer expressions, no shuffle), then
``repartitionByRange(zkey)`` + write — one range shuffle, the same cost
as any global sort, paid once at layout time to make every subsequent
scan cheaper.

The key is exact integer math end to end (rank each column to a
``bits``-wide integer over its global [min, max], interleave the bits),
so the layout is engine-independent and the x22 entry hash-checks
against a DuckDB oracle computing the same interleave.

``zorder_key`` here is THE Morton weave for the whole repo:
plans/layout.py's quantized variants (parquet row-group footer skipping,
test_layout) delegate to it with clamped inputs, while this module pairs
it with exact rank normalization and the versioned-manifest stats tier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.registry import register

_BITS = 16


def zorder_key(ranks: list[Column], bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` bits of the given integer rank columns
    into a single Morton key: bit b of rank i lands at position
    b * n_cols + i.  Pure JVM bitwise expressions — codegen-friendly,
    no shuffle, no Python."""
    n = len(ranks)
    terms = [
        F.shiftleft(
            F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i
        )
        for b in range(bits)
        for i, r in enumerate(ranks)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms).cast("long")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = _BITS,
    out: str = "zkey",
) -> DataFrame:
    """``df`` plus a Morton key over ``cols`` (integer-valued columns;
    scale decimals/doubles to integer units first, e.g. money -> cents).

    Each column is ranked to [0, 2^bits) over its global [min, max] —
    one 1-row aggregate broadcast onto the frame (the scalar-aggregate
    crossJoin pattern), then floor((v - min) * (2^bits - 1) / span).
    The double division is exact for spans below 2^53 (IEEE division is
    correctly rounded, and a non-integer quotient a/b sits >= 1/b away
    from any integer, far above the 2^-53 relative error)."""
    top = (1 << bits) - 1
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(c).cast("long").alias(f"_zmn{i}"),
            F.max(c).cast("long").alias(f"_zmx{i}"),
        ]
    stats = df.agg(*aggs)
    d = df.crossJoin(F.broadcast(stats))
    ranks = [
        F.floor(
            (F.col(c).cast("long") - F.col(f"_zmn{i}"))
            * top
            / F.greatest(
                F.col(f"_zmx{i}") - F.col(f"_zmn{i}"), F.lit(1)
            )
        ).cast("long")
        for i, c in enumerate(cols)
    ]
    return d.withColumn(out, zorder_key(ranks, bits)).drop(
        *[f"_zmn{i}" for i in range(len(cols))],
        *[f"_zmx{i}" for i in range(len(cols))],
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = _BITS,
) -> DataFrame:
    """``df`` range-repartitioned into ``num_files`` Z-curve runs, key
    dropped — ready to write.  Each output file covers a contiguous
    Z-range, i.e. a small hyper-rectangle in the clustered dimensions,
    which is what makes min/max file skipping effective on every one of
    them."""
    return (
        with_zorder_key(df, cols, bits)
        .repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )


def _interleave_sql(rank_exprs: list[str], bits: int = _BITS) -> str:
    """The DuckDB mirror of zorder_key: same bit positions, same ops."""
    n = len(rank_exprs)
    terms = [
        f"((({r} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, r in enumerate(rank_exprs)
    ]
    return " | ".join(terms)


_X22_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"

_X22_ORACLE = f"""
WITH s AS (SELECT CAST(MIN(o_custkey) AS BIGINT) AS mn0,
                  CAST(MAX(o_custkey) AS BIGINT) AS mx0,
                  MIN({_X22_CENTS}) AS mn1,
                  MAX({_X22_CENTS}) AS mx1
           FROM orders),
r AS (SELECT o_orderkey,
             CAST(FLOOR((o_custkey - mn0) * 65535
                  / GREATEST(mx0 - mn0, 1)) AS BIGINT) AS r0,
             CAST(FLOOR(({_X22_CENTS} - mn1) * 65535
                  / GREATEST(mx1 - mn1, 1)) AS BIGINT) AS r1
      FROM orders, s)
SELECT o_orderkey, CAST({_interleave_sql(['r0', 'r1'])} AS BIGINT) AS zkey
FROM r ORDER BY zkey, o_orderkey LIMIT 200"""


@register("x22_zorder_key", _X22_ORACLE)
def x22_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22 Morton layout key over (o_custkey, price-in-cents): the exact
    integer interleave the zorder_layout write path sorts by, first 200
    keys.  Map-side expressions + one 1-row stats broadcast; the only
    shuffle is the final TakeOrdered."""
    orders = load(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    return (
        with_zorder_key(orders, ["o_custkey", "cents"])
        .select("o_orderkey", "zkey")
        .orderBy("zkey", "o_orderkey")
        .limit(200)
    )
