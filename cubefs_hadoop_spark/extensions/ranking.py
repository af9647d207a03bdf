"""Skew-proof exact distributed ranking (the x18 band pattern, hardened
for heavy ties).

x18's banded rank splits the key space into disjoint value ranges so
within-band ranks parallelize — but a single heavily-tied value (every
non-purchaser's monetary_cents = 0) still lands one task with the whole
tie class (VERDICT r11 "What's wrong" #2/#3: x87 ran NTILE as three
SinglePartition sorts of the user frame; x88 sorted event-grain data
partitioned by a ~6-value key).

This module computes the exact global rank by (value, id) — identical
to ``ROW_NUMBER() OVER (ORDER BY value [DESC], id)`` — with every task
bounded by construction, ties included:

1. **Per-(value, id-band) counts**: one partial-agg'd groupBy.  A tie
   class of any size collapses to ``ceil(class/id_band)`` count rows.
2. **Value offsets** (how many rows order before this value): banded
   prefix sum over the *counts* frame — band totals are a driver-scale
   frame (one tiny SinglePartition window, the accepted x14 shape);
   within-band cumulation partitions by band, and a band of width W
   holds at most W DISTINCT integer values regardless of tie mass.
3. **Tie offsets** (how many same-value rows have a smaller id): prefix
   sum over id-bands, partitioned by value — at most
   ``id_range/id_band`` rows per partition.
4. **Row ranks**: join the offset map back on (value, id-band) — every
   join group and every row_number partition holds at most ``id_band``
   rows — and add the within-id-band row_number.

Cost: two shuffles of the data frame (the counts groupBy and the
(value, id-band) window/join) plus metadata-scale frames.  No task ever
sees more than max(value_band distinct values, id_band rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_VALUE_BAND = 1 << 16  # distinct integer values per prefix-sum band
_ID_BAND = 1 << 20  # ids per tie-splitting band


def distributed_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    descending: bool = False,
    value_band: int = _VALUE_BAND,
    id_band: int = _ID_BAND,
    out_col: str = "rank",
) -> DataFrame:
    """Add ``out_col``: the exact 1..N rank of every row by
    (``value_col`` asc|desc, ``id_col`` asc) within each ``group_cols``
    group (global when empty).  ``value_col`` and ``id_col`` must be
    integral; ``id_col`` must be unique within a group (it is the
    deterministic tiebreak, so the rank is a total order and
    hash-reproducible)."""
    g = list(group_cols)
    v, i = "_dr_v", id_col
    t = df.withColumn(v, F.col(value_col).cast("long")).withColumn(
        "_dr_ub", F.floor(F.col(id_col) / F.lit(int(id_band))).cast("long")
    )

    # 1. (value, id-band) counts — ties collapse to count rows
    ubc = t.groupBy(*g, v, "_dr_ub").agg(
        F.count(F.lit(1)).cast("long").alias("_dr_ucnt")
    )
    vc = (
        ubc.groupBy(*g, v)
        .agg(F.sum("_dr_ucnt").cast("long").alias("_dr_vcnt"))
        .withColumn(
            "_dr_vb", F.floor(F.col(v) / F.lit(int(value_band))).cast("long")
        )
    )

    # 2. value offsets: band totals (driver-scale) + within-band prefix
    vdir = F.col("_dr_vb").desc() if descending else F.col("_dr_vb").asc()
    band_prior = Window.partitionBy(*g).orderBy(vdir).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bt = (
        vc.groupBy(*g, "_dr_vb")
        .agg(F.sum("_dr_vcnt").cast("long").alias("_dr_bcnt"))
        .select(
            *g,
            "_dr_vb",
            F.coalesce(F.sum("_dr_bcnt").over(band_prior), F.lit(0))
            .cast("long")
            .alias("_dr_boff"),
        )
    )
    vvdir = F.col(v).desc() if descending else F.col(v).asc()
    in_band_prior = Window.partitionBy(*g, "_dr_vb").orderBy(vvdir).rowsBetween(
        Window.unboundedPreceding, -1
    )
    voff = (
        vc.withColumn(
            "_dr_woff",
            F.coalesce(F.sum("_dr_vcnt").over(in_band_prior), F.lit(0)).cast(
                "long"
            ),
        )
        .join(F.broadcast(bt), [*g, "_dr_vb"])
        .select(
            *g, v, (F.col("_dr_boff") + F.col("_dr_woff")).alias("_dr_voff")
        )
    )

    # 3. tie offsets: id-band prefix within each value class
    tie_prior = Window.partitionBy(*g, v).orderBy(F.col("_dr_ub").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offmap = (
        ubc.withColumn(
            "_dr_uoff",
            F.coalesce(F.sum("_dr_ucnt").over(tie_prior), F.lit(0)).cast(
                "long"
            ),
        )
        .join(voff, [*g, v])
        .select(
            *g,
            v,
            "_dr_ub",
            (F.col("_dr_voff") + F.col("_dr_uoff")).alias("_dr_toff"),
        )
    )

    # 4. per-row rank: bounded join + bounded row_number partitions
    inner = Window.partitionBy(*g, v, "_dr_ub").orderBy(F.col(i).asc())
    return (
        t.join(offmap, [*g, v, "_dr_ub"])
        .withColumn(
            out_col,
            (F.col("_dr_toff") + F.row_number().over(inner)).cast("long"),
        )
        .drop(v, "_dr_ub", "_dr_toff")
    )


def grouped_exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    quantiles: Sequence[int] = (50, 90),
    value_band: int = _VALUE_BAND,
    counts_col: str | None = None,
    broadcast_groups: bool = True,
) -> DataFrame:
    """Exact discrete order statistics per group without any row-grain
    sort: (group_cols..., n, p<q>...) where ``p<q>`` is the value of
    rank ``1 + (n-1)*q//100`` in ascending order — the x88 machinery,
    extracted (r12) so every percentile profile shares it.

    The rank-target order statistic needs only CUMULATIVE COUNTS: the
    rn-th smallest value is ``min(v : cum(v) >= rn)`` regardless of tie
    order, so the data reduces to one partial-agg'd (group, value)
    counts frame cumulated by banded prefix sums — band totals are a
    (groups x bands) metadata frame; within-band cumulation partitions
    by (group, band) and holds at most ``value_band`` DISTINCT values
    however many rows share them.  ``value_col`` must be integral.

    ``counts_col``: when the caller already holds the (group, value,
    count) frame (e.g. to derive totals off the same single scan), pass
    its count column name and ``df`` is taken at that grain instead of
    row grain.

    CONTRACT (VERDICT r12 #7): the band-offset and per-group-``n``
    attaches broadcast frames of GROUP cardinality — correct only for
    bounded, metadata-scale groupings (type/source/session-bucket
    grain, at most ~millions of groups).  A USER-grain caller must pass
    ``broadcast_groups=False`` to switch both attaches to shuffle
    joins; at a billion groups a broadcast would OOM every executor."""
    g = list(group_cols)
    if counts_col is None:
        v = df.select(*g, F.col(value_col).cast("long").alias("_gp_v"))
        vc = v.groupBy(*g, "_gp_v").agg(
            F.count(F.lit(1)).cast("long").alias("_gp_cnt")
        )
    else:
        vc = df.select(
            *g,
            F.col(value_col).cast("long").alias("_gp_v"),
            F.col(counts_col).cast("long").alias("_gp_cnt"),
        )
    vc = vc.withColumn(
        "_gp_vb",
        F.floor(F.col("_gp_v") / F.lit(int(value_band))).cast("long"),
    )
    band_prior = Window.partitionBy(*g).orderBy("_gp_vb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bt = (
        vc.groupBy(*g, "_gp_vb")
        .agg(F.sum("_gp_cnt").cast("long").alias("_gp_bcnt"))
        .select(
            *g,
            "_gp_vb",
            F.coalesce(F.sum("_gp_bcnt").over(band_prior), F.lit(0))
            .cast("long")
            .alias("_gp_boff"),
        )
    )
    in_band = Window.partitionBy(*g, "_gp_vb").orderBy("_gp_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    _hint = F.broadcast if broadcast_groups else (lambda d: d)
    cum = (
        vc.withColumn(
            "_gp_wcum", F.sum("_gp_cnt").over(in_band).cast("long")
        )
        .join(_hint(bt), [*g, "_gp_vb"])
        .select(
            *g,
            "_gp_v",
            (F.col("_gp_boff") + F.col("_gp_wcum")).cast("long").alias(
                "_gp_cum"
            ),
        )
    )
    n = vc.groupBy(*g).agg(F.sum("_gp_cnt").cast("long").alias("n"))
    j = cum.join(_hint(n), g) if g else cum.crossJoin(F.broadcast(n))
    aggs = [
        F.min(
            F.when(
                F.col("_gp_cum") >= 1 + F.expr(f"(n - 1) * {int(q)} div 100"),
                F.col("_gp_v"),
            )
        )
        .cast("long")
        .alias(f"p{int(q)}")
        for q in quantiles
    ]
    return j.groupBy(*g, "n").agg(*aggs)


def ntile_from_rank(rank_col: str, n_rows: int, k: int) -> F.Column:
    """The bucket ``NTILE(k)`` assigns to a row of exact rank
    ``rank_col`` in a frame of ``n_rows``: the first ``n_rows mod k``
    buckets take ``n_rows div k + 1`` rows, the rest ``n_rows div k`` —
    pure integer arithmetic on the rank, so a distributed_rank feeds it
    without any global sort."""
    q, r = divmod(int(n_rows), int(k))
    if q == 0:
        # fewer rows than buckets: NTILE gives bucket = rank
        return F.col(rank_col).cast("long")
    cutoff = r * (q + 1)
    return (
        F.when(
            F.col(rank_col) <= cutoff,
            1 + F.expr(f"({rank_col} - 1) div {q + 1}"),
        )
        .otherwise(1 + r + F.expr(f"({rank_col} - {cutoff} - 1) div {q}"))
        .cast("long")
    )
