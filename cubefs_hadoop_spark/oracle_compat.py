"""Cross-engine numeric normalization helpers (the "R2 protocol").

Shared by the relational query surface and the extension operators so both
hash bit-identical to the DuckDB oracle.  Lives at package top level
(not under ``queries/``) so extension modules can import it without
re-entering ``queries/__init__``'s registrant imports — that cycle is what
made ``import cubefs_hadoop_spark.extensions.components`` explode once the
reorder guard went loud (ADVICE r03 follow-on).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def r2(c: Column) -> Column:
    """The R2 normalization: CAST(ROUND(x, 2) AS DECIMAL(18,2))."""
    return F.round(c, 2).cast(DEC)


def r2d(c: Column) -> Column:
    """R2 for DOUBLE-typed expressions, emulating numeric (scaled-double)
    rounding: sign * floor(|x|*100 + 0.5) / 100.

    Spark's round() rounds the shortest decimal representation of the double
    (BigDecimal.valueOf), while DuckDB rounds the scaled double numerically;
    on exact .xx5 midpoints (e.g. 4201.315) they disagree.  This form is
    verified bit-equal to DuckDB ROUND(x,2) on a 100k-value fuzz battery.
    Use r2() for DECIMAL expressions (exact on both engines) and r2d() for
    anything double: avg, sqrt, stddev, cosine, pandas-UDF results.
    """
    sign = F.when(c < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (sign * F.floor(F.abs(c) * 100 + F.lit(0.5)) / 100).cast(DEC)


def dec(c: Column | str) -> Column:
    """Per-row decimal cast: makes SUMs exact and order-independent, so the
    hashed value is identical across partition counts and engines."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)
