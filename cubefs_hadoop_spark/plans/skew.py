"""Skew-aware join: salting.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  Salting is the static
fallback for the pathological case AQE can't fix: one join key so hot that
a single task would still own it after splitting (the classic null-key /
celebrity-key problem at 100 TB).

Pattern: explode the SMALL side S ways (one copy per salt), scatter the
large side uniformly over S salts, join on (key, salt).  The hot key's rows
now land on S tasks instead of 1; total data moved grows only by S x |small|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` with ``small`` on column ``on``, salted ``salt`` ways.

    The large side gets a deterministic per-row salt (xxhash64 of the whole
    row modulo salt — uniform, no RNG so retries/speculative tasks agree);
    the small side is exploded across all salts.  Output columns = the
    plain join's columns.
    """
    lcols = large.columns
    scols = [c for c in small.columns if c != on]
    salted_large = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt)).cast("int"),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_large.join(salted_small, [on, "_salt"], how)
    return joined.select(*lcols, *scols)
