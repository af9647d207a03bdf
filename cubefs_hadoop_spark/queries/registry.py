"""Query registry: named (spark, sf_dir) -> DataFrame callables plus their
DuckDB oracle SQL (driver correctness contract, SURVEY §5 t2).

Determinism contract baked into every registered query (FIXTURES.md):
UTC session timezone; full ORDER BY over all output columns; floating
aggregates wrapped CAST(ROUND(x,2) AS DECIMAL(18,2)); money sums computed
over per-row DECIMAL(18,2) casts so partial-aggregation order (which varies
with partitioning/parallelism) can never change the hashed value.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is the DuckDB-runnable
    ANSI SQL twin (omitted for non-SQL-expressible ops -> rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco
