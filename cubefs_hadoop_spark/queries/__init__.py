"""Query catalog: importing this package populates the registry."""

from cubefs_hadoop_spark.queries.registry import ORACLE, QUERIES, register

# Modules self-register on import.
from cubefs_hadoop_spark.queries import relational  # noqa: E402,F401
from cubefs_hadoop_spark.queries import functions_extra  # noqa: E402,F401

# Import loudly: a swallowed ImportError here would silently drop whole
# query families from the driver's correctness gate.
from cubefs_hadoop_spark.queries import streaming_twins  # noqa: E402,F401
from cubefs_hadoop_spark.queries import tpch_shapes  # noqa: E402,F401
from cubefs_hadoop_spark.queries import udfs  # noqa: E402,F401
from cubefs_hadoop_spark import extensions  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "register"]
