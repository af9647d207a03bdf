"""Query catalog: importing this package populates the registry."""

from cubefs_hadoop_spark.queries.registry import ORACLE, QUERIES, register

# Modules self-register on import.
from cubefs_hadoop_spark.queries import relational  # noqa: E402,F401
from cubefs_hadoop_spark.queries import functions_extra  # noqa: E402,F401

try:  # batch twins of the streaming surface (S-series)
    from cubefs_hadoop_spark.queries import streaming_twins  # noqa: F401
except ImportError:
    pass
try:  # pandas-UDF surface (U-series)
    from cubefs_hadoop_spark.queries import udfs  # noqa: F401
except ImportError:
    pass
try:  # LLM-pipeline extensions (X-series)
    from cubefs_hadoop_spark import extensions  # noqa: F401
except ImportError:
    pass

__all__ = ["QUERIES", "ORACLE", "register"]
