"""Source/sink format support."""

from cubefs_hadoop_spark.sources.formats import read_any, write_any  # noqa: F401
