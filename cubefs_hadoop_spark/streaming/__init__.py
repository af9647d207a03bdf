"""Structured Streaming surface (SURVEY §2B S01-S08)."""

from cubefs_hadoop_spark.streaming import ops  # noqa: F401
