"""cubefs_hadoop_spark — a PySpark-native analytics engine with the
capability surface of cubefs/cubefs-hadoop (reference at /root/reference,
surveyed in SURVEY.md).

The reference is a Hadoop-Compatible FileSystem connector
(io.cubefs.CubefsFileSystem, src/main/java/io/cubefs/CubefsFileSystem.java:43)
whose purpose is to let Hadoop-API engines (Spark, Hive, Presto/Trino, Flink,
HDFS shell — reference README.md:61-88) run their full query surface over
CubeFS-stored data.  This package re-expresses that capability Spark-first:

- ``engine``      — the storage/table contract (SURVEY §2A, N1-N19 analogs)
- ``queries``     — the delegated relational surface (SURVEY §2B, Q01-Q40)
- ``streaming``   — Structured Streaming surface (SURVEY §2B, S01-S08)
- ``extensions``  — LLM-pipeline operators (SURVEY §2C, X01-X06): dedup,
                    similarity search, text analysis, multimodal columns
- ``sources``     — binary/multimodal ingestion helpers
"""

from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
