"""Multi-format source/sink support.

The reference's entire value proposition is format-agnostic byte transport:
"any Hadoop-API engine can read/write ANY file format over CubeFS"
(reference README.md:61-88 — the connector never interprets bytes,
CubefsInputStream.java:106-124).  The Spark-native equivalent is the
DataSource V2 format registry; this module exposes the format surface the
host engines actually use on such storage: parquet (default), ORC, CSV,
JSON, text, and binaryFile, with the engine's determinism conf applied.

Format guidance baked in (100 TB posture):
- parquet/ORC: columnar, splittable, predicate pushdown — the hot path.
- CSV/JSON: ingestion-only formats; schema must be supplied (inference is
  a full extra scan) and files gzip-compressed are NOT splittable — the
  engine rejects schemaless reads of these at write time of this module's
  API rather than silently scanning twice.
- text/binaryFile: raw byte access (N3/N4 analog) for fixture generation
  and multimodal ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cubefs_hadoop_spark.errors import EngineIOError

SPLITTABLE_COLUMNAR = ("parquet", "orc")
ROW_FORMATS = ("csv", "json", "text")
READ_ONLY = ("binaryFile",)
ALL_FORMATS = SPLITTABLE_COLUMNAR + ROW_FORMATS + READ_ONLY


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``.  CSV/JSON require an explicit schema: at
    100 TB, schema inference is a second full scan of the data."""
    if fmt not in ALL_FORMATS:
        raise EngineIOError(f"unsupported format {fmt!r}; one of {ALL_FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise EngineIOError(
            f"{fmt} reads require an explicit schema (inference = extra full scan)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` through Spark's committer (the
    N6/N7/N9/N10 create-write-flush-rename contract)."""
    if fmt not in SPLITTABLE_COLUMNAR + ROW_FORMATS:
        raise EngineIOError(f"unsupported sink format {fmt!r}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
