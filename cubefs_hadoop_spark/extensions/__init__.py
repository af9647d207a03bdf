"""LLM-pipeline extension operators (SURVEY §2C): dedup, similarity,
text analysis, multimodal columns.  Importing registers the X-series
queries."""

from cubefs_hadoop_spark.extensions import dedup, similarity, text  # noqa: F401
from cubefs_hadoop_spark.extensions import multimodal  # noqa: F401
from cubefs_hadoop_spark.extensions import semantic  # noqa: F401
from cubefs_hadoop_spark.extensions import packing  # noqa: F401
from cubefs_hadoop_spark.extensions import curation  # noqa: F401
from cubefs_hadoop_spark.extensions import search  # noqa: F401
from cubefs_hadoop_spark.extensions import timeseries  # noqa: F401
from cubefs_hadoop_spark.extensions import tokenize  # noqa: F401
from cubefs_hadoop_spark.extensions import behavior  # noqa: F401
from cubefs_hadoop_spark.extensions import sketch  # noqa: F401
