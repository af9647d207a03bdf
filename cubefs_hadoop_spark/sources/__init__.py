"""Source/sink support: multi-format IO and the cfsfiles custom
Python DataSource (batch + streaming connector contract)."""

from cubefs_hadoop_spark.sources.cfs_source import (  # noqa: F401
    CfsFilesDataSource,
    read_files,
)
from cubefs_hadoop_spark.sources.formats import read_any, write_any  # noqa: F401
