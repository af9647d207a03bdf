"""Physical-plan-level utilities: bucketing, skew mitigation."""

from cubefs_hadoop_spark.plans.skew import salted_join  # noqa: F401
from cubefs_hadoop_spark.plans.bucketing import (  # noqa: F401
    write_bucketed_table,
    read_bucketed_table,
)
