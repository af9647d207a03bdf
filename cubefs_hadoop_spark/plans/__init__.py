"""Physical-plan-level utilities: audit, bucketing, skew, partitioning,
layout maintenance."""

from cubefs_hadoop_spark.plans.audit import PlanAudit, audit_plan  # noqa: F401
from cubefs_hadoop_spark.plans.bucketing import (  # noqa: F401
    read_bucketed_table,
    write_bucketed_table,
)
from cubefs_hadoop_spark.plans.layout import (  # noqa: F401
    cluster_by,
    cluster_by_zorder,
    compact,
    zorder_key,
)
from cubefs_hadoop_spark.plans.partitioning import (  # noqa: F401
    read_partitioned,
    write_partitioned,
)
from cubefs_hadoop_spark.plans.skew import salted_join  # noqa: F401
