"""Plan auditing: programmatic checks on the physical plan.

"Run .explain and iterate until it's the plan you'd want" as code: extract
the properties that matter at 100 TB — pushed filters, pruned read schemas,
join strategies, shuffle count, Python-eval presence — so tests and CI can
assert them instead of a human eyeballing explain output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    shuffles: int = 0
    has_python_eval: bool = False
    has_take_ordered: bool = False
    has_window_group_limit: bool = False
    text: str = ""

    def scan_columns(self) -> list[set[str]]:
        """Column sets actually read from each scan (pruning check)."""
        out = []
        for rs in self.read_schemas:
            out.append(set(re.findall(r"(\w+):", rs)))
        return out


def audit_plan(df: DataFrame) -> PlanAudit:
    """Parse the formatted physical plan into assertable facts."""
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    text = je.explainString(mode)
    a = PlanAudit(text=text)
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            a.pushed_filters.append(s.removeprefix("PushedFilters:").strip())
        elif s.startswith("ReadSchema:"):
            a.read_schemas.append(s.removeprefix("ReadSchema:").strip())
    a.broadcast_joins = text.count("BroadcastHashJoin")
    a.sort_merge_joins = text.count("SortMergeJoin")
    a.nested_loop_joins = text.count("BroadcastNestedLoopJoin") + text.count(
        "CartesianProduct"
    )
    a.shuffles = len(re.findall(r"\bExchange hashpartitioning", text)) + len(
        re.findall(r"\bExchange rangepartitioning", text)
    )
    a.has_python_eval = "BatchEvalPython" in text or "ArrowEvalPython" in text
    a.has_take_ordered = "TakeOrderedAndProject" in text
    a.has_window_group_limit = "WindowGroupLimit" in text
    return a
