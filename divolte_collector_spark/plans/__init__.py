"""Plan inspection utilities (SURVEY §4).

The engine needs no custom Catalyst rules — the "plans" layer is
instead about *verifying* that Catalyst produced the physical plan the
scale design assumes: filters pushed to the scan, dims broadcast (never
nested-loop), aggregations partial+final, one exchange where one is
designed. ``audit()`` extracts those properties; tests/test_plan_shapes
asserts them per query and ``tools/plan_audit.py`` dumps them for
review.
"""

from divolte_collector_spark.plans.audit import (
    PlanAudit,
    audit,
    bounded_local_relation,
    explain_formatted,
    rowwise_python_nodes,
    unbounded_loop_joins,
    unpartitioned_unbounded_windows,
)

__all__ = [
    "PlanAudit",
    "audit",
    "bounded_local_relation",
    "explain_formatted",
    "rowwise_python_nodes",
    "unbounded_loop_joins",
    "unpartitioned_unbounded_windows",
]
