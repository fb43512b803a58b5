"""Extract scale-relevant properties from a DataFrame's physical plan."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The 'formatted' explain output as a string."""
    spark = df.sparkSession
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcast_hash_joins: int
    n_sortmerge_joins: int
    has_nested_loop_join: bool
    has_cartesian_product: bool
    n_python_eval_nodes: int
    n_rowwise_python_nodes: int
    n_wholestage_codegen: int
    #: diamond heuristic — a source scanned (or an explode planned)
    #: more times than the query joins that relation usually means a
    #: shared subtree Catalyst re-planned per consumer (the tfidf /
    #: unigram-LM class of defect, both fixed in round 9); eyeball any
    #: query whose counts exceed its documented shape
    n_scans: int = 0
    n_generates: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def audit(df: DataFrame) -> PlanAudit:
    plan = explain_formatted(df)

    def nodes(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.M))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = [
        line.split("ReadSchema: ", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema: " in line
    ]
    return PlanAudit(
        n_exchanges=nodes("Exchange"),
        n_broadcast_hash_joins=nodes("BroadcastHashJoin"),
        n_sortmerge_joins=nodes("SortMergeJoin"),
        has_nested_loop_join=nodes("BroadcastNestedLoopJoin") > 0,
        has_cartesian_product=nodes("CartesianProduct") > 0,
        n_python_eval_nodes=nodes("ArrowEvalPython") + nodes("BatchEvalPython"),
        n_rowwise_python_nodes=nodes("BatchEvalPython"),
        n_wholestage_codegen=len(
            set(re.findall(r"codegen id : (\d+)", plan))
        ),
        n_scans=nodes("Scan parquet") + nodes("BatchScan"),
        n_generates=nodes("Generate"),
        pushed_filters=[p for p in pushed if p],
        read_schemas=schemas,
    )


def unpartitioned_unbounded_windows(df: DataFrame) -> list[str]:
    """Every physical Window node whose partition spec is EMPTY and
    whose input subtree contains no Limit — i.e. a single-task sort of
    a potentially unbounded relation, the one window shape that cannot
    survive a 100 TB input. Used by the repo-wide plan guard
    (tests/test_plan_shapes.py): any gated query producing one must
    either move to the two-phase scan (operators/prefixsum.py) or be
    explicitly allowlisted with a boundedness argument.

    Traversal covers AQE wrappers (``initialPlan``) and cached
    relations (``InMemoryTableScanExec`` → ``relation().cachedPlan()``)
    so a global window cannot hide behind a persist. ``WindowGroupLimit``
    nodes are exempt: their Partial pass bounds each task's output to
    K rows before any exchange, so the Final global pass sorts K*tasks
    rows, not the relation.
    """
    hits: list[str] = []
    seen: set[tuple] = set()

    def bounded_below(node) -> bool:
        """True if every row path into ``node`` passes a Limit."""
        stack = [node]
        while stack:
            p = stack.pop()
            cls = p.getClass().getSimpleName()
            if "Limit" in cls or "TakeOrderedAndProject" in cls:
                return True
        # (a Limit on ONE branch of a join does not bound the other —
        # conservatively require a Limit on the direct spine: stop
        # descending at multi-child nodes)
            it = p.children().iterator()
            kids = []
            while it.hasNext():
                kids.append(it.next())
            if len(kids) == 1:
                stack.extend(kids)
        return False

    def walk(p) -> None:
        oid = p.hashCode()
        cls = p.getClass().getSimpleName()
        if (
            "Window" in cls
            and "GroupLimit" not in cls
            and hasattr(p, "partitionSpec")
            and p.partitionSpec().length() == 0
        ):
            it = p.children().iterator()
            child = it.next() if it.hasNext() else None
            if child is None or not bounded_below(child):
                key = (oid, cls)
                if key not in seen:
                    seen.add(key)
                    hits.append(f"{cls}: {p.simpleStringWithNodeId()}")
        it = p.children().iterator()
        while it.hasNext():
            walk(it.next())
        if cls == "AdaptiveSparkPlanExec":
            walk(p.initialPlan())
        if cls == "InMemoryTableScanExec":
            walk(p.relation().cachedPlan())
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            walk(p.child())

    walk(df._jdf.queryExecution().executedPlan())
    return hits
