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


def _iter_children(p):
    it = p.children().iterator()
    while it.hasNext():
        yield it.next()


def _iter_subqueries(p):
    """Plans attached to EXPRESSIONS of ``p`` (scalar / IN subqueries):
    ``QueryPlan.subqueries`` yields each ``BaseSubqueryExec``'s plan, a
    subtree the ``children()`` walk never reaches."""
    it = p.subqueries().iterator()
    while it.hasNext():
        yield it.next()


#: rows accepted from a driver-literal relation before it stops
#: counting as structurally bounded: beyond this a "literal" probe
#: grid is big enough that broadcasting it into a loop join is a real
#: scale cost, and the query must earn an allowlist entry instead
_LOCAL_RELATION_CAP = 10_000

#: output-attribute exprId sets of REGISTERED driver-literal
#: relations, -> row count. PySpark's createDataFrame(local rows)
#: plans as RDDScanExec ("Scan ExistingRDD"), indistinguishable in
#: the plan from an arbitrary RDD-backed frame, so boundedness cannot
#: be read off the node; builders that feed a loop join register the
#: relation here via bounded_local_relation(). Insertion-ordered with
#: a hard cap so a long-lived session cannot grow it without bound.
_BOUNDED_LOCAL_IDS: dict[tuple, int] = {}
_BOUNDED_LOCAL_IDS_CAP = 4096


def _output_expr_ids(plan_node) -> tuple:
    """Sorted (id, jvmId) pairs of a plan node's output attributes —
    stable from analysis through execution, so a relation registered
    at build time is recognizable in the executed plan."""
    ids = []
    it = plan_node.output().iterator()
    while it.hasNext():
        e = it.next().exprId()
        ids.append((e.id(), str(e.jvmId())))
    return tuple(sorted(ids))


def bounded_local_relation(spark, data, schema) -> DataFrame:
    """``createDataFrame`` plus registration with the loop-join guard:
    the returned frame's output attributes are recorded with the
    relation's ROW COUNT, so ``_structurally_bounded`` can accept it
    as a loop-join broadcast side on evidence instead of trusting
    every RDD scan (the round-11 loophole). Raises when the relation
    exceeds ``_LOCAL_RELATION_CAP`` — a driver-literal relation that
    big should not exist, let alone feed a nested-loop join."""
    data = list(data)
    if len(data) > _LOCAL_RELATION_CAP:
        raise ValueError(
            f"bounded_local_relation: {len(data)} rows exceeds the "
            f"{_LOCAL_RELATION_CAP}-row driver-literal cap"
        )
    df = spark.createDataFrame(data, schema)
    key = _output_expr_ids(df._jdf.queryExecution().analyzed())
    _BOUNDED_LOCAL_IDS[key] = len(data)
    while len(_BOUNDED_LOCAL_IDS) > _BOUNDED_LOCAL_IDS_CAP:
        del _BOUNDED_LOCAL_IDS[next(iter(_BOUNDED_LOCAL_IDS))]
    return df


def _structurally_bounded(node) -> bool:
    """True when ``node``'s output row count is bounded by the QUERY
    STRUCTURE rather than the input volume — the property that makes a
    nested-loop/cartesian side safe at any data scale.

    Bounding constructs:
    - Limit / TakeOrderedAndProject / CollectLimit: at most K rows.
    - LocalTableScan / OneRowRelation: driver-literal relations
      (probe grids, fixed query sets) whose size is written in the
      program text.
    - RangeExec: ``spark.range(n)`` with a literal n.
    - a global aggregate (grouping expressions EMPTY): exactly one
      row out of the final pass (scalar subqueries plan as these).
    - a join/union of bounded inputs is bounded (K1 x K2 / K1 + K2);
      any other multi-child node requires ALL children bounded.
    - a single-child node is bounded iff its child is.

    A plain Filter/Scan is NOT bounded: its output scales with input.
    """
    cls = node.getClass().getSimpleName()
    if "Limit" in cls or cls == "TakeOrderedAndProjectExec":
        return True
    if cls == "LocalTableScanExec":
        # the literal rows live on the node — bound them (an AQE
        # empty-relation conversion also lands here, trivially small)
        return node.rows().length() <= _LOCAL_RELATION_CAP
    if cls in ("OneRowRelationExec", "RangeExec", "EmptyRelationExec"):
        # RangeExec's numElements is a plan literal
        return True
    if cls == "RDDScanExec":
        # PySpark's createDataFrame(local rows) plans as "Scan
        # ExistingRDD", indistinguishable from an arbitrary RDD-backed
        # frame — bounded ONLY when the builder registered it (with
        # its row count) via bounded_local_relation(); an unregistered
        # RDD scan falls to the allowlist like any other opaque side.
        # (Closes the round-11 loophole: a 100k-row createDataFrame
        # no longer passes the loop-join guard silently.)
        n = _BOUNDED_LOCAL_IDS.get(_output_expr_ids(node))
        return n is not None and n <= _LOCAL_RELATION_CAP
    if "Aggregate" in cls and hasattr(node, "groupingExpressions"):
        if node.groupingExpressions().length() == 0:
            return True
    if cls == "AdaptiveSparkPlanExec":
        return _structurally_bounded(node.initialPlan())
    if cls == "InMemoryTableScanExec":
        return _structurally_bounded(node.relation().cachedPlan())
    if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        return _structurally_bounded(node.child())
    if cls.startswith("BroadcastQueryStage") or cls.startswith("ShuffleQueryStage"):
        return _structurally_bounded(node.plan())
    kids = list(_iter_children(node))
    if not kids:
        return False
    return all(_structurally_bounded(k) for k in kids)


def unbounded_loop_joins(df: DataFrame) -> list[str]:
    """Every CartesianProduct node, plus every BroadcastNestedLoopJoin
    whose BROADCAST side is not structurally bounded — the two join
    shapes whose cost is |left| x |right| and therefore cannot survive
    a 100 TB relation unless one side's size is a property of the
    query text (a scalar subquery, a literal probe grid, a top-K).
    Companion to :func:`unpartitioned_unbounded_windows`; swept over
    every gated query by tests/test_plan_shapes.py."""
    hits: list[str] = []
    seen: set[int] = set()

    def walk(p) -> None:
        cls = p.getClass().getSimpleName()
        oid = p.hashCode()
        if cls == "CartesianProductExec" and oid not in seen:
            # same acceptance as the BNLJ branch: K1 x K2 of two
            # structurally bounded sides (a literal grid cross a
            # scalar aggregate) is constant-size at any data scale
            kids = list(_iter_children(p))
            if not all(_structurally_bounded(k) for k in kids):
                seen.add(oid)
                hits.append(f"{cls}: {p.simpleStringWithNodeId()}")
        if cls == "BroadcastNestedLoopJoinExec" and oid not in seen:
            kids = list(_iter_children(p))
            build = str(p.buildSide())
            side = kids[0] if build == "BuildLeft" else kids[1]
            if not _structurally_bounded(side):
                seen.add(oid)
                hits.append(
                    f"{cls}[{build}]: {p.simpleStringWithNodeId()}"
                )
        for k in _iter_children(p):
            walk(k)
        # ADVICE r11: a loop join inside a scalar/IN subquery plan is
        # attached to an EXPRESSION, not a child — recurse there too
        for sq in _iter_subqueries(p):
            walk(sq)
        if cls == "AdaptiveSparkPlanExec":
            walk(p.initialPlan())
        if cls == "InMemoryTableScanExec":
            walk(p.relation().cachedPlan())
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            walk(p.child())
        if cls.startswith("BroadcastQueryStage") or cls.startswith("ShuffleQueryStage"):
            walk(p.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return hits


def rowwise_python_nodes(df: DataFrame) -> list[str]:
    """Every BatchEvalPython node — a row-at-a-time (pickled, non-
    Arrow) Python UDF in the plan. The repo's policy is Arrow-only
    Python crossings (ArrowEvalPython / mapInPandas); a pickled UDF is
    10-100x slower per row and must never reach a gated plan."""
    plan = explain_formatted(df)
    return re.findall(r"^\(\d+\) BatchEvalPython.*$", plan, flags=re.M)


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
        # ADVICE r11: windows inside scalar/IN subquery plans hang off
        # expressions; sweep them like the loop-join detector does
        for sq in _iter_subqueries(p):
            walk(sq)
        if cls == "AdaptiveSparkPlanExec":
            walk(p.initialPlan())
        if cls == "InMemoryTableScanExec":
            walk(p.relation().cachedPlan())
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            walk(p.child())

    walk(df._jdf.queryExecution().executedPlan())
    return hits
