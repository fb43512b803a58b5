"""Differential fuzz of the mapping DSL compiler (§2.3, M1-M7): random
program trees — ordered maps, nested when/section, exit_/stop_ — are
compiled to guarded Column expressions by MappingBuilder AND executed
by an independent per-row Python interpreter of the reference's
ordered CONTINUE/EXIT/STOP semantics (DslRecordMapping.java:1203-1210,
DslRecordMapper.java:80-90); outputs must match cell-for-cell over a
row grid covering every null/True/False arm of every condition. The 41
ported Groovy fixtures pin known programs; this pins the COMPILATION
SCHEME itself (guard accumulation, alive-predicate scoping,
ordered-overwrite, presence checks) against generated programs."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from divolte_collector_spark.mapping.dsl import MappingBuilder

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

pytestmark = pytest.mark.skipif(not _HAVE_HYP, reason="hypothesis absent")

_SCHEMA = T.StructType(
    [
        T.StructField("la", T.LongType()),
        T.StructField("sb", T.StringType()),
        T.StructField("bc", T.BooleanType()),
    ]
)

#: every combination of the three input columns' interesting values —
#: both sides of each comparison, plus None for absent-propagation
_ROWS = [
    {"row_id": i, "a": a, "b": b, "c": c}
    for i, (a, b, c) in enumerate(
        itertools.product(
            [None, -2, 0, 1, 3], [None, "x", "y"], [None, True, False]
        )
    )
]

# (field, literal) pairs and (field, source column) pairs, type-valid
_LIT_CHOICES = [
    ("la", 7), ("la", -1), ("sb", "L1"), ("sb", "L2"),
    ("bc", True), ("bc", False),
]
_COL_CHOICES = [("la", "a"), ("sb", "b"), ("bc", "c")]
_CONDS = ["a_gt_0", "a_gt_2", "b_eq_x", "c_true", "a_notnull", "b_null"]


def _cond_column(name):
    return {
        "a_gt_0": F.col("a") > 0,
        "a_gt_2": F.col("a") > 2,
        "b_eq_x": F.col("b") == "x",
        "c_true": F.col("c"),
        "a_notnull": F.col("a").isNotNull(),
        "b_null": F.col("b").isNull(),
    }[name]


def _cond_py(name, row):
    a, b, c = row["a"], row["b"], row["c"]
    return {
        "a_gt_0": a is not None and a > 0,
        "a_gt_2": a is not None and a > 2,
        "b_eq_x": b is not None and b == "x",
        "c_true": c is True,
        "a_notnull": a is not None,
        "b_null": b is None,
    }[name]


if _HAVE_HYP:
    _leaf = st.one_of(
        st.sampled_from([("lit", f, v) for f, v in _LIT_CHOICES]),
        st.sampled_from([("col", f, s) for f, s in _COL_CHOICES]),
        st.just(("exit",)),
        st.just(("stop",)),
    )

    _program = st.recursive(
        st.lists(_leaf, min_size=1, max_size=4),
        lambda inner: st.lists(
            st.one_of(
                _leaf,
                st.tuples(
                    st.just("when"), st.sampled_from(_CONDS), inner
                ),
                st.tuples(st.just("section"), inner),
            ),
            min_size=1,
            max_size=4,
        ),
        max_leaves=14,
    )


class _Exit(Exception):
    pass


class _Stop(Exception):
    pass


def _interpret_block(actions, row, record):
    """Reference semantics: ordered execution with EXIT escaping the
    innermost section (the whole mapping at top level) and STOP ending
    the mapping."""
    for act in actions:
        kind = act[0]
        if kind == "lit":
            record[act[1]] = act[2]
        elif kind == "col":
            v = row[act[2]]
            if v is not None:  # presence check: absent leaves as-is
                record[act[1]] = v
        elif kind == "exit":
            raise _Exit
        elif kind == "stop":
            raise _Stop
        elif kind == "when":
            if _cond_py(act[1], row):
                _interpret_block(act[2], row, record)
        elif kind == "section":
            try:
                _interpret_block(act[1], row, record)
            except _Exit:
                pass  # escapes to end of THIS section only


def _interpret(program, row):
    record = {"la": None, "sb": None, "bc": None}
    try:
        _interpret_block(program, row, record)
    except (_Exit, _Stop):  # top-level exit ends the whole mapping too
        pass
    return record


def _build_block(m, actions):
    for act in actions:
        kind = act[0]
        if kind == "lit":
            m.map_literal(act[2], act[1])
        elif kind == "col":
            m.map_value(F.col(act[2]), act[1])
        elif kind == "exit":
            m.exit_()
        elif kind == "stop":
            m.stop_()
        elif kind == "when":
            with m.when(_cond_column(act[1])):
                _build_block(m, act[2])
        elif kind == "section":
            with m.section():
                _build_block(m, act[1])


if _HAVE_HYP:

    @settings(
        max_examples=40, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_program)
    def test_compiled_mapping_matches_reference_interpreter(spark, program):
        df = spark.createDataFrame(
            _ROWS, "row_id long, a long, b string, c boolean"
        )
        m = MappingBuilder(_SCHEMA)
        _build_block(m, program)
        exprs = m.compile(df)
        got = {
            r["row_id"]: (r["la"], r["sb"], r["bc"])
            for r in df.select(
                "row_id", *[exprs[f].alias(f) for f in ("la", "sb", "bc")]
            ).collect()
        }
        for row in _ROWS:
            want = _interpret(program, row)
            assert got[row["row_id"]] == (
                want["la"], want["sb"], want["bc"],
            ), (program, row)
