"""Mapping DSL compiler (reference §2.3, DslRecordMapping.java /
MappingBase.groovy / DslRecordMapper.java).

The reference interprets an ordered list of MappingActions per event
with CONTINUE/EXIT/STOP control flow (DslRecordMapping.java:1203-1210,
DslRecordMapper.java:80-90). This compiler turns the same surface —

    ``map value onto field`` / ``map literal onto field`` /
    ``when(cond): ...`` / ``section(): ...`` / ``exit_()`` / ``stop_()``

— into ONE ``DataFrame.select`` of guarded Column expressions (pure
dataflow; Catalyst optimizes and executes). Control flow compiles to
accumulated guard predicates:

- each action's guard = AND of enclosing ``when`` conditions (absent
  condition => false, DslRecordMapping.java:144-163) and the *alive*
  predicates of every enclosing section;
- ``exit_()`` makes the innermost section's alive predicate exclude
  rows that reached the exit (DslRecordMapping.java:165-182: escapes
  to end of section; at top level it ends the whole mapping);
- ``stop_()`` does the same to the mapping-global alive predicate
  (DslRecordMapping.java:187-189);
- later ``map`` onto the same field overwrites earlier ones exactly
  when its guard fires and (for producers) the value is present — the
  interpreter's ordered-assignment semantics (Mapping DSL ordering,
  DslRecordMapping.java:102-118).

Validation is startup-time, like the reference (schema analysis at
build; a mapping onto a missing field or with a type mismatch raises
SchemaMappingException before any data moves —
DslRecordMapping.java:102-139).
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from divolte_collector_spark.functions.booleans import cond_holds
from divolte_collector_spark.mapping.avro_schema import (
    SchemaMappingException,
    avro_to_spark_schema,
)

_LITERAL_TYPES: list[tuple[type, T.DataType]] = [
    (bool, T.BooleanType()),
    (int, T.LongType()),       # int literals accepted for int/long fields
    (float, T.DoubleType()),
    (str, T.StringType()),
    (bytes, T.BinaryType()),
]


@dataclass
class _Assignment:
    field: str
    value: Column
    guard: Column          # full guard incl. alive predicates
    check_presence: bool   # producers: set only when value non-null


class _Scope:
    """A section (or the top-level mapping): tracks its alive predicate."""

    def __init__(self) -> None:
        self.alive: Column = F.lit(True)


class MappingBuilder:
    """Python surface of the Groovy mapping DSL (MappingBase.groovy:29-114).

    Usage::

        m = MappingBuilder(schema)          # StructType or avsc dict
        m.map_value(F.col("location"), "location")
        m.map_literal("pageView", "eventType")
        with m.when(F.col("referer").isNotNull()):
            m.map_literal(True, "hasReferer")
        with m.section():
            with m.when(cond):
                m.exit_()
        out = m.apply(events_df)            # -> DataFrame with schema cols
    """

    def __init__(self, schema: T.StructType | dict, defaults: dict[str, Any] | None = None):
        self._enums: dict[str, list[str]] = {}
        if isinstance(schema, dict):
            from divolte_collector_spark.mapping.avro_schema import (
                enum_fields,
            )

            self._enums = enum_fields(schema)
            schema, avsc_defaults = avro_to_spark_schema(schema)
            defaults = {**avsc_defaults, **(defaults or {})}
        self.schema: T.StructType = schema
        self.defaults: dict[str, Any] = defaults or {}
        self._fields = {f.name: f for f in schema.fields}
        self._assignments: list[_Assignment] = []
        self._scopes: list[_Scope] = [_Scope()]       # [0] = top level
        self._when_conds: list[Column] = []

    # -- control flow -------------------------------------------------------

    @contextlib.contextmanager
    def when(self, cond: Column):
        """``when(cond) apply {...}``: absent condition => block skipped."""
        self._when_conds.append(cond_holds(cond))
        try:
            yield self
        finally:
            self._when_conds.pop()

    @contextlib.contextmanager
    def section(self):
        """``section {...}``: an ``exit_()`` inside escapes to its end."""
        self._scopes.append(_Scope())
        try:
            yield self
        finally:
            self._scopes.pop()

    def _reached(self) -> Column:
        """Predicate: control flow reaches the current statement."""
        g = F.lit(True)
        for scope in self._scopes:
            g = g & scope.alive
        for c in self._when_conds:
            g = g & c
        return g

    def exit_(self) -> None:
        """Abort the innermost section (the whole mapping at top level)."""
        reached = self._reached()
        scope = self._scopes[-1]
        scope.alive = scope.alive & ~reached

    def stop_(self) -> None:
        """Abort the entire mapping (DslRecordMapping.java:187-189)."""
        reached = self._reached()
        top = self._scopes[0]
        top.alive = top.alive & ~reached

    # -- assignments --------------------------------------------------------

    def _target(self, field: str) -> T.StructField:
        f = self._fields.get(field)
        if f is None:
            raise SchemaMappingException(
                f"mapping references missing schema field: {field!r}"
            )
        return f

    def map_value(self, value: Column, field: str) -> None:
        """``map <producer> onto 'field'``: if present (non-null) and
        type-valid, set the field; otherwise leave as-is."""
        self._target(field)
        if not isinstance(value, Column):
            raise SchemaMappingException(
                f"map_value expects a Column; got {type(value).__name__} "
                f"(use map_literal for constants)"
            )
        self._assignments.append(
            _Assignment(field, value, self._reached(), check_presence=True)
        )

    def map_literal(self, literal: Any, field: str) -> None:
        """``map <literal> onto 'field'`` — compile-time type-checked
        (DslRecordMapping.java:120-139)."""
        target = self._target(field)
        if literal is None:
            raise SchemaMappingException("cannot map a null literal")
        if field in self._enums and literal not in self._enums[field]:
            # startup failure, not a per-record encoder ValueError
            raise SchemaMappingException(
                f"literal {literal!r} is not a symbol of enum field "
                f"{field!r} (symbols: {self._enums[field]})"
            )
        for py_type, spark_type in _LITERAL_TYPES:
            # bool is a subclass of int — check in declared order
            if isinstance(literal, py_type):
                if not _type_compatible(spark_type, target.dataType):
                    raise SchemaMappingException(
                        f"literal {literal!r} ({spark_type.simpleString()}) "
                        f"does not fit field {field!r} "
                        f"({target.dataType.simpleString()})"
                    )
                break
        else:
            if isinstance(literal, (list, tuple, dict)):
                pass  # array/map literals: structural check at apply()
            else:
                raise SchemaMappingException(
                    f"unsupported literal type: {type(literal).__name__}"
                )
        value = F.lit(literal)
        if isinstance(target.dataType, (T.IntegerType, T.FloatType)):
            value = value.cast(target.dataType)
        self._assignments.append(
            _Assignment(field, value, self._reached(), check_presence=False)
        )

    # -- compilation --------------------------------------------------------

    def compile(self, df: DataFrame) -> dict[str, Column]:
        """Fold the ordered assignments into one expression per schema
        field, validating producer types against the declared schema
        (plan-time — the startup-failure semantics of §1.3)."""
        # type-check producers by asking Catalyst for their resolved types
        probe = df.select(
            *[a.value.alias(f"_m{i}") for i, a in enumerate(self._assignments)]
        )
        probe_types = {f.name: f.dataType for f in probe.schema.fields}
        for i, a in enumerate(self._assignments):
            actual = probe_types[f"_m{i}"]
            expected = self._fields[a.field].dataType
            if not _type_compatible(actual, expected):
                raise SchemaMappingException(
                    f"value for field {a.field!r} has type "
                    f"{actual.simpleString()}, schema requires "
                    f"{expected.simpleString()}"
                )

        exprs: dict[str, Column] = {}
        for f in self.schema.fields:
            default = self.defaults.get(f.name)
            exprs[f.name] = (
                F.lit(default).cast(f.dataType)
                if default is not None
                else F.lit(None).cast(f.dataType)
            )
        for i, a in enumerate(self._assignments):
            prev = exprs[a.field]
            fire = a.guard & a.value.isNotNull() if a.check_presence else a.guard
            expected = self._fields[a.field].dataType
            # cast only when the resolved type actually differs —
            # Catalyst refuses "identity" casts that differ only in
            # nullability metadata (e.g. map<string,string> from
            # from_json vs the Avro map type's non-null values)
            value = (
                a.value
                if probe_types[f"_m{i}"].simpleString() == expected.simpleString()
                else a.value.cast(expected)
            )
            exprs[a.field] = F.when(fire, value).otherwise(prev)
        return exprs

    def apply(self, df: DataFrame) -> DataFrame:
        """Run the mapping: DataFrame of normalized events -> DataFrame
        conforming to the declared schema (one Project; the analogue of
        DslRecordMapper.newRecordFromExchange for a whole partition)."""
        exprs = self.compile(df)
        return df.select(*[exprs[f.name].alias(f.name) for f in self.schema.fields])


def _type_compatible(actual: T.DataType, expected: T.DataType) -> bool:
    if actual == expected:
        return True
    # safe widenings only (Avro permits int->long, float->double at the
    # producer boundary via its own COMPATIBLE_PRIMITIVES table)
    if isinstance(actual, T.IntegerType) and isinstance(expected, T.LongType):
        return True
    if isinstance(actual, T.FloatType) and isinstance(expected, T.DoubleType):
        return True
    if isinstance(actual, T.LongType) and isinstance(expected, T.IntegerType):
        return True  # literals parse as long; runtime cast checks range
    if isinstance(actual, T.DoubleType) and isinstance(expected, T.FloatType):
        return True
    if isinstance(actual, T.NullType):
        return True
    if isinstance(actual, T.ArrayType) and isinstance(expected, T.ArrayType):
        return _type_compatible(actual.elementType, expected.elementType)
    if isinstance(actual, T.MapType) and isinstance(expected, T.MapType):
        return _type_compatible(actual.valueType, expected.valueType)
    if isinstance(actual, T.StructType) and isinstance(expected, T.StructType):
        return len(actual.fields) == len(expected.fields) and all(
            a.name == e.name and _type_compatible(a.dataType, e.dataType)
            for a, e in zip(actual.fields, expected.fields)
        )
    return False
