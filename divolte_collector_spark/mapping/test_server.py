"""Mapping test harness (reference S6, MappingTestServer.java:60-140).

The reference ships a standalone server: POST a JSON-described
synthetic event, run the mapping, get the mapped record back as JSON.
The engine equivalent is a function: event dict -> mapped record dict,
running the exact production code path (a 1-row DataFrame through
``MappingBuilder.apply``), so mapping authors can unit-test specs
without wire traffic — the same purpose the reference's
``/event`` endpoint serves.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Row, SparkSession

from divolte_collector_spark.mapping.dsl import MappingBuilder

#: the normalized DivolteEvent surface the test server accepts
#: (MappingTestServer.java EventParameters: matches DivolteEvent.java:36-61)
_EVENT_FIELDS = (
    "party_id string, session_id string, event_id string, "
    "event_source string, event_type string, corrupt_event boolean, "
    "duplicate boolean, new_party_id boolean, first_in_session boolean, "
    "client_time timestamp, request_start_time timestamp, "
    "remote_host string, referer string, location string, "
    "user_agent string, event_parameters string, "
    "viewport_pixel_width int, viewport_pixel_height int, "
    "screen_pixel_width int, screen_pixel_height int, "
    "device_pixel_ratio int, page_view_id string"
)


def _field_types() -> dict[str, str]:
    # parse with the real DDL parser: a split-on-', ' parse would
    # silently corrupt the schema the moment a parameterized type
    # (decimal(10,2), map<string,string>) joins the event surface
    from pyspark.sql.types import StructType

    return {
        f.name: f.dataType.simpleString()
        for f in StructType.fromDDL(_EVENT_FIELDS).fields
    }


def as_test_events(partial) -> "DataFrame":
    """Normalize a PARTIAL event frame to the full test-server surface:
    columns the caller provides are cast to the canonical type, every
    other DivolteEvent field becomes a typed null (so schema defaults
    and absent-field semantics run exactly as they do for a POSTed
    JSON event with missing keys); unknown columns are rejected the
    same way the server 400s unknown JSON fields
    (MappingTestServer.java:86-108). This is the one normalization
    path — run_mapping_test's single-row frame and the distributed
    gate query both go through it."""
    from pyspark.sql import functions as F

    types = _field_types()
    unknown = set(partial.columns) - set(types)
    if unknown:
        raise ValueError(f"unknown event fields: {sorted(unknown)}")
    return partial.select(
        *[
            (F.col(n) if n in partial.columns else F.lit(None))
            .cast(t)
            .alias(n)
            for n, t in types.items()
        ]
    )


def run_mapping_test(
    spark: SparkSession, mapping: MappingBuilder, event: dict[str, Any]
) -> dict[str, Any]:
    """Run one synthetic event through a mapping; return the mapped
    record as a plain dict (absent fields carry schema defaults)."""
    base = {name: None for name in _field_types()}
    unknown = set(event) - set(base)
    if unknown:
        raise ValueError(f"unknown event fields: {sorted(unknown)}")
    base.update(event)
    df = as_test_events(spark.createDataFrame([Row(**base)], _EVENT_FIELDS))
    mapped = mapping.apply(df)
    return mapped.first().asDict(recursive=True)
