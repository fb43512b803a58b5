"""Config-driven topology: reference.conf-shaped dict -> validated
graph, with the reference's startup-failure semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from divolte_collector_spark.functions.avro_codec import decode_record
from divolte_collector_spark.streaming.config import build_topology
from divolte_collector_spark.streaming.topology import TopologyError

_SCHEMA = {
    "type": "record",
    "name": "MappedEvent",
    "fields": [
        {"name": "party_id", "type": ["null", "string"], "default": None},
        {"name": "event_id", "type": ["null", "string"], "default": None},
        {"name": "event_type", "type": ["null", "string"], "default": None},
    ],
}

# no 'x' checksum param => decoded events carry corrupt_event=true
_QS = (
    "p=0%3Ai1t84hgy%3Aparty&s=0%3Ai1t84hgy%3Asession&v=pv0&e=ev{n}&"
    "c=i0rjfnxd&n=t&f=t&l=http%3A%2F%2Fexample.com%2Fhome&t=pageView"
)


def _raw_browser(spark):
    return spark.createDataFrame(
        [(_QS.format(n=i),) for i in range(3)], "query_string string"
    )


def _raw_json(spark):
    def body(i):
        return json.dumps(
            {
                "event_type": "signup",
                "session_id": "0:i1t84hgy:sess",
                "event_id": f"j-{i}",
                "is_new_party": False,
                "is_new_session": True,
                "client_timestamp_iso": "2024-01-02T03:04:05.678+02:00",
            }
        )

    return spark.createDataFrame(
        [(body(i), "0:i1t84hgy:party") for i in range(2)],
        "body string, party_id_param string",
    )


_CONFIG = {
    "sources": {
        "browser": {"type": "browser"},
        "json_api": {"type": "json"},
    },
    "mappings": {
        "keep_all": {
            "sources": ["browser", "json_api"],
            "sinks": ["kafka_sink"],
            "mapping_script": "project",
        },
        "strict": {
            "sources": ["browser"],
            "sinks": ["kafka_sink"],
            "mapping_script": "project",
            "discard_corrupted": True,
        },
    },
    "sinks": {
        "kafka_sink": {"type": "kafka", "avro_schema": _SCHEMA, "mode": "naked"},
    },
}


def _project(df):
    return df.select("party_id", "event_id", "event_type")


def test_config_builds_and_flows(spark):
    topo = build_topology(
        _CONFIG,
        raw_sources={"browser": _raw_browser(spark), "json_api": _raw_json(spark)},
        mapping_registry={"project": _project},
    )
    inputs = topo.sink_inputs()
    # keep_all passes 3 corrupt browser + 2 clean json = 5; strict
    # discards its 3 corrupt browser events entirely = 0
    assert inputs["kafka_sink"].count() == 5 + 0
    framed = topo.start()["kafka_sink"]
    rows = framed.collect()
    assert len(rows) == 5
    rec = decode_record(_SCHEMA, bytes(rows[0].value))
    assert rec["party_id"] == "0:i1t84hgy:party"
    topo.stop()


def test_config_validation_failures(spark):
    raw = {"browser": _raw_browser(spark), "json_api": _raw_json(spark)}
    reg = {"project": _project}

    bad_type = {
        **_CONFIG,
        "sources": {"browser": {"type": "carrier-pigeon"}, "json_api": {"type": "json"}},
    }
    with pytest.raises(TopologyError, match="unknown type"):
        build_topology(bad_type, raw, reg)

    unknown_sink = {
        **_CONFIG,
        "mappings": {
            "m": {"sources": ["browser"], "sinks": ["nope"], "mapping_script": "project"}
        },
    }
    with pytest.raises(TopologyError, match="unknown sinks"):
        build_topology(unknown_sink, raw, reg)

    unknown_script = {
        **_CONFIG,
        "mappings": {
            "m": {
                "sources": ["browser"],
                "sinks": ["kafka_sink"],
                "mapping_script": "missing",
            }
        },
    }
    with pytest.raises(TopologyError, match="not registered"):
        build_topology(unknown_script, raw, reg)

    with pytest.raises(TopologyError, match="no raw DataFrame"):
        build_topology(_CONFIG, {"browser": _raw_browser(spark)}, reg)

    orphan_sink = {
        **_CONFIG,
        "sinks": {**_CONFIG["sinks"], "lonely": {"type": "kafka", "avro_schema": _SCHEMA}},
    }
    with pytest.raises(TopologyError, match="not fed by any mapping"):
        build_topology(orphan_sink, raw, reg)

    confluent_no_id = {
        **_CONFIG,
        "sinks": {
            "kafka_sink": {"type": "kafka", "avro_schema": _SCHEMA, "mode": "confluent"}
        },
    }
    with pytest.raises(TopologyError, match="confluent_id"):
        build_topology(confluent_no_id, raw, reg)


def test_default_schema_mapping(spark):
    """No mapping_script + a schema => the built-in default mapping:
    matching fields map, unmatched keep their avsc defaults, an
    all-miss schema refuses to build (Mapping.java:70-100)."""
    schema = {
        "type": "record",
        "name": "DefaultMapped",
        "fields": [
            {"name": "party_id", "type": ["null", "string"], "default": None},
            {"name": "event_type", "type": ["null", "string"], "default": None},
            {"name": "corrupt_event", "type": "boolean", "default": False},
            {"name": "unmatched_extra", "type": ["null", "string"], "default": None},
        ],
    }
    cfg = {
        "sources": {"json_api": {"type": "json"}},
        "mappings": {
            "default": {"sources": ["json_api"], "sinks": ["k"], "schema": schema}
        },
        "sinks": {"k": {"type": "kafka", "avro_schema": schema}},
    }
    topo = build_topology(cfg, {"json_api": _raw_json(spark)})
    out = topo.sink_inputs()["k"]
    assert [f.name for f in out.schema.fields] == [
        "party_id", "event_type", "corrupt_event", "unmatched_extra",
    ]
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.party_id == "0:i1t84hgy:party" for r in rows)
    assert all(r.event_type == "signup" for r in rows)
    assert all(r.corrupt_event is False for r in rows)
    assert all(r.unmatched_extra is None for r in rows)

    all_miss = {
        "type": "record",
        "name": "NoMatch",
        "fields": [{"name": "nothing_matches", "type": ["null", "string"], "default": None}],
    }
    bad = {
        **cfg,
        "mappings": {
            "default": {"sources": ["json_api"], "sinks": ["k"], "schema": all_miss}
        },
    }
    with pytest.raises(TopologyError, match="matched no schema fields"):
        build_topology(bad, {"json_api": _raw_json(spark)})


def test_decoded_frame_keeps_source_columns(spark):
    """Mapping scripts retain the full §2.4 value surface: browser
    transport columns survive decode, and a multi-source mapping sees
    the superset with nulls where a source lacks a column (the
    reference's browserEventData absent on JSON events)."""
    cfg = {
        "sources": {
            "browser": {"type": "browser"},
            "json_api": {"type": "json"},
        },
        "mappings": {
            "m": {
                "sources": ["browser", "json_api"],
                "sinks": ["out"],
                "mapping_script": "loc",
            }
        },
        "sinks": {
            "out": {"type": "kafka", "avro_schema": _SCHEMA, "mode": "naked"}
        },
    }

    def loc(df):
        # reads a browser-only struct AND a transport column — both
        # must exist post-decode for the mapping to compile
        return df.select(
            "event_id",
            "event_source",
            F.col("browser.location").alias("location"),
            F.col("query_string").alias("qs"),
        )

    topo = build_topology(
        cfg,
        {"browser": _raw_browser(spark), "json_api": _raw_json(spark)},
        {"loc": loc},
    )
    rows = topo.sink_inputs()["out"].collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.event_source, []).append(r)
    assert len(by_src["browser"]) == 3
    assert all(r.location == "http://example.com/home" for r in by_src["browser"])
    # JSON events: browser struct + query_string absent -> null
    assert len(by_src["json"]) == 2
    assert all(r.location is None and r.qs is None for r in by_src["json"])


def test_global_use_x_forwarded_for(spark):
    """global.server.use_x_forwarded_for (ServerConfiguration.java:33)
    drives the browser decoder's peer replacement; default stays off."""
    raw = spark.createDataFrame(
        [(_QS.format(n=0), "10.0.0.1", "1.2.3.4, 8.8.4.4")],
        "query_string string, remote_host string, x_forwarded_for string",
    )
    cfg = {
        "global": {"server": {"use_x_forwarded_for": True}},
        "sources": {"browser": {"type": "browser"}},
        "mappings": {
            "m": {"sources": ["browser"], "sinks": ["out"], }
        },
        "sinks": {
            "out": {"type": "kafka", "avro_schema": _SCHEMA, "mode": "naked"}
        },
    }
    topo = build_topology(cfg, {"browser": raw})
    assert [r.remote_host for r in topo.sink_inputs()["out"].collect()] == [
        "8.8.4.4"
    ]
    cfg_off = {k: v for k, v in cfg.items() if k != "global"}
    topo_off = build_topology(cfg_off, {"browser": raw})
    assert [r.remote_host for r in topo_off.sink_inputs()["out"].collect()] == [
        "10.0.0.1"
    ]


_DM_SCHEMA = {
    "type": "record",
    "name": "DM",
    "fields": [
        {"name": "party_id", "type": ["null", "string"], "default": None},
        {"name": "event_type", "type": ["null", "string"], "default": None},
    ],
}


def _dm_cfg(**overrides):
    cfg = {
        "sources": {"json_api": {"type": "json"}},
        "mappings": {
            "default": {
                "sources": ["json_api"], "sinks": ["k"], "schema": _DM_SCHEMA,
            }
        },
        "sinks": {"k": {"type": "kafka", "avro_schema": _DM_SCHEMA}},
    }
    cfg.update(overrides)
    return cfg


def test_duplicate_source_attachment_rejected(spark):
    # REGRESSION: a duplicated sources entry unioned the source with
    # itself and silently DOUBLED every event
    cfg = _dm_cfg()
    cfg["mappings"]["default"]["sources"] = ["json_api", "json_api"]
    with pytest.raises(TopologyError, match="duplicate sources"):
        build_topology(cfg, {"json_api": _raw_json(spark)})


def test_duplicate_sink_attachment_rejected(spark):
    cfg = _dm_cfg()
    cfg["mappings"]["default"]["sinks"] = ["k", "k"]
    with pytest.raises(TopologyError, match="duplicate sinks"):
        build_topology(cfg, {"json_api": _raw_json(spark)})


def test_sink_schema_field_not_produced_is_startup_error(spark):
    # REGRESSION: a sink avro_schema field the mapping cannot produce
    # failed per-record inside mapInPandas on an executor
    cfg = _dm_cfg()
    cfg["sinks"]["k"]["avro_schema"] = {
        "type": "record",
        "name": "S",
        "fields": [
            {"name": "party_id", "type": ["null", "string"], "default": None},
            {"name": "not_produced", "type": ["null", "string"],
             "default": None},
        ],
    }
    with pytest.raises(TopologyError, match="not produced by mapping"):
        build_topology(cfg, {"json_api": _raw_json(spark)})


def test_kafka_sink_requires_party_id_from_mapping(spark):
    cfg = _dm_cfg()
    no_party = {
        "type": "record",
        "name": "NP",
        "fields": [
            {"name": "event_type", "type": ["null", "string"],
             "default": None}
        ],
    }
    cfg["mappings"]["default"]["schema"] = no_party
    cfg["sinks"]["k"]["avro_schema"] = no_party
    with pytest.raises(TopologyError, match="party_id"):
        build_topology(cfg, {"json_api": _raw_json(spark)})


def test_null_server_section_tolerated(spark):
    # REGRESSION: {'global': {'server': None}} (empty config section
    # deserialized as null) crashed with AttributeError
    cfg = _dm_cfg()
    cfg["global"] = {"server": None}
    topo = build_topology(cfg, {"json_api": _raw_json(spark)})
    assert "k" in topo.sink_inputs()


def test_default_mapping_covers_non_core_decoded_columns(spark):
    # REGRESSION: the default mapping matched only the 10-column event
    # core, silently nulling schema fields like event_parameters that
    # the decoders DO expose as top-level columns
    schema = {
        "type": "record",
        "name": "WithParams",
        "fields": [
            {"name": "party_id", "type": ["null", "string"], "default": None},
            {"name": "event_parameters", "type": ["null", "string"],
             "default": None},
        ],
    }
    cfg = _dm_cfg()
    cfg["mappings"]["default"]["schema"] = schema
    cfg["sinks"]["k"]["avro_schema"] = schema
    body = json.dumps(
        {
            "event_type": "signup",
            "session_id": "0:i1t84hgy:sess",
            "event_id": "j-0",
            "is_new_party": False,
            "is_new_session": True,
            "client_timestamp_iso": "2024-01-02T03:04:05.678+02:00",
            "parameters": {"k": 1},
        }
    )
    raw = spark.createDataFrame(
        [(body, "0:i1t84hgy:party")], "body string, party_id_param string"
    )
    topo = build_topology(cfg, {"json_api": raw})
    # the mapped relation (pre-sink) must carry real event_parameters
    mapped = topo._mapped()["default"]
    vals = [r.event_parameters for r in mapped.collect()]
    assert any(v is not None for v in vals)


# --- property fuzz: arbitrary config dicts never escape TopologyError --------
# The startup-validation contract (reference ValidatedConfiguration):
# any malformed topology fails with a TopologyError naming the
# problem, NEVER a KeyError/TypeError/AttributeError crash — and a
# structurally valid topology always builds. The generator mutates a
# known-good config with the malformation classes the loader guards
# (missing/unknown references, wrong types, absent required keys,
# non-dict/list shapes, empty sections).

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    def _valid_cfg():
        return {
            "sources": {
                "browser": {"type": "browser"},
                "json_api": {"type": "json"},
            },
            "mappings": {
                "m1": {
                    "sources": ["browser"],
                    "sinks": ["s1"],
                    "mapping_script": "project",
                },
            },
            "sinks": {
                "s1": {
                    "type": "kafka", "avro_schema": _SCHEMA, "mode": "naked",
                },
            },
        }

    _MUTATIONS = [
        "ok",
        "drop_sources", "drop_mappings", "drop_sinks",
        "unknown_source_ref", "unknown_sink_ref", "unknown_script",
        "bad_source_type", "bad_sink_type", "kafka_no_schema",
        "empty_mapping_sources", "empty_mapping_sinks",
        "sources_not_list", "file_sink_no_path", "bad_kafka_mode",
    ]

    @settings(
        max_examples=60, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.sampled_from(_MUTATIONS), st.integers(0, 3))
    def test_topology_validation_total(spark, mutation, salt):
        cfg = _valid_cfg()
        if mutation == "drop_sources":
            cfg["sources"] = {}
        elif mutation == "drop_mappings":
            del cfg["mappings"]
        elif mutation == "drop_sinks":
            cfg["sinks"] = None
        elif mutation == "unknown_source_ref":
            cfg["mappings"]["m1"]["sources"] = [f"ghost{salt}"]
        elif mutation == "unknown_sink_ref":
            cfg["mappings"]["m1"]["sinks"] = [f"ghost{salt}"]
        elif mutation == "unknown_script":
            cfg["mappings"]["m1"]["mapping_script"] = f"nope{salt}"
        elif mutation == "bad_source_type":
            cfg["sources"]["browser"] = {"type": f"carrier-pigeon{salt}"}
        elif mutation == "bad_sink_type":
            cfg["sinks"]["s1"] = {"type": f"tape{salt}"}
        elif mutation == "kafka_no_schema":
            cfg["sinks"]["s1"] = {"type": "kafka", "mode": "naked"}
        elif mutation == "empty_mapping_sources":
            cfg["mappings"]["m1"]["sources"] = []
        elif mutation == "empty_mapping_sinks":
            cfg["mappings"]["m1"]["sinks"] = []
        elif mutation == "sources_not_list":
            cfg["mappings"]["m1"]["sources"] = "browser"
        elif mutation == "file_sink_no_path":
            cfg["sinks"]["s1"] = {"type": "hdfs"}
        elif mutation == "bad_kafka_mode":
            cfg["sinks"]["s1"] = {
                "type": "kafka", "avro_schema": _SCHEMA,
                "mode": f"framed{salt}",
            }
        raw = {
            "browser": _raw_browser(spark),
            "json_api": _raw_json(spark),
        }
        reg = {"project": _project}
        if mutation == "ok":
            topo = build_topology(cfg, raw, reg)
            assert topo is not None
        else:
            with pytest.raises(TopologyError):
                build_topology(cfg, raw, reg)
