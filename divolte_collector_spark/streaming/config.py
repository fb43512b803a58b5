"""Config-driven topology: the reference's deployment surface.

A divolte deployment is DECLARED, not coded — ``reference.conf``'s
``divolte { sources { … } mappings { … } sinks { … } }`` tree wires
named sources through named mappings into named sinks, and the server
validates the whole graph at startup (ValidatedConfiguration.java;
source/mapping/sink reference checks in SourceConfiguration /
MappingConfiguration / SinkConfiguration; defaulting per
reference.conf). ``build_topology`` is that surface for this engine: a
plain dict with the same shape and key names produces a validated
:class:`~divolte_collector_spark.streaming.topology.Topology`.

Differences, Spark-first by design:

- a source's ``type`` selects the wire DECODER (``browser`` →
  ``parse_browser_events``, ``json`` → ``parse_json_events``); the
  transport (HTTP in the reference) is whatever DataFrame of raw
  requests the caller supplies per source — a Kafka scan, a file
  stream, a test batch. The reference couples decode to Undertow;
  here the decode is a pure transform over any transport.
- a mapping's Groovy ``mapping_script_file`` becomes a registered
  mapping callable (``DataFrame -> DataFrame``, e.g.
  ``MappingBuilder.apply``). With no script but a ``schema`` (an avsc
  dict or a ``schema_file`` path), the DEFAULT mapping applies: every
  schema field whose name matches a decoded-event column is mapped
  onto it through the DSL compiler — the reference's built-in
  default-schema mapping (Mapping.java:70-100). With neither, decoded
  events pass through unchanged.
- ``discard_corrupted`` / ``discard_duplicates`` apply the C7 filters
  with the same defaults (false — keep and flag,
  MappingConfiguration.java).
- a sink's ``type`` selects the writer family (``hdfs``/``gcs`` →
  rolling file sink, ``kafka`` → framed (key, value) projection,
  ``gcps`` → Pub/Sub message projection) with reference defaults
  (kafka ``mode = naked``).

Every validation failure raises
:class:`~divolte_collector_spark.streaming.topology.TopologyError`
at BUILD time — startup semantics, nothing fails late on a worker.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame

from divolte_collector_spark.sources.browser import (
    drop_etag_replays,
    parse_browser_events,
)
from divolte_collector_spark.sources.json_source import parse_json_events
from divolte_collector_spark.streaming.ingest import discard_filtered
from divolte_collector_spark.streaming.topology import Topology, TopologyError

SOURCE_TYPES = ("browser", "json")
SINK_TYPES = ("hdfs", "gcs", "kafka", "gcps")

#: the DivolteEvent core every source type produces (§1.1). Decoders
#: keep the FULL decoded frame (browser/transport columns included) so
#: mapping scripts retain the reference's §2.4 value surface —
#: location(), referer(), cookie(), remote_host(), timestamp() all
#: read decoded columns beyond this core. When one mapping unions
#: several source types, the union is by-name with missing columns
#: null — the reference's browserEventData simply being absent on
#: JSON events (DivolteEvent.java: optional browser data).
EVENT_CORE = (
    "party_id",
    "session_id",
    "event_id",
    "event_source",
    "event_type",
    "new_party_id",
    "first_in_session",
    "client_time",
    "event_parameters",
    "corrupt_event",
)


def _decoder(
    name: str,
    cfg: Mapping[str, Any],
    use_x_forwarded_for: bool = False,
) -> Callable[[DataFrame], DataFrame]:
    stype = cfg.get("type")
    if stype not in SOURCE_TYPES:
        raise TopologyError(
            f"source {name!r}: unknown type {stype!r} (expected one of {SOURCE_TYPES})"
        )
    if stype == "browser":

        def decode(raw: DataFrame) -> DataFrame:
            # parse_browser_events applies drop_etag_replays itself
            return _core_first(
                parse_browser_events(
                    raw, use_x_forwarded_for=use_x_forwarded_for
                )
            )

    else:

        def decode(raw: DataFrame) -> DataFrame:
            return _core_first(
                parse_json_events(
                    raw,
                    max_body_bytes=int(cfg.get("maximum_body_size", 4096)),
                )
            )

    return decode


def _core_first(df: DataFrame) -> DataFrame:
    """EVENT_CORE columns first, source-specific columns after — the
    full decoded frame stays available to mapping scripts."""
    extras = [c for c in df.columns if c not in EVENT_CORE]
    return df.select(*EVENT_CORE, *extras)


def _mapping_transform(
    name: str,
    cfg: Mapping[str, Any],
    mapping_registry: Mapping[str, Callable[[DataFrame], DataFrame]],
) -> Callable[[DataFrame], DataFrame]:
    script = cfg.get("mapping_script")
    if script is not None and script not in mapping_registry:
        raise TopologyError(
            f"mapping {name!r}: mapping_script {script!r} is not registered"
        )
    schema = _mapping_schema(cfg)
    if script is not None:
        transform = mapping_registry[script]
    elif schema is not None:
        transform = _default_mapping(name, schema)
    else:
        transform = lambda df: df  # noqa: E731
    discard_corrupted = bool(cfg.get("discard_corrupted", False))
    discard_duplicates = bool(cfg.get("discard_duplicates", False))

    def apply(df: DataFrame) -> DataFrame:
        df = discard_filtered(
            df,
            discard_corrupted=discard_corrupted,
            discard_duplicates=discard_duplicates,
        )
        return transform(df)

    return apply


def _mapping_schema(cfg: Mapping[str, Any]) -> dict | None:
    """The mapping's declared Avro schema (inline or schema_file), or
    None for script-registry mappings whose output shape is opaque."""
    schema = cfg.get("schema")
    if schema is None and cfg.get("schema_file"):
        import json

        with open(cfg["schema_file"]) as fh:
            schema = json.load(fh)
    return schema


def _default_mapping(name: str, schema: dict) -> Callable[[DataFrame], DataFrame]:
    """The built-in default mapping (Mapping.java:70-100): each schema
    field whose name matches a decoded-event column maps onto it;
    unmatched schema fields keep their defaults, with at least one
    match required (an all-miss schema is a config error)."""
    from divolte_collector_spark.mapping import MappingBuilder

    field_names = [f["name"] for f in schema.get("fields", [])]
    if not [f for f in field_names if f in EVENT_CORE]:
        # startup sanity: a schema matching NO core event column can
        # never produce a meaningful default mapping
        raise TopologyError(
            f"mapping {name!r}: default mapping matched no schema fields "
            f"against the event columns {sorted(EVENT_CORE)}"
        )

    def apply(df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        # match against the DECODED FRAME's full column set, not just
        # the core: the decoders expose more top-level columns
        # (remote_host, query_string, ...) and Mapping.java's default
        # maps every name match, not a core subset
        matched = [f for f in field_names if f in df.columns]
        m = MappingBuilder(schema)
        for f in matched:
            m.map_value(F.col(f), f)
        return m.apply(df)

    return apply


def _sink_writer(name: str, cfg: Mapping[str, Any]):
    """Writer factory per sink type. Returns a callable
    ``(DataFrame, sink_name) -> object`` suitable for Topology.start();
    file sinks return the DataStreamWriter / write result, projection
    sinks (kafka/gcps) return the projected DataFrame for the caller's
    producer to consume."""
    stype = cfg.get("type")
    if stype not in SINK_TYPES:
        raise TopologyError(
            f"sink {name!r}: unknown type {stype!r} (expected one of {SINK_TYPES})"
        )
    if stype in ("hdfs", "gcs"):
        from divolte_collector_spark.streaming.sinks import (
            avro_file_sink,
            file_sink,
            write_avro_files,
        )

        path = cfg.get("path")
        if not path:
            raise TopologyError(f"sink {name!r}: file sinks require 'path'")
        schema = cfg.get("avro_schema")

        roll = cfg.get("roll_column", "client_time")

        def write(df: DataFrame, sink_name: str):
            if df.isStreaming:
                if schema is not None:
                    return avro_file_sink(
                        df,
                        path,
                        cfg.get("checkpoint", path + "/_ckpt"),
                        schema,
                        roll_column=roll,
                    )
                return file_sink(
                    df, path, cfg.get("checkpoint", path + "/_ckpt"), roll_column=roll
                )
            if schema is not None:
                return write_avro_files(
                    df, schema, path, batch_tag=sink_name, roll_column=roll
                )
            df.write.mode("append").parquet(path)
            return path

        return write
    if stype == "kafka":
        from divolte_collector_spark.streaming.sinks import kafka_frame

        schema = cfg.get("avro_schema")
        if schema is None:
            raise TopologyError(f"sink {name!r}: kafka sinks require 'avro_schema'")
        mode = cfg.get("mode", "naked")  # KafkaSinkMode default
        # validate the framing mode at STARTUP (KafkaSinkMode.java is
        # an enum resolved by ValidatedConfiguration): before this
        # check an unknown mode passed topology build and failed
        # per-batch inside kafka_frame at write time (found by the
        # config-mutation fuzz)
        if mode not in ("naked", "confluent"):
            raise TopologyError(
                f"sink {name!r}: unknown kafka sink mode {mode!r} "
                "(expected 'naked' or 'confluent')"
            )
        cid = cfg.get("confluent_id")
        if mode == "confluent" and cid is None:
            raise TopologyError(
                f"sink {name!r}: confluent mode requires 'confluent_id'"
            )

        def project(df: DataFrame, sink_name: str):
            return kafka_frame(df, schema, mode=mode, confluent_id=cid)

        return project
    # gcps
    from divolte_collector_spark.streaming.sinks import pubsub_messages

    schema = cfg.get("avro_schema")
    if schema is None:
        raise TopologyError(f"sink {name!r}: gcps sinks require 'avro_schema'")

    def project(df: DataFrame, sink_name: str):
        return pubsub_messages(df, schema)

    return project


def build_topology(
    config: Mapping[str, Any],
    raw_sources: Mapping[str, DataFrame],
    mapping_registry: Mapping[str, Callable[[DataFrame], DataFrame]] | None = None,
) -> Topology:
    """Build a validated Topology from a reference.conf-shaped dict.

    ``config`` is the ``divolte { … }`` subtree:
    ``{"sources": {name: {"type": "browser"|"json", …}},
    "mappings": {name: {"sources": [...], "sinks": [...],
    "mapping_script": registered-name?, "discard_corrupted": bool,
    "discard_duplicates": bool}},
    "sinks": {name: {"type": "hdfs"|"gcs"|"kafka"|"gcps", …}}}``.

    ``raw_sources`` supplies the transport DataFrame per source name
    (the reference binds HTTP listeners here). Mirrors the reference's
    mapping-centric wiring: each MAPPING declares its sources and
    sinks (MappingConfiguration.java), and every reference is checked
    at build time.
    """
    mapping_registry = mapping_registry or {}
    sources_cfg = config.get("sources") or {}
    mappings_cfg = config.get("mappings") or {}
    sinks_cfg = config.get("sinks") or {}
    if not sources_cfg:
        raise TopologyError("no sources configured")
    if not mappings_cfg:
        raise TopologyError("no mappings configured")
    if not sinks_cfg:
        raise TopologyError("no sinks configured")

    missing_raw = sorted(set(sources_cfg) - set(raw_sources))
    if missing_raw:
        raise TopologyError(f"no raw DataFrame supplied for sources: {missing_raw}")

    # global.server.use_x_forwarded_for (ServerConfiguration.java:33,
    # default false): when set, browser sources replace remote_host
    # from the XFF chain before decode
    use_xff = bool(
        ((config.get("global") or {}).get("server") or {}).get(
            "use_x_forwarded_for", False
        )
    )

    topo = Topology()
    for sname, scfg in sources_cfg.items():
        decode = _decoder(sname, scfg, use_x_forwarded_for=use_xff)
        topo.add_source(sname, decode(raw_sources[sname]))

    # mapping-centric wiring: mappings declare sources AND sinks
    sink_feeds: dict[str, list[str]] = {k: [] for k in sinks_cfg}
    for mname, mcfg in mappings_cfg.items():
        srcs = list(mcfg.get("sources") or [])
        if not srcs:
            raise TopologyError(f"mapping {mname!r}: no sources attached")
        if len(set(srcs)) != len(srcs):
            # a duplicated attachment would union a source with itself
            # and silently DOUBLE every event
            raise TopologyError(
                f"mapping {mname!r}: duplicate sources {sorted(srcs)}"
            )
        unknown = [s for s in srcs if s not in sources_cfg]
        if unknown:
            raise TopologyError(
                f"mapping {mname!r} references unknown sources: {unknown}"
            )
        dsts = list(mcfg.get("sinks") or [])
        if not dsts:
            raise TopologyError(f"mapping {mname!r}: no sinks attached")
        if len(set(dsts)) != len(dsts):
            raise TopologyError(
                f"mapping {mname!r}: duplicate sinks {sorted(dsts)}"
            )
        unknown = [d for d in dsts if d not in sinks_cfg]
        if unknown:
            raise TopologyError(
                f"mapping {mname!r} references unknown sinks: {unknown}"
            )
        # the mapping's own validation (unknown script, all-miss
        # default schema) must fire before sink-compat checks
        transform = _mapping_transform(mname, mcfg, mapping_registry)
        # build-time schema compatibility: a sink avro_schema field the
        # mapping cannot produce, or a kafka/gcps sink without the
        # party_id key column, would otherwise fail PER RECORD inside
        # mapInPandas on an executor — the reference's contract is
        # startup failure (declared schemas only; script-registry
        # mappings have opaque output and validate at first batch)
        mschema = _mapping_schema(mcfg)
        if mschema is not None:
            mfields = {f["name"] for f in mschema.get("fields", [])}
            for d in dsts:
                scfg = sinks_cfg[d]
                sschema = scfg.get("avro_schema")
                if sschema is not None:
                    missing = sorted(
                        {f["name"] for f in sschema.get("fields", [])}
                        - mfields
                    )
                    if missing:
                        raise TopologyError(
                            f"sink {d!r}: avro_schema fields {missing} are "
                            f"not produced by mapping {mname!r}"
                        )
                if scfg.get("type") in ("kafka", "gcps") and (
                    "party_id" not in mfields
                ):
                    raise TopologyError(
                        f"sink {d!r} keys records by party_id, which "
                        f"mapping {mname!r} does not produce"
                    )
        topo.add_mapping(mname, srcs, transform)
        for d in dsts:
            sink_feeds[d].append(mname)

    for kname, kcfg in sinks_cfg.items():
        feeds = sink_feeds[kname]
        if not feeds:
            raise TopologyError(f"sink {kname!r} is not fed by any mapping")
        topo.add_sink(kname, feeds, _sink_writer(kname, kcfg))
    return topo
