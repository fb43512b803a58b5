"""Many-to-many stream topology: sources x mappings x sinks.

The reference wires N sources to M mappings to K sinks as a static
graph validated at startup (``mappingsBySourceIndex`` /
``sinksByMappingIndex``, IncomingRequestProcessor.java:51-53,85-137;
one-schema-per-sink constraint, config/constraint/OneSchemaPerSink.java)
and encodes each mapped record ONCE, fanning the same buffer to every
sink (AvroRecordBuffer.java:66-75,114-116).

Spark formulation:

- a source is a DataFrame (batch or streaming) of normalized events;
- a mapping is a pure DataFrame->DataFrame transform (e.g.
  ``MappingBuilder.apply`` after a wire decode), fed by the UNION of
  its attached sources — per-source event provenance stays available
  through the ``event_source`` column;
- a sink consumes the union of its attached mappings' outputs;
- serialize-once fan-out: when one mapping feeds several sinks, its
  output is persisted (batch) so the transform runs once, mirroring
  the shared read-only buffer. In streaming each sink is its own
  query (Spark's model); ``foreachBatch`` consumers can persist per
  epoch;
- the graph is validated when built: unknown names and sinks fed by
  mappings with conflicting schemas refuse to start, the same
  startup-failure semantics as the reference's config validation.

At scale the persist() is the important part: a mapping over 100 TB
of events fanned to 3 sinks must not re-read (and re-shuffle) the
input 3 times.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class TopologyError(ValueError):
    """Invalid topology — raised at build time (startup semantics)."""


@dataclass
class _Mapping:
    name: str
    sources: list[str]
    transform: Callable[[DataFrame], DataFrame]


@dataclass
class _Sink:
    name: str
    mappings: list[str]
    writer: Callable[[DataFrame, str], object] | None


@dataclass
class Topology:
    """Builder for the sources x mappings x sinks graph."""

    _sources: dict[str, DataFrame] = field(default_factory=dict)
    _mappings: dict[str, _Mapping] = field(default_factory=dict)
    _sinks: dict[str, _Sink] = field(default_factory=dict)
    # built once per topology; holds persisted fan-out outputs so
    # repeated sink_inputs()/start() calls don't leak executor cache
    _mapped_cache: dict[str, DataFrame] | None = field(default=None, repr=False)
    _persisted: list[DataFrame] = field(default_factory=list, repr=False)

    def add_source(self, name: str, events: DataFrame) -> "Topology":
        if name in self._sources:
            raise TopologyError(f"duplicate source: {name}")
        self._sources[name] = events
        return self

    def add_mapping(
        self,
        name: str,
        sources: list[str],
        transform: Callable[[DataFrame], DataFrame],
    ) -> "Topology":
        if name in self._mappings:
            raise TopologyError(f"duplicate mapping: {name}")
        missing = [s for s in sources if s not in self._sources]
        if missing:
            raise TopologyError(f"mapping {name!r} references unknown sources: {missing}")
        self._mappings[name] = _Mapping(name, list(sources), transform)
        return self

    def add_sink(
        self,
        name: str,
        mappings: list[str],
        writer: Callable[[DataFrame, str], object] | None = None,
    ) -> "Topology":
        if name in self._sinks:
            raise TopologyError(f"duplicate sink: {name}")
        missing = [m for m in mappings if m not in self._mappings]
        if missing:
            raise TopologyError(f"sink {name!r} references unknown mappings: {missing}")
        self._sinks[name] = _Sink(name, list(mappings), writer)
        return self

    # -- building ------------------------------------------------------------

    def _mapped(self) -> dict[str, DataFrame]:
        """mapping name -> transformed union of its sources.

        Built once and memoized: the fan-out persist() must not be
        re-created on every sink_inputs()/start() call, or prior
        persisted copies would linger in executor cache unreleased.
        """
        if self._mapped_cache is not None:
            return self._mapped_cache
        fanout: dict[str, int] = {m: 0 for m in self._mappings}
        for sink in self._sinks.values():
            for m in sink.mappings:
                fanout[m] += 1
        out: dict[str, DataFrame] = {}
        for m in self._mappings.values():
            union: DataFrame | None = None
            for s in m.sources:
                df = self._sources[s]
                # by-name with missing-as-null: source types carry
                # different transport/browser columns (the reference's
                # browserEventData is absent on JSON events) — a
                # multi-source mapping sees the superset, nulls where a
                # source lacks the column
                union = (
                    df
                    if union is None
                    else union.unionByName(df, allowMissingColumns=True)
                )
            mapped = m.transform(union)
            if fanout.get(m.name, 0) > 1 and not mapped.isStreaming:
                # serialize-once fan-out (AvroRecordBuffer semantics)
                mapped = mapped.persist(StorageLevel.MEMORY_AND_DISK)
                self._persisted.append(mapped)
            out[m.name] = mapped
        self._mapped_cache = out
        return out

    def stop(self) -> None:
        """Release persisted fan-out outputs (call after sinks finish).

        The next sink_inputs()/start() rebuilds the mapping outputs."""
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()
        self._mapped_cache = None

    def sink_inputs(self) -> dict[str, DataFrame]:
        """sink name -> union of its mappings' outputs (validated).

        OneSchemaPerSink: mappings feeding one sink must agree on
        schema; a mismatch refuses to build, like the reference's
        startup config validation.
        """
        mapped = self._mapped()
        out: dict[str, DataFrame] = {}
        for sink in self._sinks.values():
            schemas = {str(mapped[m].schema) for m in sink.mappings}
            if len(schemas) > 1:
                raise TopologyError(
                    f"sink {sink.name!r} fed by mappings with conflicting "
                    f"schemas (OneSchemaPerSink): {sorted(schemas)}"
                )
            union: DataFrame | None = None
            for m in sink.mappings:
                df = mapped[m]
                union = df if union is None else union.unionByName(df)
            out[sink.name] = union
        return out

    def start(self) -> dict[str, object]:
        """Run every sink's writer on its input; returns writer results
        (StreamingQuery handles for streams, writer returns for batch)."""
        results: dict[str, object] = {}
        for name, df in self.sink_inputs().items():
            writer = self._sinks[name].writer
            if writer is None:
                raise TopologyError(f"sink {name!r} has no writer")
            results[name] = writer(df, name)
        return results
