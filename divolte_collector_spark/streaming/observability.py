"""Streaming observability: per-batch progress capture.

The reference exposes sink health through JMX-ish logging and its
pause/unpause heartbeats; a Spark deployment watches
StreamingQueryProgress instead. :class:`ProgressRecorder` is a
StreamingQueryListener that keeps, per query, the metrics an operator
actually pages on: input rate, process rate, batch duration, state
rows/memory, and watermark lag — queryable from the driver while
streams run, and assertable in tests.

At scale this is how backpressure tuning closes the loop: if
``process_rate`` sits below ``input_rate`` across batches, raise
parallelism or ``maxOffsetsPerTrigger``; if ``state_rows`` grows
without bound, a watermark is missing or an interval join's band is
too wide.
"""

from __future__ import annotations


def _rate(v) -> float:
    """Spark rate metrics can be None OR NaN (first batch); both mean
    'no rate yet'."""
    if v is None or v != v:
        return 0.0
    return float(v)


from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    batch_id: int
    num_input_rows: int
    input_rate: float
    process_rate: float
    duration_ms: int | None
    state_rows: int | None
    watermark: str | None


@dataclass
class QueryMetrics:
    name: str
    batches: list[BatchMetrics] = field(default_factory=list)

    @property
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    @property
    def max_state_rows(self) -> int:
        return max((b.state_rows or 0 for b in self.batches), default=0)


class ProgressRecorder(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(recorder)``; read
    ``recorder.queries[name]`` afterwards. Listener callbacks arrive on
    a daemon thread — only append, never block."""

    def __init__(self) -> None:
        self.queries: dict[str, QueryMetrics] = {}

    # -- StreamingQueryListener interface ------------------------------------

    def onQueryStarted(self, event) -> None:
        name = event.name or str(event.id)
        self.queries.setdefault(name, QueryMetrics(name))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        qm = self.queries.setdefault(name, QueryMetrics(name))
        state_rows = None
        if p.stateOperators:
            state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        duration = None
        if p.durationMs and "triggerExecution" in p.durationMs:
            duration = int(p.durationMs["triggerExecution"])
        qm.batches.append(
            BatchMetrics(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                # `or 0.0` does not neutralize NaN (truthy): Spark
                # reports NaN rates on the first progress event, which
                # would poison any backpressure comparison or average
                input_rate=_rate(p.inputRowsPerSecond),
                process_rate=_rate(p.processedRowsPerSecond),
                duration_ms=duration,
                state_rows=state_rows,
                watermark=(p.eventTime or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - passive
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - passive
        pass


def attach_recorder(spark: SparkSession) -> ProgressRecorder:
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    return rec
