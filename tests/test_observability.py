"""ProgressRecorder captures per-batch streaming metrics."""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from divolte_collector_spark.streaming.observability import attach_recorder


def test_progress_recorder_captures_batches(spark):
    d = tempfile.mkdtemp(prefix="dvs_obs_")
    rec = attach_recorder(spark)
    try:
        with open(f"{d}/b1.json", "w") as fh:
            for i in range(50):
                fh.write(
                    json.dumps(
                        {"party_id": f"p{i % 5}", "client_time": "2024-01-01 10:00:00"}
                    )
                    + "\n"
                )
        stream = spark.readStream.schema(
            "party_id string, client_time timestamp"
        ).json(d)
        q = (
            stream.groupBy("party_id")
            .count()
            .writeStream.format("memory")
            .queryName("obs_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # listener callbacks are async — give the bus a moment
        for _ in range(40):
            qm = rec.queries.get("obs_out")
            if qm and qm.total_rows >= 50:
                break
            time.sleep(0.5)
        qm = rec.queries.get("obs_out")
        assert qm is not None, f"no metrics captured: {list(rec.queries)}"
        assert qm.total_rows == 50
        assert qm.max_state_rows == 5  # one state row per party
        assert any(b.duration_ms is not None for b in qm.batches)
    finally:
        spark.streams.removeListener(rec)
        shutil.rmtree(d, ignore_errors=True)


def test_nan_rates_normalize_to_zero():
    # REGRESSION: `or 0.0` is a no-op for NaN (truthy), poisoning any
    # backpressure comparison or average over batches
    from divolte_collector_spark.streaming.observability import _rate

    assert _rate(float("nan")) == 0.0
    assert _rate(None) == 0.0
    assert _rate(123.5) == 123.5
