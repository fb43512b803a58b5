"""K2 GCS compose-append lifecycle (streaming/gcs.py) against the
filesystem object store: header-first create, part upload + compose on
sync, compose-to-publish + inflight cleanup on close, discard path,
and the distributed streaming sink end to end
(GoogleCloudStorageFileManager.java:161-290)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from divolte_collector_spark.functions.avro_codec import (
    container_header,
    default_sync_marker,
    read_container,
)
from divolte_collector_spark.streaming.gcs import (
    FilesystemObjectStore,
    GcsAvroFile,
    gcs_avro_sink,
    gcs_write_avro_files,
)

# store factories close over tmp paths and ride into executor workers
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_SCHEMA = {
    "type": "record",
    "name": "MappedEvent",
    "fields": [
        {"name": "party_id", "type": "string"},
        {"name": "event_id", "type": "string"},
        {"name": "client_ms", "type": "long"},
    ],
}


def _rec(i):
    return {"party_id": f"0:p{i}", "event_id": f"e{i}", "client_ms": i * 1000}


def test_lifecycle_create_sync_publish(tmp_path):
    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    f = GcsAvroFile(store, _SCHEMA, "inflight", "published", "a.avro")
    # create uploads the bare header immediately
    assert store.get("inflight/a.avro") == container_header(
        _SCHEMA, default_sync_marker(_SCHEMA)
    )
    f.append(_rec(1))
    f.append(_rec(2))
    f.sync_file()  # part upload + compose back onto the inflight object
    assert store.exists("inflight/a.avro.part")
    schema_read, recs = read_container(store.get("inflight/a.avro"))
    assert [r["event_id"] for r in recs] == ["e1", "e2"]
    f.append(_rec(3))
    f.close_and_publish()
    # published object carries all records; inflight + part are deleted
    _, recs = read_container(store.get("published/a.avro"))
    assert [r["event_id"] for r in recs] == ["e1", "e2", "e3"]
    assert store.list() == ["published/a.avro"]


def test_lifecycle_empty_sync_composes_self(tmp_path):
    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    f = GcsAvroFile(store, _SCHEMA, "inflight", "published", "a.avro")
    f.sync_file()  # nothing buffered: self-compose, no part object
    assert not store.exists("inflight/a.avro.part")
    _, recs = read_container(store.get("inflight/a.avro"))
    assert recs == []


def test_lifecycle_discard(tmp_path):
    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    f = GcsAvroFile(store, _SCHEMA, "inflight", "published", "a.avro")
    f.append(_rec(1))
    f.sync_file()
    f.discard()
    assert store.list() == []


def _events(spark, n=25):
    return spark.range(n).select(
        F.concat(F.lit("0:p"), (F.col("id") % 3).cast("string")).alias(
            "party_id"
        ),
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("event_id"),
        (F.col("id") * 1000).alias("client_ms"),
        F.timestamp_millis(F.lit(1500000000000) + F.col("id")).alias(
            "client_time"
        ),
    )


def test_batch_write_publishes_composed_containers(spark, tmp_path):
    root = str(tmp_path / "bucket")
    manifest = gcs_write_avro_files(
        _events(spark), _SCHEMA,
        store_factory=lambda r=root: FilesystemObjectStore(r),
        batch_tag="0", sync_every=10,
    )
    store = FilesystemObjectStore(root)
    published = [n for n in store.list() if n.startswith("published/")]
    assert published and all(n.endswith(".avro") for n in published)
    # no inflight or part residue after publish
    assert all(not n.startswith("inflight/") for n in store.list())
    seen = []
    for name, n in manifest:
        _, recs = read_container(store.get(name))
        assert len(recs) == n
        seen.extend(r["event_id"] for r in recs)
    assert sorted(seen, key=lambda e: int(e[1:])) == [f"e{i}" for i in range(25)]


def test_streaming_sink_end_to_end(spark, tmp_path):
    root = str(tmp_path / "bucket")
    src = str(tmp_path / "src")
    _events(spark).write.mode("overwrite").json(src)
    stream = spark.readStream.schema(
        "party_id string, event_id string, client_ms long, client_time timestamp"
    ).json(src)
    q = (
        gcs_avro_sink(
            stream, _SCHEMA,
            store_factory=lambda r=root: FilesystemObjectStore(r),
            checkpoint=str(tmp_path / "ckpt"),
            sync_every=7,
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "gcs sink timed out"
    store = FilesystemObjectStore(root)
    eids = []
    for name in store.list():
        assert name.startswith("published/")
        _, recs = read_container(store.get(name))
        eids.extend(r["event_id"] for r in recs)
    assert sorted(eids, key=lambda e: int(e[1:])) == [f"e{i}" for i in range(25)]


def test_sweep_inflight_removes_orphaned_attempt_chains(spark, tmp_path):
    """A hard-killed attempt leaves its attempt-unique inflight/.part
    chain behind (no except handler ran); the post-batch janitor must
    delete exactly this batch's orphans — other batches' inflight
    objects and published output stay untouched."""
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    root = str(tmp_path / "bucket")
    store = FilesystemObjectStore(root)
    # orphans from a dead attempt of batch 7
    orphan = "inflight/x-divolte-tracking-spark-7-3.avro.a12"
    store.upload(orphan, b"hdr")
    store.upload(orphan + ".part", b"blk")
    # a DIFFERENT batch's live inflight object must survive
    other = "inflight/x-divolte-tracking-spark-8-0.avro.a13"
    store.upload(other, b"hdr")

    manifest = gcs_write_avro_files(
        _events(spark), _SCHEMA,
        store_factory=lambda r=root: FilesystemObjectStore(r),
        batch_tag="7", sync_every=10,
    )
    names = store.list()
    assert orphan not in names and orphan + ".part" not in names
    assert other in names
    assert all(n for n, _ in manifest)


def test_sweep_inflight_skips_stores_without_listing():
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    class _NoList:  # minimal 5-call store: no list()
        def delete(self, name):  # pragma: no cover — must not be hit
            raise AssertionError("delete without listing")

    assert sweep_inflight(_NoList(), "0") == []


def test_stale_sweep_cleans_zombie_uploads_from_earlier_batches(tmp_path):
    """REGRESSION: a zombie speculative attempt can upload an inflight
    object AFTER its own batch's post-sweep ran — that name is never
    swept by a same-tag sweep again. The pre-batch STALE sweep (over
    the stream-scoped prefix) deletes everything not belonging to the
    current batch, while same-tag (current-batch) chains and other
    prefixes survive."""
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    pre = "inflight/s1"
    zombie = f"{pre}/x-divolte-tracking-spark-6-2.avro.a99"  # batch 6 leftover
    store.upload(zombie, b"hdr")
    store.upload(zombie + ".part", b"blk")
    current = f"{pre}/x-divolte-tracking-spark-7-0.avro.a100"  # batch 7 live
    store.upload(current, b"hdr")
    other_stream = "inflight/s2/x-divolte-tracking-spark-6-0.avro.a7"
    store.upload(other_stream, b"hdr")
    published = "published/20240101000000-divolte-tracking-spark-6-0.avro"
    store.upload(published, b"avro")

    deleted = sweep_inflight(store, "7", pre, stale=True)
    assert sorted(deleted) == [zombie, zombie + ".part"]
    names = store.list()
    assert current in names and other_stream in names and published in names


def test_store_listing_is_prefix_scoped(tmp_path):
    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    store.upload("inflight/a", b"x")
    store.upload("published/b", b"x")
    assert store.list("inflight/") == ["inflight/a"]
    assert store.list() == ["inflight/a", "published/b"]


def test_sweep_falls_back_to_unscoped_listing(tmp_path):
    """A store whose list() takes no prefix still sweeps correctly via
    client-side filtering."""
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    class _BareList(FilesystemObjectStore):
        def list(self):  # no prefix parameter
            return super().list()

    store = _BareList(str(tmp_path / "bucket"))
    orphan = "inflight/x-divolte-tracking-spark-3-0.avro.a1"
    store.upload(orphan, b"h")
    store.upload("published/keep.avro", b"a")
    assert sweep_inflight(store, "3") == [orphan]
    assert store.list() == ["published/keep.avro"]


def test_stream_inflight_prefix_stable_across_restarts(tmp_path):
    """The stream-scoped inflight prefix must derive from the
    checkpoint (the logical stream's stable name), not a per-instance
    random id — else a restarted query orphans the previous run's
    prefix forever and the stale sweep never reaches it. It must also
    be a SIBLING of the default 'inflight' dir, never nested under
    it, so bare-caller sweeps over 'inflight/' cannot list it."""
    from divolte_collector_spark.streaming.gcs import (
        _stream_inflight_prefix,
    )

    a1 = _stream_inflight_prefix("/ckpt/streamA")
    a2 = _stream_inflight_prefix("/ckpt/streamA")
    b = _stream_inflight_prefix("/ckpt/streamB")
    assert a1 == a2           # stable across restarts
    assert a1 != b            # distinct per stream
    assert not a1.startswith("inflight/")  # sibling, not nested


def test_streaming_sink_restart_sweeps_prior_run_and_no_duplicates(
    spark, tmp_path
):
    """Restart discipline end to end: run the sink over half the
    source, plant an inflight orphan under the STREAM's prefix (a
    zombie upload from the dead run), then restart from the same
    checkpoint over the full source. The restarted run must (a) sweep
    the prior run's orphan via the checkpoint-derived prefix, (b) not
    duplicate already-published events, (c) leave no inflight objects
    behind."""
    from divolte_collector_spark.streaming.gcs import (
        _stream_inflight_prefix,
    )

    root = str(tmp_path / "bucket")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _events(spark, 12).write.mode("overwrite").json(src)
    schema = (
        "party_id string, event_id string, client_ms long, "
        "client_time timestamp"
    )

    def run_once():
        stream = spark.readStream.schema(schema).json(src)
        q = (
            gcs_avro_sink(
                stream, _SCHEMA,
                store_factory=lambda r=root: FilesystemObjectStore(r),
                checkpoint=ckpt, sync_every=5,
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "gcs sink timed out"

    run_once()  # "first run" completes batch 0
    store = FilesystemObjectStore(root)
    prefix = _stream_inflight_prefix(ckpt)
    zombie = f"{prefix}/x-divolte-tracking-spark-0-9.avro.a777"
    store.upload(zombie, b"hdr")  # zombie upload from the "dead" run

    _events(spark, 25).write.mode("append").json(src)  # 13 new events
    run_once()  # restart from the same checkpoint

    names = store.list()
    assert not [n for n in names if n.startswith("inflight")], names
    eids = []
    for name in names:
        _, recs = read_container(store.get(name))
        eids.extend(r["event_id"] for r in recs)
    # the append re-wrote e0-e11 under new file names, so those events
    # legitimately appear once per SOURCE occurrence; what must NOT
    # happen is the sink re-publishing batch 0's output. Events unique
    # to the appended files appear exactly once.
    assert sorted(eids.count(f"e{i}") for i in range(12, 25)) == [1] * 13
    assert len([n for n in names if n.startswith("published/")]) >= 2


def test_batch_tag_parsed_not_substring_matched(tmp_path):
    """REGRESSION: a host string containing '-<digits>-' (e.g.
    'node-7-east') must not be mistaken for the batch tag — the tag is
    the exact second-to-last dash segment of the roll-file name."""
    from divolte_collector_spark.streaming.gcs import (
        _name_batch_tag,
        sweep_inflight,
    )

    n = "inflight/20240101-divolte-tracking-node-7-east-12-3.avro.a9"
    assert _name_batch_tag(n) == "12"
    assert _name_batch_tag(n + ".part") == "12"
    assert _name_batch_tag("inflight/garbage") is None

    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    old = "inflight/x-divolte-tracking-node-7-east-6-0.avro.a1"
    store.upload(old, b"h")  # batch 6 orphan; host contains '-7-'
    cur = "inflight/x-divolte-tracking-node-7-east-7-0.avro.a2"
    store.upload(cur, b"h")
    # during batch 7, the stale sweep must delete the batch-6 orphan
    # even though its name CONTAINS '-7-' via the host string
    deleted = sweep_inflight(store, "7", "inflight", stale=True)
    assert deleted == [old]
    assert store.list("inflight/") == [cur]


def test_sweeps_never_touch_unrecognized_names(tmp_path):
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    store = FilesystemObjectStore(str(tmp_path / "bucket"))
    store.upload("inflight/README.txt", b"not a roll file")
    assert sweep_inflight(store, "3", "inflight") == []
    assert sweep_inflight(store, "3", "inflight", stale=True) == []
    assert store.list("inflight/") == ["inflight/README.txt"]


def test_sweep_kwargs_only_lister_falls_back_to_unscoped(tmp_path):
    """REGRESSION (round-7 advice): a store whose list() is declared
    **kwargs-only has parameters but cannot take a positional prefix —
    the signature probe must classify it as prefix-less and fall back
    to client-side filtering instead of crashing the sweep."""
    from divolte_collector_spark.streaming.gcs import sweep_inflight

    class _KwargsList(FilesystemObjectStore):
        def list(self, **kwargs):  # parameters, but none positional
            return super().list()

    store = _KwargsList(str(tmp_path / "bucket"))
    orphan = "inflight/x-divolte-tracking-spark-3-0.avro.a1"
    store.upload(orphan, b"h")
    store.upload("published/keep.avro", b"a")
    assert sweep_inflight(store, "3") == [orphan]
    assert store.list() == ["published/keep.avro"]
