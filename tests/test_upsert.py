"""streaming/upsert.py: keyed merge semantics, replay idempotency,
atomic version publishing, partition-touch rewrites."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from divolte_collector_spark.streaming.upsert import (
    current_version,
    merge_batch,
    read_upsert_table,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts long, v string, day string"
    )


def test_merge_keeps_latest_per_key(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_batch(
        spark, _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d1")]), 0,
        path, ["k"], "ts", "k",
    )
    merge_batch(
        spark,
        _df(spark, [(1, 20, "a2", "d1"), (3, 5, "c", "d2")]), 1,
        path, ["k"], "ts", "k",
    )
    out = {r.k: r for r in read_upsert_table(spark, path).collect()}
    assert out[1].v == "a2" and out[1].ts == 20  # newer wins
    assert out[2].v == "b" and out[3].v == "c"  # carried / inserted


def test_stale_update_does_not_regress(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_batch(spark, _df(spark, [(1, 100, "new", "d1")]), 0,
                path, ["k"], "ts", "k")
    merge_batch(spark, _df(spark, [(1, 50, "old", "d1")]), 1,
                path, ["k"], "ts", "k")
    assert read_upsert_table(spark, path).collect()[0].v == "new"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    b0 = _df(spark, [(1, 10, "a", "d1")])
    b1 = _df(spark, [(1, 20, "a2", "d1")])
    merge_batch(spark, b0, 0, path, ["k"], "ts", "k")
    merge_batch(spark, b1, 1, path, ["k"], "ts", "k")
    before = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    # foreachBatch redelivers batch 1 after a failure: published version
    # already covers it, so the merge must be a no-op
    merge_batch(spark, b1, 1, path, ["k"], "ts", "k")
    merge_batch(spark, b0, 0, path, ["k"], "ts", "k")  # even older replay
    after = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    assert before == after and current_version(path) == 1


def test_version_pointer_flips_and_prunes(spark, tmp_path):
    # versions are sequential publishes, independent of batch ids
    path = str(tmp_path / "t")
    merge_batch(spark, _df(spark, [(1, 1, "x", "d1")]), 3,
                path, ["k"], "ts", "k")
    assert current_version(path) == 0
    merge_batch(spark, _df(spark, [(1, 2, "y", "d1")]), 7,
                path, ["k"], "ts", "k")
    assert current_version(path) == 1
    versions = sorted(e for e in os.listdir(path) if e.startswith("_v"))
    # _v0 is retained one flip as a grace window for in-flight readers
    assert versions == ["_v0", "_v1"]
    merge_batch(spark, _df(spark, [(2, 3, "z", "d1")]), 8,
                path, ["k"], "ts", "k")
    versions = sorted(e for e in os.listdir(path) if e.startswith("_v"))
    assert versions == ["_v1", "_v2"]  # two-flips-old _v0 pruned
    # batch ids 3 and 7 were applied; 7 replayed is a no-op
    merge_batch(spark, _df(spark, [(1, 0, "stale", "d1")]), 7,
                path, ["k"], "ts", "k")
    assert read_upsert_table(spark, path).collect()[0].v == "y"


def test_merge_after_erasure_is_not_mistaken_for_replay(spark, tmp_path):
    # REGRESSION: with version==batch_id semantics, an erasure's version
    # bump made the next batch look already-applied and silently dropped
    # it. The batch watermark is tracked separately from the version.
    from divolte_collector_spark.streaming.upsert import erase_keys

    path = str(tmp_path / "t")
    merge_batch(spark, _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d1")]),
                0, path, ["k"], "ts", "k")
    merge_batch(spark, _df(spark, [(3, 10, "c", "d1")]),
                1, path, ["k"], "ts", "k")
    erase_keys(spark, path, "k", [2])  # bumps version past batch ids
    merge_batch(spark, _df(spark, [(4, 10, "d", "d1")]),
                2, path, ["k"], "ts", "k")  # must NOT be skipped
    out = sorted(r.k for r in read_upsert_table(spark, path).collect())
    assert out == [1, 3, 4]


def test_partition_touch_carries_untouched_by_hardlink(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d2")]), 0,
        path, ["k"], "ts", "k", partition_col="day",
    )
    v0 = os.path.join(path, "_v0", "day=d2")
    d2_inodes = {
        f: os.stat(os.path.join(v0, f)).st_ino
        for f in os.listdir(v0) if f.endswith(".parquet")
    }
    # batch touches ONLY d1; d2 must carry by hardlink, not rewrite
    merge_batch(
        spark, _df(spark, [(1, 20, "a2", "d1")]), 1,
        path, ["k"], "ts", "k", partition_col="day",
    )
    v1 = os.path.join(path, "_v1", "day=d2")
    for f, ino in d2_inodes.items():
        assert os.stat(os.path.join(v1, f)).st_ino == ino
    out = {r.k: r for r in read_upsert_table(spark, path).collect()}
    assert out[1].v == "a2" and out[2].v == "b"
    # partition column survives the round-trip as table data
    assert set(
        r.day for r in read_upsert_table(spark, path).select("day").collect()
    ) == {"d1", "d2"}


def test_moved_key_does_not_leave_stale_row(spark, tmp_path):
    # REGRESSION: a key whose latest row lands in a DIFFERENT partition
    # than its existing row used to leave the stale row alive in the
    # untouched partition — two rows for one key.
    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d2")]), 0,
        path, ["k"], "ts", "k", partition_col="day",
    )
    # key 1 moves d1 -> d3; the batch itself never names d1
    merge_batch(
        spark, _df(spark, [(1, 20, "a2", "d3")]), 1,
        path, ["k"], "ts", "k", partition_col="day",
    )
    rows = read_upsert_table(spark, path).collect()
    assert sorted((r.k, r.ts, r.v, r.day) for r in rows) == [
        (1, 20, "a2", "d3"),
        (2, 10, "b", "d2"),
    ]


def test_static_partitions_skips_moved_key_scan(spark, tmp_path):
    # with the invariant asserted, only batch-named partitions merge:
    # the d2 partition must carry by hardlink (no table scan happened)
    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d2")]), 0,
        path, ["k"], "ts", "k", partition_col="day", static_partitions=True,
    )
    v0 = os.path.join(path, "_v0", "day=d2")
    inodes = {
        f: os.stat(os.path.join(v0, f)).st_ino
        for f in os.listdir(v0) if f.endswith(".parquet")
    }
    merge_batch(
        spark, _df(spark, [(1, 20, "a2", "d1")]), 1,
        path, ["k"], "ts", "k", partition_col="day", static_partitions=True,
    )
    v1 = os.path.join(path, "_v1", "day=d2")
    for f, ino in inodes.items():
        assert os.stat(os.path.join(v1, f)).st_ino == ino


def test_null_partition_value_merges_once(spark, tmp_path):
    # REGRESSION: a null partition value writes to
    # __HIVE_DEFAULT_PARTITION__, but the touched-set used str(None) and
    # isin() (null-hostile), so the null partition was both rewritten
    # AND carried -> duplicated rows.
    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", None), (2, 10, "b", "d2")]), 0,
        path, ["k"], "ts", "k", partition_col="day",
    )
    merge_batch(
        spark, _df(spark, [(1, 20, "a2", None)]), 1,
        path, ["k"], "ts", "k", partition_col="day",
    )
    rows = read_upsert_table(spark, path).collect()
    assert sorted((r.k, r.ts, r.v, r.day) for r in rows) == [
        (1, 20, "a2", None),
        (2, 10, "b", "d2"),
    ]


def test_erase_keys_removes_subject_and_bumps_version(spark, tmp_path):
    from divolte_collector_spark.streaming.upsert import erase_keys

    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d1"), (3, 10, "c", "d2")]),
        0, path, ["k"], "ts", "k",
    )
    erase_keys(spark, path, "k", [2])
    out = sorted(r.k for r in read_upsert_table(spark, path).collect())
    assert out == [1, 3]
    assert current_version(path) == 1
    # the pre-erasure version (containing subject rows) is retired
    assert [e for e in os.listdir(path) if e.startswith("_v")] == ["_v1"]


def test_erase_keys_partition_touch(spark, tmp_path):
    from divolte_collector_spark.streaming.upsert import erase_keys

    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d2"), (3, 10, "c", "d2")]),
        0, path, ["k"], "ts", "k", partition_col="day",
    )
    v0d1 = os.path.join(path, "_v0", "day=d1")
    d1_inodes = {
        f: os.stat(os.path.join(v0d1, f)).st_ino
        for f in os.listdir(v0d1) if f.endswith(".parquet")
    }
    # subject lives only in d2: d1 must carry by hardlink
    erase_keys(spark, path, "k", [2], partition_col="day")
    v1d1 = os.path.join(path, "_v1", "day=d1")
    for f, ino in d1_inodes.items():
        assert os.stat(os.path.join(v1d1, f)).st_ino == ino
    out = {r.k: r.day for r in read_upsert_table(spark, path).collect()}
    assert out == {1: "d1", 3: "d2"}


def test_empty_pointer_file_reads_as_unpublished(spark, tmp_path):
    # REGRESSION: a crash could leave a zero-length _CURRENT; parsing
    # it raised an uncaught IndexError on every later merge/read,
    # permanently wedging the sink. It must read as "nothing published"
    # and the next merge must self-heal.
    path = str(tmp_path / "t")
    import os

    os.makedirs(path)
    open(os.path.join(path, "_CURRENT"), "w").close()  # empty pointer
    assert current_version(path) is None
    merge_batch(spark, _df(spark, [(1, 10, "a", "d1")]), 0,
                path, ["k"], "ts", "k")
    assert current_version(path) == 0
    assert [r.k for r in read_upsert_table(spark, path).collect()] == [1]


def test_erase_keys_dataframe_subjects(spark, tmp_path):
    """The scale path: subjects as a DataFrame never pass through the
    driver — distributed anti-join, same semantics as the list path
    (incl. null-key survival)."""
    from divolte_collector_spark.streaming.upsert import erase_keys

    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d1"),
                    (3, 10, "c", "d2"), (None, 10, "n", "d2")]),
        0, path, ["k"], "ts", "v",
    )
    subjects = spark.createDataFrame([(2,), (3,)], "subject long")
    erase_keys(spark, path, "k", subjects)
    out = sorted(
        (r.k if r.k is not None else -1)
        for r in read_upsert_table(spark, path).collect()
    )
    assert out == [-1, 1]  # null key survives, 2 and 3 erased
    assert current_version(path) == 1


def test_erase_keys_dataframe_subjects_partition_touch(spark, tmp_path):
    from divolte_collector_spark.streaming.upsert import erase_keys
    import os

    path = str(tmp_path / "t")
    merge_batch(
        spark,
        _df(spark, [(1, 10, "a", "d1"), (2, 10, "b", "d2"), (3, 10, "c", "d2")]),
        0, path, ["k"], "ts", "k", partition_col="day",
    )
    v0d1 = os.path.join(path, "_v0", "day=d1")
    d1_inodes = {
        f: os.stat(os.path.join(v0d1, f)).st_ino
        for f in os.listdir(v0d1) if f.endswith(".parquet")
    }
    subjects = spark.createDataFrame([(2,)], "subject long")
    # subject lives only in d2: d1 must still carry by hardlink
    erase_keys(spark, path, "k", subjects, partition_col="day")
    v1d1 = os.path.join(path, "_v1", "day=d1")
    for f, ino in d1_inodes.items():
        assert os.stat(os.path.join(v1d1, f)).st_ino == ino
    out = {r.k: r.day for r in read_upsert_table(spark, path).collect()}
    assert out == {1: "d1", 3: "d2"}
