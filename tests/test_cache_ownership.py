"""Cache-ownership convention (VERDICT r11 item 4).

Gated query builds persist intermediates their RETURNED plan still
reads (rank-scan inputs, self-join sides), so the build cannot
unpersist them — ownership is instead: every persist goes through
``session.track_persist`` and is released by
``queries.release_caches(spark)``; a cache_plan entry evicted by a
table regeneration additionally unpersists ITS build's pins
immediately. Source-scanned + behaviorally pinned here.
"""

from __future__ import annotations

import glob
import shutil

SF_DIR = "/root/testdata/sf0.001"


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_queries_never_call_raw_persist():
    """The convention's mechanical half: no query module calls
    ``.persist()`` directly — only ``track_persist`` (which records a
    release path). A raw persist would be invisible to
    ``release_caches`` and accumulate in a long-lived session."""
    offenders = []
    for f in sorted(glob.glob("divolte_collector_spark/queries/*.py")):
        for i, line in enumerate(open(f), 1):
            code = line.split("#")[0]
            if ".persist()" in code or ".cache()" in code:
                offenders.append(f"{f}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_release_caches_unpersists_tracked_relations(spark):
    """Build + execute the two heaviest persisting queries, then one
    release call leaves the cache manager empty — no cached relation
    the engine created survives past release_caches."""
    from divolte_collector_spark import session as sess
    from divolte_collector_spark.queries import all_queries, release_caches

    spark.catalog.clearCache()
    sess._TRACKED_PERSISTS.pop(spark.sparkContext.applicationId, None)

    for name in ("agg_user_rfm_segments", "agg_user_activity_gini"):
        df = all_queries()[name].fn(spark, SF_DIR)
        assert df.count() >= 0
    app = spark.sparkContext.applicationId
    pins = list(sess._TRACKED_PERSISTS.get(app, []))
    assert pins, "expected tracked persists from the rfm/gini builds"
    assert not _cache_manager(spark).isEmpty()

    released = release_caches(spark)
    assert released >= len(pins)
    assert _cache_manager(spark).isEmpty()
    for p in pins:
        assert not p.storageLevel.useMemory and not p.storageLevel.useDisk


def test_discard_pins_unpersists_and_unregisters(spark):
    """Unit half of the eviction contract: discard_pins drops the JVM
    cache entry and the registry record for exactly the given pins."""
    from pyspark.sql import functions as F

    from divolte_collector_spark import session as sess

    spark.catalog.clearCache()
    app = spark.sparkContext.applicationId
    sess._TRACKED_PERSISTS.pop(app, None)

    a = sess.track_persist(
        spark.range(100).select((F.col("id") * 2).alias("x"))
    )
    b = sess.track_persist(
        spark.range(100).select((F.col("id") * 3).alias("y"))
    )
    a.count(), b.count()
    assert a.storageLevel.useMemory and b.storageLevel.useMemory

    sess.discard_pins(spark, [a])
    assert not a.storageLevel.useMemory
    assert b.storageLevel.useMemory  # untouched
    reg = sess._TRACKED_PERSISTS.get(app, [])
    assert any(r is b for r in reg) and all(r is not a for r in reg)
    sess.discard_pins(spark, [b])


def test_plan_cache_eviction_discards_the_evicted_builds_pins(
    spark, tmp_path, monkeypatch
):
    """A table regeneration evicts the prepared plan AND routes that
    build's pins through discard_pins — a resident service rebuilding
    after each regeneration must not accumulate dead cached relations.
    (JVM-side assertions can't distinguish old/new here: the rebuilt
    plan reads the same root path, so Spark's cache manager aliases
    them by sameResult — hence the spy + registry assertions, with
    discard_pins' JVM behavior unit-pinned above.)"""
    import os

    from divolte_collector_spark import session as sess
    from divolte_collector_spark.queries import all_queries, release_caches

    spark.catalog.clearCache()
    app = spark.sparkContext.applicationId
    sess._TRACKED_PERSISTS.pop(app, None)

    sfd = str(tmp_path)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{sfd}/events.parquet")
    rq = all_queries()["agg_user_activity_gini"]
    first = rq.fn(spark, sfd)
    assert first.count() == 1
    old_pins = list(sess._TRACKED_PERSISTS.get(app, []))
    assert old_pins

    discarded = []
    real = sess.discard_pins

    def spy(s, pins):
        discarded.extend(pins)
        return real(s, pins)

    monkeypatch.setattr(sess, "discard_pins", spy)

    # regenerate the table (different content => different signature)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(500)
    os.remove(f"{sfd}/events.parquet")
    src.write.mode("overwrite").parquet(f"{sfd}/events.parquet")
    sess._SIG_CACHE.clear()  # drop the stat-TTL snapshot, keep the plans

    second = rq.fn(spark, sfd)
    assert second.count() == 1
    assert any(
        any(d is p for p in old_pins) for d in discarded
    ), "eviction must discard the evicted build's pins"
    reg = sess._TRACKED_PERSISTS.get(app, [])
    assert reg and all(
        all(r is not p for p in old_pins) for r in reg
    ), "evicted pins must leave the registry; the rebuild's must stay"

    release_caches(spark)
    assert _cache_manager(spark).isEmpty()
