"""Storage layout for the mapped-event table at 100 TB.

The reference's K1 sink already rolls files into hourly buckets
(FileFlusher.java:183-208 — time IS its partition scheme); this module
is the batch/table-side counterpart: write the event table

- **partitioned by event date** — every time-bounded query (sessions,
  funnels, retention, DAU — i.e. nearly all of them) prunes to the
  scanned days at PLANNING time; a year-long 100 TB table serves a
  one-week query by listing 7 directories;
- **sorted by (party_id, client_time) within each file** — parquet
  min/max page stats then act as a party-id zone map (predicate
  locality for per-party lookups), and downstream per-party windows
  read their rows pre-clustered;
- **with bounded files per partition** — `files_per_partition` caps
  the small-file count (the classic 100 TB failure mode is a day
  directory with 200k tiny files from 200k tasks).

`read_events_partitioned` is the matching reader; filters on
`event_date` become PartitionFilters (no data files touched outside
the range), which `tests/test_layout.py` pins via the plan audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_events_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: tuple[str, ...] = ("party_id",),
    files_per_partition: int = 4,
) -> None:
    """Write an event DataFrame date-partitioned and party-clustered.

    ``repartition(files_per_partition, date, party)`` bounds the file
    count per day while keeping one party's rows in one file;
    ``sortWithinPartitions`` clusters each file by party then time so
    parquet page stats prune per-party scans."""
    present = [c for c in sort_cols if c in df.columns]
    out = df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col)))
    (
        out.repartition(files_per_partition, F.col(PARTITION_COL), *present)
        .sortWithinPartitions(PARTITION_COL, *present, ts_col)
        .write.partitionBy(PARTITION_COL)
        .mode("overwrite")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned table; date predicates prune partitions."""
    return spark.read.parquet(path)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_value: str,
    target_files: int = 1,
) -> int:
    """Rewrite one date partition into ``target_files`` files.

    The maintenance half of the layout story: streaming ingest (or a
    misconfigured backfill) leaves a day directory with many small
    files; queries then pay per-file open/footer costs and lose page-
    stat pruning. Compaction reads the partition, rewrites it at the
    target file count (re-sorted, so page stats re-tighten), and swaps
    the directory in with rename — readers see the old or the new
    layout, never a mix. On an object store the swap step would go
    through a manifest/table-format commit instead; the read-rewrite
    core is identical. Returns the row count of the compacted
    partition.
    """
    import os
    import shutil

    part_dir = os.path.join(path, f"{PARTITION_COL}={partition_value}")
    df = spark.read.parquet(part_dir)
    n = df.count()
    tmp = part_dir + ".compacting"
    old = part_dir + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out = df.repartition(target_files)
    sort_cols = [c for c in ("party_id",) if c in df.columns]
    if sort_cols:  # sortWithinPartitions rejects an empty column list
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp)
    os.replace(part_dir, old)  # readers renaming-in-flight see old data
    os.replace(tmp, part_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n
