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
