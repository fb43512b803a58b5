"""Session-scoped result materialization for tempdir-backed queries.

Several gated queries build their result on top of an on-disk artifact
(a versioned upsert table, a persisted LSH/IVF index) living in a
tempdir the query removes before returning. The result must therefore
be detached from those files — but ``createDataFrame(df.collect(),
schema)`` detaches it by funneling the ENTIRE table through the
driver, which is unbounded at scale. Instead: write the result to a
session-scoped temp parquet (executor-parallel, driver sees only
metadata) and return a reader over it; the directory is cleaned at
process exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def detach_result(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Persist ``df`` beyond its inputs' lifetime without a driver
    roundtrip: distributed write to a session-scoped temp parquet,
    read back. Row order is not preserved (gated comparisons are
    multiset-based)."""
    out_dir = tempfile.mkdtemp(prefix="dvs_result_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)
