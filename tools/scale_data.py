"""Replicate the sf0.1 tables K-fold into a bench-compatible directory.

The provided testdata tops out at sf0.1; this builds K=10/100 volumes
(~sf1 / ~sf10 equivalents) for the SCALING CURVE measurement only —
correctness stays gated on the driver-provided parquet. Replication
preserves referential integrity (every TPC-H key offsets by
replica * OFFSET consistently on both sides of each join), grows key
cardinality rather than per-key history (user_id/doc_id/vec_id offset
per replica, so window partitions stay the same size while the table
grows — the realistic shape), and mutates document text with a
per-replica token so the dedup queries don't see a K-fold planted
duplicate explosion that no real corpus would have.

Replicated tables are written as MANY files (>= one cluster-width of
32, ~one per replica beyond that, capped at 256): the exploded build
plan otherwise inherits the single-partition source layout and emits
ONE parquet file per table at any K — and a 100x fact table stored as
one file caps every downstream scan at its handful of row groups
(measured: the 10x events table scanned as 2 tasks on 32 cores, so
every narrow-map curve row was timing the file layout, not the plan).
No real dataset at these volumes is a single file; the curve should
measure plan scaling under the layout a parallel writer actually
produces. Dimension tables (region/nation) keep the source layout.

Usage: python tools/scale_data.py K [out_dir]   (default /tmp/sfscale_K)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

OFFSET = 10_000_000
SRC = "/root/testdata/sf0.1"

# table -> columns to offset per replica (consistent across tables)
KEYED = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(k: int, out_dir: str) -> None:
    from divolte_collector_spark.session import get_spark, load_table

    spark = get_spark(f"scale-data-{k}")
    spark.sparkContext.setLogLevel("ERROR")
    for table, keys in KEYED.items():
        df = load_table(spark, SRC, table)
        if not keys or k == 1:
            out = df
        else:
            # widen BEFORE the explode: the source tables are one
            # parquet file each, and exploding from a single partition
            # serializes the whole K-fold expansion into one task
            # (measured: the 100x lineitem build alone ran >15 min
            # single-task; 32-wide it's minutes for the full set)
            rep = df.repartition(32).select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_r")
            )
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.col("_r") * OFFSET)
            if table == "documents":
                # distinct text per replica: no artificial K-fold dups
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(" ", F.col("text"), F.concat(F.lit("r"), F.col("_r"))),
                ).withColumn("n_chars", F.length("text"))
            if table == "embeddings":
                # perturb per replica: exact-duplicate vectors would give
                # every original 100 identical LSH siblings -> K^2 pair
                # blowup no real corpus has; a small deterministic nudge
                # keeps neighborhoods while breaking exact ties
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.element_at("embedding", 1)
                             + F.col("_r") * F.lit(0.003)).cast("float")
                        ),
                        F.slice("embedding", 2, 10_000),
                    ),
                )
            # scale-proportional file count (see module docstring):
            # at least full cluster width, ~one file per replica past
            # that, bounded so the 100x build doesn't shatter into
            # thousands of tiny files
            out = rep.drop("_r").repartition(max(32, min(k, 256)))
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: x{k} -> {out_dir}/{table}.parquet", file=sys.stderr)


if __name__ == "__main__":
    k = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfscale_{k}"
    build(k, out)
