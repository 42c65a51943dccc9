"""Data-layout planning for partitioned writes at scale.

At 100 TB the difference between a healthy table and an unreadable one
is file sizing: a partition written as one 40 GB file can't parallelize
its scan; the same partition as 40,000 1 MB files drowns the driver in
footer fetches. The planner below turns per-partition size statistics
into explicit file-count targets BEFORE the write, so the writer can
``repartition(n_files, keys)`` into right-sized files — the query-side
counterpart of the parquet compaction in sources/writers.py
(optimize_layout, S11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 256 * 1024 * 1024  # matches maxPartitionBytes in session.py


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition AFTER the read when (and only when) the
    plan's natural parallelism is below the session default — the
    optimization-guide §2.5 fix for unsplittable inputs ("one huge
    unsplittable file … repartition immediately after the read").

    A single-row-group parquet file caps scan parallelism at one task no
    matter how many cores the session has, so every map-heavy operator
    downstream (crypto hashing, per-element array work) runs serially.
    The check reads the physical plan's partition count (one planning
    pass, no job): at scale — where inputs have many row groups — it is
    ≥ the core count and this is a NO-OP, so no shuffle is ever added to
    a well-laid-out table. ``target`` defaults to the session's
    defaultParallelism, so the same code adapts to any core count
    (never a constant tuned for one machine). Results are unaffected:
    every consumer in this engine is partitioning-insensitive by
    construction (order-free aggregates, sorted collect_lists)."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def partition_layout_plan(
    df: DataFrame,
    part_cols: list[str],
    size_col: Column | str,
    target_bytes: int = TARGET_FILE_BYTES,
) -> DataFrame:
    """Per-partition write plan: row count, total bytes (from the
    caller-supplied per-row size expression — e.g. a serialized-width
    estimate or an on-disk length column), the file count that lands
    each partition at ``target_bytes``, and rows per file.

    One aggregation down to the partition-key cardinality; everything
    after is arithmetic on the (small) plan table. Integer ceilings
    only — deterministic on every engine."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    plan = df.groupBy(*part_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size.cast("bigint")).alias("total_bytes"),
    )
    n_files = F.greatest(
        F.lit(1),
        F.ceil(F.col("total_bytes").cast("double") / F.lit(target_bytes)).cast(
            "int"
        ),
    )
    return plan.select(
        *part_cols,
        "n_rows",
        "total_bytes",
        n_files.alias("n_files"),
        F.ceil(F.col("n_rows").cast("double") / n_files)
        .cast("bigint")
        .alias("rows_per_file"),
    )
