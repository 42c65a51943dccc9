"""Writers (SURVEY.md §2.1 S3/S4/S5/S10).

The reference writes Delta (delta_utils.py:24-33, batch_scoring.py:151-186).
delta-spark is not in this environment, so the default table format is
parquet with the same write semantics; every function upgrades to Delta
transparently when delta-spark is importable. MERGE (S5) is re-expressed
as the canonical Spark emulation: target anti-join source on the merge
keys, union the source, rewrite — idempotent for re-runs with the same
keys, which is the property batch_scoring.py:161-186 relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_mobility_data_pipeline_spark.session import has_delta


def _fmt() -> str:
    return "delta" if has_delta() else "parquet"


def write_overwrite(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Full-table overwrite, schema evolution allowed
    (delta_utils.write_delta_overwrite, delta_utils.py:24-33)."""
    writer = df.write.format(_fmt()).mode("overwrite")
    if has_delta():
        writer = writer.option("overwriteSchema", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_append(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Append sink for metrics/drift/log rows (batch_scoring.py:245)."""
    writer = df.write.format(_fmt()).mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe (delta_utils.py:14-18)."""
    if has_delta():
        from delta.tables import DeltaTable  # type: ignore

        return DeltaTable.isDeltaTable(spark, path)
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 16
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_cols`` between
    co-bucketed tables skip the shuffle entirely (pyspark guide:
    'Bucketing'). The 100 TB answer for repeatedly-joined fact tables."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def optimize_layout(
    spark: SparkSession,
    path: str,
    zorder_by: list[str],
    target_partitions: int | None = None,
) -> None:
    """Data-layout maintenance — S11 (gold_dag.py:194-212 calls a
    nonexistent ``delta.optimize_table(zorder_by=...)``; working here).

    Delta path: OPTIMIZE ... ZORDER BY. Parquet path: the poor-man's
    Z-order — range-repartition + in-partition sort on the locality
    columns, so min/max row-group stats prune on those columns."""
    if has_delta():
        cols = ", ".join(f"`{c}`" for c in zorder_by)
        spark.sql(f"OPTIMIZE delta.`{path}` ZORDER BY ({cols})")
        return
    df = spark.read.parquet(path)
    n = target_partitions or max(df.rdd.getNumPartitions() // 4, 1)
    out = (
        df.repartitionByRange(n, *zorder_by)
        .sortWithinPartitions(*zorder_by)
        .localCheckpoint(eager=True)
    )
    out.write.mode("overwrite").parquet(path)


def merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Upsert ``source`` into the table at ``path`` on ``keys``.

    Delta path: ``whenMatchedUpdateAll().whenNotMatchedInsertAll()``
    (batch_scoring.py:161-186). Parquet path: emulate with
    target ⟕anti source on keys, then union source and rewrite — the
    matched rows are replaced wholesale, unmatched inserted, giving the
    same end state as the Delta MERGE for update-all/insert-all.

    At 100 TB the parquet emulation rewrites the table; with partition
    columns supplied, only affected partitions need rewriting (dynamic
    partition overwrite) — but prefer real Delta/Iceberg MERGE on a
    cluster with those jars.
    """
    if has_delta():
        from delta.tables import DeltaTable  # type: ignore

        if DeltaTable.isDeltaTable(spark, path):
            tgt = DeltaTable.forPath(spark, path)
            cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
            (
                tgt.alias("t")
                .merge(source.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        write_overwrite(source, path, partition_by)
        return

    if not table_exists(spark, path):
        write_overwrite(source, path, partition_by)
        return
    target = spark.read.parquet(path)
    kept = target.join(source.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
    merged = kept.unionByName(source, allowMissingColumns=True)
    # Parquet overwrite of the path we are also reading: break the lineage
    # by materializing to a local checkpoint before rewriting.
    merged = merged.localCheckpoint(eager=True)
    write_overwrite(merged, path, partition_by)
