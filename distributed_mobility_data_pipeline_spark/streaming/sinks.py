"""Streaming sinks (SURVEY.md §2.10 + §2.1 S5 composition).

The production pattern the reference's batch MERGE implies but never
streams: ``foreachBatch`` turns each micro-batch into a batch DataFrame
and runs the idempotent upsert from sources.writers — exactly how a
Structured Streaming job maintains a keyed table (Delta MERGE on a
cluster, the parquet emulation here). Because merge_upsert is idempotent
on keys, a replayed micro-batch (at-least-once delivery) converges to
the same table — the end-to-end-exactly-once recipe.

Also the plain append sink with checkpointing, for log-shaped outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from distributed_mobility_data_pipeline_spark.sources import writers


def stream_merge_upsert(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    dedup_order_col: str | None = None,
):
    """writeStream.foreachBatch → merge_upsert per micro-batch.

    ``dedup_order_col``: within one micro-batch the same key can appear
    many times; keep the row with the max of this column (e.g. event
    time) before merging, so the merge sees one row per key.

    Cross-batch semantics are MERGE's update-all (last writer wins),
    matching Delta's whenMatchedUpdateAll: if the source can deliver a
    key's OLDER row in a LATER micro-batch, add a recency condition to
    the merge (Delta ``whenMatchedUpdate(condition=...)``) — file and
    Kafka sources in arrival order don't need it.
    Returns the started StreamingQuery (caller awaits/stops)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        one = batch_df
        if dedup_order_col is not None:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(*keys).orderBy(
                F.col(dedup_order_col).desc(), *[F.col(k) for k in keys]
            )
            one = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        writers.merge_upsert(
            batch_df.sparkSession, one, path, keys, partition_by
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
