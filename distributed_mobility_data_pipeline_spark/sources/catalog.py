"""Session catalog helpers: register the dataset as temp views so the
engine's SQL surface (``spark.sql``) works alongside the DataFrame API.

The reference exposes its tables to ad-hoc SQL through the metastore;
path-based deployments get the same ergonomics from temp views. Views
are lazy — registering costs one parquet-footer read per table, and
every Catalyst optimization (pushdown, pruning, AQE) applies to SQL
text exactly as to DataFrame code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from distributed_mobility_data_pipeline_spark.sources.readers import read_events

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Register each parquet table under ``sf_dir`` as a temp view named
    after the table. Events go through the ns-timestamp-normalizing
    reader. Returns the registered names (missing files are skipped)."""
    registered = []
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = (
            read_events(spark, path)
            if name == "events"
            else spark.read.parquet(path)
        )
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered
