"""Deduplication operators (SURVEY.md §2.3 D1-D3).

D1 keep-latest is the canonical Spark dedup: a row_number window over
the business key ordered by recency. One shuffle on the key; at 100 TB
pre-partitioning bronze writes by the same key column family lets AQE
keep partitions local. LLM-scale near-dedup (MinHash/SimHash) lives in
dedup_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent record per key — D1
    (bronze_to_silver.py:40-42: row_number over trip_id by ingested_at
    desc). `tiebreak_cols` make the result deterministic when the
    recency column has duplicates (the reference's version is
    nondeterministic on ties — fixed here)."""
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the EARLIEST record per key — the deterministic batch twin
    of streaming dropDuplicates (which keeps first *arrival*, an
    ordering batch mode cannot reproduce)."""
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def distinct_projection(df: DataFrame, cols: list[str]) -> DataFrame:
    """Distinct key-set extraction — D2 (silver_to_gold.py:28-76:
    dropDuplicates on narrow projections for dim building)."""
    return df.select(*cols).distinct()


def exact_duplicate_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicate census per key: how many physical rows per business
    key (the monitoring view of D1)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("version_count"))
        .filter(F.col("version_count") > 1)
    )
