"""ML feature engineering (SURVEY.md §2.6/§2.12, feature_engineering.py).

Composes the window operator layer into the reference's three feature
tables, transplanted to the driver's tables:

- demand features (feature_engineering.py:51-169): hourly/daily grain,
  lag 1/7, rolling mean/std, calendar flags;
- entity-activity (churn) features (feature_engineering.py:275-352):
  per-customer daily activity, rolling spend, gap-based churn label.

Everything is deterministic column algebra (exact decimal sums), so both
feature tables are DuckDB-oracle-checkable — stronger than the
reference's untested feature pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import windows as W


def demand_features(events: DataFrame) -> DataFrame:
    """Daily demand features per event_type: counts, lags, trailing
    rolling stats, calendar flags (is_weekend via dayofweek)."""
    daily = W.daily_counts(events)  # d, event_type, n, sum_value
    feat = W.with_lags(daily, ["event_type"], "d", "n", [1, 7], prefix="n_lag_")
    feat = W.with_rolling_rows(feat, ["event_type"], "d", "n", 7, "7r")
    feat = feat.withColumn("day_of_week", F.dayofweek("d")).withColumn(
        "is_weekend", F.when(F.col("day_of_week").isin(1, 7), 1).otherwise(0)
    )
    # demand spike flag vs rolling baseline (feature_engineering.py:241-245)
    feat = feat.withColumn(
        "is_spike",
        F.when(
            F.col("avg_7r").isNotNull() & (F.col("n") > F.col("avg_7r") * 1.5), 1
        ).otherwise(0),
    )
    return feat.select(
        F.col("d").cast("string").alias("d"),
        "event_type",
        "n",
        "sum_value",
        "n_lag_1",
        "n_lag_7",
        "avg_7r",
        "std_7r",
        "cnt_7r",
        "day_of_week",
        "is_weekend",
        "is_spike",
    )


def churn_features(orders: DataFrame, gap_days: int = 30) -> DataFrame:
    """Per-customer activity features + churn label: order recency gaps
    (lead), trailing 3-order rolling spend, labeled will_churn."""
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        "o_totalprice",
    )
    lab = W.churn_label(base, "o_custkey", "od", gap_days, tiebreak=["o_orderkey"])
    roll = W.with_rolling_rows(
        lab, ["o_custkey"], "od", "o_totalprice", 3, "3o", tiebreak=["o_orderkey"]
    )
    return roll.select(
        "o_orderkey",
        "o_custkey",
        F.col("od").cast("string").alias("od"),
        "o_totalprice",
        "days_to_next",
        "will_churn",
        "avg_3o",
        "cnt_3o",
    )
