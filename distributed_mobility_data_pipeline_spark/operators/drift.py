"""Drift monitoring (SURVEY.md §2.12 M8, model_monitoring.py:78-124).

PSI (population stability index) between a baseline and a current slice:
bucketize both by common edges, compare bin proportions,
psi = Σ (c% − b%) · ln(c% / b%).

Two variants, as SURVEY.md §6 prescribes:
- ``psi_fixed_bins`` — explicit edges, fully deterministic, DuckDB-
  oracle-checkable (the ln output is truncated at decimal(28,8) to
  absorb cross-engine libm ULP differences).
- ``psi_quantile_bins`` — edges from ``approxQuantile`` on the baseline
  (Greenwald-Khanna, model_monitoring.py:101-103); approximate by
  design → rows-only check.

Laplace-style smoothing (+1 per bin) replaces the reference's eps-clamp
so empty bins can't produce ±inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucketize(df: DataFrame, col: str, edges: list[float]) -> DataFrame:
    n = len(edges) - 1
    b = F.when(F.col(col).isNull(), F.lit(-1))
    for i in range(n - 1):
        b = b.when(F.col(col) < F.lit(edges[i + 1]), F.lit(i))
    b = b.otherwise(F.lit(n - 1))
    return df.withColumn("bucket", b)


def psi_detail_fixed_bins(
    baseline: DataFrame, current: DataFrame, col: str, edges: list[float]
) -> DataFrame:
    """Per-bin PSI terms: bucket, baseline/current counts and shares,
    psi_term. Smoothed counts keep every bucket present on both sides."""
    b = (
        _bucketize(baseline, col, edges)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("b_n"))
    )
    c = (
        _bucketize(current, col, edges)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_n"))
    )
    joined = b.join(c, "bucket", "full").na.fill(0, ["b_n", "c_n"])
    b_tot = F.sum("b_n").over(Window.partitionBy())
    c_tot = F.sum("c_n").over(Window.partitionBy())
    b_pct = (F.col("b_n") + 1).cast("double") / (b_tot + 1)
    c_pct = (F.col("c_n") + 1).cast("double") / (c_tot + 1)
    term = ((c_pct - b_pct) * F.log(c_pct / b_pct)).cast("decimal(28,8)").cast("double")
    return joined.select(
        "bucket",
        F.col("b_n").cast("bigint").alias("baseline_n"),
        F.col("c_n").cast("bigint").alias("current_n"),
        term.alias("psi_term"),
    )


def psi_fixed_bins(
    baseline: DataFrame, current: DataFrame, col: str, edges: list[float]
) -> DataFrame:
    """One-row PSI summary from the fixed-bin detail."""
    detail = psi_detail_fixed_bins(baseline, current, col, edges)
    return detail.agg(
        F.sum(F.col("psi_term").cast("decimal(28,8)")).cast("double").alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def psi_quantile_bins(
    baseline: DataFrame, current: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Production variant: bin edges from approxQuantile on the baseline
    (model_monitoring.py:101-103). Approximate → rows-only check."""
    probs = [i / n_bins for i in range(1, n_bins)]
    edges = baseline.approxQuantile(col, probs, 0.01)
    uniq: list[float] = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    full = [float("-inf"), *uniq, float("inf")]
    return psi_fixed_bins(baseline, current, col, full)


def missing_rate_shift(
    baseline: DataFrame, current: DataFrame, cols: list[str]
) -> DataFrame:
    """Null-rate drift per column (model_monitoring.py:126-133,
    threshold config.yaml:31)."""
    def rates(df: DataFrame, label: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for c in cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_n_{c}")
            )
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{c}', _n_{c}" for c in cols)
        return wide.selectExpr(
            f"stack({len(cols)}, {stack}) as (column, null_count)",
            "_total",
        ).select(
            "column",
            (F.col("null_count").cast("double") / F.col("_total")).alias(
                f"{label}_rate"
            ),
        )

    b = rates(baseline, "baseline")
    c = rates(current, "current")
    return b.join(c, "column").select(
        "column",
        "baseline_rate",
        "current_rate",
        F.abs(F.col("current_rate") - F.col("baseline_rate")).alias("shift"),
    )
