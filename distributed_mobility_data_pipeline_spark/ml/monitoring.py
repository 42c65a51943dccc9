"""Model-monitoring run composition (SURVEY.md §3 entry point 3,
model_monitoring.py:193-338).

Composes the operator layers into the reference's monitoring loop:
baseline/current date-window split → volume check → regression metrics
on both slices → per-feature PSI + missing-rate shift → API-latency
stats from the JSONL log (distributed, not the reference's Python
loop, model_monitoring.py:136-152) → one flat run record plus a
threshold-driven alerts table (thresholds from the reference's
config.yaml:28-32). Everything stays a DataFrame; nothing collects."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import drift as drift_ops
from distributed_mobility_data_pipeline_spark.operators import metrics as metric_ops
from distributed_mobility_data_pipeline_spark.operators import quality as quality_ops

# reference thresholds (config.yaml:28-32)
PSI_WARN = 0.1
PSI_CRIT = 0.2
MISSING_SHIFT_WARN = 0.05
VOLUME_DROP_RATIO = 0.3


def monitoring_record(
    scored: DataFrame,
    date_col: str,
    y: str,
    yhat: str,
    feature_col: str,
    split_date: str,
    start_date: str,
    end_date: str,
    psi_edges: list[float],
) -> DataFrame:
    """One-row monitoring record: volumes, baseline/current error
    metrics, PSI, missing shift."""
    d = F.to_date(date_col)
    baseline = scored.filter((d >= F.lit(start_date)) & (d < F.lit(split_date)))
    current = scored.filter((d >= F.lit(split_date)) & (d < F.lit(end_date)))

    vol = quality_ops.volume_check(
        scored, date_col, start_date, split_date, split_date, end_date
    )
    mb = metric_ops.regression_metrics(baseline, y, yhat).select(
        F.col("mae").alias("baseline_mae"),
        F.col("rmse").alias("baseline_rmse"),
        F.col("n").alias("baseline_n"),
    )
    mc = metric_ops.regression_metrics(current, y, yhat).select(
        F.col("mae").alias("current_mae"),
        F.col("rmse").alias("current_rmse"),
        F.col("n").alias("current_n"),
    )
    psi = drift_ops.psi_fixed_bins(baseline, current, feature_col, psi_edges).select(
        F.col("psi").alias(f"psi_{feature_col}")
    )
    shift = (
        drift_ops.missing_rate_shift(baseline, current, [feature_col])
        .select(F.col("shift").alias(f"missing_shift_{feature_col}"))
    )
    return (
        vol.crossJoin(mb)
        .crossJoin(mc)
        .crossJoin(psi)
        .crossJoin(shift)
    )


def alerts(record: DataFrame, feature_col: str) -> DataFrame:
    """Threshold evaluation → long alerts table (model_monitoring.py:
    174-185 prints/webhooks; here it's data)."""
    psi_col = F.col(f"psi_{feature_col}")
    shift_col = F.col(f"missing_shift_{feature_col}")
    checks = record.select(
        F.when(psi_col >= PSI_CRIT, F.lit("critical"))
        .when(psi_col >= PSI_WARN, F.lit("warn"))
        .otherwise(F.lit("ok"))
        .alias("psi_status"),
        F.when(shift_col >= MISSING_SHIFT_WARN, F.lit("warn"))
        .otherwise(F.lit("ok"))
        .alias("missing_status"),
        # NULL ratio means the baseline window had ZERO rows (outage or
        # misconfigured split) — the case that must alarm loudest, and
        # exactly the one `NULL < x -> otherwise('ok')` would wave through
        F.when(
            F.col("volume_ratio").isNull()
            | (F.col("volume_ratio") < VOLUME_DROP_RATIO),
            F.lit("critical"),
        )
        .otherwise(F.lit("ok"))
        .alias("volume_status"),
    )
    return checks.selectExpr(
        "stack(3, 'psi', psi_status, 'missing_rate', missing_status, "
        "'volume', volume_status) as (check, status)"
    )


def latency_stats(api_log: DataFrame) -> DataFrame:
    """API-latency percentiles from the JSONL log — distributed
    (model_monitoring.py:153-171 computes these in a Python loop)."""
    return api_log.groupBy("endpoint").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.round(F.avg("latency_ms"), 3).alias("avg_latency_ms"),
        F.percentile_approx("latency_ms", 0.5).alias("p50_ms"),
        F.percentile_approx("latency_ms", 0.95).alias("p95_ms"),
        F.percentile_approx("latency_ms", 0.99).alias("p99_ms"),
        F.sum(F.when(F.col("status") >= 500, 1).otherwise(0)).alias("n_errors"),
    )
