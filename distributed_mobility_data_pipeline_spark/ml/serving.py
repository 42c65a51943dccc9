"""Request-path model serving, Spark-first (reference src/api/app.py:243-378).

The reference serves predictions from a FastAPI process: one joblib
model in memory, a Python loop over request rows (app.py:305-345), a
fallback formula when no artifact is loaded, and a prediction-event log
appended as JSONL (app.py:219-239). Re-expressed for Spark:

- a request batch (one row or thousands) becomes a local-rows DataFrame
  (SURVEY.md §2.1 S7) and is scored as ONE vectorized plan — MLlib
  ``model.transform`` when a fitted model is supplied, the expression
  fallback scorers (ml/scoring.py) otherwise, mirroring the reference's
  local_artifact/fallback split;
- the prediction-event log is a distributed JSONL append whose shape
  matches what ml/monitoring.latency_stats reads back — same columns
  the reference logs (request_id, task, model_used, latency_ms);
- /health and /models become one-row DataFrames — the health of a Spark
  serving job is its session + registered model table, not a process.

Single-digit-millisecond point lookups are not Spark's job; this module
is the batch/micro-batch request path (the reference's /predict/demand/
batch is precisely this shape, app.py:305-345).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.ml import scoring

DEMAND_REQUEST_SCHEMA = (
    "hour int, day_of_week int, is_weekend int, "
    "n_lag_1 double, n_lag_7 double, avg_7r double"
)
SURGE_REQUEST_SCHEMA = "hour int, is_weekend int, n long, avg_7r double"


def demand_requests(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Local request rows → DataFrame (S7), the API's request body."""
    return spark.createDataFrame(rows, DEMAND_REQUEST_SCHEMA)


def surge_requests(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, SURGE_REQUEST_SCHEMA)


def serve_demand(
    requests: DataFrame, model=None, request_id: str = "batch-0"
) -> DataFrame:
    """Score a demand request batch (app.py:268-345 semantics): model
    artifact if loaded, expression fallback otherwise; predictions
    rounded to 2 decimals like the reference's response."""
    if model is not None:
        scored = model.transform(requests).withColumnRenamed(
            "prediction", "predicted_demand"
        )
        used = "local_artifact"
    else:
        scored = scoring.score_demand_expression(requests)
        used = "fallback"
    return scored.select(
        F.lit(request_id).alias("request_id"),
        "*",
        F.round(F.col("predicted_demand"), 2).alias("predicted"),
        F.lit(used).alias("model_used"),
    ).drop("predicted_demand")


def serve_surge(
    requests: DataFrame, model=None, request_id: str = "batch-0"
) -> DataFrame:
    """Surge twin (app.py:347-378): clamped multiplier, 3 decimals."""
    if model is not None:
        scored = model.transform(requests).withColumnRenamed(
            "prediction", "predicted_surge"
        )
        used = "local_artifact"
    else:
        scored = scoring.score_surge_expression(requests)
        used = "fallback"
    return scored.select(
        F.lit(request_id).alias("request_id"),
        "*",
        F.round(F.col("predicted_surge"), 3).alias("predicted_surge_multiplier"),
        F.lit(used).alias("model_used"),
    ).drop("predicted_surge")


def log_prediction_events(
    responses: DataFrame, path: str, task: str, latency_ms: int,
    status: int = 200,
) -> None:
    """Append prediction events as JSONL (app.py:219-239's log shape,
    extended with the endpoint/status fields ml/monitoring.latency_stats
    groups and error-counts on — the reference logs latency_ms only, so
    without these the documented log→stats round-trip would fail on
    UNRESOLVED_COLUMN). Distributed append — no driver-side row loop."""
    (
        responses.select(
            "request_id",
            F.lit(task).alias("task"),
            F.lit(f"/predict/{task}").alias("endpoint"),
            "model_used",
            F.lit(latency_ms).alias("latency_ms"),
            F.lit(status).alias("status"),
        )
        .write.mode("append")
        .json(path)
    )


def health(spark: SparkSession, models: dict | None = None) -> DataFrame:
    """One-row health record (app.py:247-253)."""
    models = models or {}
    return spark.createDataFrame(
        [
            (
                "ok",
                models.get("demand") is not None,
                models.get("surge") is not None,
            )
        ],
        "status string, demand_model_loaded boolean, surge_model_loaded boolean",
    )
