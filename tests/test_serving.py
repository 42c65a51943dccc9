"""Serving + tracking surface (reference app.py /predict routes and
mlflow run logging): batch request scoring, fallback/model split,
prediction-event log roundtrip, run store + best-run selection."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_mobility_data_pipeline_spark.ml import serving, tracking


def test_serve_demand_fallback_batch(spark):
    reqs = serving.demand_requests(
        spark,
        [(10, 2, 0, 4.0, 6.0, 5.0), (22, 6, 1, None, 2.0, 1.5)],
    )
    out = serving.serve_demand(reqs, request_id="r1")
    rows = {r.hour: r for r in out.collect()}
    # 0.5*4 + 0.3*6 + 0.2*5 + 1 = 5.8 ; null lag → coalesce 0
    assert rows[10].predicted == 5.8
    assert rows[22].predicted == round(0.3 * 2.0 + 0.2 * 1.5 + 1.0, 2)
    assert rows[10].model_used == "fallback"
    assert rows[10].request_id == "r1"


def test_serve_surge_clamped(spark):
    reqs = serving.surge_requests(
        spark, [(8, 0, 100, 1.0), (3, 1, 0, 10.0)]
    )
    out = {r.hour: r for r in serving.serve_surge(reqs).collect()}
    assert out[8].predicted_surge_multiplier == 3.0  # clamped at max
    assert 1.0 <= out[3].predicted_surge_multiplier <= 3.0


def test_prediction_log_roundtrip(spark, tmp_path):
    p = str(tmp_path / "pred_log")
    reqs = serving.demand_requests(spark, [(1, 1, 0, 1.0, 1.0, 1.0)])
    out = serving.serve_demand(reqs, request_id="log-1")
    serving.log_prediction_events(out, p, task="demand", latency_ms=12)
    serving.log_prediction_events(out, p, task="demand", latency_ms=20)
    back = spark.read.json(p)
    assert back.count() == 2
    assert {r.latency_ms for r in back.collect()} == {12, 20}
    assert back.columns and set(back.columns) >= {
        "request_id", "task", "model_used", "latency_ms",
        "endpoint", "status",
    }
    # the DOCUMENTED round-trip: the log this module writes must feed
    # ml/monitoring.latency_stats directly (it groups on endpoint and
    # error-counts on status — a log without them fails to resolve)
    from distributed_mobility_data_pipeline_spark.ml import monitoring

    stats = monitoring.latency_stats(back).collect()
    assert len(stats) == 1 and stats[0].endpoint == "/predict/demand"
    assert stats[0].n_requests == 2 and stats[0].n_errors == 0


def test_health_row(spark):
    h = serving.health(spark, {"demand": object()}).collect()[0]
    assert h.status == "ok" and h.demand_model_loaded and not h.surge_model_loaded


def test_tracking_best_run(spark, tmp_path):
    store = str(tmp_path / "runs")
    tracking.log_run(
        spark, store, "demand_rf",
        {"model_type": "RandomForest", "num_trees": "100"},
        {"rmse": 3.2, "mae": 2.1}, "2026-01-01 00:00:00",
    )
    tracking.log_run(
        spark, store, "demand_gbt",
        {"model_type": "GBT"}, {"rmse": 2.8, "mae": 2.3}, "2026-01-01 00:10:00",
    )
    tracking.log_run(
        spark, store, "demand_lr",
        {"model_type": "LR"}, {"rmse": 4.0, "mae": 3.0}, "2026-01-01 00:20:00",
    )
    assert tracking.runs(spark, store).count() == 6  # 3 runs x 2 metrics
    best = tracking.best_run(spark, store, "rmse").collect()[0]
    assert best.run_name == "demand_gbt" and best.value == 2.8
    worst = tracking.best_run(spark, store, "mae", minimize=False).collect()[0]
    assert worst.run_name == "demand_lr"
