"""Monitoring composition: run record shape, threshold alerts, and
distributed latency stats."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import types as T

from distributed_mobility_data_pipeline_spark.ml import monitoring
from distributed_mobility_data_pipeline_spark.ml.features import demand_features
from distributed_mobility_data_pipeline_spark.ml.scoring import score_demand_expression
from distributed_mobility_data_pipeline_spark.sources.readers import read_events, read_json_log


def test_monitoring_record_and_alerts(spark, sf_dir):
    scored = score_demand_expression(
        demand_features(read_events(spark, f"{sf_dir}/events.parquet"))
    ).withColumn("y", F.col("n").cast("double"))
    rec = monitoring.monitoring_record(
        scored,
        date_col="d",
        y="y",
        yhat="predicted_demand",
        feature_col="n_lag_1",
        split_date="2024-01-15",
        start_date="2024-01-01",
        end_date="2024-01-29",
        psi_edges=[0.0, 5.0, 10.0, 20.0, 40.0],
    )
    row = rec.collect()[0]
    assert row.baseline_n > 0 and row.current_n > 0
    assert row.baseline_rmse >= 0 and row.current_rmse >= 0
    al = monitoring.alerts(rec, "n_lag_1")
    got = {r.check: r.status for r in al.collect()}
    assert set(got) == {"psi", "missing_rate", "volume"}
    assert all(s in ("ok", "warn", "critical") for s in got.values())


def test_latency_stats_distributed(spark, tmp_path):
    p = tmp_path / "api.jsonl"
    rows = [
        {"endpoint": "/predict/demand", "latency_ms": float(i), "status": 200}
        for i in range(100)
    ] + [{"endpoint": "/predict/demand", "latency_ms": 500.0, "status": 503}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("endpoint", T.StringType()),
            T.StructField("latency_ms", T.DoubleType()),
            T.StructField("status", T.IntegerType()),
        ]
    )
    out = monitoring.latency_stats(read_json_log(spark, str(p), schema)).collect()[0]
    assert out.n_requests == 101
    assert out.n_errors == 1
    assert out.p50_ms <= out.p95_ms <= out.p99_ms


def test_robust_outliers_known_data(spark):
    from distributed_mobility_data_pipeline_spark.operators import quality

    # group a: tight cluster + one wild point; group b: constant (MAD 0)
    rows = [("a", float(v)) for v in [10, 10, 11, 9, 10, 11, 9, 10, 1000]]
    rows += [("b", 5.0)] * 6
    df = spark.createDataFrame(rows, ["grp", "value"])
    out = {r.grp: r for r in quality.robust_outlier_report(df, "grp", "value").collect()}
    assert out["a"].median == 10.0
    assert out["a"].mad == 1.0  # devs [0,0,0,0,1,1,1,1,990] -> median 1
    assert out["a"].n_outliers == 1  # only the 1000
    assert out["b"].mad == 0.0
    assert out["b"].n_outliers == 0  # MAD 0 guard: constants never flag


def test_schema_drift_detects_all_changes(spark):
    from pyspark.sql import functions as F

    from distributed_mobility_data_pipeline_spark.operators import quality

    old = spark.createDataFrame([(1, "a", 1.5)], "id long, name string, v double")
    new = (
        old.withColumn("v", F.col("v").cast("float"))  # type change
        .withColumn("extra", F.lit(1))                 # added
        .drop("name")                                  # removed
    )
    got = {r.column: (r.status, r.old_type, r.new_type)
           for r in quality.schema_drift(old, new).collect()}
    assert got == {
        "extra": ("added", None, "int"),
        "name": ("removed", "string", None),
        "v": ("type_changed", "double", "float"),
    }
    assert quality.schema_drift(old, old).count() == 0


def test_expectations_report_counts(spark):
    from distributed_mobility_data_pipeline_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, "zz", None), (None, "a", 50.0)],
        "id long, code string, v double",
    )
    ref = spark.createDataFrame([("a",), ("b",)], "code string")
    rules = [
        {"rule": "id_nn", "kind": "not_null", "col": "id"},
        {"rule": "v_range", "kind": "in_range", "col": "v", "lo": 0,
         "hi": 10},
        {"rule": "code_set", "kind": "in_set", "col": "code",
         "values": ["a", "b"]},
        {"rule": "code_re", "kind": "regex", "col": "code",
         "pattern": "^[ab]$"},
        {"rule": "id_uniq", "kind": "unique", "cols": ["id"]},
        {"rule": "code_ref", "kind": "ref_integrity", "col": "code",
         "ref": "codes", "ref_col": "code"},
    ]
    out = {
        r.rule: r
        for r in quality.expectations_report(
            df, rules, ref_tables={"codes": ref}
        ).collect()
    }
    assert out["id_nn"].n_violations == 1
    assert out["v_range"].n_violations == 2  # -1 and 50; NULL passes
    assert out["code_set"].n_violations == 1  # zz
    assert out["code_re"].n_violations == 1
    assert out["id_uniq"].n_violations == 1  # id=2 duplicated
    assert out["id_uniq"].n_checked == 3  # distinct keys incl NULL
    assert out["code_ref"].n_violations == 1  # zz not in ref
    assert out["code_ref"].n_checked == 4
    assert not out["id_nn"].passed and out["id_nn"].n_checked == 4


def test_expectations_rejects_unknown_kind(spark):
    from distributed_mobility_data_pipeline_spark.operators import quality
    import pytest as _pytest

    df = spark.range(1)
    with _pytest.raises(ValueError):
        quality.expectations_report(df, [{"rule": "x", "kind": "nope"}])
    with _pytest.raises(ValueError):
        quality.expectations_report(df, [{"kind": "not_null", "col": "id"}])
    with _pytest.raises(ValueError):
        quality.expectations_report(df, [])


def test_ks_binned_detects_location_shift(spark):
    from distributed_mobility_data_pipeline_spark.operators import drift

    base = spark.createDataFrame([(float(v),) for v in range(0, 50)], "v double")
    curr = spark.createDataFrame([(float(v),) for v in range(50, 100)], "v double")
    out = drift.ks_binned(base, curr, "v", [0.0, 25.0, 50.0, 75.0, 100.0]).collect()
    ks = max(r.abs_diff for r in out)
    assert ks == 1.0  # disjoint supports -> maximal ECDF gap
    # identical distributions -> zero gap everywhere
    out2 = drift.ks_binned(base, base, "v", [0.0, 25.0, 50.0, 75.0, 100.0]).collect()
    assert all(r.abs_diff == 0.0 for r in out2)
    # cumulative shares end at 1.0 on both sides
    last = max(out, key=lambda r: r.bucket)
    assert last.b_cum_share == 1.0 and last.c_cum_share == 1.0


def test_calibration_bins_exact_means(spark):
    from distributed_mobility_data_pipeline_spark.operators import metrics

    rows = [(5.0, 4), (15.0, 20), (25.0, 25), (35.0, 30), (None, 9), (50.0, None)]
    df = spark.createDataFrame(rows, "pred double, actual int")
    out = {
        r.bucket: r
        for r in metrics.calibration_bins(
            df, "pred", "actual", [0.0, 20.0, 40.0]
        ).collect()
    }
    # NULL pred / NULL actual rows are excluded entirely
    assert set(out) == {0, 1}
    assert out[0].n == 2 and out[0].avg_pred == 10.0 and out[0].avg_actual == 12.0
    assert out[0].bias == -2.0
    assert out[1].n == 2 and out[1].avg_pred == 30.0 and out[1].bias == 2.5


def test_contribution_analysis_decomposes_delta(spark):
    from distributed_mobility_data_pipeline_spark.operators import aggregates

    # x -> base period, y -> comp period. Per-dim totals:
    #   A: base 100 -> comp 50  (delta -50)
    #   B: base 100 -> comp 130 (delta +30)
    #   C: base 20  -> comp 0   (delta -20)
    df = spark.createDataFrame(
        [
            ("x", "A", 100.0), ("x", "B", 100.0),
            ("y", "A", 50.0), ("y", "B", 130.0),
            ("x", "C", 20.0),
        ],
        ["period", "dim", "v"],
    ).withColumn("period", F.when(F.col("period") == "x", "base").otherwise("comp"))
    rows = {
        r.dim_value: r
        for r in aggregates.contribution_analysis(
            df, "dim", "v", F.col("period"), "base", "comp"
        ).collect()
    }
    assert rows["A"].delta == -50.0 and rows["B"].delta == 30.0
    assert rows["C"].delta == -20.0
    total = sum(r.delta for r in rows.values())
    assert abs(sum(r.delta_share for r in rows.values()) - 1.0) < 1e-12
    assert rows["A"].contribution_rank == 1  # largest |delta|
    assert abs(rows["A"].delta_share - (-50.0 / total)) < 1e-12


def test_k_anonymity_flags_small_groups(spark):
    import pytest as _pytest

    from distributed_mobility_data_pipeline_spark.operators import quality

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)],
        ["qi1", "qi2"],
    )
    rows = quality.k_anonymity_report(df, ["qi1", "qi2"], k=3).collect()
    got = {(r.qi1, r.qi2): r.n_rows for r in rows}
    assert got == {("a", 2): 2, ("b", 1): 1}  # the 5-row group is safe
    # worst-first ordering
    assert [(r.qi1, r.qi2) for r in rows] == [("b", 1), ("a", 2)]
    with _pytest.raises(ValueError):
        quality.k_anonymity_report(df, [], 3)
    with _pytest.raises(ValueError):
        quality.k_anonymity_report(df, ["qi1"], 1)


def test_alerts_null_volume_ratio_is_critical(spark):
    """An EMPTY baseline window yields volume_ratio NULL (can't
    compute) — the outage case must alarm, not read as 'ok' via
    NULL < threshold -> otherwise('ok')."""
    rec = spark.createDataFrame(
        [(0.0, 0.0, None)],
        "psi_n_lag_1 double, missing_shift_n_lag_1 double, volume_ratio double",
    )
    al = {r.check: r.status for r in monitoring.alerts(rec, "n_lag_1").collect()}
    assert al["volume"] == "critical"
