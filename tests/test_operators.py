"""Operator unit invariants on tiny inline DataFrames (SURVEY.md §5):
keep-latest tie-breaking, surrogate-key determinism, window frame
boundaries, histogram clamping, multimodal feature extraction."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_mobility_data_pipeline_spark.operators import (
    aggregates,
    dedup,
    multimodal,
    star,
    windows,
)


def test_keep_latest_picks_newest_and_breaks_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "v1"),
            (1, "2024-01-02 00:00:00", 11, "v2"),  # newest → kept
            (2, "2024-01-01 00:00:00", 20, "v1"),
            (2, "2024-01-01 00:00:00", 21, "v2"),  # tie → higher id kept
        ],
        "k long, ts string, id long, payload string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedup.keep_latest(df, ["k"], "ts", ["id"])
    got = {(r.k, r.payload) for r in out.collect()}
    assert got == {(1, "v2"), (2, "v2")}


def test_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([(42,)], "id long")
    a = df.select(star.surrogate_key("id").alias("k")).collect()[0].k
    b = df.select(star.surrogate_key("id").alias("k")).collect()[0].k
    assert a == b and len(a) == 64  # sha2-256 hex


def test_rolling_frame_excludes_current_row(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 6)], "g string, i long, v double"
    )
    out = windows.with_rolling_rows(df, ["g"], "i", "v", 2, "w").orderBy("i")
    rows = out.collect()
    assert rows[0].avg_w is None  # empty frame
    assert rows[1].avg_w == 1.0  # only row 1
    assert rows[2].avg_w == 1.5  # rows 1,2
    assert rows[4].avg_w == 3.5  # rows 3,4 (frame of 2, excludes self)


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5.0,), (5.0,), (15.0,), (999.0,), (None,)], "x double"
    )
    out = {r.bucket: r.n for r in aggregates.histogram(df, "x", [0, 10, 20]).collect()}
    assert out == {-1: 1, 0: 2, 1: 2}  # -5 clamps low, 999 clamps high


def test_multimodal_feature_extraction(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG fake"), "image/png"),
         (2, "audio", bytearray(b"RIFF fake"), "audio/wav")],
        "media_id long, kind string, payload binary, mime string",
    )
    out = multimodal.extract_features(media).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_bytes > 0 and len(r.payload_sha256) == 64
        assert all(0.0 <= r[f"feat_{j}"] <= 1.0 for j in range(4))
    # deterministic across runs
    again = multimodal.extract_features(media).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_top_k_per_group_exact(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)],
        "g string, v long",
    )
    out = aggregates.top_k(df, "v", 2, "g").collect()
    got = sorted((r.g, r.v) for r in out)
    assert got == [("a", 8), ("a", 9), ("b", 1), ("b", 2)]


def test_gini_extremes(spark):
    from distributed_mobility_data_pipeline_spark.operators import aggregates as agg

    # group e: perfectly equal -> gini 0; group c: one key has all value
    rows = [("e", k, 10.0) for k in range(4)]
    rows += [("c", 0, 100.0), ("c", 1, 0.0), ("c", 2, 0.0), ("c", 3, 0.0)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    out = {r.g: r for r in agg.gini_by_group(df, "g", "k", "v").collect()}
    assert out["e"].gini == 0.0
    # max gini for n=4 with one holder = (n-1)/n = 0.75
    assert out["c"].gini == 0.75
    assert out["e"].n_keys == 4 and out["e"].total_value == 40.0
