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


def test_rolling_std_is_zero_not_nan_on_constant_frames(spark):
    """s2 - s1²/cnt can cancel to a tiny NEGATIVE double on a constant
    series; sqrt of that is NaN, and Spark orders NaN above every
    number — a z-score filter would then flag exactly the flat frames.
    The moment formula must zero-clamp."""
    import math

    v = 35273.368321  # a value whose squared moments don't cancel cleanly
    df = spark.createDataFrame(
        [("g", i, v) for i in range(1, 6)], "g string, i long, v double"
    )
    rows = windows.with_rolling_rows(df, ["g"], "i", "v", 4, "w").collect()
    for r in rows:
        if r.std_w is not None:
            assert not math.isnan(r.std_w), r
            assert r.std_w == 0.0, r


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


def test_sample_frames_offsets_and_hashes(spark):
    import hashlib

    payload = bytes(range(100))  # L=100, span=84, offsets 0,28,56,84
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), "video/mp4"),
         (2, "video", bytearray(b"tiny"), "video/mp4")],  # L < frame_bytes
        "media_id long, kind string, payload binary, mime string",
    )
    rows = {
        (r.media_id, r.frame_idx): r
        for r in multimodal.sample_frames(media).collect()
    }
    assert len(rows) == 8  # 4 frames per payload
    assert [rows[(1, i)].frame_offset for i in range(4)] == [0, 28, 56, 84]
    assert rows[(1, 3)].frame_sha256 == hashlib.sha256(
        payload[84:100]
    ).hexdigest()
    # short payload: every frame is the whole payload at offset 0
    assert rows[(2, 0)].frame_offset == 0
    assert rows[(2, 0)].n_frame_bytes == 4
    assert rows[(2, 2)].frame_sha256 == hashlib.sha256(b"tiny").hexdigest()


def test_sample_frames_rejects_zero_frames(spark):
    import pytest as _pytest

    media = spark.createDataFrame(
        [], "media_id long, kind string, payload binary, mime string"
    )
    with _pytest.raises(ValueError):
        multimodal.sample_frames(media, n_frames=0)


def test_resize_media_truncates_over_budget_only(spark):
    import hashlib

    big, small = bytes(range(64)), b"ok"
    media = spark.createDataFrame(
        [(1, "image", bytearray(big), "image/png"),
         (2, "image", bytearray(small), "image/png")],
        "media_id long, kind string, payload binary, mime string",
    )
    rows = {
        r.media_id: r for r in multimodal.resize_media(media, 32).collect()
    }
    assert (rows[1].n_bytes_in, rows[1].n_bytes_out) == (64, 32)
    assert rows[1].resized_sha256 == hashlib.sha256(big[:32]).hexdigest()
    assert (rows[2].n_bytes_in, rows[2].n_bytes_out) == (2, 2)
    assert rows[2].resized_sha256 == hashlib.sha256(small).hexdigest()


def test_winsorize_clamps_to_exact_percentiles(spark):
    from distributed_mobility_data_pipeline_spark.operators import cleaning

    # values 0..100: p5=5.0, p95=95.0 under linear interpolation
    df = spark.createDataFrame([(float(i),) for i in range(101)], "v double")
    out = cleaning.winsorize(df, "v", 0.05, 0.95).collect()
    wins = sorted(r.v_winsorized for r in out)
    assert wins[0] == 5.0 and wins[-1] == 95.0
    assert sum(1 for w in wins if w == 5.0) == 6  # 0..5 all clamp to 5


def test_winsorize_per_group_and_nulls(spark):
    from distributed_mobility_data_pipeline_spark.operators import cleaning

    rows = [("a", float(i)) for i in range(11)] + [
        ("b", 1000.0), ("b", 2000.0), ("b", 3000.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = cleaning.winsorize(df, "v", 0.25, 0.75, group_col="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    # group a: p25=2.5, p75=7.5
    a = sorted(r.v_winsorized for r in by_g["a"])
    assert a[0] == 2.5 and a[-1] == 7.5
    # group b clamps to its own envelope, and NULL stays NULL
    b_null = [r for r in by_g["b"] if r.v is None]
    assert len(b_null) == 1 and b_null[0].v_winsorized is None
    assert max(r.v_winsorized for r in by_g["b"] if r.v is not None) == 2500.0


def test_winsorize_rejects_bad_bounds(spark):
    from distributed_mobility_data_pipeline_spark.operators import cleaning
    import pytest as _pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError):
        cleaning.winsorize(df, "v", 0.9, 0.1)
