from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import timeseries as ts


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["event_type", "ts", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))


def test_resample_fills_known_gap(spark):
    df = _mk(
        spark,
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 00:50:00", 2.0),
            # 01:00 and 02:00 empty
            ("a", "2024-01-01 03:05:00", 7.0),
            ("b", "2024-01-01 05:00:00", 9.0),
        ],
    )
    out = {
        (r.event_type, r.hour_ts): r
        for r in ts.resample_ffill(df).collect()
    }
    # series a: 4 grid hours 00..03; series b: single hour
    assert len(out) == 5
    a1 = out[("a", "2024-01-01 01:00:00")]
    assert a1.is_gap == 1 and a1.n_events == 0
    assert a1.sum_value_ffill == 3.0  # carried forward from hour 00
    a3 = out[("a", "2024-01-01 03:00:00")]
    assert a3.is_gap == 0 and a3.sum_value_ffill == 7.0
    assert out[("b", "2024-01-01 05:00:00")].is_gap == 0


def test_grid_is_contiguous_per_series(spark, sf_dir):
    from distributed_mobility_data_pipeline_spark.sources.readers import read_events

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    filled = ts.resample_ffill(ev)
    # bucket count must equal (max-min)/step + 1 for every series
    check = (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                (
                    F.unix_timestamp(F.max("hour_ts"))
                    - F.unix_timestamp(F.min("hour_ts"))
                )
                / 3600
                + 1
            ).alias("expected"),
        )
        .collect()
    )
    for r in check:
        assert r.n == r.expected


def test_gap_stats_longest_run(spark):
    df = _mk(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 1.0),
            # 3-hour gap: 01,02,03
            ("a", "2024-01-01 04:00:00", 1.0),
            # 1-hour gap: 05
            ("a", "2024-01-01 06:00:00", 1.0),
        ],
    )
    row = ts.gap_stats(df).collect()[0]
    assert row.n_buckets == 7
    assert row.n_gaps == 4
    assert row.longest_gap_run == 3


def test_ewma_dyadic_known_values(spark):
    from distributed_mobility_data_pipeline_spark.operators import windows as win

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 2), ("a", 3, 1), ("b", 1, 10)],
        ["k", "t", "n"],
    )
    out = {
        (r.k, r.t): r.ewma
        for r in win.ewma_dyadic(df, "k", "t", "n", window_rows=20).collect()
    }
    assert out[("a", 1)] == 4.0  # single obs: ewma == value
    # m=2: (2*1 + 4*0.5) / 1.5
    assert out[("a", 2)] == (2 + 4 * 0.5) / 1.5
    # m=3: (1 + 2*0.5 + 4*0.25) / 1.75
    assert out[("a", 3)] == 3.0 / 1.75
    assert out[("b", 1)] == 10.0


def test_ewma_tiebreak_makes_ties_deterministic(spark):
    from distributed_mobility_data_pipeline_spark.operators import windows as win

    # two rows tie on (k, t); with a tiebreak column the fold order is
    # total, so both shuffles of the input agree exactly
    rows = [("a", 1, 1, 4), ("a", 1, 2, 2), ("a", 2, 3, 1)]
    df1 = spark.createDataFrame(rows, ["k", "t", "seq", "n"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["k", "t", "seq", "n"])
    o1 = {
        (r.k, r.t, r.seq): r.ewma
        for r in win.ewma_dyadic(df1, "k", "t", "n", 20, tiebreak_col="seq").collect()
    }
    o2 = {
        (r.k, r.t, r.seq): r.ewma
        for r in win.ewma_dyadic(df2, "k", "t", "n", 20, tiebreak_col="seq").collect()
    }
    assert o1 == o2
    assert o1[("a", 2, 3)] == (1 + 2 * 0.5 + 4 * 0.25) / 1.75


def test_ewma_rejects_bad_window(spark):
    import pytest
    from distributed_mobility_data_pipeline_spark.operators import windows as win

    df = spark.createDataFrame([("a", 1, 1)], ["k", "t", "n"])
    with pytest.raises(ValueError):
        win.ewma_dyadic(df, "k", "t", "n", window_rows=0)


def test_interpolate_linear_known_gap(spark):
    df = _mk(
        spark,
        [
            ("a", "2024-01-01 00:30:00", 2.0),
            # 01:00, 02:00 empty -> line from 2.0 at hour0 to 8.0 at hour3
            ("a", "2024-01-01 03:10:00", 8.0),
        ],
    )
    out = {
        r.hour_ts: r.sum_value_interp
        for r in ts.resample_interpolate(df).collect()
    }
    assert out["2024-01-01 00:00:00"] == 2.0
    assert out["2024-01-01 01:00:00"] == 4.0
    assert out["2024-01-01 02:00:00"] == 6.0
    assert out["2024-01-01 03:00:00"] == 8.0


def test_interpolate_boundary_degenerates_to_neighbor(spark):
    # gap at the series start cannot happen (grid starts at the first
    # observation), but a one-sided tail gap can't either; verify the
    # observed passthrough on single-bucket series instead
    df = _mk(spark, [("b", "2024-01-01 05:00:00", 9.0)])
    rows = ts.resample_interpolate(df).collect()
    assert len(rows) == 1 and rows[0].sum_value_interp == 9.0


def test_seasonal_anomaly_flags_known_spike(spark):
    # 10 days of hour-0 observations for one series: nine hours with 1
    # event, one hour with 30 -> that hour is a >2-sigma outlier
    rows = []
    eid = 0
    for day in range(1, 11):
        n = 30 if day == 5 else 1
        for k in range(n):
            rows.append((eid, f"2024-01-{day:02d} 00:{k:02d}:00", "a"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ts.seasonal_anomaly(df).collect()
    assert len(out) == 10
    flagged = [r for r in out if r.is_anomaly]
    assert [r.hour_s for r in flagged] == ["2024-01-05 00:00:00"]
    assert all(r.mean_n == pytest.approx(3.9) for r in out)


def test_seasonal_anomaly_degenerate_profile_unflagged(spark):
    # constant series (zero variance) and a single-observation series:
    # both must yield NULL z and no flags
    rows = [(1, "2024-01-01 03:00:00", "c"), (2, "2024-01-02 03:00:00", "c"),
            (3, "2024-01-01 07:00:00", "solo")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ts.seasonal_anomaly(df).collect()
    assert all(r.z is None and not r.is_anomaly for r in out)


def test_cusum_matches_sequential_recurrence(spark):
    """The window closed form (cumsum minus clamped running min) must
    equal the textbook sequential recurrence on a series with a planted
    level shift, and alarm exactly when the recurrence crosses h."""
    import datetime

    from distributed_mobility_data_pipeline_spark.operators import timeseries as ts

    base = datetime.datetime(2024, 1, 1)
    # 20 quiet days (n=10), then a persistent +5 shift
    counts = [10] * 20 + [15] * 10
    rows = []
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append(("s", base + datetime.timedelta(days=d, seconds=i)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {
        r.day: r
        for r in ts.cusum_alarms(df, h_threshold=3.0).collect()
    }
    # python reference recurrence
    import statistics

    mean = statistics.mean(counts)
    sd = statistics.pstdev(counts)
    s_hi = s_lo = 0.0
    for d, c in enumerate(counts):
        z = (c - mean) / sd
        s_hi = max(0.0, s_hi + z - 0.5)
        s_lo = max(0.0, s_lo - z - 0.5)
        day = (base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        r = got[day]
        assert abs(r.cusum_hi - s_hi) < 1e-9, (day, r.cusum_hi, s_hi)
        assert abs(r.cusum_lo - s_lo) < 1e-9
        assert r.alarm_hi == int(s_hi > 3.0)
    # the shifted tail must alarm on the high side; with retrospective
    # full-series standardization the quiet period sits below the mean,
    # so low-side alarms there are correct too — assert placement, not
    # absence: high alarms only in the shifted tail, low alarms only in
    # the quiet head
    shift_start = (base + datetime.timedelta(days=20)).strftime("%Y-%m-%d")
    assert any(r.alarm_hi for d, r in got.items() if d >= shift_start)
    assert not any(r.alarm_hi for d, r in got.items() if d < shift_start)
    assert not any(r.alarm_lo for d, r in got.items() if d >= shift_start)


def test_cusum_outage_alarms_low(spark):
    """A complete outage must still alarm on the low side: the day grid
    is densified, so zero-count days are scored rather than absent."""
    import datetime

    from distributed_mobility_data_pipeline_spark.operators import timeseries as ts

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # 30 active days then 10 days of silence, closed by one final event
    # (the grid spans min..max observed day)
    for d in range(30):
        for i in range(10):
            rows.append(("s", base + datetime.timedelta(days=d, seconds=i)))
    rows.append(("s", base + datetime.timedelta(days=40)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {r.day: r for r in ts.cusum_alarms(df, h_threshold=3.0).collect()}
    assert len(got) == 41  # densified: silent days present
    silent_day = (base + datetime.timedelta(days=35)).strftime("%Y-%m-%d")
    assert got[silent_day].n == 0
    assert any(
        r.alarm_lo
        for d, r in got.items()
        if d >= (base + datetime.timedelta(days=30)).strftime("%Y-%m-%d")
    )
