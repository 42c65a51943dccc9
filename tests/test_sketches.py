"""Mergeable fixed-bin histogram quantiles: error bound vs exact
percentiles, the merge property, and argument validation. (HLL sketch
rollup tests live in test_behavior.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import sketches




def test_histogram_quantiles_within_bin_width(spark, sf_dir):
    """The estimator's guarantee: the answering bin CONTAINS the order
    statistic at rank ceil(q·n), so the estimate is within one bin
    width of that order statistic. (Comparing against interpolated
    quantile_cont instead would fail on sparse tails, where adjacent
    order statistics are further apart than any bin — a definitional
    gap, not histogram error.)"""
    import math
    import os

    from distributed_mobility_data_pipeline_spark.sources.readers import read_events

    ev = read_events(spark, os.path.join(sf_dir, "events.parquet"))
    approx = {
        (r.event_type, r.q): r.value_q
        for r in sketches.quantile_rollup_hist(ev, [0.5, 0.9, 0.99]).collect()
    }
    values: dict[str, list[float]] = {}
    for r in ev.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    ).collect():
        values.setdefault(r.event_type, []).append(r.value)
    width = 500.0 / 20
    assert approx, "no quantile rows"
    for et, vs in values.items():
        vs.sort()
        for q in (0.5, 0.9, 0.99):
            rank = math.ceil(q * len(vs))
            order_stat = vs[rank - 1]
            assert abs(approx[(et, q)] - order_stat) <= width + 1e-9


def test_histogram_merge_equals_direct(spark):
    """Summing daily bin counts == binning the union directly — the
    mergeability property the 100 TB rollup relies on."""
    df = spark.createDataFrame(
        [("a", "d1", float(v)) for v in range(10)]
        + [("a", "d2", float(v * 3) % 7) for v in range(8)],
        ["g", "day", "v"],
    )
    daily = sketches.binned_value_histograms(df, ["g", "day"], "v", 0.0, 10.0, 5)
    merged = {
        (r.g, r.bin): r.n
        for r in daily.groupBy("g", "bin").agg(F.sum("n").alias("n")).collect()
    }
    direct = {
        (r.g, r.bin): r.n
        for r in sketches.binned_value_histograms(
            df, ["g"], "v", 0.0, 10.0, 5
        ).collect()
    }
    assert merged == direct


def test_histogram_validates_args(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        sketches.binned_value_histograms(df, ["g"], "v", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        sketches.binned_value_histograms(df, ["g"], "v", 5.0, 5.0, 3)


def test_rolling_quantile_matches_per_window_recompute(spark):
    """The trailing-window histogram sum must equal recomputing the
    histogram quantile over each window's raw rows directly."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(10):
        for v in range(d + 1):  # growing daily volume, values 0..d
            rows.append((base + datetime.timedelta(days=d), float(v * 10)))
    df = spark.createDataFrame(rows, ["ts", "value"])
    got = {
        (r.day, r.q): r.value_q
        for r in sketches.rolling_quantile_hist(
            df, [0.5], window_days=3, lo=0.0, hi=100.0, n_bins=10
        ).collect()
    }
    for d in range(10):
        day = (base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        lo_d = max(0, d - 2)
        window_rows = [
            (f"w", float(v * 10))
            for dd in range(lo_d, d + 1)
            for v in range(dd + 1)
        ]
        wdf = spark.createDataFrame(window_rows, ["g", "value"])
        hist = sketches.binned_value_histograms(wdf, ["g"], "value", 0.0, 100.0, 10)
        want = sketches.quantiles_from_histograms(
            hist, ["g"], [0.5], 0.0, 100.0, 10
        ).collect()[0].value_q
        assert got[(day, 0.5)] == want, (day, got[(day, 0.5)], want)


def test_embedding_drift_identity_and_statuses(spark):
    from distributed_mobility_data_pipeline_spark.operators import similarity

    old = spark.createDataFrame(
        [(i, [float(i + 1), 0.0, 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    # id 0 removed; id 5 vector flipped (cosine < 0); id 99 added
    new = (
        old.filter("vec_id > 0")
        .withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == 5,
                F.expr("transform(embedding, x -> -x)"),
            ).otherwise(F.col("embedding")),
        )
        .union(
            spark.createDataFrame(
                [(99, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
            )
        )
    )
    rows = similarity.embedding_drift_hist(old, new).collect()
    by = {(r.status, r.bin): r.n for r in rows}
    assert by[("added", -1)] == 1
    assert by[("removed", -1)] == 1
    # 4 unchanged ids -> cosine ~1 -> top bin (19); flipped -> cosine -1 -> bin 0
    assert by[("matched", 19)] == 4
    assert by[("matched", 0)] == 1


def test_embedding_drift_null_vector_stays_matched(spark):
    """A matched id whose VECTOR is NULL or zero-norm must not be
    misread as added/removed (presence is keyed on the join markers),
    must not vanish from the report, and must not ride NaN into the top
    bin — it lands in the dedicated matched_null bucket, so the status
    rows partition the full id universe."""
    from distributed_mobility_data_pipeline_spark.operators import similarity

    old = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.embedding_drift_hist(old, new).collect()
    by = {(r.status, r.bin): r.n for r in rows}
    assert by[("added", -1)] == 0
    assert by[("removed", -1)] == 0
    # id 1 (NULL vector) + id 3 (zero-norm -> NaN cosine) -> matched_null
    assert by[("matched_null", -1)] == 2
    # id 2 is the only binned matched id; counts cover the id universe
    assert sum(n for (s, _), n in by.items() if s == "matched") == 1
    assert sum(by.values()) == 3


def test_winsorize_hist_clamps_within_bin_of_exact(spark):
    """The histogram cutoffs must sit within one bin width of the exact
    percentile cutoffs, and clamping must preserve NULLs and interior
    values."""
    from distributed_mobility_data_pipeline_spark.operators import cleaning

    rows = [("g", float(v)) for v in range(100)] + [("g", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {
        r.value: r.value_winsorized
        for r in cleaning.winsorize_hist(
            df, "value", 0.05, 0.95, lo=0.0, hi=100.0, n_bins=20, group_col="grp"
        ).collect()
    }
    assert out[None] is None
    assert out[50.0] == 50.0  # interior untouched
    # exact cutoffs are ~5 and ~95; bin width 5 -> clamp bounds within [0,10] & [90,100]
    assert 0.0 <= out[0.0] <= 10.0 and out[0.0] > 0.0
    assert 90.0 <= out[99.0] <= 100.0 and out[99.0] < 99.0


def test_robust_outlier_hist_close_to_exact(spark):
    """Histogram median/MAD must land within a bin width of the exact
    report's values, and flag the same gross outlier."""
    from distributed_mobility_data_pipeline_spark.operators import quality

    rows = [("g", float(v)) for v in range(100)] + [("g", 10_000.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    exact = quality.robust_outlier_report(df, "grp", "value").collect()[0]
    hist = quality.robust_outlier_report_hist(
        df, "grp", "value", 0.0, 200.0, n_bins=40
    ).collect()[0]
    width = 200.0 / 40
    assert abs(hist.median - exact.median) <= width
    assert abs(hist.mad - exact.mad) <= width
    assert hist.n == exact.n
    assert hist.n_outliers >= 1  # the 10k point is flagged either way


def test_quantile_q_zero_returns_first_nonempty_bin_edge(spark):
    """q=0 satisfies no cum_before < target bin, which used to drop the
    row entirely; it must answer with the lo edge of the first NONEMPTY
    bin (the histogram's minimum)."""
    # values 23..77 over [0, 100) with width 10: first nonempty bin is 2
    df = spark.createDataFrame(
        [(float(v),) for v in range(23, 78)], "value double"
    )
    hist = sketches.binned_value_histograms(df, [], "value", 0.0, 100.0, 10)
    got = {
        r.q: r.value_q
        for r in sketches.quantiles_from_histograms(
            hist, [], [0.0, 0.5], 0.0, 100.0, 10
        ).collect()
    }
    assert got[0.0] == 20.0  # lo edge of bin 2, not a missing row
    assert 20.0 <= got[0.5] <= 60.0


def test_winsorize_hist_lo_p_zero_clamps_at_lo_edge(spark):
    """lo_p=0.0 used to silently produce a NULL _lo cutoff (no lower
    clamp at all); now the cutoff is the first nonempty bin's lo edge,
    so values still clamp and nothing NULLs out."""
    from distributed_mobility_data_pipeline_spark.operators import cleaning

    df = spark.createDataFrame(
        [(float(v),) for v in range(23, 78)], "value double"
    )
    out = {
        r.value: r.value_winsorized
        for r in cleaning.winsorize_hist(
            df, "value", lo_p=0.0, hi_p=0.5, lo=0.0, hi=100.0, n_bins=10
        ).collect()
    }
    assert None not in out.values()
    # lower cutoff = 20.0 (first nonempty bin edge) -> below-min values keep
    assert out[23.0] == 23.0
    # upper cutoff = the hist median (~50): larger values clamp DOWN
    assert out[77.0] <= 60.0


def test_rolling_distinct_sketch_respects_day_gaps(spark):
    """The sketch window must be a true trailing-N-DAYS range, not the
    last N observed ROWS: activity older than the window separated by a
    gap of zero-event days must NOT inflate the estimate (it used to —
    a rows frame unioned the stale sketches)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12)
    rows = []
    for day, users in ((0, (1, 2, 3)), (1, (4, 5, 6)), (9, (7, 8, 9))):
        for u in users:
            rows.append((base + datetime.timedelta(days=day), u))
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    got = {
        r.day: r.approx_users
        for r in sketches.rolling_distinct_sketch(
            df, window_days=7
        ).collect()
    }
    exact = {
        r.day: r.n_users
        for r in sketches.rolling_distinct_exact(df, window_days=7).collect()
    }
    # day 9 sits > 7 days after days 0/1: only its own 3 users count
    assert exact["2024-01-10"] == 3
    assert got["2024-01-10"] == 3  # HLL exact at tiny cardinality
    assert got == exact
