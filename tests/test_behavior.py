from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import behavior, linkage, sketches
from distributed_mobility_data_pipeline_spark.sources.readers import read_events


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_events(spark, f"{sf_dir}/events.parquet")


def test_funnel_counts_monotonic_nonincreasing(events):
    rows = behavior.funnel_stages(events).orderBy("stage_idx").collect()
    assert [r.stage for r in rows] == ["view", "click", "purchase"]
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True)
    assert rows[0].pct_of_first == 100.0


def test_funnel_respects_stage_order(spark):
    # user 1 does click BEFORE its first view -> that click can't count
    rows_in = [
        (1, "2024-01-01 00:00:00", "click"),
        (1, "2024-01-02 00:00:00", "view"),
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-02 00:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows_in, ["user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.stage: r.users
        for r in behavior.funnel_stages(
            df, stages=("view", "click")
        ).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_funnel_rejects_single_stage(events):
    with pytest.raises(ValueError):
        behavior.funnel_stages(events, stages=("view",))


def test_cohort_offset_zero_is_full_retention(events):
    rows = behavior.cohort_retention(events).collect()
    assert rows, "expected at least one cohort"
    for r in rows:
        if r.period_offset == 0:
            assert r.n_users == r.cohort_size
            assert r.retention_pct == 100.0
        assert 0 < r.n_users <= r.cohort_size


def test_cohort_rejects_bad_period(events):
    with pytest.raises(ValueError):
        behavior.cohort_retention(events, period="day")


def test_rfm_scores_in_range_and_deterministic(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = behavior.rfm_scores(orders)
    rows = out.collect()
    assert len(rows) == orders.select("o_custkey").distinct().count()
    for r in rows:
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= 4
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # deterministic across runs (ties broken by custkey)
    again = {r.custkey: r.segment for r in behavior.rfm_scores(orders).collect()}
    assert {r.custkey: r.segment for r in rows} == again


def test_fuzzy_pairs_properties(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    pairs = linkage.blocked_fuzzy_pairs(part, "p_partkey", "p_name", 2)
    rows = pairs.collect()
    assert rows, "expected some near-duplicate names"
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b  # unordered, no self-pairs
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
        assert r.edit_distance <= 2
        assert 0.0 <= r.similarity <= 1.0
        if r.edit_distance == 0:
            assert r.name_a == r.name_b and r.similarity == 1.0


def test_fuzzy_pairs_rejects_negative_distance(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    with pytest.raises(ValueError):
        linkage.blocked_fuzzy_pairs(part, "p_partkey", "p_name", -1)


def test_sketch_rollup_within_hll_error(events):
    exact = {
        r.month: r.n_users
        for r in sketches.distinct_rollup_exact(events).collect()
    }
    approx = {
        r.month: r.approx_users
        for r in sketches.distinct_rollup_sketch(events).collect()
    }
    assert set(exact) == set(approx)
    for m, n in exact.items():
        # lg_k=12 HLL is well under 5% relative error
        assert abs(approx[m] - n) <= max(1, 0.05 * n)


def test_rolling_distinct_sketch_tracks_exact(events):
    exact = {
        r.day: r.n_users
        for r in sketches.rolling_distinct_exact(events).collect()
    }
    approx = {
        r.day: r.approx_users
        for r in sketches.rolling_distinct_sketch(events).collect()
    }
    assert set(exact) == set(approx) and exact
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(1, 0.05 * n)
    # rolling window >= any single day's distinct count
    daily = {
        r.day: r.n_users
        for r in sketches.rolling_distinct_exact(events, window_days=1).collect()
    }
    for d in exact:
        assert exact[d] >= daily[d]


def test_type_entropy_bounds(spark):
    import math

    rows = [(1, "a")] * 4 + [(2, "a"), (2, "b"), (2, "c"), (2, "d")]
    ev = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {r.user_id: r for r in behavior.type_entropy(ev).collect()}
    assert out[1].entropy == 0.0  # single-type user
    assert abs(out[2].entropy - math.log(4)) < 1e-12  # uniform over 4 types
    assert out[2].n_events == 4 and out[2].n_types == 4


def test_funnel_timing_known_lags(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", "view", 1),
        (1, "2024-01-01 01:00:00", "click", 2),     # 1h lag
        (1, "2024-01-01 01:30:00", "purchase", 3),  # 30m lag
        (2, "2024-01-01 00:00:00", "view", 4),
        (2, "2024-01-01 03:00:00", "click", 5),     # 3h lag, no purchase
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "event_id"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.transition: r for r in behavior.funnel_timing(ev).collect()}
    vc = out["view>click"]
    assert vc.n_converted == 2
    assert vc.avg_lag_us == (1 + 3) / 2 * 3600 * 1e6
    assert vc.median_lag_us == 2 * 3600 * 1e6  # interpolated between 1h and 3h
    cp = out["click>purchase"]
    assert cp.n_converted == 1
    assert cp.median_lag_us == 30 * 60 * 1e6


def test_touch_attribution_known_case(spark):
    # user 1: view(d1) -> click(d2) -> purchase(d3): first=view last=click
    # user 2: purchase with no prior touch -> NULLs, 0 touches
    # user 3: touch 10 days before purchase -> outside 7-day lookback
    rows_in = [
        (10, 1, "2024-01-01 00:00:00", "view"),
        (11, 1, "2024-01-02 00:00:00", "click"),
        (12, 1, "2024-01-03 00:00:00", "purchase"),
        (20, 2, "2024-01-05 00:00:00", "purchase"),
        (30, 3, "2024-01-01 00:00:00", "view"),
        (31, 3, "2024-01-11 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.conv_id: r for r in behavior.touch_attribution(df).collect()
    }
    assert set(out) == {12, 20, 31}
    assert (out[12].first_touch_type, out[12].last_touch_type) == (
        "view",
        "click",
    )
    assert out[12].n_touches == 2
    assert out[20].first_touch_type is None
    assert out[20].n_touches == 0
    assert out[31].first_touch_type is None  # 10 days > 7-day lookback


def test_touch_attribution_excludes_prior_conversions_as_touches(spark):
    rows_in = [
        (1, 7, "2024-01-01 00:00:00", "purchase"),
        (2, 7, "2024-01-02 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.conv_id: r for r in behavior.touch_attribution(df).collect()}
    # the earlier purchase is in the lookback but is not a touch
    assert out[2].n_touches == 0 and out[2].last_touch_type is None


def test_attribution_credit_conserves_conversions(events):
    attr = behavior.touch_attribution(events)
    n_conv = attr.count()
    credit = behavior.attribution_credit(events)
    agg = credit.agg(
        F.sum("first_touch_credits").alias("f"),
        F.sum("last_touch_credits").alias("l"),
    ).collect()[0]
    # every conversion gets exactly one credit under each model
    assert agg.f == n_conv and agg.l == n_conv


def test_window_funnel_known_chains(spark):
    rows_in = [
        # user 1: full chain inside 24h -> level 3
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 01:00:00", "click"),
        (3, 1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase lands outside the 24h window -> level 2
        (4, 2, "2024-01-01 00:00:00", "view"),
        (5, 2, "2024-01-01 01:00:00", "click"),
        (6, 2, "2024-01-03 00:00:00", "purchase"),
        # user 3: wrong order (purchase before click) -> level 2
        (7, 3, "2024-01-01 00:00:00", "view"),
        (8, 3, "2024-01-01 01:00:00", "purchase"),
        (9, 3, "2024-01-01 02:00:00", "click"),
        # user 4: only a click (no stage-1 view) -> excluded
        (10, 4, "2024-01-01 00:00:00", "click"),
        # user 5: first window fails, a LATER view opens a full chain
        (11, 5, "2024-01-01 00:00:00", "view"),
        (12, 5, "2024-01-05 00:00:00", "view"),
        (13, 5, "2024-01-05 01:00:00", "click"),
        (14, 5, "2024-01-05 02:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.user_id: r.funnel_level
        for r in behavior.window_funnel(df).collect()
    }
    assert out == {1: 3, 2: 2, 3: 2, 5: 3}


def test_window_funnel_greedy_is_depth_optimal(spark):
    # two clicks after the view; only chaining through the EARLIER one
    # leaves room for the purchase inside the window
    rows_in = [
        (1, 9, "2024-01-01 00:00:00", "view"),
        (2, 9, "2024-01-01 01:00:00", "click"),
        (3, 9, "2024-01-01 23:00:00", "click"),
        (4, 9, "2024-01-01 12:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = behavior.window_funnel(df).collect()
    assert out[0].funnel_level == 3


def test_window_funnel_rejects_single_stage(spark):
    import pytest as _pytest

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError):
        behavior.window_funnel(df, stages=("view",))


def test_stickiness_known_values(spark):
    # 3 users; day1: u1,u2  day2: u1  -> dau 2,1; WAU(7d) day1=2, day2=2
    rows_in = [
        (1, 1, "2024-01-01 05:00:00", "view"),
        (2, 2, "2024-01-01 06:00:00", "view"),
        (3, 1, "2024-01-01 07:00:00", "click"),  # same user+day dedups
        (4, 1, "2024-01-02 05:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.day: r for r in behavior.stickiness(df).collect()}
    assert out["2024-01-01"].dau == 2 and out["2024-01-01"].window_au == 2
    assert out["2024-01-02"].dau == 1 and out["2024-01-02"].window_au == 2
    assert out["2024-01-02"].stickiness == 0.5


def test_stickiness_window_expires(spark):
    # u2 active 10 days before day 11: outside the 7-day window
    rows_in = [
        (1, 2, "2024-01-01 05:00:00", "view"),
        (2, 1, "2024-01-11 05:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.day: r for r in behavior.stickiness(df).collect()}
    assert out["2024-01-11"].window_au == 1 and out["2024-01-11"].stickiness == 1.0


def test_attribution_linear_conserves_total_credit(spark, events):
    attr = behavior.touch_attribution(events)
    n_touched_convs = attr.filter(F.col("n_touches") > 0).count()
    lin = behavior.attribution_linear(events).collect()
    # each touched conversion distributes exactly 1.0 credit
    assert sum(r.linear_credits for r in lin) == pytest.approx(
        n_touched_convs, abs=1e-6
    )


def test_attribution_linear_equal_shares(spark):
    rows_in = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-02 00:00:00", "click"),
        (3, 1, "2024-01-03 00:00:00", "view"),
        (4, 1, "2024-01-04 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "user_id", "ts", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.touch_type: r for r in behavior.attribution_linear(df).collect()}
    assert out["view"].linear_credits == pytest.approx(2 / 3, abs=1e-9)
    assert out["click"].linear_credits == pytest.approx(1 / 3, abs=1e-9)
    assert out["view"].n_touch_events == 2


def test_rfm_hist_close_to_ntile(spark, sf_dir):
    """Histogram-cutoff RFM must broadly agree with the ntile exact
    form: identical score direction conventions, and per-dimension
    scores within one tile for the vast majority of customers (the
    two bucket different ties/boundaries by design)."""
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    exact = {
        r.custkey: r for r in behavior.rfm_scores(orders).collect()
    }
    hist = {
        r.custkey: r for r in behavior.rfm_scores_hist(orders).collect()
    }
    # the hist form is key-name drop-in for rfm_scores (both emit custkey)
    assert set(exact) == set(hist)
    n = len(exact)
    close = sum(
        1
        for k in exact
        if abs(exact[k].r_score - hist[k].r_score) <= 1
        and abs(exact[k].f_score - hist[k].f_score) <= 1
        and abs(exact[k].m_score - hist[k].m_score) <= 1
    )
    assert close / n >= 0.9, f"only {close}/{n} within one tile"
    # direction sanity: the most recent/most valuable customer scores
    # at least as high as the least on each dimension
    by_rec = sorted(exact, key=lambda k: exact[k].recency_days)
    assert hist[by_rec[0]].r_score >= hist[by_rec[-1]].r_score
