"""Mergeable-sketch rollups (Apache DataSketches HLL via Spark 3.5+
built-ins).

The reference's distinct counts are exact per-rollup recomputes; at
100 TB the winning pattern is different: aggregate ONCE at the finest
grain into mergeable sketches, persist them, and answer every coarser
rollup by unioning sketches — no second pass over raw data, and the
sketch table is tiny (one ~2^lg_k-byte blob per group).

``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` are
JVM-side aggregates (DataSketches HLL), so the whole plan stays in
codegen — no Python in the loop.

Approximate results are checked rows-only by the driver; the exact
twin (``distinct_rollup_exact``) is the hash-checked oracle query, and
tests assert the sketch estimate lands within HLL's error envelope of
the exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Finest-grain sketch table: one HLL sketch of ``key_col`` per day.
    This is the artifact you'd persist — every coarser distinct-count
    rollup derives from it without rescanning events."""
    return events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"))


def distinct_rollup_sketch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Monthly approx-distinct users via union of the DAILY sketches —
    the mergeable-rollup path. Returns (month, approx_users)."""
    daily = daily_distinct_sketches(events, key_col, ts_col, lg_k)
    return (
        daily.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch")))
            .cast("bigint")
            .alias("approx_users")
        )
    )


def distinct_rollup_exact(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact twin of ``distinct_rollup_sketch`` (hash-checked oracle):
    monthly distinct users the expensive way — a full distinct per
    rollup grain. Returns (month, n_users)."""
    return (
        events.groupBy(F.date_format(F.col(ts_col), "yyyy-MM").alias("month"))
        .agg(F.countDistinct(F.col(key_col)).cast("bigint").alias("n_users"))
    )


def rolling_distinct_sketch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Rolling N-day distinct ``key_col`` per day from the DAILY sketch
    table: ``hll_union_agg`` runs as a WINDOW aggregate over the last N
    daily sketches — the rolling-retention metric without ever
    rescanning events (the second reuse of the persisted sketch table,
    after the monthly rollup).

    Approximate → rows-only checked; the exact twin below is the
    hash-checked oracle query."""
    daily = daily_distinct_sketches(events, key_col, ts_col, lg_k)
    # the un-partitioned window runs over the DAILY table — one row per
    # day (bounded dimension), never event rows. RANGE frame over a day
    # index, not ROWS: with zero-event days missing from the daily table
    # a rows frame would mean "last N observed days" and silently union
    # sketches older than the window (the exact twin uses a true date
    # range — a rows frame diverges from it on any gapped series).
    day_idx = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(day_idx)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w))
        .cast("bigint")
        .alias("approx_users"),
    )


def rolling_distinct_exact(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Exact twin of ``rolling_distinct_sketch``: distinct keys in the
    trailing N-day window of each observed day.

    COUNT(DISTINCT) over a window frame isn't supported directly, so
    the classic shape: reduce to distinct (key, day), join the day list
    against activity within the range, count distinct per day.

    Plan note: the range predicate makes this a
    BroadcastNestedLoopJoin — deliberate, with the DAY LIST (bounded:
    one row per observed day) as the explicit broadcast side and the
    distinct-activity table streamed, never raw events. This is the
    small-scale ORACLE TWIN; do not promote it to a large-scale path —
    ``rolling_distinct_sketch`` (day-level HLL sketches, window union
    over the sketch table) is the production form, with a measured
    flatter decade slope (SCALE_NOTES.md round-6 probes)."""
    activity = events.select(
        F.col(key_col).alias("_k"),
        F.date_trunc("day", F.col(ts_col)).alias("_d"),
    ).distinct().persist()  # two consumers (day list + range join) —
    # persist so the event scan + distinct run once (r19, guide §5)
    days = activity.select("_d").distinct().withColumnRenamed("_d", "_day")
    joined = F.broadcast(days).join(
        activity,
        (F.col("_d") <= F.col("_day"))
        & (F.col("_d") > F.date_sub(F.col("_day"), window_days)),
    )
    return (
        joined.groupBy("_day")
        .agg(F.countDistinct("_k").cast("bigint").alias("n_users"))
        .select(F.date_format("_day", "yyyy-MM-dd").alias("day"), "n_users")
    )


def binned_value_histograms(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Uniform-width binned histogram per group — the MERGEABLE
    quantile summary (the quantile analogue of the HLL rollup above):
    aggregate raw values ONCE at the finest grain; any coarser rollup
    just sums bin counts, never re-touching raw data.

    Bins clamp: values below ``lo`` land in bin 0, values ≥ ``hi`` in
    the last bin; NULLs are excluded. Returns group_cols + (bin, n).
    Fixed explicit edges keep the whole pipeline deterministic and
    oracle-checkable (unlike percentile_approx sketches)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_bins
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
        ),
    ).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def quantiles_from_histograms(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Invert the merged histogram CDF into approximate quantiles with
    linear interpolation inside the target bin.

    For each q: target rank = q · total; the answering bin is the first
    with cumulative count ≥ target, and the value interpolates
    ``lo_edge + (target - cum_before) / n_bin · width``. Guarantee
    (test-pinned): the answering bin contains the order statistic at
    rank ⌈q·total⌉, so the estimate is within one bin width of it —
    the classic fixed-histogram quantile trade: choose edges for the
    metric's range, get mergeability and determinism in exchange for
    resolution.

    Shape: one window pass over the bin table (≤ n_bins rows per
    group), a groupBy for totals, a literal explode for qs, and a
    per-group equi-join — everything downstream of the histogram is
    summary-sized."""
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    bins = hist.withColumn("cum", F.sum("n").over(w))
    totals = hist.groupBy(*group_cols).agg(
        F.sum("n").cast("bigint").alias("total")
    )
    # SQL-text fragments below (r19 optimization, guide §7.3): this
    # builder is instantiated 1-3× per histogram-backed query, and the
    # old Column-by-Column form cost ~640 py4j round-trips (~0.34 s of
    # driver time) per call. The parsed trees — double literals are
    # repr() round-trips with a D suffix — are identical to the old
    # builds, so every quantile is bit-identical.
    qs_sql = ",".join(f"{float(q)!r}D" for q in qs)
    targets = totals.selectExpr(
        *group_cols,
        f"explode(array({qs_sql})) AS q",
        "total",
    ).withColumn("target", F.expr("q*CAST(total AS DOUBLE)"))
    # group_cols may be empty (global quantiles): plain join([]) is
    # invalid, the grouping degenerates to a cross join of the one-row
    # targets-per-q table with the <= n_bins bin table
    joined = (
        targets.join(bins, group_cols) if group_cols
        else targets.crossJoin(bins)
    )
    # q = 0 (target 0) satisfies no "cum_before < target" bin — answer it
    # with the first nonempty bin instead (its lo edge = the histogram's
    # minimum), so callers like winsorize_hist(lo_p=0.0) clamp at the lo
    # edge rather than silently receiving no row / NULL cutoff
    answers = F.expr(
        "CASE WHEN target > 0.0D THEN (CAST(cum AS DOUBLE) >= target)"
        " AND (CAST(cum - n AS DOUBLE) < target)"
        " ELSE (n > 0) AND (cum - n = 0) END"
    )
    return (
        joined
        .filter(answers)
        .selectExpr(
            *group_cols,
            "q",
            f"({float(lo)!r}D + CAST(bin AS DOUBLE)*{float(width)!r}D"
            f" + (target - CAST(cum - n AS DOUBLE))/CAST(n AS DOUBLE)"
            f"*{float(width)!r}D) AS value_q",
        )
    )


def quantile_rollup_hist(
    events: DataFrame,
    qs: list[float],
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 20,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Composed mergeable-quantile rollup: DAILY per-group histograms
    (the finest-grain single pass over raw events), merged up to the
    group level by summing bin counts, then inverted to quantiles.

    The merge step is the point: at 100 TB the daily histogram table is
    what you persist; per-group (or per-week, per-anything) quantiles
    come from re-aggregating ≤ n_bins-row summaries, never raw data."""
    daily = binned_value_histograms(
        events.withColumn("_day", F.date_trunc("day", F.col(ts_col))),
        [group_col, "_day"],
        value_col,
        lo,
        hi,
        n_bins,
    )
    merged = daily.groupBy(group_col, "bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    return quantiles_from_histograms(
        merged, [group_col], qs, lo, hi, n_bins
    )


def rolling_quantile_hist(
    events: DataFrame,
    qs: list[float],
    window_days: int = 7,
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 20,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Trailing N-day quantiles per day from the DAILY histogram table —
    the second reuse of the persisted summary (mirroring
    ``rolling_distinct_sketch`` for HLL): bin counts sum over a trailing
    RANGE window per bin, then each day's merged CDF inverts to
    quantiles. Raw events are scanned exactly once, for the daily
    histograms; everything after runs on the (days × ≤n_bins) grid.

    The grid is densified first (days × observed bins, both bounded
    dimensions) so a bin with no arrivals TODAY still contributes its
    trailing-window mass to today's CDF."""
    daily = binned_value_histograms(
        events.withColumn(
            "_day", F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
        ),
        ["_day"],
        value_col,
        lo,
        hi,
        n_bins,
    ).persist()  # (days × ≤n_bins)-sized; three consumers (day list,
    # bin list, densified join) each re-ran the event scan un-persisted
    days = daily.select("_day").distinct()
    bins = daily.select("bin").distinct()
    grid = days.crossJoin(F.broadcast(bins))
    dense = grid.join(daily, ["_day", "bin"], "left").select(
        "_day",
        "bin",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.datediff(F.to_date("_day"), F.lit("1970-01-01"))
        .cast("long")
        .alias("_di"),
    )
    w = (
        Window.partitionBy("bin")
        .orderBy("_di")
        .rangeBetween(-(window_days - 1), 0)
    )
    rolled = dense.select(
        "_day",
        "bin",
        F.sum("n").over(w).cast("bigint").alias("n"),
    )
    return quantiles_from_histograms(
        rolled, ["_day"], qs, lo, hi, n_bins
    ).withColumnRenamed("_day", "day")
