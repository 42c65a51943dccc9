"""As-of and range join semantics on crafted data: direction,
tie-breaking, boundary inclusion, bucket edges."""

from __future__ import annotations

import pyspark.sql.functions as F

from distributed_mobility_data_pipeline_spark.operators import asof


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (1, "2024-01-01 00:00:00")],
        "k long, lt string",
    ).withColumn("lt", F.to_timestamp("lt"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-05 00:00:00", 10, "early"),
            (1, "2024-01-10 00:00:00", 11, "exact"),   # == left time → eligible
            (1, "2024-01-11 00:00:00", 12, "future"),  # after → never matched
        ],
        "k long, rt string, uid long, tag string",
    ).withColumn("rt", F.to_timestamp("rt"))
    out = asof.asof_join(left, right, "k", "k", "lt", "rt", ["tag"], "uid")
    got = {(str(r.lt), r.asof_tag) for r in out.collect()}
    assert got == {
        ("2024-01-10 00:00:00", "exact"),  # equal timestamps match
        ("2024-01-01 00:00:00", None),     # nothing at or before → null
    }


def test_asof_tiebreak_highest_wins(spark):
    left = spark.createDataFrame([(1, "2024-01-02 00:00:00")], "k long, lt string")
    left = left.withColumn("lt", F.to_timestamp("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5, "low"), (1, "2024-01-01 00:00:00", 9, "high")],
        "k long, rt string, uid long, tag string",
    ).withColumn("rt", F.to_timestamp("rt"))
    out = asof.asof_join(left, right, "k", "k", "lt", "rt", ["tag"], "uid")
    assert out.collect()[0].asof_tag == "high"


def test_asof_null_value_col_stays_one_row(spark):
    # The matched right row has tag=NULL; both output columns must still
    # come from that row — per-column forward-fill would borrow the tag
    # from the older row while taking uid from the newer one.
    left = spark.createDataFrame([(1, "2024-01-10 00:00:00")], "k long, lt string")
    left = left.withColumn("lt", F.to_timestamp("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5, "old"), (1, "2024-01-05 00:00:00", 9, None)],
        "k long, rt string, uid long, tag string",
    ).withColumn("rt", F.to_timestamp("rt"))
    out = asof.asof_join(
        left, right, "k", "k", "lt", "rt", ["uid", "tag"], "uid"
    ).collect()[0]
    assert (out.asof_uid, out.asof_tag) == (9, None)


def test_range_join_boundaries_and_bucket_edges(spark):
    left = spark.createDataFrame([(1, "2024-01-10")], "k long, ld string")
    left = left.withColumn("ld", F.to_date("ld"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-08", 1),   # exactly max_days before → in
            (1, "2024-01-12", 2),   # exactly max_days after → in
            (1, "2024-01-07", 3),   # one past the radius → out
            (1, "2024-01-13", 4),   # one past the radius → out
            (2, "2024-01-10", 5),   # wrong key → out
        ],
        "k long, rd string, rid long",
    ).withColumn("rd", F.to_date("rd"))
    out = asof.range_join_bucketed(left, right, "k", "k", "ld", "rd", 2)
    assert {r.rid for r in out.collect()} == {1, 2}


def test_range_join_matches_naive_inequality_join(spark):
    # randomized-ish grid: bucketed result must equal the naive theta join
    left = spark.createDataFrame(
        [(i % 3, f"2024-01-{(i % 27) + 1:02d}", i) for i in range(60)],
        "k long, ld string, lid long",
    ).withColumn("ld", F.to_date("ld"))
    right = spark.createDataFrame(
        [(i % 3, f"2024-01-{((i * 7) % 27) + 1:02d}", i) for i in range(60)],
        "k long, rd string, rid long",
    ).withColumn("rd", F.to_date("rd"))
    fast = asof.range_join_bucketed(left, right, "k", "k", "ld", "rd", 3)
    naive = left.join(
        right.withColumnRenamed("k", "k2"),
        (F.col("k") == F.col("k2"))
        & (F.abs(F.datediff(F.col("ld"), F.col("rd"))) <= 3),
    )
    a = {(r.lid, r.rid) for r in fast.collect()}
    b = {(r.lid, r.rid) for r in naive.collect()}
    assert a == b and len(a) > 0


def test_point_in_time_join_boundaries(spark):
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
            (1, "gold", "2024-01-10 00:00:00", None),
            (2, "silver", "2024-01-05 00:00:00", None),
        ],
        ["user_id", "status", "valid_from", "valid_to"],
    ).select(
        "user_id",
        "status",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    probes = spark.createDataFrame(
        [
            (1, "2024-01-05 12:00:00"),  # inside v1
            (1, "2024-01-10 00:00:00"),  # exactly at change -> new version
            (1, "2024-02-01 00:00:00"),  # open interval
            (2, "2024-01-01 00:00:00"),  # before first interval -> dropped
        ],
        ["user_id", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r.user_id, str(r.ts)): r.status
        for r in asof.point_in_time_join(probes, hist, "user_id", "ts").collect()
    }
    assert out == {
        (1, "2024-01-05 12:00:00"): "bronze",
        (1, "2024-01-10 00:00:00"): "gold",
        (1, "2024-02-01 00:00:00"): "gold",
    }


def test_range_join_rejects_nonpositive_radius(spark):
    import pytest

    left = spark.createDataFrame([(1, "2024-01-10")], "k long, ld string")
    right = spark.createDataFrame([(1, "2024-01-10", 1)], "k long, rd string, rid long")
    with pytest.raises(ValueError, match="max_days"):
        asof.range_join_bucketed(left, right, "k", "k", "ld", "rd", 0)
