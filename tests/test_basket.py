from __future__ import annotations

from distributed_mobility_data_pipeline_spark.ml import basket


def test_frequent_itemsets_known_counts(spark):
    # 4 orders; parts 1,2 co-occur in 3 of them; part 3 appears once
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 3),
        (13, 1),
        (13, 1),  # duplicate line: distinct() must collapse it
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    out = {
        r.itemset: (r.n_items, r.freq)
        for r in basket.frequent_itemsets(li, min_support=0.5, max_len=2).collect()
    }
    # min_count = ceil(0.5 * 4) = 2
    assert out["1"] == (1, 4)
    assert out["2"] == (1, 3)
    assert out["1,2"] == (2, 3)
    assert "3" not in out  # freq 1 < 2
    assert "2,3" not in out


def test_order_baskets_distinct_items(spark):
    li = spark.createDataFrame(
        [(1, 7), (1, 7), (1, 8)], ["l_orderkey", "l_partkey"]
    )
    items = basket.order_baskets(li).collect()[0]["items"]
    assert sorted(items) == [7, 8]


def test_sequential_patterns_known(spark):
    from pyspark.sql import functions as F

    # user 1: a then b; user 2: b then a; user 3: a then b
    rows = [
        (1, "2024-01-01 00:00:00", "a", 1),
        (1, "2024-01-01 01:00:00", "b", 2),
        (2, "2024-01-01 00:00:00", "b", 3),
        (2, "2024-01-01 01:00:00", "a", 4),
        (3, "2024-01-01 00:00:00", "a", 5),
        (3, "2024-01-01 01:00:00", "b", 6),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "event_id"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.pattern: r.freq
        for r in basket.sequential_patterns(ev, min_support=0.6).collect()
    }
    assert out == {"a": 3, "b": 3, "a>b": 2}  # b>a support 1 < ceil(0.6*3)


def test_user_sequences_ordered_and_tiebroken(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", "x", 2),
        (1, "2024-01-01 00:00:00", "y", 1),  # same ts: event_id orders
        (1, "2024-01-02 00:00:00", "z", 3),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "event_id"]
    ).withColumn("ts", F.to_timestamp("ts"))
    seq = basket.user_event_sequences(ev).collect()[0]["sequence"]
    assert [s[0] for s in seq] == ["y", "x", "z"]
