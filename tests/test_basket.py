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
