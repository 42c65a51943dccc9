"""Property-based invariants (hypothesis): the exact-decimal aggregate
layer is partition-order independent, dedup is idempotent, histograms
conserve mass. Few examples per property — each drives a real Spark job."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_mobility_data_pipeline_spark.functions.exact import exact_sum
from distributed_mobility_data_pipeline_spark.operators import aggregates, dedup

_vals = st.lists(
    st.decimals(
        min_value=Decimal("-1000000"),
        max_value=Decimal("1000000"),
        places=4,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=60,
)

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(_vals)
def test_exact_sum_is_partition_order_independent(spark, xs):
    rows = [(float(x),) for x in xs]
    df1 = spark.createDataFrame(rows, "v double").repartition(7)
    df2 = spark.createDataFrame(list(reversed(rows)), "v double").repartition(2)
    s1 = df1.agg(exact_sum("v").alias("s")).collect()[0].s
    s2 = df2.agg(exact_sum("v").alias("s")).collect()[0].s
    assert s1 == s2  # bit-identical, not approximately equal
    assert Decimal(str(s1)).quantize(Decimal("0.0001")) == sum(xs).quantize(
        Decimal("0.0001")
    )


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=50,
    )
)
def test_keep_latest_idempotent_and_minimal(spark, pairs):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(pairs)], "k long, ord long, uid long"
    )
    once = dedup.keep_latest(df, ["k"], "ord", ["uid"])
    twice = dedup.keep_latest(once, ["k"], "ord", ["uid"])
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b  # idempotent
    assert len(a) == len({k for k, _ in pairs})  # exactly one row per key


@_slow
@given(st.lists(st.floats(-50, 150, allow_nan=False), min_size=1, max_size=50))
def test_histogram_conserves_mass(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = aggregates.histogram(df, "x", [0.0, 25.0, 50.0, 75.0, 100.0])
    assert out.agg(F.sum("n")).collect()[0][0] == len(xs)
