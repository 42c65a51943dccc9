"""Round-5 operator scale probe: synthesize a 10x relational slice
(events / customers / orders / lineitem / part) and re-time the round-5
operators so SCALE_NOTES.md carries measured slopes, not claims.

Synthesis keeps the realistic density regime per operator family:
- events/customers/orders replicate with OFFSET keys → 10x entities,
  constant per-entity activity (funnel/cohort/RFM/PIT distribute
  per key, so near-linear wall is the expected signature);
- lineitem keeps part/supplier keys UNCHANGED → the bipartite graph
  gains 10x edges on the same supplier nodes (PageRank's skew-ish case);
- part names gain a per-replica suffix on the noun → 10x blocking-key
  cardinality with CONSTANT block sizes (the honest blocked-linkage
  regime: pairs grow linearly, never quadratically).

Usage: python tools/scale_probe3.py [--regen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.session import get_spark
from distributed_mobility_data_pipeline_spark.sources.readers import read_events

SF01 = "/root/testdata/sf0.1"
PROBE = "/tmp/spark_graft_r5_probe"  # 10x relational slice
N_REP = 10

QUERIES = [
    "behavior_funnel",
    "behavior_cohort_retention",
    "behavior_rfm_scores",
    "link_fuzzy_pairs",
    "graph_pagerank",
    "ts_resample_ffill",
    "win_ewma_demand",
    "scale_table_checksum",
    "join_point_in_time",
    "ml_freq_itemsets",
    "stream_stream_conversions",
    "agg_distinct_rollup_sketch",
    # added in the later round-5 batch (relational-table ops only — the
    # probe slice has no documents/embeddings tables)
    "behavior_type_entropy",
    "agg_revenue_gini",
    "ml_seq_patterns",
    "agg_rolling_distinct_exact",
    "behavior_funnel_timing",
    "pipeline_user_insights",
    "ts_resample_interpolate",
    "scalar_morton3_key",
    # final round-5 batch
    "behavior_attribution",
    "behavior_attribution_credit",
    "behavior_window_funnel",
    "ts_seasonal_anomaly",
    "quality_expectations",
    "behavior_attribution_linear",
]


def generate(spark) -> None:
    reps = spark.range(N_REP).withColumnRenamed("id", "r")

    ev = read_events(spark, os.path.join(SF01, "events.parquet"))
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    big_ev = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("r") * n_events).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("r") * n_users).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE, "events.parquet")
    )

    cust = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    n_cust = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    cust.crossJoin(reps).select(
        (F.col("c_custkey") + F.col("r") * n_cust).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(PROBE, "customer.parquet")
    )

    orders = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("r") * n_ord).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("r") * n_cust).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE, "orders.parquet")
    )

    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    li_cols = [c for c in li.columns if c != "l_orderkey"]
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("r") * n_ord).alias("l_orderkey"),
        *li_cols,
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE, "lineitem.parquet")
    )

    part = spark.read.parquet(os.path.join(SF01, "part.parquet"))
    n_part = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    other = [c for c in part.columns if c not in ("p_partkey", "p_name")]
    # replica suffix lands on the final token -> new blocking key per
    # replica: block cardinality x10, block sizes constant
    name = F.when(F.col("r") == 0, F.col("p_name")).otherwise(
        F.concat(F.col("p_name"), F.lit("r"), F.col("r").cast("string"))
    )
    part.crossJoin(reps).select(
        (F.col("p_partkey") + F.col("r") * n_part).alias("p_partkey"),
        name.alias("p_name"),
        *other,
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(PROBE, "part.parquet")
    )


def _time(qs, name, spark, d) -> float:
    t0 = time.time()
    qs[name](spark, d).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale_probe3")
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(PROBE, "events.parquet")
    ):
        t0 = time.time()
        generate(spark)
        print(f"generated 10x probe slice in {time.time() - t0:.1f}s", flush=True)

    qs = entrymod.queries()
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    rows = []
    for name in [q for q in QUERIES if not only or q in only]:
        _time(qs, name, spark, SF01)  # warm the shape
        t_01 = _time(qs, name, spark, SF01)
        t_1 = _time(qs, name, spark, PROBE)
        rows.append(
            (name, round(t_01, 2), round(t_1, 2), round(t_1 / max(t_01, 1e-9), 1))
        )
        print(rows[-1], flush=True)
    spark.stop()

    print()
    print("| query | sf0.1 | 10x | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")


if __name__ == "__main__":
    main()
