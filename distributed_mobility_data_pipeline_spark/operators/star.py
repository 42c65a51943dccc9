"""Star-schema operators — Gold-layer semantics (SURVEY.md §2.4, §2.8).

Re-expresses silver_to_gold.py: sha2 surrogate keys (:40-43), dim
builders as dropDuplicates over narrow projections (:27-76), role-playing
dims via union (:49-55), and multi-way left-join fact assembly
(:110-116), plus the aspirational referential-integrity anti-join
(gold_dag.py:174-191) as a working operator.

Scale notes: dimension tables are small by construction (distinct key
sets), so every fact join carries an explicit ``F.broadcast`` hint — at
100 TB the fact side streams map-side with zero shuffle. The RI check is
a broadcast anti-join for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def surrogate_key(*cols: str) -> F.Column:
    """Deterministic surrogate key: sha2-256 over '||'-joined columns
    (silver_to_gold.py:40-43). Content-addressed → stable across runs
    and engines; no sequence/identity bottleneck at scale."""
    return F.sha2(F.concat_ws("||", *[F.col(c).cast("string") for c in cols]), 256)


def dim_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Time dimension from distinct timestamps at day grain
    (silver_to_gold.py:27-44, transplanted to the driver's tables)."""
    dates = df.select(F.to_date(ts_col).alias("date")).distinct()
    return dates.select(
        F.sha2(F.col("date").cast("string"), 256).alias("time_id"),
        F.col("date").cast("string").alias("date"),
        F.year("date").alias("year"),
        F.month("date").alias("month"),
        F.dayofmonth("date").alias("day"),
        F.dayofweek("date").alias("day_of_week"),
        F.quarter("date").alias("quarter"),
        F.when(F.dayofweek("date").isin(1, 7), 1).otherwise(0).alias("is_weekend"),
    )


def dim_entity(df: DataFrame, key_col: str, attr_cols: list[str], key_name: str) -> DataFrame:
    """Generic dimension builder (dim_users/dim_drivers pattern,
    silver_to_gold.py:63-72): distinct natural key + attributes, sha2
    surrogate key."""
    return (
        df.select(key_col, *attr_cols)
        .distinct()
        .select(
            surrogate_key(key_col).alias(key_name),
            F.col(key_col),
            *[F.col(c) for c in attr_cols],
        )
    )


def dim_locations_roleplay(customer: DataFrame, supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Role-playing location dim via union — silver_to_gold.py:49-55
    unions pickup and dropoff zones; here customer-nations and
    supplier-nations union into one nation-role dim."""
    cust_zones = customer.select(F.col("c_nationkey").cast("int").alias("zone_id"))
    supp_zones = supplier.select(F.col("s_nationkey").cast("int").alias("zone_id"))
    zones = cust_zones.union(supp_zones).distinct()
    return zones.join(
        F.broadcast(nation), zones.zone_id == nation.n_nationkey, "left"
    ).select(
        surrogate_key("zone_id").alias("location_id"),
        "zone_id",
        F.col("n_name").alias("zone_name"),
        F.col("n_regionkey").alias("region_id"),
    )


def trips_fact(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """5-way star fact assembly — J1 (silver_to_gold.py:110-116).

    lineitem is the fact; orders/customer/part/supplier play the dims.
    Dims are projected narrow *before* the join (column pruning); the
    three TRUE dims (customer/part/supplier) are broadcast-hinted so the
    fact never shuffles for them. Orders is different: it grows with the
    fact (fact-sized at 100 TB — billions of rows), so its join strategy
    is left to the planner — auto-broadcast below the threshold (the
    sf0.1 plan is still 4 BroadcastHashJoins), sort-merge/AQE above it.
    A forced broadcast here would OOM every executor the first time
    orders outgrows memory (measured two-decade curve in SCALE_NOTES.md).
    """
    ord_dim = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    cust_dim = customer.select(
        "c_custkey", surrogate_key("c_custkey").alias("user_key"), "c_mktsegment"
    )
    part_dim = part.select(
        "p_partkey", surrogate_key("p_partkey").alias("vehicle_key"), "p_brand"
    )
    supp_dim = supplier.select(
        "s_suppkey", surrogate_key("s_suppkey").alias("driver_key")
    )
    return (
        lineitem.join(ord_dim, lineitem.l_orderkey == ord_dim.o_orderkey, "left")
        .join(F.broadcast(cust_dim), F.col("o_custkey") == cust_dim.c_custkey, "left")
        .join(F.broadcast(part_dim), F.col("l_partkey") == part_dim.p_partkey, "left")
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == supp_dim.s_suppkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "user_key",
            "driver_key",
            "vehicle_key",
            "o_orderstatus",
            "c_mktsegment",
            "p_brand",
            F.to_date("o_orderdate").cast("string").alias("order_date"),
            "l_quantity",
            "l_extendedprice",
        )
    )


def payments_fact(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Payments fact — J3 (silver_to_gold.py:147-161): order grain with
    user surrogate key and a deterministic payment id."""
    cust_dim = customer.select(
        "c_custkey", surrogate_key("c_custkey").alias("user_key")
    )
    return (
        orders.join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey, "left")
        .select(
            F.sha2(
                F.concat_ws("||", F.col("o_orderkey").cast("string"), F.lit("payment")),
                256,
            ).alias("payment_id"),
            "o_orderkey",
            "user_key",
            "o_totalprice",
            F.to_date("o_orderdate").cast("string").alias("order_date"),
        )
    )


def ri_orphans(fact: DataFrame, dim: DataFrame, fk: str, pk: str) -> DataFrame:
    """Referential-integrity orphan extraction — J6
    (gold_dag.py:174-191, aspirational in the reference; working here).
    Broadcast left-anti join: fact rows whose FK misses the dim."""
    return fact.join(F.broadcast(dim), fact[fk] == dim[pk], "left_anti")


def ri_check(fact: DataFrame, dim: DataFrame, fk: str, pk: str) -> DataFrame:
    """RI summary row: total fact rows, orphan rows, orphan rate."""
    total = fact.agg(F.count(F.lit(1)).alias("total_rows"))
    orphans = ri_orphans(fact, dim, fk, pk).agg(
        F.count(F.lit(1)).alias("orphan_rows")
    )
    return total.crossJoin(orphans).select(
        "total_rows",
        "orphan_rows",
        (F.col("orphan_rows").cast("double") / F.col("total_rows")).alias(
            "orphan_rate"
        ),
    )


def semi_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """EXISTS — left_semi (engine join surface, SURVEY.md §2.4)."""
    return left.join(right, left[lk] == right[rk], "left_semi")


def anti_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """NOT EXISTS — left_anti."""
    return left.join(right, left[lk] == right[rk], "left_anti")
