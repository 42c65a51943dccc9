"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Organization: the engine lives in ``distributed_mobility_data_pipeline_spark/``;
this module only wires operators to the driver's testdata tables.
Query names are grouped by SURVEY.md §2 operator family.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import aggregates as agg_ops
from distributed_mobility_data_pipeline_spark.operators import cleaning as clean_ops
from distributed_mobility_data_pipeline_spark.operators import dedup as dedup_ops
from distributed_mobility_data_pipeline_spark.operators import setops as set_ops
from distributed_mobility_data_pipeline_spark.operators import star as star_ops
from distributed_mobility_data_pipeline_spark.sources.readers import read_events

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Timestamp formatting/truncation is session-TZ sensitive; the DuckDB
    # oracle runs in UTC, so pin it regardless of the caller's session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return read_events(spark, path)  # ns timestamps need special read
    return spark.read.parquet(path)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    return agg_ops.hourly_demand(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# queries() — one entry per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------


def queries() -> dict[str, QueryFn]:
    return {
        # §2.5 aggregates
        "agg_hourly_demand": lambda s, d: agg_ops.hourly_demand(_t(s, d, "events")),
        "agg_revenue_daily": lambda s, d: agg_ops.revenue_daily(_t(s, d, "lineitem")),
        "agg_driver_daily_summary": lambda s, d: agg_ops.driver_daily_summary(
            _t(s, d, "orders")
        ),
        "agg_pricing_summary": lambda s, d: agg_ops.pricing_summary(
            _t(s, d, "lineitem")
        ),
        "agg_supply_demand_hourly": lambda s, d: agg_ops.supply_demand_hourly(
            _t(s, d, "events")
        ),
        "agg_approx_distinct_hourly": lambda s, d: agg_ops.approx_supply_demand_hourly(
            _t(s, d, "events")
        ),
        "agg_histogram_value": lambda s, d: agg_ops.histogram(
            _t(s, d, "events"), "value", [0.0, 10.0, 25.0, 50.0, 75.0, 100.0]
        ),
        "agg_status_distribution": lambda s, d: agg_ops.status_distribution(
            _t(s, d, "orders"), "o_orderstatus"
        ),
        "agg_top_k_global": lambda s, d: agg_ops.top_k(
            _t(s, d, "orders").select("o_orderkey", "o_totalprice"),
            "o_totalprice",
            10,
        ),
        "agg_top_k_per_group": lambda s, d: agg_ops.top_k(
            _t(s, d, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            "o_totalprice",
            3,
            "o_orderpriority",
        ),
        "agg_cube_revenue": lambda s, d: agg_ops.cube_revenue(_t(s, d, "lineitem")),
        "agg_rollup_revenue": lambda s, d: agg_ops.rollup_revenue(
            _t(s, d, "lineitem")
        ),
        "agg_pivot_status": lambda s, d: agg_ops.pivot_status(_t(s, d, "orders")),
        # §2.2 cleaning / projection / predicates
        "clean_events_silver": lambda s, d: clean_ops.clean_events(
            _t(s, d, "events")
        ),
        "clean_ensure_columns": lambda s, d: clean_ops.ensure_columns(
            _t(s, d, "orders").select("o_orderkey", "o_totalprice"),
            {"city": F.lit("unknown"), "surge_factor": F.lit(1.0)},
        ),
        "clean_range_filter": lambda s, d: _t(s, d, "orders")
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1995-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1996-01-01"))
            & (F.col("o_totalprice") > 1000.0)
        )
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("order_date"),
            "o_totalprice",
        ),
        # §2.3 dedup
        "dedup_keep_latest": lambda s, d: dedup_ops.keep_latest(
            _t(s, d, "events"), ["user_id"], "ts", ["event_id"]
        ).select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
        ),
        "dedup_distinct_projection": lambda s, d: dedup_ops.distinct_projection(
            _t(s, d, "events"), ["user_id", "event_type"]
        ),
        "dedup_duplicate_stats": lambda s, d: dedup_ops.exact_duplicate_stats(
            _t(s, d, "lineitem"), ["l_orderkey"]
        ),
        # §2.4 star schema + joins
        "star_dim_time": lambda s, d: star_ops.dim_time(
            _t(s, d, "orders"), "o_orderdate"
        ),
        "star_dim_entity": lambda s, d: star_ops.dim_entity(
            _t(s, d, "customer"), "c_custkey", ["c_name", "c_mktsegment"], "user_key"
        ),
        "star_dim_locations": lambda s, d: star_ops.dim_locations_roleplay(
            _t(s, d, "customer"), _t(s, d, "supplier"), _t(s, d, "nation")
        ),
        "star_trips_fact": lambda s, d: star_ops.trips_fact(
            _t(s, d, "lineitem"),
            _t(s, d, "orders"),
            _t(s, d, "customer"),
            _t(s, d, "supplier"),
            _t(s, d, "part"),
        ),
        "star_payments_fact": lambda s, d: star_ops.payments_fact(
            _t(s, d, "orders"), _t(s, d, "customer")
        ),
        "join_ri_check": lambda s, d: star_ops.ri_check(
            _t(s, d, "lineitem"), _t(s, d, "part"), "l_partkey", "p_partkey"
        ),
        "join_semi_orders_with_lines": lambda s, d: star_ops.semi_join(
            _t(s, d, "orders").select("o_orderkey", "o_orderstatus"),
            _t(s, d, "lineitem"),
            "o_orderkey",
            "l_orderkey",
        ),
        "join_anti_customers_no_orders": lambda s, d: star_ops.anti_join(
            _t(s, d, "customer").select("c_custkey", "c_mktsegment"),
            _t(s, d, "orders"),
            "c_custkey",
            "o_custkey",
        ),
        # §2.8 set ops
        "set_union_nation_keys": lambda s, d: set_ops.union_distinct(
            _t(s, d, "customer").select(F.col("c_nationkey").cast("int").alias("nk")),
            _t(s, d, "supplier").select(F.col("s_nationkey").cast("int").alias("nk")),
        ),
        "set_intersect_nation_keys": lambda s, d: set_ops.intersect(
            _t(s, d, "customer").select(F.col("c_nationkey").cast("int").alias("nk")),
            _t(s, d, "supplier").select(F.col("s_nationkey").cast("int").alias("nk")),
        ),
        "set_except_nation_keys": lambda s, d: set_ops.except_distinct(
            _t(s, d, "customer").select(F.col("c_nationkey").cast("int").alias("nk")),
            _t(s, d, "supplier").select(F.col("s_nationkey").cast("int").alias("nk")),
        ),
    }


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB-runnable ANSI SQL twins
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "agg_hourly_demand": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
                   event_type,
                   CAST(count(*) AS BIGINT) AS event_count,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        """,
        "agg_revenue_daily": """
            SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
                   l_linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                            * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                        AS DOUBLE) AS total_revenue,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount) AS avg_discount,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_quantity,
                   CAST(count(*) AS BIGINT) AS line_count
            FROM lineitem WHERE l_returnflag = 'N'
            GROUP BY 1, 2
        """,
        "agg_driver_daily_summary": """
            SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
                   o_custkey AS cust_key,
                   CAST(count(*) AS BIGINT) AS order_count,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(o_totalprice) AS avg_spend
            FROM orders
            GROUP BY 1, 2
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                            * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
                        AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                                 * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                                 AS DECIMAL(18,6))
                            * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))))
                        AS DOUBLE) AS sum_charge,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "agg_supply_demand_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
                   CAST(count(*) AS BIGINT) AS event_count,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value,
                   max(value) AS max_value,
                   min(value) AS min_value
            FROM events
            GROUP BY 1
        """,
        "agg_histogram_value": """
            SELECT CASE
                     WHEN value IS NULL THEN -1
                     WHEN value < 10.0 THEN 0
                     WHEN value < 25.0 THEN 1
                     WHEN value < 50.0 THEN 2
                     WHEN value < 75.0 THEN 3
                     ELSE 4
                   END AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY 1 ORDER BY 1
        """,
        "agg_status_distribution": """
            SELECT o_orderstatus AS status,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
            FROM orders GROUP BY 1
        """,
        "agg_top_k_global": """
            SELECT o_orderkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC LIMIT 10
        """,
        "agg_top_k_per_group": """
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM (
              SELECT o_orderkey, o_orderpriority, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC) AS rk
              FROM orders
            ) WHERE rk <= 3
        """,
        "agg_cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "agg_rollup_revenue": """
            SELECT CAST(year(l_shipdate) AS INT) AS ship_year, l_returnflag,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            GROUP BY ROLLUP (year(l_shipdate), l_returnflag)
        """,
        "agg_pivot_status": """
            SELECT o_orderpriority,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
            FROM orders GROUP BY 1
        """,
        "clean_events_silver": """
            SELECT event_id,
                   strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
                   user_id,
                   lower(trim(event_type)) AS event_type,
                   CASE WHEN lower(trim(event_type)) LIKE 'error%' THEN NULL
                        ELSE value END AS value,
                   CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
            FROM events
            WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
        """,
        "clean_ensure_columns": """
            SELECT o_orderkey, o_totalprice,
                   'unknown' AS city, CAST(1.0 AS DOUBLE) AS surge_factor
            FROM orders
        """,
        "clean_range_filter": """
            SELECT o_orderkey,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
                   o_totalprice
            FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
              AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
              AND o_totalprice > 1000.0
        """,
        "dedup_keep_latest": """
            SELECT event_id,
                   strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
                   user_id, event_type
            FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "dedup_distinct_projection": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "dedup_duplicate_stats": """
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS version_count
            FROM lineitem GROUP BY 1 HAVING count(*) > 1
        """,
        "star_dim_time": """
            SELECT sha256(CAST(d AS VARCHAR)) AS time_id,
                   CAST(d AS VARCHAR) AS date,
                   CAST(year(d) AS INT) AS year,
                   CAST(month(d) AS INT) AS month,
                   CAST(day(d) AS INT) AS day,
                   CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
                   CAST(quarter(d) AS INT) AS quarter,
                   CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
            FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        """,
        "star_dim_entity": """
            SELECT sha256(CAST(c_custkey AS VARCHAR)) AS user_key,
                   c_custkey, c_name, c_mktsegment
            FROM (SELECT DISTINCT c_custkey, c_name, c_mktsegment FROM customer)
        """,
        "star_dim_locations": """
            SELECT sha256(CAST(zone_id AS VARCHAR)) AS location_id,
                   zone_id,
                   n_name AS zone_name,
                   n_regionkey AS region_id
            FROM (
              SELECT DISTINCT CAST(c_nationkey AS INT) AS zone_id FROM customer
              UNION
              SELECT DISTINCT CAST(s_nationkey AS INT) AS zone_id FROM supplier
            ) z LEFT JOIN nation ON z.zone_id = nation.n_nationkey
        """,
        "star_trips_fact": """
            SELECT l.l_orderkey, l.l_linenumber,
                   sha256(CAST(o.o_custkey AS VARCHAR)) AS user_key,
                   sha256(CAST(l.l_suppkey AS VARCHAR)) AS driver_key,
                   sha256(CAST(l.l_partkey AS VARCHAR)) AS vehicle_key,
                   o.o_orderstatus, c.c_mktsegment, p.p_brand,
                   CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date,
                   l.l_quantity, l.l_extendedprice
            FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN part p ON l.l_partkey = p.p_partkey
        """,
        "star_payments_fact": """
            SELECT sha256(CAST(o_orderkey AS VARCHAR) || '||' || 'payment') AS payment_id,
                   o_orderkey,
                   sha256(CAST(c_custkey AS VARCHAR)) AS user_key,
                   o_totalprice,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "join_ri_check": """
            SELECT CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS total_rows,
                   CAST((SELECT count(*) FROM lineitem
                         WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
                        AS BIGINT) AS orphan_rows,
                   CAST((SELECT count(*) FROM lineitem
                         WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
                        AS DOUBLE)
                   / (SELECT count(*) FROM lineitem) AS orphan_rate
        """,
        "join_semi_orders_with_lines": """
            SELECT o_orderkey, o_orderstatus FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_anti_customers_no_orders": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "set_union_nation_keys": """
            SELECT CAST(c_nationkey AS INT) AS nk FROM customer
            UNION
            SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        """,
        "set_intersect_nation_keys": """
            SELECT CAST(c_nationkey AS INT) AS nk FROM customer
            INTERSECT
            SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        """,
        "set_except_nation_keys": """
            SELECT CAST(c_nationkey AS INT) AS nk FROM customer
            EXCEPT
            SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        """,
    }
