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

from distributed_mobility_data_pipeline_spark.operators import aggregates as agg_ops
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
    }
