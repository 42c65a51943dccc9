"""Explicit StructType contracts.

The reference infers schema at the CSV boundary (bronze_loader.py:17-19)
and keeps every downstream schema implicit. Here every layer has an
explicit contract: deterministic reads (no inference pass over 100 TB)
and self-documenting operator signatures (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference domain: trips (generate_all.py:63-133, bronze casts 22-26)
# ---------------------------------------------------------------------------

TRIPS_RAW = T.StructType(
    [
        T.StructField("trip_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("driver_id", T.LongType(), True),
        T.StructField("pickup_zone_id", T.LongType(), True),
        T.StructField("dropoff_zone_id", T.LongType(), True),
        T.StructField("requested_at", T.TimestampType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("distance_km", T.DoubleType(), True),
        T.StructField("duration_min", T.DoubleType(), True),
        T.StructField("surge_multiplier", T.DoubleType(), True),
        T.StructField("fare_amount", T.DoubleType(), True),
        T.StructField("payment_method", T.StringType(), True),
    ]
)

# Bronze = raw + audit columns (bronze_loader.py:30-35)
TRIPS_BRONZE = T.StructType(
    TRIPS_RAW.fields
    + [
        T.StructField("ingested_at", T.TimestampType(), False),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("requested_date", T.DateType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — declared so reads never infer
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON-as-string
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal extension: opaque binary payload + typed metadata
# (north-star; the decode step is stubbed, the plumbing is real).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
