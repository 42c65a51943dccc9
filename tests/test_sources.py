"""Reader/maintenance coverage (SURVEY.md §2.1 S1/S9/S11): CSV with
explicit schema, schema'd JSONL scan, layout optimize."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import types as T

from distributed_mobility_data_pipeline_spark.sources import readers, writers


def test_csv_reader_explicit_schema(spark, tmp_path):
    p = tmp_path / "trips.csv"
    p.write_text("trip_id,fare\n1,10.5\n2,20.0\n")
    schema = T.StructType(
        [
            T.StructField("trip_id", T.LongType()),
            T.StructField("fare", T.DoubleType()),
        ]
    )
    df = readers.read_csv(spark, str(p), schema)
    assert df.schema == schema
    assert df.agg(F.sum("fare")).collect()[0][0] == 30.5


def test_jsonl_log_reader(spark, tmp_path):
    p = tmp_path / "api_log.jsonl"
    rows = [
        {"endpoint": "/predict/demand", "latency_ms": 12.5, "status": 200},
        {"endpoint": "/predict/surge", "latency_ms": 40.0, "status": 200},
        {"endpoint": "/predict/demand", "latency_ms": 9.1, "status": 500},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("endpoint", T.StringType()),
            T.StructField("latency_ms", T.DoubleType()),
            T.StructField("status", T.IntegerType()),
        ]
    )
    df = readers.read_json_log(spark, str(p), schema)
    assert df.count() == 3
    ok = df.filter(F.col("status") == 200).agg(F.avg("latency_ms")).collect()[0][0]
    assert abs(ok - 26.25) < 1e-9


def test_optimize_layout_parquet(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    df.repartition(8).write.parquet(p)
    writers.optimize_layout(spark, p, ["k", "id"], target_partitions=2)
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert back.select(F.sum("id")).collect()[0][0] == 499500


def test_orc_read_with_filter(spark, tmp_path):
    # distinct name from the write/read round-trip test below — a
    # duplicate definition would shadow this one and kill its coverage
    p = str(tmp_path / "orc_t")
    spark.range(100).withColumn("k", F.col("id") % 5).write.orc(p)
    df = readers.read_orc(spark, p)
    assert df.count() == 100
    assert df.filter(F.col("k") == 2).count() == 20


def test_text_lines_reader(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\n\ndelta epsilon zeta")
    df = readers.read_text_lines(spark, str(p))
    assert df.count() == 4  # blank line preserved as a row
    assert df.columns == ["value"]


def test_parquet_schema_evolution_read(spark, tmp_path):
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)
    df = readers.read_parquet_evolving(spark, p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[2] == 9.5 and rows[1] is None  # old rows surface NULL


def test_orc_roundtrip(spark, tmp_path):
    from distributed_mobility_data_pipeline_spark.sources import writers

    p = str(tmp_path / "orc_tbl")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, v double"
    )
    writers.write_orc(df, p)
    back = readers.read_orc(spark, p)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_orc_partitioned_write(spark, tmp_path):
    from distributed_mobility_data_pipeline_spark.sources import writers

    p = str(tmp_path / "orc_part")
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "id long, part string"
    )
    writers.write_orc(df, p, partition_by=["part"])
    back = readers.read_orc(spark, p)
    assert back.filter("part = 'x'").count() == 2


def test_register_views_and_sql(spark, sf_dir):
    from distributed_mobility_data_pipeline_spark.sources.catalog import register_views

    names = register_views(spark, sf_dir)
    assert "orders" in names and "events" in names
    n = spark.sql("SELECT count(*) AS c FROM orders").collect()[0]["c"]
    assert n == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    # events view went through the ns-normalizing reader
    assert dict(spark.sql("SELECT * FROM events").dtypes)["ts"] in (
        "timestamp",
    )
