from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import reconcile


def _orders(spark):
    return spark.createDataFrame(
        [(i, i % 7, "O" if i % 2 else "F", "3-MEDIUM") for i in range(200)],
        ["k", "c", "status", "prio"],
    )


COLS = ["k", "c", "status", "prio"]


def test_identical_tables_have_empty_diff(spark):
    a = _orders(spark)
    out = reconcile.checksum_diff(a, _orders(spark), "k", COLS, 32)
    assert out.count() == 0


def test_single_value_change_is_detected(spark):
    a = _orders(spark)
    b = a.withColumn(
        "status", F.when(F.col("k") == 42, F.lit("X")).otherwise(F.col("status"))
    )
    rows = reconcile.checksum_diff(a, b, "k", COLS, 32).collect()
    assert len(rows) == 1
    assert rows[0].status == "checksum_mismatch"
    assert rows[0].n_rows_a == rows[0].n_rows_b


def test_missing_rows_flag_count_mismatch(spark):
    a = _orders(spark)
    b = a.filter(F.col("k") != 17)
    rows = reconcile.checksum_diff(a, b, "k", COLS, 32).collect()
    assert len(rows) == 1
    assert rows[0].status == "count_mismatch"
    assert rows[0].n_rows_a == rows[0].n_rows_b + 1


def test_checksum_is_partitioning_independent(spark):
    a = _orders(spark)
    c1 = {tuple(r) for r in reconcile.table_checksum(a, "k", COLS, 32).collect()}
    c2 = {
        tuple(r)
        for r in reconcile.table_checksum(
            a.repartition(13), "k", COLS, 32
        ).collect()
    }
    assert c1 == c2


def test_empty_cols_rejected(spark):
    with pytest.raises(ValueError):
        reconcile.table_checksum(_orders(spark), "k", [], 32)


def test_null_position_changes_digest(spark):
    # (a, NULL, b) vs (a, b, NULL): same non-null values, different
    # column carrying the NULL — must yield a checksum mismatch
    # (concat_ws alone would skip NULLs and hash both identically).
    schema = "k int, x string, y string, z string"
    a = spark.createDataFrame([(1, "a", None, "b")], schema)
    b = spark.createDataFrame([(1, "a", "b", None)], schema)
    rows = reconcile.checksum_diff(a, b, "k", ["x", "y", "z"], 8).collect()
    assert len(rows) == 1 and rows[0].status == "checksum_mismatch"


def test_null_vs_literal_backslash_n_differ(spark):
    # NULL encodes as the unescapable token \N; a literal "\\N" string
    # escapes its backslash, so the two stay distinguishable.
    a = spark.createDataFrame([(1, None)], "k int, x string")
    b = spark.createDataFrame([(1, "\\N")], "k int, x string")
    assert len(reconcile.checksum_diff(a, b, "k", ["x"], 8).collect()) == 1


def test_separator_injection_detected(spark):
    # ("a|b", "c") vs ("a", "b|c") must not collide: the separator is
    # escaped per column before joining.
    a = spark.createDataFrame([(1, "a|b", "c")], ["k", "x", "y"])
    b = spark.createDataFrame([(1, "a", "b|c")], ["k", "x", "y"])
    assert len(reconcile.checksum_diff(a, b, "k", ["x", "y"], 8).collect()) == 1


def test_row_diff_statuses_and_changed_cols(spark):
    schema = "k int, x string, y string"
    a = spark.createDataFrame(
        [(1, "a", "b"), (2, "c", "d"), (3, "e", "f"), (4, None, "g")], schema
    )
    b = spark.createDataFrame(
        [(1, "a", "b"), (2, "C", "D"), (4, "h", "g"), (5, "new", "row")], schema
    )
    rows = {
        r.k: (r.status, r.changed_cols)
        for r in reconcile.row_diff(a, b, "k", ["x", "y"]).collect()
    }
    assert rows == {
        2: ("changed", "x,y"),
        3: ("removed", ""),
        4: ("changed", "x"),  # NULL -> value counts as a change
        5: ("added", ""),
    }  # key 1 identical: absent


def test_row_diff_null_to_null_is_no_change(spark):
    schema = "k int, x string"
    a = spark.createDataFrame([(1, None)], schema)
    b = spark.createDataFrame([(1, None)], schema)
    assert reconcile.row_diff(a, b, "k", ["x"]).count() == 0
    with pytest.raises(ValueError):
        reconcile.row_diff(a, b, "k", [])


def test_checksum_matches_python_modular_sum(spark):
    # pins the digest formula AND the overflow-proof accumulation:
    # checksum == (sum of md5-prefix digests) % 2^62, computed here in
    # arbitrary-precision Python. A plain bigint sum would overflow at
    # ~2^31 rows per bucket (digests are up to 2^32); the decimal
    # accumulate + modulus keeps the bigint output exact at any size.
    import hashlib

    df = _orders(spark)
    out = {
        r.bucket: (r.n_rows, r.checksum)
        for r in reconcile.table_checksum(df, "k", COLS, n_buckets=4).collect()
    }
    expect: dict[int, list[int]] = {}
    for i in range(200):
        row = (i, i % 7, "O" if i % 2 else "F", "3-MEDIUM")
        bucket = int(hashlib.md5(f"{i}ck".encode()).hexdigest()[:8], 16) % 4
        canon = "|".join(
            str(v).replace("\\", "\\\\").replace("|", "\\|") for v in row
        )
        digest = int(hashlib.md5(canon.encode()).hexdigest()[:8], 16)
        expect.setdefault(bucket, []).append(digest)
    for bucket, digests in expect.items():
        assert out[bucket] == (len(digests), sum(digests) % 2**62), bucket
