"""Skew mitigation (SURVEY.md §4c: "salting helper for skewed zone keys
at 100 TB; AQE skew-join handles most cases").

AQE's skew-join splitting (on by default in session.py) is the first
line of defense. Salting is for the cases AQE can't fix: skewed
*aggregations* and skewed broadcast-ineligible joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key fix: the large side gets a
    deterministic salt (hash of its unique column), the small side is
    replicated n_salts times, and the join key becomes (key, salt) — a
    single hot key now spreads over ``n_salts`` reducers.

    Deterministic (salt = xxhash of ``unique_col``), so results are
    reproducible and equal to the unsalted join (tested).

    Only inner/left are supported: replicating the small side would
    duplicate its unmatched rows under right/full semantics."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}"
        )
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")
    ).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_large.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, unique_col: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed groupBy keys: partial count per
    (key, salt), then final combine per key. Spark's hash aggregate
    already does map-side partial combine, so this only matters when a
    single key overflows one reducer's partition — the 100 TB case."""
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def key_skew_report(
    df: DataFrame, key: str, top_k: int = 20
) -> DataFrame:
    """Heavy-hitter diagnostic: the top-``top_k`` keys by row count with
    each key's share of the table and the running cumulative share — the
    report that decides whether a join/agg key needs salting or AQE skew
    handling BEFORE the 100 TB job runs (a key with >1/shuffle-partitions
    share will straggle its reducer).

    Scale shape: one aggregation to the per-key counts, global top-K via
    TakeOrderedAndProject (never a full sort), rank/cumulative windows
    only over the bounded K-row result, grand total broadcast back as a
    one-row literal."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    top = counts.orderBy(F.col("n").desc(), F.col(key)).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col(key))
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            F.col(key).cast("string").alias("key"),
            "n",
            (F.col("n").cast("double") / F.col("n_total")).alias("share"),
            (
                F.sum("n").over(w_cum).cast("double") / F.col("n_total")
            ).alias("cum_share"),
        )
    )
