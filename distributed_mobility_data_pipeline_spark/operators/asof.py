"""As-of (point-in-time) join — a capability Spark lacks natively
(pyspark guide: 'As-of / range join').

Implemented with the union-tag + last-non-null-window technique: tag
right rows 0 and left rows 1, union on a common shape, sort within each
key by (time, tag, tiebreak), and carry the right columns forward with
``last(ignorenulls=True)``. One shuffle on the key, no range cross-join,
fully deterministic — and identical SQL runs on DuckDB for the oracle.

At 100 TB this beats the naive theta-join (which Spark would execute as
BroadcastNestedLoop or a huge range join): state per key is one sort,
and skewed keys fall to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    max_days: int,
) -> DataFrame:
    """Range join (|right_time − left_time| ≤ max_days on the same key)
    via bucketization: both sides get a day-bucket column, the left side
    explodes its ±1 candidate buckets, and the range predicate becomes
    an equi-join on (key, bucket) + a cheap filter. Catalyst would
    otherwise plan the raw inequality as a nested-loop join — this form
    is a hash join, the 100 TB-safe shape (bucket width = range width
    so each row lands in ≤3 buckets)."""
    if max_days <= 0:
        # width 0 would divide the bucket expression by zero — with
        # non-ANSI doubles that is a NULL bucket on BOTH sides and the
        # equi-join silently returns nothing. For same-day matching use
        # max_days=1 (the |datediff| filter still enforces the radius).
        raise ValueError(f"max_days must be positive, got {max_days}")
    width = max_days  # bucket width in days == range radius
    lb = F.floor(
        F.datediff(F.col(left_time), F.lit("1970-01-01")) / F.lit(width)
    )
    rb = F.floor(
        F.datediff(F.col(right_time), F.lit("1970-01-01")) / F.lit(width)
    )
    l = left.withColumn(
        "_b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r = right.withColumn("_b", rb)
    joined = l.join(
        r,
        (l["_b"] == r["_b"]) & (l[left_key] == r[right_key]),
    ).drop("_b")
    dist = F.abs(F.datediff(F.col(left_time), F.col(right_time)))
    return joined.filter(dist <= max_days)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time on the same key. Right rows at equal
    (time, tiebreak) resolve by the highest tiebreak — deterministic.

    All value columns travel as ONE struct and the forward-fill is
    ``last(ignorenulls)`` over that struct, so every ``asof_*`` output
    column comes from the same right row — per-column fill could stitch
    together fields of different rows when a value column is NULL."""
    from pyspark.sql import types as T

    v_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_v"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(v_type).alias("_v"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*", F.last("_v", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_asof").getField(c).alias(f"asof_{c}") for c in value_cols],
    )


def point_in_time_join(
    probes: DataFrame,
    history: DataFrame,
    key: str,
    probe_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) join: attach to each probe row the history
    version whose validity interval contains the probe timestamp
    (``valid_from <= ts < valid_to``, open ``valid_to`` = current).

    The feature-store primitive that prevents training-data leakage:
    features joined AS OF the label timestamp, never from the future.
    Pairs with ``windows.scd2_history`` (whose intervals partition time
    per key, so each probe matches at most one version).

    Scale shape: an equi-join on the entity key + an interval filter —
    candidates per probe are that key's version count (bounded by
    change frequency, not table size). For adversarially hot keys,
    pre-bucket with ``range_join_bucketed`` instead.
    """
    j = probes.join(history, key)
    cond = (F.col(probe_ts) >= F.col(valid_from)) & (
        F.col(valid_to).isNull() | (F.col(probe_ts) < F.col(valid_to))
    )
    return j.filter(cond)
