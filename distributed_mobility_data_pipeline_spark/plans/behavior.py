"""Composed behavioral-insights pipeline: one lazy plan that turns the
raw event stream into a per-user feature table — sessionization,
sequential funnel milestones, behavioral diversity, and recency,
joined on the user key.

Second flagship composition beside plans/corpus.py: every stage is an
individually oracle-green operator, and the composition itself is
deterministic, so the whole pipeline hash-checks end-to-end.

Scale shape: each branch reduces the event stream per user (windows
and aggregations all partition on user_id), and the final joins are
user-keyed between user-sized tables. The one broadcast is the global
as-of timestamp (a one-row aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import behavior
from distributed_mobility_data_pipeline_spark.streaming.events import (
    session_start_flags,
)


def user_insights(
    events: DataFrame,
    session_gap_minutes: int = 30,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Per-user behavioral feature table:

    (user_id, n_events, n_types, entropy, n_sessions,
     events_per_session, reached_<stage>... , days_since_last)
    """
    ent = behavior.type_entropy(events)

    # session stats straight from the start flags (r19, guide §2.4):
    # per user, sum(_new) == the session count (each session has exactly
    # one flagged first event) and count(*) == total session events, so
    # the per-(user, session) rollup + regroup the old form paid is one
    # aggregation now
    sess = (
        session_start_flags(events, session_gap_minutes)
        .groupBy("user_id")
        .agg(
            F.sum("_new").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).cast("bigint").alias("_sess_events"),
        )
        .withColumn(
            "events_per_session",
            F.col("_sess_events") / F.col("n_sessions"),
        )
        .drop("_sess_events")
    )

    miles = behavior.user_milestones(events, stages)
    for i, s in enumerate(stages):
        miles = miles.withColumn(
            f"reached_{s}", F.col(f"_t{i}").isNotNull().cast("int")
        )
    miles = miles.select(
        "user_id", *[f"reached_{s}" for s in stages]
    )

    # as-of derives from the per-user maxima (max of per-group maxima
    # == the global max) instead of its own event scan (r19, guide §2.4
    # — same move as behavior.rfm_scores_hist)
    last = events.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("_last")
    ).persist()  # user-sized; feeds both the as-of agg and the join
    asof = last.agg(F.max("_last").alias("_asof"))
    recency = (
        last.crossJoin(F.broadcast(asof))
        .select(
            "user_id",
            F.datediff(F.col("_asof"), F.col("_last"))
            .cast("int")
            .alias("days_since_last"),
        )
    )

    return (
        ent.join(sess, "user_id")
        .join(miles, "user_id")
        .join(recency, "user_id")
    )
