"""Round-5 corpus-statistics operators: unigram-LM scoring, PMI
collocations, vocabulary coverage, importance-weighted sampling, SCD2
history (operators/text.py, sampling.py, windows.py)."""

from __future__ import annotations

import math

from distributed_mobility_data_pipeline_spark.operators import sampling
from distributed_mobility_data_pipeline_spark.operators import text as text_ops
from distributed_mobility_data_pipeline_spark.operators import windows as win_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_logprob_scores_rare_tokens_lower(spark):
    rows = [
        (1, "the the the the"),      # all high-probability tokens
        (2, "the the zzqx1 zzqx2"),  # half rare tokens
    ]
    out = {r.doc_id: r for r in text_ops.unigram_logprob(_docs(spark, rows)).collect()}
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4
    # doc full of corpus-common tokens scores above the one with rare tokens
    assert out[1].mean_token_logprob > out[2].mean_token_logprob
    # hand-check doc 1: every token is 'the' with corpus count 6 of 8
    expect = math.log(6 / 8)
    assert abs(out[1].mean_token_logprob - expect) < 1e-6


def test_bigram_pmi_ranks_collocation_over_chance(spark):
    # 'new york' always co-occurs; 'a'/'b' pair freely
    rows = [(i, "new york a b") for i in range(5)] + [
        (10, "b a new river"),
        (11, "a b york state"),
    ]
    out = {(r.w1, r.w2): r for r in text_ops.bigram_pmi(_docs(spark, rows), min_count=5).collect()}
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny.c_xy == 5
    # exclusive pair has higher PMI than the promiscuous filler pair
    if ("a", "b") in out:
        assert ny.pmi > out[("a", "b")].pmi


def test_vocab_coverage_is_monotone_and_complete(spark):
    rows = [(1, "x x x y y z")]
    out = sorted(
        text_ops.vocab_coverage(_docs(spark, rows), vocab_size=2).collect(),
        key=lambda r: r.vocab_id,
    )
    assert [(r.token, r.n_occurrences) for r in out] == [("x", 3), ("y", 2)]
    assert [r.cum_occurrences for r in out] == [3, 5]
    assert abs(out[-1].cum_coverage - 5 / 6) < 1e-12


def test_importance_weighted_sample_respects_weights(spark):
    rows = [(i, 1.0 if i < 200 else 0.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = sampling.importance_weighted_sample(df, "doc_id", "w").collect()
    # weight 1 -> always kept, weight 0 -> never
    assert {r.doc_id for r in kept} == set(range(200))
    # fractional weights keep roughly that share, deterministically
    half = spark.createDataFrame(
        [(i, 0.5) for i in range(1000)], "doc_id long, w double"
    )
    k1 = {r.doc_id for r in sampling.importance_weighted_sample(half, "doc_id", "w").collect()}
    k2 = {
        r.doc_id
        for r in sampling.importance_weighted_sample(
            half.repartition(7), "doc_id", "w"
        ).collect()
    }
    assert k1 == k2  # layout-independent
    assert 400 <= len(k1) <= 600


def test_scd2_history_collapses_runs_and_versions(spark):
    rows = [
        (1, "a", 1, 10),
        (1, "a", 2, 11),  # unchanged -> collapsed into version 1
        (1, "b", 3, 12),  # change -> version 2
        (1, "a", 4, 13),  # change back -> version 3 (type-2 keeps both)
        (2, "x", 1, 20),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, eid long")
    hist = win_ops.scd2_history(df, "k", "attr", "ts", tiebreak=["eid"]).collect()
    by = {(r.k, r.version): r for r in hist}
    assert len(by) == 4
    assert by[(1, 1)].attr == "a" and by[(1, 1)].valid_from == 1
    assert by[(1, 1)].valid_to == 3 and by[(1, 1)].is_current == 0
    assert by[(1, 2)].attr == "b" and by[(1, 2)].valid_to == 4
    assert by[(1, 3)].attr == "a" and by[(1, 3)].valid_to is None
    assert by[(1, 3)].is_current == 1
    assert by[(2, 1)].is_current == 1


def test_segment_dedup_drops_repeated_boilerplate(spark):
    from distributed_mobility_data_pipeline_spark.operators import dedup_llm

    boiler = " ".join(f"b{i}" for i in range(4))   # 4-token boilerplate
    rows = [
        (1, boiler + " " + "u1 u2 u3 u4"),
        (2, boiler + " " + "v1 v2 v3 v4"),  # same leading block as doc 1
        (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
    ]
    out = {
        r.doc_id: r
        for r in dedup_llm.segment_dedup(_docs(spark, rows), seg_tokens=4).collect()
    }
    # doc 1 keeps both blocks; doc 2 loses the shared boilerplate block
    assert out[1].n_segments == 2 and out[1].n_kept_segments == 2
    assert out[2].n_segments == 2 and out[2].n_kept_segments == 1
    assert out[2].dedup_text == "v1 v2 v3 v4"
    assert out[2].n_dropped_segments == 1
    assert out[3].n_kept_segments == 2  # unique content untouched
    # surviving text preserves in-document block order
    assert out[1].dedup_text == boiler + " " + "u1 u2 u3 u4"


def test_key_skew_report_orders_and_accumulates(spark):
    from distributed_mobility_data_pipeline_spark.operators import skew

    rows = [(i, "hot" if i < 70 else f"k{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = sorted(skew.key_skew_report(df, "k", top_k=2).collect(), key=lambda r: r.rank)
    assert out[0].key == "hot" and out[0].n == 70
    assert abs(out[0].share - 0.7) < 1e-12
    assert out[1].cum_share > out[0].cum_share  # cumulative is monotone


def test_incremental_state_merge_equals_full_aggregate(spark, sf_dir):
    import os

    from distributed_mobility_data_pipeline_spark.operators import aggregates as agg

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    from pyspark.sql import functions as F

    full = agg.finalize_daily_revenue(agg.daily_revenue_state(li))
    merged = agg.finalize_daily_revenue(
        agg.merge_daily_revenue_states(
            agg.daily_revenue_state(li.filter(F.col("l_orderkey") % 3 == 0)),
            agg.daily_revenue_state(li.filter(F.col("l_orderkey") % 3 == 1)),
            agg.daily_revenue_state(li.filter(F.col("l_orderkey") % 3 == 2)),
        )
    )
    a = {r.ship_date: r for r in full.collect()}
    b = {r.ship_date: r for r in merged.collect()}
    assert set(a) == set(b)
    for k in a:  # decimal state merges are EXACT, not approximately equal
        assert a[k].total_revenue == b[k].total_revenue
        assert a[k].n_rows == b[k].n_rows
        assert a[k].avg_quantity == b[k].avg_quantity


def test_partition_layout_plan_targets_file_size(spark):
    from pyspark.sql import functions as F

    from distributed_mobility_data_pipeline_spark.operators import layout

    rows = [(i, "big" if i < 90 else "small", 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, part string, nbytes long")
    out = {
        r.part: r
        for r in layout.partition_layout_plan(
            df, ["part"], F.col("nbytes"), target_bytes=30_000
        ).collect()
    }
    assert out["big"].total_bytes == 90_000 and out["big"].n_files == 3
    assert out["big"].rows_per_file == 30
    assert out["small"].n_files == 1  # floor of one file, never zero
