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
