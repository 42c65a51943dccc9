"""Round-4 LLM-pipeline text ops: chunking, PII redaction,
benchmark decontamination (operators/text.py)."""

from __future__ import annotations

from distributed_mobility_data_pipeline_spark.operators import text as text_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_covers_every_token_with_stride_overlap(spark):
    toks = [f"t{i}" for i in range(150)]
    docs = _docs(spark, [(1, " ".join(toks))])
    out = text_ops.chunk_documents(docs, chunk_size=64, stride=48).collect()
    # starts at 1, 49, 97, 145 (1-based) -> 4 chunks
    assert [r.start_token for r in out] == [1, 49, 97, 145]
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [64, 64, 54, 6]
    # full coverage: every token appears in some chunk; tail chunk exact
    assert out[-1].chunk_text == " ".join(toks[144:])
    # overlap: chunk 1 starts 16 tokens before chunk 0 ends
    assert out[0].chunk_text.split(" ")[48:] == out[1].chunk_text.split(" ")[:16]


def test_chunking_short_doc_single_chunk(spark):
    out = text_ops.chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_size=64, stride=48
    ).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "a b c" and out[0].n_chunk_tokens == 3


def test_redact_pii_counts_and_scrubs(spark):
    docs = _docs(spark, [(7, "mail me at bob@corp.io or 415-555-1234 now")])
    r = text_ops.redact_pii(docs).collect()[0]
    # 1 in-text email + 1 injected, 1 in-text phone + 1 injected
    assert r.n_emails == 2 and r.n_phones == 2
    assert len(r.redacted_fingerprint) == 64  # sha2-256 hex


def test_contamination_finds_planted_leak(spark):
    bench_text = " ".join(f"b{i}" for i in range(20))
    rows = [
        (1, bench_text),                               # benchmark doc
        (100, bench_text + " extra trailing tokens"),  # contaminated
        (101, " ".join(f"c{i}" for i in range(20))),   # clean
    ]
    out = text_ops.contamination_overlap(
        _docs(spark, rows), bench_max_id=50, n=8, min_overlap=2
    ).collect()
    assert {(r.doc_id, r.bench_id) for r in out} == {(100, 1)}
    r = out[0]
    # bench doc has 13 distinct 8-grams, all present in the superset doc
    assert r.bench_total == 13 and r.n_shared == 13
    assert abs(r.containment - 1.0) < 1e-12


def test_repetition_flags_spammy_doc(spark):
    natural = " ".join(f"w{i}" for i in range(30))
    spam = "buy now " * 20
    out = {
        r.doc_id: r
        for r in text_ops.repetition_stats(
            _docs(spark, [(1, natural), (2, spam.strip())]), n=2
        ).collect()
    }
    assert out[1].dup_ngram_ratio == 0.0 and out[1].keep == 1
    assert out[2].dup_ngram_ratio > 0.9 and out[2].keep == 0


def test_pack_chunks_respects_budget_per_doc(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(300)))])
    chunks = text_ops.chunk_documents(docs, chunk_size=64, stride=48)
    packed = text_ops.pack_chunks(chunks, budget=256, chunk_size=64).collect()
    # cumulative totals are per-doc and monotone
    cums = [r.cum_tokens for r in sorted(packed, key=lambda r: r.chunk_idx)]
    assert cums == sorted(cums)
    # capacity-exact: every pack's token total stays within budget
    totals: dict[int, int] = {}
    for r in packed:
        assert r.pack_id == r.chunk_idx // 4  # 256 // 64 chunks per pack
        totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_chunk_tokens
    assert all(t <= 256 for t in totals.values())


def test_source_mixing_weights_sum_and_direction(spark):
    from distributed_mobility_data_pipeline_spark.operators import sampling

    rows = [
        (i, "tok " * 10 + "x", "over" if i < 8 else "under") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in sampling.source_mixing_weights(
            docs, {"over": 0.5, "under": 0.5}
        ).collect()
    }
    assert abs(out["over"].actual_share + out["under"].actual_share - 1.0) < 1e-12
    # the over-represented source gets down-weighted, the rare one boosted
    assert out["over"].sampling_weight < 1.0 < out["under"].sampling_weight


# -- property-based invariants (hypothesis), matching test_properties.py --

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_doc_shapes = st.tuples(
    st.integers(min_value=1, max_value=200),   # n_tokens
    st.integers(min_value=2, max_value=40),    # chunk_size
    st.integers(min_value=1, max_value=40),    # stride
)


@_slow
@given(_doc_shapes)
def test_chunking_properties(spark, shape):
    n_tok, chunk_size, stride = shape
    doc = " ".join(f"t{i}" for i in range(n_tok))
    out = sorted(
        text_ops.chunk_documents(
            _docs(spark, [(1, doc)]), chunk_size=chunk_size, stride=stride
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts are exactly 1, 1+stride, ... <= n_tok
    assert [r.start_token for r in out] == list(range(1, n_tok + 1, stride))
    covered = set()
    for r in out:
        covered.update(range(r.start_token, r.start_token + r.n_chunk_tokens))
    if stride <= chunk_size:
        # overlapping/contiguous regime: every token lands in some chunk
        assert covered == set(range(1, n_tok + 1))
    else:
        # stride > chunk_size deliberately subsamples — gaps allowed,
        # but nothing out of range and chunk starts are still on-grid
        assert covered <= set(range(1, n_tok + 1))
    # chunk text agrees with its claimed token count
    for r in out:
        assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens


@_slow
@given(_doc_shapes, st.integers(min_value=8, max_value=512))
def test_packing_properties(spark, shape, budget):
    import pytest

    n_tok, chunk_size, stride = shape
    doc = " ".join(f"t{i}" for i in range(n_tok))
    chunks = text_ops.chunk_documents(
        _docs(spark, [(1, doc)]), chunk_size=chunk_size, stride=stride
    )
    if budget < chunk_size:
        # sub-chunk budgets can never honor the at-most-budget
        # guarantee -> rejected up front
        with pytest.raises(ValueError, match="budget >= chunk_size"):
            text_ops.pack_chunks(chunks, budget=budget, chunk_size=chunk_size)
        return
    packed = sorted(
        text_ops.pack_chunks(chunks, budget=budget, chunk_size=chunk_size).collect(),
        key=lambda r: r.chunk_idx,
    )
    per_pack = budget // chunk_size
    run = 0
    prev_pack = 0
    totals: dict[int, int] = {}
    for r in packed:
        run += r.n_chunk_tokens
        assert r.cum_tokens == run  # prefix sum audit column
        assert r.pack_id == r.chunk_idx // per_pack
        assert r.pack_id >= prev_pack  # monotone non-decreasing
        prev_pack = r.pack_id
        totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_chunk_tokens
    # capacity guarantee: no pack exceeds the token budget, ALWAYS
    assert all(t <= budget for t in totals.values())


def test_token_rarity_separates_common_from_rare(spark):
    rows = [
        (1, "common common unique1"),
        (2, "common common unique2"),
        (3, "common unique3 unique4"),
    ]
    out = {r.doc_id: r for r in text_ops.token_rarity(_docs(spark, rows), rare_df=1).collect()}
    # 'common' has df=3; unique tokens df=1
    assert out[3].rare_ratio > out[1].rare_ratio
    assert out[1].n_tokens == 3 and out[1].sum_df == 3 + 3 + 1


def test_tfidf_top_terms_picks_distinctive_tokens(spark):
    rows = [
        (1, "shared shared apple apple apple"),
        (2, "shared shared banana"),
        (3, "shared cherry cherry"),
    ]
    out = text_ops.tfidf_top_terms(_docs(spark, rows), k=1).collect()
    top = {r.doc_id: r.token for r in out}
    # the doc-specific token always outranks the corpus-wide one
    assert top == {1: "apple", 2: "banana", 3: "cherry"}


def test_corpus_diff_classifies_all_transitions(spark):
    from distributed_mobility_data_pipeline_spark.operators import dedup_llm

    old = _docs(spark, [(1, "a b"), (2, "c d"), (3, "e f")])
    new = _docs(spark, [(2, "c d"), (3, "e CHANGED"), (9, "new doc")])
    out = {r.doc_id: r.status for r in dedup_llm.corpus_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 9: "added"}


def test_fixed_k_per_group_balances_skewed_sources(spark):
    from distributed_mobility_data_pipeline_spark.operators import sampling

    rows = [(i, "t", "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sampling.fixed_k_per_group(df, "source", "doc_id", k=7).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["big"]) == 7          # capped
    assert len(by_src["small"]) == 7        # 10 available, 7 kept
    # layout-independent: same selection after a different repartition
    again = sampling.fixed_k_per_group(
        df.repartition(13), "source", "doc_id", k=7
    ).collect()
    assert {(r.source, r.doc_id) for r in again} == {
        (r.source, r.doc_id) for r in out
    }


def test_negative_samples_never_self_and_deterministic(spark):
    from distributed_mobility_data_pipeline_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(50)], "vec_id long")
    out = sampling.negative_samples(df, "vec_id", n_keys=50, k=4).collect()
    assert len(out) == 200  # 50 anchors x 4 negatives
    for r in out:
        assert r.negative_id != r.anchor_id
        assert 0 <= r.negative_id < 50
    again = sampling.negative_samples(
        df.repartition(9), "vec_id", n_keys=50, k=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quality_percentile_filter_drops_exact_fraction(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(i + 2)), (i + 2) * 3) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = text_ops.quality_percentile_filter(docs, drop_below=0.25).collect()
    # percent_rank >= 0.25 over 20 rows keeps ranks 6..20 -> 15 rows
    assert len(out) == 15
    kept_scores = sorted(r.quality_score for r in out)
    all_scores = sorted(
        r.quality_score for r in text_ops.quality_score(docs).collect()
    )
    assert kept_scores == all_scores[5:]  # exactly the worst 5 dropped


def test_quality_histogram_cutoff_matches_percentile_on_separated_scores(spark):
    # identical text (ttr/short ratio constant) with n_chars stepping by
    # 50 -> scores 0.4 + 0.04*i, 40 histogram bins apart: the histogram
    # cutoff and the exact percent_rank twin must agree exactly
    rows = [(i, "a b c", i * 50) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    hist = text_ops.quality_histogram_cutoff_filter(docs, drop_below=0.25).collect()
    pct = text_ops.quality_percentile_filter(docs, drop_below=0.25).collect()
    assert {r.doc_id for r in hist} == {r.doc_id for r in pct} == set(range(2, 8))
    # every survivor sits at or above the broadcast cutoff bucket
    assert all(r.bucket >= r.cutoff_bucket for r in hist)


def test_quality_histogram_cutoff_is_conservative_and_order_consistent(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(i + 2)), (i + 2) * 3) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    kept = text_ops.quality_histogram_cutoff_filter(docs, drop_below=0.25).collect()
    # drops AT MOST the requested fraction (whole buckets only)
    assert 15 <= len(kept) <= 20
    all_scores = {
        r.doc_id: r.quality_score for r in text_ops.quality_score(docs).collect()
    }
    dropped = set(all_scores) - {r.doc_id for r in kept}
    if dropped:  # order consistency: no kept doc scores below a dropped one
        assert min(r.quality_score for r in kept) >= max(
            all_scores[d] for d in dropped
        )


def test_pack_chunks_rejects_sub_chunk_budget(spark):
    import pytest

    chunks = text_ops.chunk_documents(
        _docs(spark, [(1, "a b c d e")]), chunk_size=4, stride=4
    )
    with pytest.raises(ValueError, match="budget >= chunk_size"):
        text_ops.pack_chunks(chunks, budget=3, chunk_size=4)


def test_negative_samples_rejects_degenerate_keyspace(spark):
    import pytest

    from distributed_mobility_data_pipeline_spark.operators import sampling

    df = spark.createDataFrame([(0,)], "vec_id long")
    for bad in (1, 0, -3):
        with pytest.raises(ValueError, match="n_keys >= 2"):
            sampling.negative_samples(df, "vec_id", n_keys=bad)


def test_source_mixing_weights_dangling_target_and_empty_source(spark):
    from distributed_mobility_data_pipeline_spark.operators import sampling

    rows = [(i, "tok tok tok", "seen") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.source: r
        for r in sampling.source_mixing_weights(
            docs, {"seen": 0.6, "ghost": 0.4}
        ).collect()
    }
    # a target source with zero documents still emits a visible row...
    assert set(out) == {"seen", "ghost"}
    ghost = out["ghost"]
    assert ghost.n_docs == 0 and ghost.n_tokens == 0
    assert ghost.actual_share == 0.0 and ghost.target_share == 0.4
    # ...and its weight is null, never Infinity
    assert ghost.sampling_weight is None
    assert out["seen"].sampling_weight is not None
