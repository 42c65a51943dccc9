"""End-to-end corpus-prep pipeline (plans/corpus.py): stage semantics
and composition invariants on a corpus with planted defects."""

from __future__ import annotations

import pytest

from distributed_mobility_data_pipeline_spark.plans import corpus


@pytest.fixture(scope="module")
def raw_docs(spark):
    long_text = " ".join(f"w{i}" for i in range(120))
    near_dup = " ".join(f"w{i}" for i in range(119))  # one token short
    rows = [
        (1, long_text, "en", "src0", len(long_text)),
        (2, long_text, "en", "src0", len(long_text)),        # exact dup of 1
        (3, near_dup, "en", "src1", len(near_dup)),          # near dup of 1
        (4, "spam spam " * 40, "en", "src1", 400),           # repetitive
        (5, "tiny", "en", "src2", 4),                        # low quality
        (
            6,
            " ".join(f"u{i}" for i in range(150))
            + " mail bob@x.io or 555-123-4567",
            "en",
            "src2",
            900,
        ),
    ]
    return spark.createDataFrame(
        [(i, t, l, s, n) for i, t, l, s, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_pipeline_stages_remove_planted_defects(spark, raw_docs):
    stages = corpus.prepare_training_corpus(raw_docs)
    assert {r.doc_id for r in stages["deduped"].select("doc_id").collect()} == {
        1, 3, 4, 5, 6,
    }  # exact dup 2 dropped, survivor is the lowest id
    assert {
        r.doc_id for r in stages["near_deduped"].select("doc_id").collect()
    } == {1, 4, 5, 6}  # near dup 3 dropped via LSH pair (1,3)
    survivors = {r.doc_id for r in stages["filtered"].select("doc_id").collect()}
    assert 4 not in survivors  # repetition gate
    assert 5 not in survivors  # quality gate
    assert {1, 6} <= survivors


def test_pipeline_scrubs_pii_and_packs(spark, raw_docs):
    stages = corpus.prepare_training_corpus(raw_docs)
    texts = {r.doc_id: r.text for r in stages["clean"].collect()}
    assert "<EMAIL>" in texts[6] and "<PHONE>" in texts[6]
    assert "bob@x.io" not in texts[6]
    packed = stages["packed"].collect()
    assert len(packed) > 0
    totals: dict[tuple, int] = {}
    for r in packed:
        assert r.pack_id == r.chunk_idx // 4  # budget 256 // chunk 64
        key = (r.doc_id, r.pack_id)
        totals[key] = totals.get(key, 0) + r.n_chunk_tokens
    assert all(t <= 256 for t in totals.values())  # capacity guarantee
    # chunk rows match the chunks stage 1:1
    assert stages["chunks"].count() == len(packed)


def test_near_dup_threshold_is_honored(spark, raw_docs):
    # regression: losers must come from VERIFIED pairs (is_dup), not raw
    # band-bucket candidates — with an unachievable threshold nothing
    # may be dropped even though LSH candidates exist
    deduped = corpus.drop_exact_duplicates(raw_docs)
    before = {r.doc_id for r in deduped.select("doc_id").collect()}
    kept = {
        r.doc_id
        for r in corpus.drop_near_duplicates(deduped, threshold=1.01)
        .select("doc_id")
        .collect()
    }
    assert kept == before


def test_corpus_health_by_source_single_scan_and_counts(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            # src_a: 3 docs, one exact dup pair, english stopwords
            (1, "the cat and the dog in the house that is it for", "en", "src_a", 48),
            (2, "the cat and the dog in the house that is it for", "en", "src_a", 48),
            (3, "el perro y el gato en la casa de los dos", "es", "src_a", 40),
            # src_b: 1 short junk doc (all short tokens -> keep=0)
            (4, "a b c d", "xx", "src_b", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = {r.source: r for r in corpus.corpus_health_by_source(docs).collect()}
    a, b = rows["src_a"], rows["src_b"]
    assert (a.n_docs, a.n_unique_texts) == (3, 2)
    assert abs(a.exact_dup_rate - 1 / 3) < 1e-12
    assert a.n_lang_en == 2 and a.n_lang_es == 1
    assert b.n_docs == 1 and b.n_quality_keep == 0
    assert b.total_tokens == 4

    # single-scan: the whole dashboard reads the corpus exactly once
    plan = (
        corpus.corpus_health_by_source(docs)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    import re

    # one scan NODE (formatted mode prints each node once in the tree
    # and once as a numbered "(n) Scan ..." detail header — count the
    # detail headers)
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1, plan[:1500]


def test_null_text_docs_are_not_deduped_away(spark):
    """NULL-text documents (failed fetches, pending extraction) must
    each survive exact dedup as their own group — grouping on a plain
    sha2(normalize_text) collapses every NULL-text doc into one NULL
    fingerprint and silently drops all but the lowest id."""
    from distributed_mobility_data_pipeline_spark.operators import dedup_llm
    from distributed_mobility_data_pipeline_spark.streaming import (
        corpus as stream_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "same text here", "a", 14),
            (2, "same text here", "a", 14),  # true duplicate of 1
            (10, None, "a", 0),
            (11, None, "b", 0),
            (12, None, "c", 0),
        ],
        "doc_id long, text string, source string, n_chars int",
    )
    kept = sorted(
        r.doc_id for r in dedup_llm.keep_first_by_fingerprint(docs).collect()
    )
    assert kept == [1, 10, 11, 12]  # dup dropped; NULL-text docs all kept
    exact = dedup_llm.exact_dedup(docs).collect()
    assert sorted(r.keep_doc_id for r in exact) == [1, 10, 11, 12]
    assert all(r.n_copies == 1 for r in exact if r.keep_doc_id >= 10)
    # streaming batch twin shares the rule
    kept_s = sorted(
        r.doc_id for r in stream_corpus.dedup_batch_exact(docs).collect()
    )
    assert kept_s == [1, 10, 11, 12]
