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
