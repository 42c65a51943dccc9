"""Streaming near-dup admission: the persisted LSH band index must
reject re-ingested near-duplicates across micro-batches while admitting
genuinely new content."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.streaming import corpus as sc


def _run(spark, src, out, idx, ckpt):
    stream = sc.read_documents_stream(spark, src)
    q = sc.stream_neardedup_sink(stream, out, idx, ckpt)
    q.processAllAvailable()
    q.stop()


def test_neardedup_index_rejects_reingestion(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") < 100)
        .persist()
    )
    n_orig = docs.count()
    docs.write.mode("append").parquet(src)
    _run(spark, src, out, idx, ckpt)
    admitted = spark.read.parquet(out).persist()
    admitted1 = admitted.count()
    # the synthetic corpus contains a handful of genuine near-dups, so
    # greedy admission keeps most-but-not-necessarily-all originals
    assert 0.9 * n_orig <= admitted1 <= n_orig

    # second arrival: near-dups of ADMITTED docs (last token dropped,
    # new ids) + 20 genuinely-new docs (token-wise rewrites -> shingles
    # disjoint from everything)
    near = admitted.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, length(text) - instr(reverse(text), ' '))"
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    fresh = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                # doc_id-salted rewrite: shingles disjoint across docs
                # too (unsalted, docs sharing trigrams would produce
                # near-dup rewrites of each other)
                lambda t: F.substring(
                    F.md5(
                        F.concat_ws("_", t, F.col("doc_id").cast("string"))
                    ),
                    1,
                    8,
                ),
            ),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    near.unionByName(fresh).write.mode("append").parquet(src)
    _run(spark, src, out, idx, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == admitted1 + 20  # near-dups rejected, new admitted
    assert final.filter(F.col("doc_id") >= 20_000).count() == 20
    assert final.filter(
        (F.col("doc_id") >= 10_000) & (F.col("doc_id") < 20_000)
    ).count() == 0
    admitted.unpersist()
    docs.unpersist()
