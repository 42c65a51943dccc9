"""Streaming corpus ingestion (north-star extension): exact-dedup a
continuously-arriving document stream by content fingerprint.

The batch exact dedup (operators/dedup_llm.exact_dedup) keyed on
sha2(normalized text) has a direct streaming twin: ``dropDuplicates``
on the fingerprint keeps the FIRST arrival of each distinct content and
discards re-ingestions — the shape of a crawl pipeline that must not
re-emit documents it has already admitted.

State is one row per distinct fingerprint. Unbounded for a true
forever-crawl; in practice bounded with ``dropDuplicatesWithinWatermark``
when re-crawls cluster in time (the variant exposed here too). At
100 TB state lives in RocksDB on executors, keyed by the 32-byte hash —
the same state-size argument as streaming_dedup on event_id
(streaming/events.py:138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators.text import normalize_text

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of the documents table (parquet dir/glob)."""
    if path.endswith(".parquet"):
        path = path[: -len("t")] + "*"
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    return docs.withColumn("fingerprint", F.sha2(normalize_text(), 256))


def dedup_stream_exact(docs: DataFrame) -> DataFrame:
    """Keep the first arrival of each distinct normalized content.

    Same function body serves batch and streaming (unified API); the
    batch run is the oracle twin the tests compare against."""
    return with_fingerprint(docs).dropDuplicates(["fingerprint"])


def dedup_batch_exact(docs: DataFrame) -> DataFrame:
    """Deterministic batch twin of ``dedup_stream_exact`` (lowest doc_id
    wins per fingerprint) — the oracle-checkable form; the stream keeps
    arrival order instead, and tests prove the fingerprint sets agree.
    Delegates to the canonical rule in dedup_llm so the tie-break can
    never diverge from the batch corpus pipeline."""
    from distributed_mobility_data_pipeline_spark.operators.dedup_llm import (
        keep_first_by_fingerprint,
    )

    return keep_first_by_fingerprint(docs, keep_fingerprint=True).select(
        "doc_id", "source", "fingerprint"
    )


def dedup_stream_within_watermark(
    docs: DataFrame, ts_col: str = "ingested_at", delay: str = "1 hour"
) -> DataFrame:
    """Bounded-state variant: duplicates are only suppressed within the
    watermark horizon — the production choice when re-ingestions arrive
    close to the original and state must not grow forever."""
    fp = with_fingerprint(docs)
    if not fp.isStreaming:
        return fp.dropDuplicates(["fingerprint"])
    return fp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
