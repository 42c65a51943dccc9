"""Multimodal column plumbing (north-star extension, BASELINE.json:
"multimodal columns").

Media are opaque ``binary`` payloads + typed metadata (schemas.MEDIA).
The Spark-side plumbing — schema, partition-friendly long format,
Arrow-batched ``mapInPandas`` operator shape — is real and tested; the
actual codec work (image decode / resize, audio feature extraction,
video frame sampling) is stubbed behind ``_decode_stub`` because the
media libraries are not in this environment. Swapping the stub for
PIL/librosa/pyav turns these into production operators without touching
the dataflow.

Batch shape: ``mapInPandas`` receives an iterator of Arrow-backed
pandas batches; each batch holds whole payload blobs, so executor
memory bounds batch size via ``spark.sql.execution.arrow.maxRecordsPerBatch``
— set it low (e.g. 64) for large media on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_sha256 string, "
    "feat_0 double, feat_1 double, feat_2 double, feat_3 double"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (UTF-8 payload blobs) so
    the plumbing is exercisable on the driver's tables. Deterministic."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata pass (no Python): byte length + content hash.
    This is the cheap scan that routes/filters media before any decode."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def _decode_stub(kind: str, payload: bytes) -> list[float]:
    """STUB for the real codec: deterministic fake features from the
    payload hash. Replace with PIL/librosa/pyav decode + model feature
    extraction in production (NotImplementedError intentionally *not*
    raised so the dataflow is testable end-to-end)."""
    h = hashlib.sha256(payload if payload is not None else b"").digest()
    return [b / 255.0 for b in h[:4]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas`` — the real
    operator shape for decode/resize/frame-sample at scale. Python only
    touches the payload bytes; everything before/after stays JVM-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(k, p) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )
            for j in range(4):
                out[f"feat_{j}"] = [f[j] for f in feats]
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
