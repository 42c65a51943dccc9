"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the public local-fingerprinting algorithm behind MOSS).

Whole-document hashing (text.fingerprint) only catches EXACT dups;
MinHash/SimHash (dedup_llm) catch near-dups at the whole-document
level. Winnowing covers the third regime: SHARED PASSAGES — a document
that embeds a paragraph of another (boilerplate, quotations, template
reuse, copy-paste contamination) shares the fingerprints selected from
that passage, regardless of how different the rest is. The guarantee:
any shared run of at least w + k - 1 tokens yields at least one shared
fingerprint.

Algorithm: hash every word-level k-gram (rolling window), slide a
window of w consecutive k-gram hashes, select the MINIMUM hash per
window (rightmost position on ties — "robust winnowing"), keep the
distinct selected (hash, position) set per document.

Spark shape (100 TB): per-doc k-gram explode (map-side), ONE window
pass per doc partition for the min selection, distinct. Document-pair
detection is an equi-join on the fingerprint hash — never all-pairs —
with a document-frequency cap dropping boilerplate fingerprints shared
by more than ``max_df`` docs (the same stop-key discipline as the LSH
band join).

Cross-engine determinism: hashes are md5-hex-prefix integers (same
rule as dedup_llm/reconcile), and the rightmost-min-per-window
selection is encoded as an order-free ``min`` over a single packed
BIGINT — ``h * 2^21 + (2^21 - 1 - pos)`` — so the DuckDB oracle
computes the identical fingerprint set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators.text import normalize_text

# positions pack into the low 21 bits of the selection key: documents
# are limited to 2^21 - 1 (~2M) k-grams, far above any web document;
# h < 2^32 keeps the packed key under 2^53 — exact in BIGINT and even
# in a double.
_POS_CAP = 1 << 21


def kgram_hashes(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, h): the rolling word-level k-gram hash stream per
    document, pos 1-based. Documents with fewer than k words emit
    nothing. Map-only (normalize → slice → md5), no shuffle."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = F.split(normalize_text(text_col), " ")
    n = F.size(words)
    kgrams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    h = F.conv(F.substring(F.md5(F.col("kgram")), 1, 8), 16, 10).cast("bigint")
    return (
        docs.select(F.col(id_col), F.posexplode(kgrams).alias("pos0", "kgram"))
        .select(
            id_col,
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            h.alias("h"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct winnowed fingerprints per document:
    ``(id, fp_hash, fp_pos)``.

    Every window of ``w`` consecutive k-gram hashes contributes its
    minimum (rightmost on ties); the distinct union of those picks is
    the fingerprint set. Documents shorter than ``w + k - 1`` words
    have no full window and emit nothing (cf. Schleimer et al. §4 —
    guarantees start at that length).

    One window pass: the rightmost-min is ``min(h * 2^21 + (2^21-1 -
    pos))`` over the w-row frame — lexicographically (h asc, pos desc)
    — then unpacked. Only full windows (pos ≤ n_kgrams - w + 1) count
    as window starts."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    kg = kgram_hashes(docs, k, text_col, id_col)
    # positions beyond the pack cap would make the offset negative and
    # silently corrupt the min selection — fail loudly instead
    # (assert_true returns NULL on success, so the when() is a no-op)
    guard = F.assert_true(
        F.col("pos") < _POS_CAP,
        F.lit(
            f"winnow: document exceeds {_POS_CAP - 1} k-grams; the packed "
            "selection key would corrupt — split longer documents before "
            "fingerprinting"
        ),
    )
    key = F.when(
        guard.isNull(),
        F.col("h") * _POS_CAP + (F.lit(_POS_CAP - 1) - F.col("pos")),
    )
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy(id_col)
    return (
        kg.withColumn("_key", F.min(key).over(frame))
        .withColumn("_n", F.count(F.lit(1)).over(per_doc))
        .filter(F.col("pos") <= F.col("_n") - w + 1)
        .select(
            id_col,
            F.expr(f"_key div {_POS_CAP}").alias("fp_hash"),
            (F.lit(_POS_CAP - 1) - F.col("_key") % _POS_CAP)
            .cast("bigint")
            .alias("fp_pos"),
        )
        .distinct()
    )


def winnow_dup_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_overlap: float = 0.3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints — passage-level
    duplicate / contamination candidates.

    Returns ``(doc_a, doc_b, n_shared, overlap)`` with
    ``overlap = n_shared / min(|fp_a|, |fp_b|)`` (containment-style, so
    a short doc fully embedded in a long one scores 1.0), filtered to
    ``overlap >= min_overlap``, ``doc_a < doc_b``.

    Scale shape: distinct (doc, hash) fingerprint sets self-join on the
    HASH (equi-join), after dropping fingerprints present in more than
    ``max_df`` documents (boilerplate; they would otherwise create
    quadratic candidate blow-up exactly like hot LSH bands)."""
    fps = winnow_fingerprints(docs, k, w, text_col, id_col).select(
        F.col(id_col).alias("doc"), "fp_hash"
    ).distinct()
    kept = _df_capped(fps, max_df)
    return _pairs_from_kept(kept, min_overlap)


def _df_capped(fps: DataFrame, max_df: int) -> DataFrame:
    """Drop fingerprints present in more than ``max_df`` docs.
    ``fps`` must be distinct (doc, fp_hash) rows."""
    rare = (
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp_hash")
    )
    return fps.join(rare, "fp_hash", "left_semi")


def _pairs_from_kept(kept: DataFrame, min_overlap: float) -> DataFrame:
    """Overlap-scored pairs from a df-capped distinct (doc, fp_hash)
    table — shared so winnow_shared_spans reuses the SAME fingerprint
    lineage instead of recomputing the corpus k-gram/window pass."""
    sizes = kept.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp"))
    a = kept.select(F.col("doc").alias("doc_a"), "fp_hash")
    b = kept.select(F.col("doc").alias("doc_b"), "fp_hash")
    shared = (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("_na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("_nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least("_na", "_nb").cast("double")
            ).alias("overlap"),
        )
        .filter(F.col("overlap") >= min_overlap)
    )


def winnow_shared_spans(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_overlap: float = 0.3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contamination forensics: for every winnow dup pair, the token
    span of the shared material in EACH document — where the copied
    passage sits, not just that it exists.

    For each pair above ``min_overlap``, join back to the positioned
    fingerprints shared by both docs and take min/max positions per
    side; spans are reported in 1-based token coordinates
    (``end = max k-gram position + k - 1``). Conservative envelope: the
    span covers all shared fingerprints, so disjoint shared passages
    merge into one bounding span.

    Scale shape: the pair table (already overlap-filtered) equi-joins
    the fingerprint table twice on (doc, hash) — candidate-bounded,
    never corpus × corpus. The fingerprint table, df-cap, and pair
    scoring all derive from ONE winnow_fingerprints lineage (the
    corpus k-gram + window pass is the dominant cost; building the
    pair table from a second independent lineage would run it
    twice)."""
    fpsp = winnow_fingerprints(docs, k, w, text_col, id_col).select(
        F.col(id_col).alias("doc"), "fp_hash", "fp_pos"
    )
    kept_flat = _df_capped(fpsp.select("doc", "fp_hash").distinct(), max_df)
    fps = fpsp.join(
        kept_flat.select("fp_hash").distinct(), "fp_hash", "left_semi"
    )
    pairs = _pairs_from_kept(kept_flat, min_overlap).select(
        "doc_a", "doc_b", "n_shared", "overlap"
    )
    fa = fps.select(
        F.col("doc").alias("doc_a"),
        "fp_hash",
        F.col("fp_pos").alias("pos_a"),
    )
    fb = fps.select(
        F.col("doc").alias("doc_b"),
        "fp_hash",
        F.col("fp_pos").alias("pos_b"),
    )
    shared = pairs.join(fa, "doc_a").join(fb, ["doc_b", "fp_hash"])
    return (
        shared.groupBy("doc_a", "doc_b", "n_shared", "overlap")
        .agg(
            F.min("pos_a").cast("bigint").alias("a_start"),
            (F.max("pos_a") + F.lit(k - 1)).cast("bigint").alias("a_end"),
            F.min("pos_b").cast("bigint").alias("b_start"),
            (F.max("pos_b") + F.lit(k - 1)).cast("bigint").alias("b_end"),
        )
    )
