"""Distributed BPE (byte-pair-encoding) merge learning.

The text family already counts tokens with a FIXED BPE-ish regex
(text.py token_count_bpe); this module LEARNS the merge table from the
corpus — the tokenizer-training step of an LLM data pipeline.

Classic word-level BPE (Sennrich et al. 2016, public domain algorithm):

1. corpus → (word, count) — ONE distributed aggregation; afterwards
   every iteration runs over the vocabulary table, which is orders of
   magnitude smaller than the corpus (the standard trick that makes
   BPE training tractable).
2. each word starts as a character array with an end-of-word marker.
3. N times: count adjacent symbol pairs weighted by word count, take
   the most frequent pair (ties broken lexicographically → fully
   deterministic), merge it everywhere.

Spark mapping: pair counting is slice+zip_with+explode+groupBy (all
codegen); the argmax is a TakeOrderedAndProject over pair counts; the
merge rewrite is a pure ``aggregate`` fold over each word's symbol
array (greedy left-to-right, exactly like the reference algorithm).
One single-row collect per iteration (the learned pair) — that scalar
drives the next round, the vocab table itself never leaves executors;
it is re-persisted per round and the previous round unpersisted.

Cross-engine checked two ways: tests/test_bpe.py pins the merge table
against a pure-Python reference on the same corpus, and the driver
oracle unrolls the fixed n_merges into per-step DuckDB CTEs where the
greedy fold becomes a single global string replace
(__spark_entry__._bpe_learn_oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word marker (SentencePiece-style block char)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count): lower/trim/whitespace-split, the same
    normalization as text.py's token ops."""
    words = F.explode(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " "), " ")
    ).alias("word")
    return (
        docs.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: Column) -> Column:
    """Word → character array + end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_step(acc: Column, x: Column, a: str, b: str) -> Column:
    merged_last = (
        (F.size(acc) > 0)
        & (F.element_at(acc, -1) == F.lit(a))
        & (x == F.lit(b))
    )
    return F.when(
        merged_last,
        F.concat(
            F.slice(acc, F.lit(1), F.size(acc) - 1),
            F.array(F.lit(a + b)),
        ),
    ).otherwise(F.concat(acc, F.array(x)))


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b in a symbol
    array — a pure fold, no Python in the loop."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: _merge_step(acc, x, a, b),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.explode(
        F.zip_with(
            F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1),
            F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
            lambda x, y: F.struct(x.alias("left"), y.alias("right")),
        )
    ).alias("pair")
    return (
        vocab.filter(F.size("syms") > 1)
        .select("count", pairs)
        .groupBy("pair.left", "pair.right")
        .agg(F.sum("count").alias("pair_count"))
    )


def learn_bpe_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns (step, left, right, merged, pair_count) — the merge table
    in learned order. Stops early if no pair is left to merge.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = word_counts(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "count"
    )
    vocab = vocab.persist()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
            merges.append((step, a, b, a + b, int(cnt)))
            nxt = vocab.select(
                apply_merge(F.col("syms"), a, b).alias("syms"), "count"
            ).persist()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )


def segment_vocabulary(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary: returns
    (word, count, syms, n_tokens) — the word → subword segmentation
    used to encode the corpus (broadcast-join it onto documents)."""
    vocab = word_counts(docs, text_col).select(
        "word", "count", _initial_symbols(F.col("word")).alias("syms")
    )
    for a, b in merges:
        vocab = vocab.withColumn("syms", apply_merge(F.col("syms"), a, b))
    return vocab.withColumn("n_tokens", F.size("syms"))


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document with a learned merge table — the
    tokenizer APPLY step that follows :func:`learn_bpe_merges` in an
    LLM data pipeline (per-doc BPE token counts drive packing budgets
    and mixture weights).

    The expensive fold runs once per DISTINCT WORD (the segmented
    vocabulary), never per occurrence — the corpus word stream is then
    a broadcast equi-join against that vocabulary (the same
    distinct-first trick as the fuzzy-linkage DP, linkage.py). Returns
    one row per document: ``doc_id, n_words, n_bpe_tokens,
    avg_tokens_per_word``.

    Scale shape (100 TB): one explode+groupBy over the corpus for the
    word stream, vocabulary fold over the (distinct-word)-sized table,
    broadcast join back (vocabularies are ~10^5-10^6 rows — droppable
    to a shuffle join if a corpus breaks that), one final groupBy(doc).
    """
    seg = segment_vocabulary(docs, merges, text_col).select(
        "word", "n_tokens"
    )
    words = F.explode(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " "),
            " ",
        )
    ).alias("word")
    occurrences = (
        docs.select(F.col(id_col), words)
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return (
        occurrences.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_tokens"))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
        .withColumn(
            "avg_tokens_per_word",
            F.col("n_bpe_tokens").cast("double") / F.col("n_words"),
        )
    )
