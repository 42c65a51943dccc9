from __future__ import annotations

import re
from collections import Counter

import pytest

from distributed_mobility_data_pipeline_spark.operators import bpe


def _py_bpe(texts, n_merges):
    """Pure-Python reference BPE (same normalization + tie-breaks)."""
    words = Counter()
    for t in texts:
        for w in re.sub(" +", " ", t.strip().lower()).split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + [bpe.EOW]): c for w, c in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        # max count, ties broken lexicographically on (left, right)
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TOY = [
    "low low low lower lowest",
    "new newer newest low",
    "wide wider widest",
]


def test_learn_matches_python_reference_on_toy(spark):
    docs = spark.createDataFrame([(t,) for t in TOY], ["text"])
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe.learn_bpe_merges(docs, 8).orderBy("step").collect()
    ]
    assert got == _py_bpe(TOY, 8)


def test_learn_matches_python_reference_on_corpus(spark, sf_dir):
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe.learn_bpe_merges(docs, 5).orderBy("step").collect()
    ]
    assert got == _py_bpe(texts, 5)


def test_segmentation_reconstructs_words(spark):
    docs = spark.createDataFrame([(t,) for t in TOY], ["text"])
    merges = [
        (r.left, r.right)
        for r in bpe.learn_bpe_merges(docs, 6).orderBy("step").collect()
    ]
    seg = bpe.segment_vocabulary(docs, merges).collect()
    for r in seg:
        assert "".join(r.syms) == r.word + bpe.EOW  # lossless segmentation
        assert r.n_tokens == len(r.syms)


def test_learn_rejects_bad_args(spark):
    docs = spark.createDataFrame([("a",)], ["text"])
    with pytest.raises(ValueError):
        bpe.learn_bpe_merges(docs, 0)


def test_encode_documents_counts(spark):
    from distributed_mobility_data_pipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "the table the"), (2, "tab")], "doc_id long, text string"
    )
    merges = [("t", "h"), ("th", "e"), ("e", bpe.EOW)]
    out = {r.doc_id: r for r in bpe.encode_documents(docs, merges).collect()}
    # 'the' -> [the, ▁] = 2 toks; 'table' -> [t,a,b,l,e▁] = 5;
    # 'tab' -> [t,a,b,▁] = 4
    assert out[1].n_words == 3 and out[1].n_bpe_tokens == 2 + 5 + 2
    assert out[2].n_words == 1 and out[2].n_bpe_tokens == 4
    assert out[1].avg_tokens_per_word == pytest.approx(9 / 3)


def test_greedy_fold_matches_reference_implementation(spark):
    """Property: the Spark aggregate-fold segmentation equals a plain
    Python greedy left-to-right merge on adversarial repeat patterns
    (the cases where replace-style rewrites usually diverge)."""
    from distributed_mobility_data_pipeline_spark.operators import bpe
    from pyspark.sql import functions as F

    def fold(word, merges):
        syms = list(word) + [bpe.EOW]
        for a, b in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return syms

    words = ["aaaa", "aaa", "abab", "aabb", "baaab", "abba", "bbbb"]
    merges = [("a", "a"), ("a", "b"), ("aa", "aa"), ("ab", bpe.EOW)]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    col = bpe._initial_symbols(F.col("word"))
    for a, b in merges:
        col = bpe.apply_merge(col, a, b)
    got = {r.word: list(r.syms) for r in df.select("word", col.alias("syms")).collect()}
    for w in words:
        assert got[w] == fold(w, merges), w
