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
