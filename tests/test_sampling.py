"""Cluster-safe (leakage-free) splitting: near-dup pairs must never
straddle train/test. (Hash-split/mixing tests live in test_llm_ops.py.)"""

from __future__ import annotations


def test_cluster_safe_split_never_straddles_pairs(spark):
    from distributed_mobility_data_pipeline_spark.operators import sampling

    # 3 chains of near-dups + singletons; pairs define the clusters
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7)],
        "doc_a long, doc_b long",
    )
    out = sampling.cluster_safe_split(docs, pairs, 0.5).collect()
    split_of = {r.doc_id: r.split for r in out}
    cluster_of = {r.doc_id: r.cluster_id for r in out}
    assert len(out) == 12
    for a, b in [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7)]:
        assert split_of[a] == split_of[b], (a, b)
        assert cluster_of[a] == cluster_of[b]
    # cluster ids are the component minimum
    assert cluster_of[2] == 0 and cluster_of[7] == 5
    # singletons keep their own id
    assert cluster_of[11] == 11
    with __import__("pytest").raises(ValueError):
        sampling.cluster_safe_split(docs, pairs, 1.5)
