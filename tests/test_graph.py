from __future__ import annotations

import pytest

from distributed_mobility_data_pipeline_spark.operators import graph


def _py_pagerank(edge_list, iterations=3, scale=graph.FIXED_SCALE):
    """Reference implementation in pure Python ints (same fixed-point
    update rule), for bit-exact comparison."""
    nodes = sorted({n for e in edge_list for n in e})
    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    teleport = (3 * scale) // (20 * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        insum = {v: 0 for v in nodes}
        for s, d in edge_list:
            insum[d] += rank[s] // outdeg[s]
        rank = {v: teleport + (17 * insum[v]) // 20 for v in nodes}
    return rank


def test_pagerank_matches_reference_ints(spark):
    raw = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    edges = graph.symmetrize(spark.createDataFrame(raw, ["src", "dst"]))
    got = {
        r.node: r.rank_fp
        for r in graph.pagerank_fixed_point(edges, iterations=3).collect()
    }
    sym = raw + [(b, a) for a, b in raw]
    assert got == _py_pagerank(sym)


def test_pagerank_favors_high_degree(spark):
    # star graph: hub connected to 5 leaves
    raw = [("hub", f"leaf{i}") for i in range(5)]
    edges = graph.symmetrize(spark.createDataFrame(raw, ["src", "dst"]))
    ranks = {
        r.node: r.rank_fp
        for r in graph.pagerank_fixed_point(edges, iterations=3).collect()
    }
    for i in range(5):
        assert ranks["hub"] > ranks[f"leaf{i}"]


def test_pagerank_mass_approximately_conserved(spark):
    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = graph.symmetrize(spark.createDataFrame(raw, ["src", "dst"]))
    rows = graph.pagerank_fixed_point(edges, iterations=3).collect()
    total = sum(r.rank_fp for r in rows)
    # floor losses only: within n * iterations * (den) micro-units
    assert abs(total - graph.FIXED_SCALE) < 1000 * len(rows)
    assert all(r.rank_fp > 0 for r in rows)


def test_pagerank_validates_args(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        graph.pagerank_fixed_point(edges, iterations=0)
    with pytest.raises(ValueError):
        graph.pagerank_fixed_point(edges, damping_num=20, damping_den=20)
    with pytest.raises(ValueError):
        graph.pagerank_fixed_point(edges, checkpoint_every=0)


def test_pagerank_deep_iterations_checkpointed(spark):
    """12 iterations crossing several checkpoint boundaries stays
    bit-identical to the pure-Python reference (fixed-point arithmetic
    means checkpointing can't change a single bit), and to a run whose
    checkpoint interval never fires."""
    raw = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    edges = graph.symmetrize(spark.createDataFrame(raw, ["src", "dst"]))
    got = {
        r.node: r.rank_fp
        for r in graph.pagerank_fixed_point(
            edges, iterations=12, checkpoint_every=4
        ).collect()
    }
    sym = raw + [(b, a) for a, b in raw]
    assert got == _py_pagerank(sym, iterations=12)
    no_ckpt = {
        r.node: r.rank_fp
        for r in graph.pagerank_fixed_point(
            edges, iterations=12, checkpoint_every=100
        ).collect()
    }
    assert got == no_ckpt
