"""Graph algorithms on DataFrames (Pregel-style iteration, no driver
loops over data).

Companion to the pointer-doubling connected components in
operators/dedup_llm.py — this adds fixed-iteration PageRank over an
edge table.

Determinism trick: ranks are kept in FIXED-POINT integer micro-units
(scale = 1e12) and every update uses integer ``div`` — no floating
point anywhere in the iteration. Summation order therefore cannot
change the result, so a DuckDB oracle computes the bit-identical
answer (double-based PageRank would drift in the last bits per
partitioning). The damping factor is a rational (17/20 = 0.85).

Scale shape per iteration: one shuffle to join ranks onto edges (both
sides hash-partitioned on the node key) and one groupBy(dst) with
map-side partial sums. Lineage is BOUNDED: the node-sized rank table is
localCheckpoint-ed every ``checkpoint_every`` iterations (eager; a
superseded checkpoint's blocks are released asynchronously by the
ContextCleaner once dereferenced), so plan/closure size stays constant
at any iteration depth — the same persist-cycle discipline as the
iterative BPE learner (operators/bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FIXED_SCALE = 1_000_000_000_000  # 1e12 micro-rank units


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected → directed: emit each edge in both directions."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev)


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = FIXED_SCALE,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge table (src, dst),
    in integer fixed-point (see module docstring).

    Update rule (all integer ops):
        contrib(v)  = rank(v) div outdeg(v)
        rank'(u)    = (den-num)*scale div (den*N)
                      + num * sum_in(contrib) div den

    Returns (node, rank_fp, rank) — ``rank_fp`` is the exact integer
    micro-rank, ``rank`` = rank_fp / scale as a double for reading.

    ``N`` (node count) is the one driver-side scalar (a count). The
    rank table is eagerly localCheckpoint-ed every ``checkpoint_every``
    iterations so lineage (and plan-analysis cost) stays bounded at
    deep iteration counts. Superseded checkpoints are NOT freed
    synchronously — ``Dataset.unpersist`` only uncaches CacheManager
    entries, never a localCheckpoint's RDD blocks — they are released
    by the ContextCleaner once this loop drops the last reference
    (node-sized blocks, eventual cleanup; bounded in practice by GC
    cadence). localCheckpoint trades executor-loss fault tolerance for
    not needing a checkpoint dir, the right trade for a rank table
    that is cheap to recompute from the last checkpoint.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must be a proper fraction")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # Loop-invariant tables are built once and persisted (memory-and-
    # disk, the iterative-algorithm standard). Shuffle-avoidance moves
    # (tightened in the r19 optimization round — guide §2.4, remove
    # shuffles outright): the out-degree rides a COUNT window on the
    # same src partitioning the iteration join needs anyway, so one
    # exchange replaces the old groupBy-shuffle + join-back +
    # repartition chain (outdeg values identical — a full-partition
    # count window equals the joined-back groupBy count); and ``nodes``
    # derives from the PERSISTED edges_deg, so the upstream edge build
    # (a fact-sized join in the bench query) is computed once, not once
    # per consumer. Each round's rank join then only shuffles the rank
    # table (node-sized) — the edge table (the big side) never moves
    # again.
    edges = edges.select("src", "dst")
    edges_deg = (
        edges.repartition("src")
        .withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .persist()
    )
    nodes = (
        edges_deg.select(F.col("src").alias("node"))
        .union(edges_deg.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank on an empty edge table")
    teleport = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = nodes.withColumn("rank_fp", F.lit(scale // n).cast("bigint"))
    # Per-iteration rank update is ONE exchange (r19, guide §2.4): the
    # old nodes LEFT JOIN insums added a second exchange plus two sort
    # passes per iteration just to give in-degree-0 nodes their
    # coalesce(insum, 0). Seeding the aggregation with a zero-contrib
    # row per node folds that into the same groupBy — integer sum with
    # an extra 0 term is exactly coalesce(sum, 0), and every node
    # appears in the seed, so the rank-table row set is identical.
    zero_seed = nodes.select(
        "node", F.lit(0).cast("bigint").alias("contrib")
    )
    for i in range(iterations):
        if i == 0:
            # iteration 1's rank table is the CONSTANT scale div n for
            # every node — inline it instead of joining it on (r19):
            # one fewer join (and edge-table sort) per run, same values.
            contribs = edges_deg.select(
                F.col("dst").alias("node"),
                F.expr(f"CAST({scale // n} AS BIGINT) div outdeg").alias(
                    "contrib"
                ),
            )
        else:
            # SHUFFLE_HASH build side = the node-sized rank table: a
            # sort-merge join would re-sort the (fact-sized) edge table
            # every iteration; hashing the small side is the classic
            # pagerank join shape at any scale (guide §3.1).
            contribs = (
                edges_deg.join(
                    ranks.hint("shuffle_hash"),
                    edges_deg["src"] == ranks["node"],
                )
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank_fp div outdeg").alias("contrib"),
                )
            )
        insums = contribs.unionByName(zero_seed).groupBy("node").agg(
            F.sum("contrib").alias("insum")
        )
        ranks = insums.select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({damping_num} * insum) div {damping_den}")
            )
            .cast("bigint")
            .alias("rank_fp"),
        )
        # bound lineage: cut the plan every k rounds (skip after the
        # final round — the caller's one-shot read doesn't need a cut).
        # Dropping the old `ranks` reference here is what lets the
        # ContextCleaner release the superseded checkpoint's blocks.
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp") / F.lit(float(scale))).alias("rank"),
    )
