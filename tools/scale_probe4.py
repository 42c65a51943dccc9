"""Round-6 scale probes.

Two measurements the round-5 decade table doesn't carry:

1. Deep-iteration PageRank (10 rounds) with and without the bounded-
   lineage localCheckpoint cycle, at sf0.1 and on the 10x probe slice
   (reuses tools/scale_probe3.py's synthesized tables). Demonstrates
   that checkpointing keeps deep iteration from paying lineage-growth
   overhead, and that the per-iteration cost stays flat.

2. rolling_distinct_exact vs rolling_distinct_sketch side by side at
   both decades — the 100 TB argument made measurable: the exact twin
   re-touches the raw (day x user) activity table per window via a
   range join, so its cost grows with data; the sketch path aggregates
   raw data ONCE into day-level sketches and every window union is
   sketch-table-sized, so its incremental cost is flat in raw volume.

3. Winnowing at 10x documents: replicas carry doc_id-salted tokens so
   cross-replica fingerprint overlap is zero (the honest regime —
   unsalted replicas would manufacture quadratic dup pairs). Expected:
   near-linear for the map+window fingerprint pass AND for the
   pair join (pairs only form within replicas).

Usage: python tools/scale_probe4.py  (regenerates the 10x slice only
if missing)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.operators import graph as graph_ops
from distributed_mobility_data_pipeline_spark.session import get_spark
from tools.scale_probe3 import PROBE, SF01, generate


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _edges(spark, d):
    from __spark_entry__ import _t

    return graph_ops.symmetrize(
        _t(spark, d, "orders")
        .join(
            _t(spark, d, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def gen_docs(spark) -> None:
    reps = spark.range(10).withColumnRenamed("id", "r")
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    salted = F.when(F.col("r") == 0, F.col("text")).otherwise(
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_"), F.col("r").cast("string")),
            ),
        )
    )
    docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("r") * n).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        # recompute from the SALTED text — tokens grew by "_<r>", so the
        # copied source n_chars would understate length and skew any
        # quality/length-scored operator timed against the probe slice
        F.length(salted).cast("long").alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE, "documents.parquet")
    )


def main() -> None:
    spark = get_spark("scale_probe4")
    if not os.path.exists(os.path.join(PROBE, "events.parquet")):
        t0 = time.time()
        generate(spark)
        print(f"generated 10x probe slice in {time.time() - t0:.1f}s", flush=True)

    qs = entrymod.queries()

    print("== deep PageRank (10 iterations) ==", flush=True)
    rows = []
    for label, d in [("sf0.1", SF01), ("10x", PROBE)]:
        for ck_label, ck in [("ckpt@4", 4), ("no-ckpt", 100)]:
            e = _edges(spark, d)
            _noop(graph_ops.pagerank_fixed_point(e, 10, checkpoint_every=ck))
            t = _noop(graph_ops.pagerank_fixed_point(e, 10, checkpoint_every=ck))
            rows.append((label, ck_label, round(t, 2)))
            print(rows[-1], flush=True)
    print("| data | mode | wall (s) |")
    print("|---|---|---|")
    for label, ck_label, t in rows:
        print(f"| {label} | {ck_label} | {t} |")

    print("\n== rolling distinct: exact twin vs sketch path ==", flush=True)
    rows = []
    for name in ("agg_rolling_distinct_exact", "agg_rolling_distinct_sketch"):
        _noop(qs[name](spark, SF01))
        t_01 = _noop(qs[name](spark, SF01))
        t_1 = _noop(qs[name](spark, PROBE))
        rows.append(
            (name, round(t_01, 2), round(t_1, 2), round(t_1 / max(t_01, 1e-9), 1))
        )
        print(rows[-1], flush=True)
    print("| query | sf0.1 | 10x | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")

    print("\n== round-6 relational ops at 10x ==", flush=True)
    rows = []
    for name in (
        "agg_quantile_rollup_hist",
        "agg_rolling_quantile_hist",
        "scale_row_diff",
        "agg_contribution_analysis",
        "quality_k_anonymity",
    ):
        _noop(qs[name](spark, SF01))
        t_01 = _noop(qs[name](spark, SF01))
        t_1 = _noop(qs[name](spark, PROBE))
        rows.append(
            (name, round(t_01, 2), round(t_1, 2), round(t_1 / max(t_01, 1e-9), 1))
        )
        print(rows[-1], flush=True)
    print("| query | sf0.1 | 10x | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")

    print("\n== winnowing at 10x documents ==", flush=True)
    if not os.path.exists(os.path.join(PROBE, "documents.parquet")):
        gen_docs(spark)
    rows = []
    for name in ("text_winnow_fingerprints", "dedup_docs_winnow"):
        _noop(qs[name](spark, SF01))
        t_01 = _noop(qs[name](spark, SF01))
        t_1 = _noop(qs[name](spark, PROBE))
        rows.append(
            (name, round(t_01, 2), round(t_1, 2), round(t_1 / max(t_01, 1e-9), 1))
        )
        print(rows[-1], flush=True)
    print("| query | sf0.1 | 10x | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")
    spark.stop()


if __name__ == "__main__":
    main()
