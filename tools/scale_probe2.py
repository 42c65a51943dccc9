"""Second scale-decade probe (VERDICT r03 item 8): synthesize an
sf10-equivalent corpus (100x sf0.1: ~500k documents / 200k embeddings)
and re-time the two data-bound north-star queries so SCALE_NOTES.md has
a two-point slope (sf0.1 -> sf1 -> sf10), not a single ratio.

Reuses tools/scale_probe.py's distributed generator shape: replica 0 =
original, replica 1 = near-dup (last token dropped), replicas 2..99 =
token-wise md5 rewrites with shingle sets disjoint from the original —
duplicate DENSITY stays constant as the corpus grows, which is the
realistic regime (a growing corpus does not grow its dup fraction
quadratically).

Output parquet goes under /tmp (scratch). Usage:
python tools/scale_probe2.py [--regen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
PROBE1 = "/tmp/spark_graft_sf1_probe"    # 10x (from tools/scale_probe.py)
PROBE2 = "/tmp/spark_graft_sf10_probe"   # 100x
N_REP = 100

# the two queries whose sf1 ratio was data-bound (4.2x / 4.5x at 10x),
# plus exact dedup as the cheap control
QUERIES = [
    "dedup_docs_exact",
    "dedup_docs_minhash_lsh",
    "dedup_docs_clusters",
    # round-5 documents-table additions
    "mm_sample_frames",
    "mm_resize_meta",
    "text_bpe_encode",
]


def generate(spark) -> None:
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    reps = spark.range(N_REP).withColumnRenamed("id", "r")
    text = (
        F.when(F.col("r") == 0, F.col("text"))
        .when(
            F.col("r") == 1,
            F.expr("substring(text, 1, length(text) - instr(reverse(text), ' '))"),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.substring(
                        F.md5(F.concat_ws("|", t, F.col("r").cast("string"))), 1, 8
                    ),
                ),
            )
        )
    )
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).alias("n_chars"),
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE2, "documents.parquet")
    )


def _time(qs, name, spark, d) -> float:
    t0 = time.time()
    qs[name](spark, d).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("scale_probe2")
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(PROBE2, "documents.parquet")
    ):
        t0 = time.time()
        generate(spark)
        print(f"generated sf10 probe data in {time.time() - t0:.1f}s", flush=True)
    if not os.path.exists(os.path.join(PROBE1, "documents.parquet")):
        print("sf1 probe missing - run tools/scale_probe.py first", flush=True)
        return
    for d, label in ((PROBE1, "sf1"), (PROBE2, "sf10")):
        n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        print(f"{label} corpus: {n} docs", flush=True)

    qs = entrymod.queries()
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    rows = []
    for name in [q for q in QUERIES if not only or q in only]:
        _time(qs, name, spark, SF01)            # warm the shape
        t_01 = _time(qs, name, spark, SF01)
        t_1 = _time(qs, name, spark, PROBE1)
        t_10 = _time(qs, name, spark, PROBE2)
        rows.append(
            (name, round(t_01, 2), round(t_1, 2), round(t_10, 2),
             round(t_1 / max(t_01, 1e-9), 1), round(t_10 / max(t_1, 1e-9), 1))
        )
        print(rows[-1], flush=True)
    spark.stop()

    print()
    print("| query | sf0.1 | sf1 (10x) | sf10 (100x) | 10x ratio | next-decade ratio |")
    print("|---|---|---|---|---|---|")
    for name, a, b, c, r1, r2 in rows:
        print(f"| {name} | {a} | {b} | {c} | {r1}x | {r2}x |")


if __name__ == "__main__":
    main()
