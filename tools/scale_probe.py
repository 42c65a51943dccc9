"""Scale-headroom probe (VERDICT r01 item 8): synthesize an sf1-equivalent
documents/embeddings slice (10x sf0.1) and re-time the north-star dedup +
ANN queries on it, extending the SCALE_NOTES.md curve one decade.

Generation is fully distributed (crossJoin with a replica index, column
algebra mutations — no driver loops, no RNG): replica 0 keeps the
original text, replica 1 is a near-duplicate (last token dropped, like
dedup_llm.with_mutated_copies), replicas 2-9 rewrite EVERY token to a
per-(token, replica) md5 prefix so their shingle sets are disjoint from
the original's — genuinely distinct documents (a prepended-salt variant
left ~90% shingle overlap and made every doc a 10-way near-dup family,
which quadratically inflates true pairs; realistic corpora are mostly
distinct). Embeddings get a small deterministic per-element rotation so
replicas are near but not equal.

Output parquet goes under /tmp (scratch); nothing outside the repo is
modified. Usage: python tools/scale_probe.py [--regen]
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
PROBE = "/tmp/spark_graft_sf1_probe"
N_REP = 10

QUERIES = [
    "dedup_docs_exact",
    "dedup_docs_minhash_sig",
    "dedup_docs_minhash_lsh",
    "dedup_docs_clusters",
    "sim_cosine_topk",
    "sim_lsh_bucketed_ann",
    "sim_ivf_ann",
    "text_quality_score",
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
            # token-wise rewrite: shingle sets disjoint from the original
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
        os.path.join(PROBE, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    # deterministic tiny rotation: add (hash(vec_id, r, i) % 1000 - 500) * 1e-5
    perturbed = F.transform(
        "embedding",
        lambda x, i: (
            x
            + (
                F.pmod(F.hash(F.col("vec_id"), F.col("r"), i), F.lit(1000)) - 500
            ).cast("float")
            * F.lit(1e-5).cast("float")
        ).cast("float"),
    )
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
        F.when(F.col("r") == 0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(PROBE, "embeddings.parquet")
    )


def main() -> None:
    spark = get_spark("scale_probe")
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(PROBE, "documents.parquet")
    ):
        t0 = time.time()
        generate(spark)
        print(f"generated probe data in {time.time() - t0:.1f}s", flush=True)
    nd = spark.read.parquet(os.path.join(PROBE, "documents.parquet")).count()
    ne = spark.read.parquet(os.path.join(PROBE, "embeddings.parquet")).count()
    print(f"probe corpus: {nd} docs, {ne} embeddings", flush=True)

    qs = entrymod.queries()
    rows: list[tuple[str, float, float, float]] = []
    for name in QUERIES:
        # warm the shape at sf0.1 first, then time sf0.1 and the probe
        qs[name](spark, SF01).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        qs[name](spark, SF01).write.format("noop").mode("overwrite").save()
        t_small = time.time() - t0
        t0 = time.time()
        qs[name](spark, PROBE).write.format("noop").mode("overwrite").save()
        t_big = time.time() - t0
        rows.append((name, round(t_small, 2), round(t_big, 2),
                     round(t_big / max(t_small, 1e-9), 1)))
        print(rows[-1], flush=True)
    spark.stop()

    print()
    print("| query | sf0.1 | sf1-probe (10x docs/emb) | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        print(f"| {name} | {a} | {b} | {r}x |")


if __name__ == "__main__":
    main()
