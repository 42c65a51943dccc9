"""Round-8 two-decade probe for the ANN/similarity family.

The dedup/documents, relational, and behavioral/streaming families all
carry 100x curves in SCALE_NOTES.md; the ANN queries were only ever
timed one decade up (tools/scale_probe.py, 10x embeddings). This tool
gives them the second decade: 2,000 -> 20,000 -> 200,000 vectors with
the same deterministic replication recipe scale_probe.py used (replica
0 = original, replicas 1..n-1 = tiny per-element hash rotation, so
replicas are near but not equal and every query id still exists).

What the decade should surface per query:

- sim_cosine_topk / sim_pq_ann: broadcast-probes x corpus scans —
  expected ~linear in corpus size (the documented brute-force floor;
  PQ's scan carries m small ints instead of the float vector).
- sim_lsh_bucketed_ann: bucket equi-join — cost tracks per-bucket
  candidate counts, which grow linearly at constant bucket geometry.
- sim_ivf_ann / sim_ivfpq_ann_fixed: cell-pruned scans — the probed
  fraction (n_probe / n_clusters) of the corpus, so both should stay
  well under the brute-force slope.
- offline quantizer fits (fit_ivf_quantizer / fit_pq_codebooks) are
  timed SEPARATELY: they are the train-once path the caches keep off
  the per-query cost, and their own scaling is worth one line each.

Output parquet goes under /tmp (scratch). Usage:
  python tools/scale_probe7.py [--regen] [10|100 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.session import get_spark
from distributed_mobility_data_pipeline_spark.operators import similarity as sim_ops

SF01 = "/root/testdata/sf0.1"

QUERIES = [
    "sim_cosine_topk",
    "sim_lsh_bucketed_ann",
    "sim_pq_ann",
    "sim_ivf_ann",
    "sim_ivfpq_ann_fixed",
]


def probe_dir(n_rep: int) -> str:
    return f"/tmp/spark_graft_emb_probe{n_rep}x"


def generate(spark, n_rep: int) -> None:
    """Same distributed replication as tools/scale_probe.py: replica 0
    keeps the original vector (query ids 0-4 survive), every other
    replica gets a deterministic per-element hash perturbation."""
    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    reps = spark.range(n_rep).withColumnRenamed("id", "r")
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
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
        F.when(F.col("r") == 0, F.col("embedding"))
        .otherwise(perturbed)
        .alias("embedding"),
        "label",
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(probe_dir(n_rep), "embeddings.parquet")
    )


def _time(qs, name, spark, d):
    """Time one query end-to-end; None on failure. One failing query
    (e.g. OOM on the 100x run) must not abort the probe and discard
    every timing already gathered — the same all-or-nothing mode
    bench._run_pass guards against (ADVICE r09 / VERDICT r03 #4)."""
    t0 = time.time()
    try:
        qs[name](spark, d).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001 — print partial table regardless
        print(f"{name} @ {d}: {type(exc).__name__}: {exc}"[:300], flush=True)
        return None
    return time.time() - t0


def main() -> None:
    decades = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10, 100]
    spark = get_spark("scale_probe7")
    for n in decades:
        if "--regen" in sys.argv or not os.path.exists(
            os.path.join(probe_dir(n), "embeddings.parquet")
        ):
            t0 = time.time()
            generate(spark, n)
            print(f"generated {n}x embeddings in {time.time() - t0:.1f}s", flush=True)

    # offline model fits, timed separately per scale (the train-once
    # path; per-query timings below hit the entrymod caches)
    for d in [SF01] + [probe_dir(n) for n in decades]:
        emb = entrymod._t(spark, d, "embeddings")
        t0 = time.time()
        entrymod._IVF_CENTROIDS[d] = sim_ops.fit_ivf_quantizer(emb)
        t_ivf = time.time() - t0
        t0 = time.time()
        entrymod._PQ_CODEBOOKS[d] = sim_ops.fit_pq_codebooks(emb)
        t_pq = time.time() - t0
        n_vec = emb.count()
        print(f"| fit_ivf_quantizer | {n_vec} vecs | {t_ivf:.1f}s |", flush=True)
        print(f"| fit_pq_codebooks | {n_vec} vecs | {t_pq:.1f}s |", flush=True)

    qs = entrymod.queries()
    rows = []
    for name in QUERIES:
        _time(qs, name, spark, SF01)  # warm the shape
        t = {1: _time(qs, name, spark, SF01)}
        for n in decades:
            t[n] = _time(qs, name, spark, probe_dir(n))
        rows.append((name, t))
        print(
            name,
            {k: (round(v, 2) if v is not None else None) for k, v in t.items()},
            flush=True,
        )
    spark.stop()

    print()
    header = "| query | sf0.1 | " + " | ".join(
        f"{n}x | ratio" for n in decades
    ) + " |"
    print(header)
    print("|---" * (2 + 2 * len(decades)) + "|")
    for name, t in rows:
        fmt = lambda v: f"{v:.2f}" if v is not None else "FAIL"  # noqa: E731
        cells = [fmt(t[1])]
        for n in decades:
            ok = t[n] is not None and t[1] is not None
            cells += [fmt(t[n]), f"{t[n] / max(t[1], 1e-9):.1f}x" if ok else "-"]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
