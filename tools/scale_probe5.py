"""Round-7 two-decade probe: the core relational path at 10x AND 100x.

The 10x probes (scale_probe3/4) cover every operator family; this tool
pushes the HEADLINE relational queries one more decade so SCALE_NOTES.md
carries a two-decade curve for the paths a 100 TB run leans on hardest:

- star_trips_fact  — the 5-way star assembly (and the round-7 change:
  orders' join strategy is planner-chosen, not force-broadcast);
- agg_pricing_summary — the full-scan group-by (TPC-H Q1 shape);
- dedup_keep_latest — the windowed keep-latest dedup (WindowGroupLimit).

Synthesis rule (different from scale_probe3, deliberately): FACTS
replicate with offset primary keys, FOREIGN KEYS STAY UNCHANGED — the
honest big-data regime where facts grow ~linearly while the dimension
universe is near-constant. Consequences the probe should surface:
- star: customer/part/supplier broadcasts stay constant-size; the
  lineitem-orders join grows on BOTH sides (orders is fact-sized);
- dedup: each user's event count grows 10x/100x (dup-heavy regime) —
  per-key top-1 must not materialize a per-key sort of everything.

Usage: python tools/scale_probe5.py [--regen] [10|100 ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from distributed_mobility_data_pipeline_spark.session import get_spark
from distributed_mobility_data_pipeline_spark.sources.readers import read_events

SF01 = "/root/testdata/sf0.1"
PROBE_ROOT = "/tmp/spark_graft_r7_probe"

QUERIES = ["star_trips_fact", "agg_pricing_summary", "dedup_keep_latest"]

# documents-table family (run with --docs): replicas carry doc_id-salted
# tokens (same honest regime as scale_probe4 — cross-replica fingerprint
# overlap is zero, so dup-pair volume grows with dup DENSITY, not
# corpus² — unsalted replicas would manufacture quadratic pairs)
DOC_QUERIES = ["text_doc_stats", "dedup_docs_minhash_lsh", "dedup_docs_winnow"]

# facts (events/orders/lineitem) are replicated explicitly in
# generate(); these small dims are copied verbatim
DIMS = ("customer", "supplier", "part", "nation", "region")


def probe_dir(n_rep: int) -> str:
    return f"{PROBE_ROOT}{n_rep}x"


def generate(spark, n_rep: int) -> None:
    out = probe_dir(n_rep)
    reps = spark.range(n_rep).withColumnRenamed("id", "r")

    ev = read_events(spark, os.path.join(SF01, "events.parquet"))
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    # event_id offsets (stays a key); user_id/ts unchanged -> every user
    # carries n_rep x the events, the dup-heavy keep-latest regime
    ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("r") * n_events).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    ).repartition(max(8, n_rep)).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    orders = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    o_cols = [c for c in orders.columns if c != "o_orderkey"]
    orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("r") * n_ord).alias("o_orderkey"),
        *o_cols,
    ).repartition(max(8, n_rep)).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )

    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    l_cols = [c for c in li.columns if c != "l_orderkey"]
    li.crossJoin(reps).select(
        (F.col("l_orderkey") + F.col("r") * n_ord).alias("l_orderkey"),
        *l_cols,
    ).repartition(max(16, n_rep)).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )

    for t in DIMS:
        src = os.path.join(SF01, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)


def generate_docs(spark, n_rep: int) -> None:
    out = probe_dir(n_rep)
    reps = spark.range(n_rep).withColumnRenamed("id", "r")
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
        F.length(salted).cast("long").alias("n_chars"),
    ).repartition(max(16, n_rep)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )


def _time(qs, name, spark, d) -> float:
    t0 = time.time()
    qs[name](spark, d).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    decades = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10, 100]
    docs_mode = "--docs" in sys.argv
    spark = get_spark("scale_probe5")
    for n in decades:
        marker = "documents.parquet" if docs_mode else "lineitem.parquet"
        if "--regen" in sys.argv or not os.path.exists(
            os.path.join(probe_dir(n), marker)
        ):
            t0 = time.time()
            (generate_docs if docs_mode else generate)(spark, n)
            print(f"generated {n}x slice in {time.time() - t0:.1f}s", flush=True)

    qs = entrymod.queries()
    rows = []
    for name in DOC_QUERIES if docs_mode else QUERIES:
        _time(qs, name, spark, SF01)  # warm the shape
        t = {1: _time(qs, name, spark, SF01)}
        for n in decades:
            t[n] = _time(qs, name, spark, probe_dir(n))
        rows.append((name, t))
        print(name, {k: round(v, 2) for k, v in t.items()}, flush=True)
    spark.stop()

    print()
    header = "| query | sf0.1 | " + " | ".join(
        f"{n}x | ratio" for n in decades
    ) + " |"
    print(header)
    print("|---" * (2 + 2 * len(decades)) + "|")
    for name, t in rows:
        cells = [f"{t[1]:.2f}"]
        for n in decades:
            cells += [f"{t[n]:.2f}", f"{t[n] / max(t[1], 1e-9):.1f}x"]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
