"""Measure wall-clock scaling of representative queries across the
three driver scale factors → SCALE_NOTES.md. Evidence that plans hold
as data grows (the 100 TB question asked at measurable scale)."""

from __future__ import annotations

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "agg_pricing_summary",
    "star_trips_fact",
    "agg_local_supplier_volume",
    "win_rolling_rows",
    "dedup_keep_latest",
    "dedup_docs_minhash_lsh",
    "sim_knn_label_agreement",
    "stream_sessionize",
]


def main() -> None:
    spark = get_spark("scale_curve")
    qs = entrymod.queries()
    # warm JVM + parquet machinery once
    qs[QUERIES[0]](spark, SFS[0]).write.format("noop").mode("overwrite").save()
    results: dict[str, list[float]] = {}
    for name in QUERIES:
        # warm this query shape once (codegen + broadcast machinery) so
        # the measured cells are data cost, not first-plan compilation
        qs[name](spark, SFS[0]).write.format("noop").mode("overwrite").save()
        times = []
        for sf in SFS:
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        results[name] = times
        print(name, times, flush=True)
    spark.stop()

    lines = [
        "# SCALE_NOTES — measured scaling across driver scale factors",
        "",
        "Wall-clock seconds on local[32] (single cold run per cell, shared JVM).",
        "lineitem rows: sf0.001=6k, sf0.01=60k, sf0.1=600k (100× data across the row).",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | 0.1/0.001 ratio |",
        "|---|---|---|---|---|",
    ]
    for name, t in results.items():
        ratio = round(t[2] / t[0], 1) if t[0] > 0 else float("nan")
        lines.append(f"| {name} | {t[0]} | {t[1]} | {t[2]} | {ratio}× |")
    lines += [
        "",
        "A ratio well below 100× across 100× more data means fixed overhead",
        "(JVM, planning, broadcast builds) still dominates at sf0.1 and the",
        "per-row cost curve is flat — the plan scales. Ratios approaching the",
        "data growth indicate the operator is already data-bound; those are",
        "the queries whose shuffle/partitioning strategy matters at 100 TB",
        "(documents/embeddings tables grow 10×, not 100×, across these sf dirs).",
    ]
    # NEVER truncate SCALE_NOTES.md: later rounds append probe sections
    # and hand-written findings there (pipeline_bench.py, round notes) —
    # a 'w' rewrite would silently destroy that evidence. Emit this
    # run's table as its own dated-by-round section at the END, anchored
    # at the repo root so CWD doesn't matter.
    notes = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_NOTES.md",
    )
    with open(notes, "a") as f:
        f.write("\n## scale_curve.py run\n\n" + "\n".join(lines) + "\n")
    print("appended to SCALE_NOTES.md")


if __name__ == "__main__":
    main()
