"""Round-8 two-decade probe: the behavioral/streaming family at 10x AND
100x, plus a winnow core-scaling measurement.

The relational (scale_probe5) and documents (scale_probe5 --docs)
families already carry 100x curves in SCALE_NOTES.md; this tool gives
the third headline family — sessionization, as-of joins, RFM, and
stickiness — the same second decade (VERDICT r07 #3).

Reuses scale_probe5's synthesis regime verbatim (imported, not copied):
facts replicate with offset primary keys, foreign keys and timestamps
stay unchanged. Consequences the probe should surface:

- stream_sessionize: each user carries n_rep x the events at identical
  timestamps — the heavy-user regime. Session COUNT stays flat while
  per-session event counts grow; the per-user session window must not
  blow up on wide users.
- join_asof_orders_events: both sides are fact-sized and grow together;
  per (custkey, ts) the event side carries n_rep duplicate candidates,
  stressing the latest-event-<=-ts selection inside the bucketed join.
- behavior_rfm_hist / behavior_stickiness: per-customer order counts
  and per-user active-day sets grow n_rep x while the entity universe
  is constant — group-by cardinality flat, group payload growing.

Winnow core-scaling (--winnow-cores N, VERDICT r07 #5): times
dedup_docs_winnow on the 10x documents slice under local[N]. The 100x
row in SCALE_NOTES is ~linear-in-corpus by design (every token is
touched once); running the same corpus at different core counts turns
"embarrassingly partition-parallel" from claim into measurement. Run in
SEPARATE processes (one --winnow-cores invocation each), since
SparkSession.getOrCreate caches the first master per JVM.

Usage:
  python tools/scale_probe6.py [--regen] [10|100 ...]
  python tools/scale_probe6.py --winnow-cores 8
  python tools/scale_probe6.py --winnow-cores 32
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark
from tools.scale_probe5 import SF01, generate, probe_dir

QUERIES = [
    "stream_sessionize",
    "join_asof_orders_events",
    "behavior_rfm_hist",
    "behavior_stickiness",
]


def _time(qs, name, spark, d) -> float:
    t0 = time.time()
    qs[name](spark, d).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def winnow_cores(n_cores: int) -> None:
    spark = get_spark(
        f"winnow_cores_{n_cores}",
        master=f"local[{n_cores}]",
        shuffle_partitions=n_cores,
    )
    qs = entrymod.queries()
    d = probe_dir(10)
    assert os.path.exists(os.path.join(d, "documents.parquet")), (
        f"10x documents slice missing — run scale_probe5 --docs first ({d})"
    )
    _time(qs, "dedup_docs_winnow", spark, d)  # warm the shape
    t = min(_time(qs, "dedup_docs_winnow", spark, d) for _ in range(2))
    print(f"| dedup_docs_winnow 10x | local[{n_cores}] | {t:.1f}s |", flush=True)
    spark.stop()


def main() -> None:
    if "--winnow-cores" in sys.argv:
        winnow_cores(int(sys.argv[sys.argv.index("--winnow-cores") + 1]))
        return
    decades = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10, 100]
    spark = get_spark("scale_probe6")
    for n in decades:
        if "--regen" in sys.argv or not os.path.exists(
            os.path.join(probe_dir(n), "lineitem.parquet")
        ):
            t0 = time.time()
            generate(spark, n)
            print(f"generated {n}x slice in {time.time() - t0:.1f}s", flush=True)

    qs = entrymod.queries()
    rows = []
    for name in QUERIES:
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
