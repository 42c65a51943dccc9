"""Round-9 two-decade probes: quality/drift/timeseries family + pagerank.

Closes the last two holes in the family scale matrix (VERDICT r08 #3/#4):
every other headline family — relational (scale_probe5), documents
(scale_probe5 --docs), behavioral/streaming (scale_probe6), ANN
(scale_probe7) — already carries 10x AND 100x rows in SCALE_NOTES.md.

Reuses scale_probe5's synthesis regime verbatim (imported, not copied):
facts (events/orders/lineitem) replicate with offset primary keys,
foreign keys and timestamps stay unchanged. Consequences the probe
should surface:

- quality_full_report (lineitem): single-pass multi-check scan — one
  job computing null/negative/required-column aggregates; expected
  ~linear-at-worst, sublinear while scan parallelism has headroom.
- drift_psi_fixed_bins (events): two bucketize+groupBy passes over
  fixed bins — output cardinality constant (n_bins), map-side partial
  aggregation should absorb the growth.
- ts_resample_ffill / ts_gap_stats / ts_seasonal_anomaly (events):
  per-series hourly grid with gap-fill explode / per-series lag gaps /
  hour-of-day seasonal baseline. The series universe (event_type) is
  constant while per-hour payloads grow n_rep x — grid size is
  therefore FLAT across decades; only the pre-aggregation scan grows.
- graph_pagerank (--pagerank; orders JOIN lineitem edges): the edge set
  grows n_rep x while the node universe (c<custkey>/s<suppkey> labels)
  is constant. The claim under test (PLANS.md): each of the 3
  fixed-point iterations shuffles the NODE-sized rank table, not the
  edge set — so iteration cost should track the edge scan, and the
  rank-join shuffle should stay flat. Kept behind a flag because the
  100x edge set makes it the slowest probe in the suite.

Usage:
  python tools/scale_probe8.py [--regen] [10|100 ...]
  python tools/scale_probe8.py --pagerank [10|100 ...]
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
    "quality_full_report",
    "drift_psi_fixed_bins",
    "ts_resample_ffill",
    "ts_gap_stats",
    "ts_seasonal_anomaly",
]

PAGERANK_QUERIES = ["graph_pagerank"]


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
    names = PAGERANK_QUERIES if "--pagerank" in sys.argv else QUERIES
    decades = [int(a) for a in sys.argv[1:] if a.isdigit()] or [10, 100]
    spark = get_spark("scale_probe8")
    for n in decades:
        if "--regen" in sys.argv or not os.path.exists(
            os.path.join(probe_dir(n), "lineitem.parquet")
        ):
            t0 = time.time()
            generate(spark, n)
            print(f"generated {n}x slice in {time.time() - t0:.1f}s", flush=True)

    qs = entrymod.queries()
    rows = []
    for name in names:
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
