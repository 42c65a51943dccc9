"""Per-query phase profiler (optimization guide §1: measure first).

For each bench query, splits wall time into:
  construct — the queries() lambda (py4j expression-tree building;
              driver-side, single-threaded)
  analyze   — resolving the logical plan (df.schema forces analysis)
  optimize  — optimizedPlan + physical planning via explain(extended=False)
  execute   — noop-sink write of the (already planned) DataFrame

Usage: python3 tools/profile_phases.py [sf_dir] [query ...]
Defaults to the bench HEADLINE + EXTENDED panels at $SPARK_GRAFT_SF_DIR.
Prints one line per query plus a phase-sum sanity column; a second
pass repeats the measurement warm so JIT/codegen caches don't masquerade
as per-query cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from distributed_mobility_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def profile(spark, qs, name: str) -> dict[str, float]:
    t0 = time.time()
    df = qs[name](spark, SF_DIR)
    t1 = time.time()
    df.schema  # force analysis
    t2 = time.time()
    # force optimization + physical planning (no execution)
    df._jdf.queryExecution().executedPlan()
    t3 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t4 = time.time()
    return {
        "construct": t1 - t0,
        "analyze": t2 - t1,
        "optimize": t3 - t2,
        "execute": t4 - t3,
        "total": t4 - t0,
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = SF_DIR
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
        globals()["SF_DIR"] = sf_dir
    spark = get_spark("profile_phases")
    qs = entrymod.queries()
    names = args or (bench.HEADLINE + bench.EXTENDED)
    bad = [n for n in names if n not in qs]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")

    # warm the session (JIT, codegen cache, file index) with one pass
    for n in names:
        try:
            profile(spark, qs, n)
        except Exception as exc:  # noqa: BLE001
            print(f"{n}: WARM-PASS ERROR {exc}", flush=True)

    rows = []
    for n in names:
        try:
            r = profile(spark, qs, n)
        except Exception as exc:  # noqa: BLE001
            print(f"{n}: ERROR {exc}", flush=True)
            continue
        rows.append((n, r))
        print(
            f"{n:36s} total={r['total']:7.3f} construct={r['construct']:7.3f} "
            f"analyze={r['analyze']:6.3f} optimize={r['optimize']:6.3f} "
            f"execute={r['execute']:7.3f}",
            flush=True,
        )
    tot = {k: sum(r[k] for _, r in rows) for k in
           ("construct", "analyze", "optimize", "execute", "total")}
    print(
        f"{'TOTAL':36s} total={tot['total']:7.3f} construct={tot['construct']:7.3f} "
        f"analyze={tot['analyze']:6.3f} optimize={tot['optimize']:6.3f} "
        f"execute={tot['execute']:7.3f}"
    )


if __name__ == "__main__":
    main()
