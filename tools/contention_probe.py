"""End-to-end validation of bench.py's degraded-pass exclusion.

The unit test (test_driver_contract.test_bench_degraded_pass_exclusion)
pins the 1.5x logic on canned timings; this probe validates it against
REAL contention: it runs bench._run_warm_median over a subset of the
headline panel with a canary wrapper that, immediately before the
final pass, saturates every core with busy-spin processes — the same
"systematically slow last pass" shape that contaminated the r09
capture (VERDICT r09 #2, SCALE_NOTES r10). Expected output: the final
pass's total exceeds 1.5x the fastest pass, lands in
``degraded_passes``, and the medians equal the median of the clean
passes only.

Usage: python tools/contention_probe.py [sf_dir]
(default /root/testdata/sf0.01 — contention scale, not timing scale)
"""

from __future__ import annotations

import multiprocessing
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark

# a shuffle-heavy slice of the headline panel: enough work per pass
# for contention to bite, short enough to iterate
NAMES = [
    "agg_pricing_summary",
    "star_trips_fact",
    "join_asof_orders_events",
    "dedup_docs_minhash_lsh",
    "sim_cosine_topk",
]


def _spin(stop_flag):
    # RawValue (no lock) so the loop actually burns CPU instead of
    # serializing on the flag's lock
    x = 0
    while not stop_flag.value:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def main() -> None:
    if len(sys.argv) > 1:
        bench.SF_DIR = sys.argv[1]
    else:
        bench.SF_DIR = "/root/testdata/sf0.01"
    spark = get_spark("contention_probe")
    qs = entrymod.queries()

    stop = multiprocessing.RawValue("b", False)
    hogs: list[multiprocessing.Process] = []
    calls = {"n": 0}

    def canary():
        # invoked by _run_warm_median immediately before each pass —
        # the injection point: saturate the host before the LAST pass
        calls["n"] += 1
        if calls["n"] == 3 and not hogs:
            # oversubscribe 3x so the JVM's fair share drops well below
            # half — mild 1:1 contention stayed at 1.19x, under threshold
            for _ in range(3 * (os.cpu_count() or 8)):
                p = multiprocessing.Process(target=_spin, args=(stop,))
                p.daemon = True
                p.start()
                hogs.append(p)
            print("hogs started before pass 3", flush=True)
        return bench._canary_once(spark)

    # warm-up: in bench.main the warm panel runs after the cold pass +
    # table warm-up, so the first measured pass must not carry cold
    # codegen/first-touch (the un-warmed first probe pass ran 2.9x and
    # was itself flagged degraded — correct, but not the shape under test)
    warm_err: dict[str, str] = {}
    bench._run_pass(spark, qs, NAMES, warm_err)

    errors: dict[str, str] = {}
    try:
        meds, runs, spread, flaky, info = bench._run_warm_median(
            spark, qs, NAMES, errors, repeats=3, canary=canary
        )
    finally:
        stop.value = True
        for p in hogs:
            p.join(timeout=5)
    spark.stop()

    print("pass_totals:", info["pass_totals"])
    print("pass_calibrations:", info["pass_calibrations"])
    print("degraded_passes:", info["degraded_passes"])
    print("medians:", meds)
    print("errors:", errors)
    ok_fired = info["degraded_passes"] == [2]
    mn = min(info["pass_totals"][:2])
    ratio = info["pass_totals"][2] / mn if mn else float("inf")
    print(f"contended-pass ratio vs fastest clean pass: {ratio:.2f}x")
    if ok_fired:
        # medians must come from the two clean passes only
        clean_ok = all(
            meds[n] == bench._median(sorted(runs[n][:2])) for n in meds
        )
        print("medians exclude the contended pass:", clean_ok)
        print("PROBE PASS" if clean_ok else "PROBE FAIL (medians)")
    else:
        # contention below 1.5x is a soft outcome, not a logic failure —
        # report it so the threshold discussion stays evidence-based
        print(
            "PROBE SOFT: contended pass stayed under the 1.5x threshold "
            f"({ratio:.2f}x) — exclusion correctly did not fire"
        )


if __name__ == "__main__":
    main()
