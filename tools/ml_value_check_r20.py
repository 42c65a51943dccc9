"""Prove the r20 training persists change NO computed value.

Runs ml_train_demand_models + ml_train_classifier and prints their full
collected rows (sorted, repr floats). Run once on the pre-change tree
and once on the changed tree; diff the outputs — they must be
byte-identical (rows-only driver checks don't pin the metric values, so
the brief's "don't change what any query computes" is proven here
instead).

Usage: python tools/ml_value_check_r20.py <label>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    spark = get_spark("ml_value_check")
    qs = entrymod.queries()
    for name in ("ml_train_demand_models", "ml_train_classifier"):
        t0 = time.time()
        rows = sorted(repr(r) for r in qs[name](spark, SF_DIR).collect())
        dt = time.time() - t0
        print(f"### {label} {name} ({dt:.1f}s)")
        for r in rows:
            print(r)
    spark.stop()


if __name__ == "__main__":
    main()
