"""Round-rotation helper for the driver's CORRECTNESS cap.

The driver's per-round artifact has historically covered only the first
50 keys of ``queries()``. This tool reads every CORRECTNESS_r*.json in
the repo root, computes which queries have EVER earned a green row
(full pass or intentional rows-only), and prints the suggested
``_DRIVER_FIRST`` ordering for ``__spark_entry__.py``: never-checked
oracle-backed queries first, never-checked rows-only next, then
everything already green (stable order otherwise).

Usage: python tools/rotate_driver_order.py
(prints a Python list literal to paste into __spark_entry__.py)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> None:
    green: set[str] = set()
    latest: dict[str, int] = {}
    # anchor at the repo root (like the import path above): a CWD-relative
    # glob run from tools/ would find zero artifacts and silently emit a
    # rotation that marks every query never-checked
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert artifacts, f"no CORRECTNESS_r*.json under {root}"
    for path in artifacts:
        rnd = int(path.split("_r")[-1].split(".")[0])
        with open(path) as f:
            art = json.load(f)
        for name, row in art.items():
            # a row counts as checked if it passed, or if it is a
            # deliberate rows-only entry (no oracle) that executed
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            ):
                green.add(name)
                latest[name] = rnd
        print(f"# {path}: {len(art)} rows", file=sys.stderr)

    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    unchecked_oracle = [q for q in qs if q not in green and q in oracles]
    unchecked_rows = [q for q in qs if q not in green and q not in oracles]
    # staleness hides breakage: after never-checked queries, re-confirm
    # the greens whose latest driver row is OLDEST (ties: queries() order)
    checked = sorted((q for q in qs if q in green), key=lambda q: latest[q])
    from collections import Counter

    print(
        f"# unchecked w/ oracle: {len(unchecked_oracle)}, "
        f"unchecked rows-only: {len(unchecked_rows)}, green: {len(checked)}; "
        f"latest-round histogram: {dict(sorted(Counter(latest.values()).items()))}",
        file=sys.stderr,
    )
    print("_DRIVER_FIRST: list[str] = [")
    for name in unchecked_oracle + unchecked_rows:
        print(f'    "{name}",')
    for name in checked[: max(0, 50 - len(unchecked_oracle) - len(unchecked_rows))]:
        print(f'    "{name}",  # latest green r{latest[name]:02d}')
    print("]")


if __name__ == "__main__":
    main()
