"""Round-rotation helper for the driver's CORRECTNESS cap.

The driver's per-round artifact has historically covered only the first
50 keys of ``queries()``. This tool reads every CORRECTNESS_r*.json in
the repo root, computes which queries have EVER earned a green row
(full pass or intentional rows-only), and prints the suggested
``_DRIVER_FIRST`` ordering for ``__spark_entry__.py``: never-checked
oracle-backed queries first, never-checked rows-only next, then
everything already green, oldest-latest-row first (stable order
otherwise).

Usage: python tools/rotate_driver_order.py
(prints the ``_DRIVER_FIRST_THROUGH_ROUND`` constant plus the
``_DRIVER_FIRST`` list literal — paste BOTH into __spark_entry__.py in
the same commit; the pytest tripwire recomputes the rotation bounded to
the pinned rounds, so the pair must move together)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50  # the driver checks only the first 50 queries() keys


def round_of(path: str) -> int:
    """Parse the round number out of a ``*_rNN.json`` artifact path."""
    return int(path.split("_r")[-1].split(".")[0])


def scan_artifacts(
    paths: list[str],
) -> tuple[set[str], dict[str, int], dict[str, int]]:
    """Parse CORRECTNESS artifacts → (greens, name→latest round, path→rows).

    A row counts as checked if it hash-passed, or if it is a deliberate
    rows-only entry (``err: "no_oracle"``) that actually executed
    (``spark_rows`` present) — a rows-only row that CRASHED must stay
    un-green, or the rotation would never re-surface it. ``latest``
    tracks the newest round containing a green row per name, so
    staleness is measurable. Paths are sorted by PARSED round here
    rather than trusting caller order: lexical ``sorted()`` puts r100
    before r11, which would let earlier rounds overwrite later ones in
    the latest map (ADVICE r13). The per-path row counts ride along so
    callers can report them without re-parsing each artifact
    (ADVICE r12).
    """
    green: set[str] = set()
    latest: dict[str, int] = {}
    row_counts: dict[str, int] = {}
    for path in sorted(paths, key=round_of):
        rnd = round_of(path)
        with open(path) as f:
            art = json.load(f)
        row_counts[path] = len(art)
        for name, row in art.items():
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            ):
                green.add(name)
                latest[name] = rnd
    return green, latest, row_counts


def rotation_order(
    qs: list[str],
    oracles: set[str],
    green: set[str],
    latest: dict[str, int],
    window: int = WINDOW,
) -> list[tuple[str, int | None]]:
    """The window-sized rotation: (name, latest green round | None).

    Priority: never-checked oracle-backed queries (a hash check is
    stronger evidence than rows-only, so they jump the queue), then
    never-checked rows-only, then already-green queries oldest-latest-
    row first (ties broken by ``qs`` order, which sorted() preserves
    via stability) — staleness hides breakage, so the oldest greens
    re-confirm first.
    """
    unchecked_oracle = [q for q in qs if q not in green and q in oracles]
    unchecked_rows = [q for q in qs if q not in green and q not in oracles]
    checked = sorted((q for q in qs if q in green), key=lambda q: latest[q])
    head: list[tuple[str, int | None]] = [
        (q, None) for q in unchecked_oracle + unchecked_rows
    ]
    fill = max(0, window - len(head))
    return (head + [(q, latest[q]) for q in checked[:fill]])[:window]


def main() -> None:
    import __spark_entry__ as entrymod

    # anchor at the repo root (like the import path above): a CWD-relative
    # glob run from tools/ would find zero artifacts and silently emit a
    # rotation that marks every query never-checked
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=round_of
    )
    assert artifacts, f"no CORRECTNESS_r*.json under {root}"
    green, latest, row_counts = scan_artifacts(artifacts)
    for path in artifacts:
        print(f"# {path}: {row_counts[path]} rows", file=sys.stderr)

    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    order = rotation_order(qs, oracles, green, latest)
    from collections import Counter

    n_unchecked = sum(1 for _, r in order if r is None)
    print(
        f"# unchecked in window: {n_unchecked}, green: {len(green)}; "
        f"latest-round histogram: {dict(sorted(Counter(latest.values()).items()))}",
        file=sys.stderr,
    )

    # Non-gating staleness report: the committed rotation pins which
    # artifact rounds it was computed from; if newer artifacts exist the
    # committed _DRIVER_FIRST is due for regeneration. The pytest gate
    # deliberately bounds itself to the pinned rounds (so a driver
    # artifact landing mid-round can't redden the suite) — THIS warning
    # is the unbounded check that keeps the forcing function visible.
    newest = max(round_of(p) for p in artifacts)
    committed = getattr(entrymod, "_DRIVER_FIRST_THROUGH_ROUND", None)
    if committed is not None and newest > committed:
        print(
            f"# WARNING: committed rotation covers r01-r{committed:02d} but "
            f"CORRECTNESS_r{newest:02d}.json exists — paste the output below "
            "(constant + list) into __spark_entry__.py this session",
            file=sys.stderr,
        )

    print(f"_DRIVER_FIRST_THROUGH_ROUND: int = {newest}")
    print("_DRIVER_FIRST: list[str] = [")
    for name, rnd in order:
        suffix = "" if rnd is None else f"  # latest green r{rnd:02d}"
        print(f'    "{name}",{suffix}')
    print("]")


if __name__ == "__main__":
    main()
