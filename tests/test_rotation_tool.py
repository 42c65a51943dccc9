"""Pins tools/rotate_driver_order.py — the rotation is the only
external correctness signal (VERDICT r11), so a silent parsing
regression here (a green row misread as never-checked, or vice versa)
would quietly corrupt the driver window's freshness guarantee.
Spark-free: synthetic artifacts on disk, pure-function assertions."""

from __future__ import annotations

import json
from pathlib import Path

# tools/ is on sys.path via conftest's single shared insert (ADVICE r15)
from rotate_driver_order import (
    rotation_order,
    round_of,
    scan_artifacts,
)


def _write(tmp_path: Path, rnd: int, rows: dict) -> str:
    p = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
    p.write_text(json.dumps(rows))
    return str(p)


def test_scan_green_semantics(tmp_path):
    paths = [
        _write(
            tmp_path,
            1,
            {
                "q_hash": {"hash_match": True, "spark_rows": 10},
                "q_fail": {"hash_match": False, "spark_rows": 10},
                "q_rowsonly": {"err": "no_oracle", "spark_rows": 5},
                "q_rowsonly_crashed": {"err": "no_oracle"},
                "q_other_err": {"err": "AnalysisException: boom"},
            },
        ),
        # a later round re-greens q_fail and refreshes q_hash
        _write(
            tmp_path,
            3,
            {
                "q_hash": {"hash_match": True, "spark_rows": 10},
                "q_fail": {"hash_match": True, "spark_rows": 10},
            },
        ),
    ]
    green, latest, row_counts = scan_artifacts(paths)
    # hash-pass and executed rows-only are green; a FAILED hash row, a
    # rows-only row that never executed, and a hard error are NOT
    assert green == {"q_hash", "q_fail", "q_rowsonly"}
    # latest tracks the newest green round per name
    assert latest == {"q_hash": 3, "q_fail": 3, "q_rowsonly": 1}
    # per-path row counts ride along (ADVICE r12: no second parse pass)
    assert row_counts == {paths[0]: 5, paths[1]: 2}


def test_scan_sorts_by_parsed_round_not_lexically(tmp_path):
    # ADVICE r13: lexical sort puts CORRECTNESS_r100 before r11, so a
    # caller-ordered scan would let round 11 overwrite round 100 in the
    # latest map. scan_artifacts must sort by PARSED round itself.
    p100 = _write(tmp_path, 100, {"q": {"hash_match": True, "spark_rows": 1}})
    p11 = _write(tmp_path, 11, {"q": {"hash_match": True, "spark_rows": 1}})
    lexical = sorted([p100, p11])
    assert lexical == [p100, p11]  # the hazard is real: r100 < r11 lexically
    _, latest, _ = scan_artifacts(lexical)
    assert latest == {"q": 100}
    assert round_of(p100) == 100 and round_of(p11) == 11


def test_rotation_priority_and_staleness():
    qs = ["a", "b", "c", "d", "e", "f"]
    oracles = {"a", "b", "c", "d"}  # e, f are rows-only by design
    green = {"b", "c", "e"}
    latest = {"b": 4, "c": 2, "e": 3}
    order = rotation_order(qs, oracles, green, latest, window=5)
    names = [n for n, _ in order]
    # never-checked oracle-backed first (a, d), then never-checked
    # rows-only (f), then greens OLDEST latest-row first (c r2, e r3 —
    # b r4 falls off the 5-slot window as the freshest green)
    assert names == ["a", "d", "f", "c", "e"]
    # unchecked entries carry no round; greens carry their latest round
    assert order[0][1] is None and order[2][1] is None
    assert order[3] == ("c", 2) and order[4] == ("e", 3)


def test_rotation_ties_follow_queries_order():
    qs = ["z_late", "a_early", "m_mid"]
    order = rotation_order(
        qs, set(qs), set(qs), {"z_late": 1, "a_early": 1, "m_mid": 1}, window=3
    )
    # equal staleness → stable queries() order, not alphabetical
    assert [n for n, _ in order] == ["z_late", "a_early", "m_mid"]


def test_rotation_window_never_exceeded():
    qs = [f"q{i}" for i in range(80)]
    green = set(qs)
    latest = {q: 1 for q in qs}
    order = rotation_order(qs, set(qs), green, latest, window=50)
    assert len(order) == 50
    # all-unchecked also caps at the window
    order2 = rotation_order(qs, set(qs), set(), {}, window=50)
    assert len(order2) == 50 and all(r is None for _, r in order2)


def test_live_rotation_matches_tool_output():
    # the committed _DRIVER_FIRST must be exactly what the tool would
    # emit from the artifact rounds it CLAIMS it was computed from
    # (_DRIVER_FIRST_THROUGH_ROUND) — a hand-edited drift between them
    # would silently misdirect the freshness budget. The glob is bounded
    # to those rounds (VERDICT r12): the driver dropping a NEW
    # CORRECTNESS artifact mid-round must not redden the suite — the
    # tool's own stderr WARNING is the unbounded staleness reminder, and
    # each session's rotation bumps the constant + list in one commit.
    import glob
    import os

    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [
        p
        for p in sorted(
            glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=round_of
        )
        if round_of(p) <= entrymod._DRIVER_FIRST_THROUGH_ROUND
    ]
    # the pinned rounds must actually exist — a constant ahead of the
    # committed artifacts would vacuously pass on an empty scan
    assert paths, "no artifacts within _DRIVER_FIRST_THROUGH_ROUND"
    # …and the PINNED round's artifact itself must be among them: if the
    # constant were typo'd above the newest artifact, the bound becomes a
    # no-op and the tool's 'newest > committed' stderr WARNING — the
    # regeneration forcing function — would be permanently suppressed
    # (ADVICE r13)
    assert max(round_of(p) for p in paths) == (
        entrymod._DRIVER_FIRST_THROUGH_ROUND
    ), (
        "_DRIVER_FIRST_THROUGH_ROUND points at a round with no committed "
        "CORRECTNESS artifact — the constant is ahead of the artifacts"
    )
    green, latest, _ = scan_artifacts(paths)
    order = rotation_order(
        list(entrymod.queries()), set(entrymod.oracle_sql()), green, latest
    )
    assert [n for n, _ in order] == list(entrymod._DRIVER_FIRST)


def test_new_artifact_does_not_change_bounded_rotation(tmp_path):
    # round-transition safety (VERDICT r12 item 2): a fresh driver
    # artifact landing AFTER the rotation was committed must not change
    # what the bounded recomputation sees — the suite stays green with
    # an extra, newer CORRECTNESS file present.
    through_round = 2
    _write(tmp_path, 1, {"qa": {"hash_match": True, "spark_rows": 1}})
    _write(tmp_path, 2, {"qb": {"hash_match": True, "spark_rows": 1}})
    committed_order = rotation_order(
        ["qa", "qb"],
        {"qa", "qb"},
        *scan_artifacts(
            sorted(str(p) for p in tmp_path.glob("CORRECTNESS_r*.json"))
        )[:2],
        window=2,
    )
    # the driver lands r03 mid-round: qa refreshed, qb now stale-first
    _write(tmp_path, 3, {"qa": {"hash_match": True, "spark_rows": 1}})
    bounded = [
        str(p)
        for p in sorted(tmp_path.glob("CORRECTNESS_r*.json"))
        if int(str(p).split("_r")[-1].split(".")[0]) <= through_round
    ]
    green, latest, _ = scan_artifacts(bounded)
    recomputed = rotation_order(["qa", "qb"], {"qa", "qb"}, green, latest, window=2)
    assert recomputed == committed_order  # bounded view: unchanged
    # sanity: the UNbounded view would differ — proving the bound matters
    g_all, l_all, _ = scan_artifacts(
        sorted(str(p) for p in tmp_path.glob("CORRECTNESS_r*.json"))
    )
    assert rotation_order(["qa", "qb"], {"qa", "qb"}, g_all, l_all, window=2) != (
        committed_order
    )
