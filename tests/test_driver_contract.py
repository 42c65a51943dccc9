"""Driver-contract invariants: the artifacts the per-round driver
consumes must stay structurally valid — broken rotation names or
queries/oracle drift would silently shrink the correctness gate."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_rotation_names_and_oracle_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # every rotation name resolves (raises AssertionError otherwise)
    ordered = entrymod._driver_order(q, require_all=True)
    assert list(ordered.keys())[: len(q)] and len(ordered) == len(q)
    # oracle keys are a subset of queries; both dicts share the order
    assert set(o) <= set(q)
    assert len(set(entrymod._DRIVER_FIRST)) == len(entrymod._DRIVER_FIRST), (
        "duplicate names in _DRIVER_FIRST"
    )
    # the driver's 50-slot window must be fully oracle-backed or
    # intentionally rows-only — i.e. every windowed name is a real query
    window = list(entrymod._driver_order(o).keys())[:50]
    assert all(name in q for name in window)


def test_bench_final_line_fits_tail_capture():
    # BENCH_r06.json recorded `parsed: null` because the single JSON line
    # outgrew the driver's ~2 KB tail capture. Pin the fix: a worst-case
    # payload (every headline query timed warm+cold, full extended panel,
    # error maps) must still produce a final line under the budget, and
    # that line must parse standalone.
    import json

    import bench

    payload = {
        "metric": "headline_queries_total",
        "value": 14.47,
        "unit": "sec",
        "queries": {n: 123.456 for n in bench.HEADLINE},
        "warm_repeats": 3,
        "warm_spread_sec": 1.301,
        "warm_rel_spread": 0.0788,
        "queries_warm_runs": {n: [123.4, 123.5, 123.6] for n in bench.HEADLINE},
        "cold_total": 28.01,
        "queries_cold": {n: 123.456 for n in bench.HEADLINE},
        "calibration": 0.0538,
        "value_normalized": 276.43,
        "cold_total_normalized": 559.83,
        "n_queries": len(bench.HEADLINE),
        "n_timed": len(bench.HEADLINE),
        "n_errors": 2,
        "n_errors_cold": 2,
        "queries_extended": {n: 123.456 for n in bench.EXTENDED},
        "extended_total": 99.9,
        "extended_repeats": 3,
        "extended_spread_sec": 2.345,
        "queries_extended_runs": {n: [123.4, 123.5] for n in bench.EXTENDED},
        "n_errors_extended": 1,
        "warm_flaky": {"dedup_docs_minhash_lsh": 1},
        "extended_flaky": {"graph_pagerank": 2},
        "sf": 0.1,
        "errors": {"q": "x" * 300},
        "errors_cold": {"q": "x" * 300},
        "errors_extended": {"q": "x" * 300},
    }
    line = bench._compact_line(payload)
    assert len(line) <= 1600, f"compact bench line is {len(line)} bytes"
    parsed = json.loads(line)
    # contract fields the driver/judge read
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 14.47 and parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1 and "queries" in parsed
    # detail payload must NOT leak into the compact line
    assert "queries_cold" not in parsed and "queries_extended" not in parsed
    assert "queries_warm_runs" not in parsed
    assert "queries_extended_runs" not in parsed
    # flaky-pass markers must survive into the compact line so a partial
    # warm failure is visible to the driver, not just the detail file
    assert parsed["warm_flaky"] == {"dedup_docs_minhash_lsh": 1}
    assert parsed["extended_spread_sec"] == 2.345


def test_bench_median_even_run_lists():
    # ADVICE r08: ts[len//2] on an even-length list picks the upper of
    # the two middle values (biased high when a query fails one of three
    # warm passes). Pin the true-median behavior.
    import bench

    assert bench._median([1.0, 2.0, 3.0]) == 2.0
    assert bench._median([1.0, 2.0]) == 1.5
    assert bench._median([4.0]) == 4.0
    assert bench._median([1.0, 2.0, 3.0, 10.0]) == 2.5


def test_entry_query_is_registered(spark):
    # entry() must correspond to a queries() member so the smoke check
    # and the correctness gate exercise the same code path
    df = entrymod.queries()["agg_hourly_demand"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["hour_ts", "event_type", "event_count", "avg_value"]
