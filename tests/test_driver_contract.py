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


def test_entry_query_is_registered(spark):
    # entry() must correspond to a queries() member so the smoke check
    # and the correctness gate exercise the same code path
    df = entrymod.queries()["agg_hourly_demand"](spark, "/root/testdata/sf0.001")
    assert df.columns == ["hour_ts", "event_type", "event_count", "avg_value"]
