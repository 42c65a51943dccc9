"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The driver captures only the TAIL of stdout (~2 KB) and parses the
final JSON line; round 6's single line outgrew that budget
(BENCH_r06.json `parsed: null` — VERDICT r06 #1). The final printed
line is therefore a COMPACT object (headline metric + warm per-query
timings + scalar totals, bounded well under the capture budget), while
the full payload — cold per-query detail, the extended operator panel,
error maps — is written to BENCH_DETAIL.json next to this file for the
judge and for cross-round diffing.

Each query is timed end-to-end (plan + execute); results are consumed
with a count-style action so nothing is collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: one per operator family, weighted toward shuffles/joins.
HEADLINE = [
    "agg_pricing_summary",
    "agg_hourly_demand",
    "agg_supply_demand_hourly",
    "agg_driver_daily_summary",
    "agg_top_k_per_group",
    "agg_cube_revenue",
    "star_trips_fact",
    "agg_shipping_priority",
    "agg_local_supplier_volume",
    "join_asof_orders_events",
    "join_ri_check",
    "dedup_keep_latest",
    "win_rolling_rows",
    "ml_demand_features",
    "stream_sessionize",
    "text_doc_stats",
    "dedup_docs_minhash_lsh",
    "sim_cosine_topk",
]


# Extended panel (round-5 operator families): timed warm-only and
# reported under queries_extended/extended_total — deliberately NOT part
# of `value`, so headline totals stay comparable across rounds.
EXTENDED = [
    "behavior_funnel",
    "graph_pagerank",
    "ts_resample_ffill",
    "join_point_in_time",
    "ml_freq_itemsets",
    "win_ewma_demand",
    "scale_table_checksum",
    "sim_prototype_confusion",
    "behavior_window_funnel",
    "behavior_attribution",
    "ts_seasonal_anomaly",
    "quality_expectations",
    # round-6 additions
    "text_winnow_fingerprints",
    "dedup_docs_winnow",
    "agg_quantile_rollup_hist",
    "agg_rolling_quantile_hist",
    "scale_row_diff",
    "agg_contribution_analysis",
    "quality_k_anonymity",
    "sim_embedding_drift",
    "pipeline_corpus_health",
    "agg_product_type_profit",
    "agg_min_cost_supplier",
    "agg_promotion_suppliers",
    "ts_cusum_alarms",
    "behavior_rfm_hist",
    "quality_robust_outliers_hist",
    "clean_winsorize_hist",
    # round-7 additions: the ANN queries flipped from rows-only to
    # hash-checked (fixed codebooks / deterministic hyperplanes)
    "sim_pq_encode",
    "sim_pq_ann",
    "sim_lsh_bucketed_ann",
    # round-8 additions: the fixed-model IVF and composed IVF-PQ twins
    # (both hash-checked; trained variants stay recall-pinned)
    "sim_ivf_ann_fixed",
    "sim_ivfpq_ann_fixed",
    # (dedup_docs_winnow_clusters / sample_cluster_safe_split are
    # excluded: their iterative pointer-doubling dominates panel wall
    # at ~10-12s each; they stay driver-checked + pytest-covered)
]


def _run_pass(spark, qs, names: list[str], errors: dict[str, str]) -> dict[str, float]:
    # One broken query must not zero the whole artifact: record its error
    # and keep timing the rest (r03 lost all numbers to a single
    # AnalysisException — see VERDICT r03 #4).
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        timings[name] = round(time.time() - t0, 3)
    return timings


def _median(ts: list[float]) -> float:
    """True median: averages the two middle values for even-length run
    lists. ts[n//2] on an even list picks the upper value — biased high
    when a query fails one of three passes (ADVICE r08)."""
    n = len(ts)
    if n % 2:
        return ts[n // 2]
    return round((ts[n // 2 - 1] + ts[n // 2]) / 2.0, 3)


def _run_warm_median(
    spark,
    qs,
    names: list[str],
    errors: dict[str, str],
    repeats: int = 3,
) -> tuple[dict[str, float], dict[str, list[float]], float, dict[str, int]]:
    """Warm panel with per-query median-of-N timings.

    Single-shot warm totals could not distinguish a ~10% regression from
    host variance (VERDICT r07 #1: an outlier query moved +48% in the
    capture and reverted on re-run). N full passes — pass-interleaved,
    not back-to-back per query, so each repeat sees the same cache state
    the old single warm pass saw — give a per-query median plus a
    dispersion figure, making round-over-round deltas signal.

    Returns (medians, per-query runs, spread_sec, flaky) where
    spread_sec is the summed per-query half-range (max−min)/2 — an
    error bar on the warm total — and flaky maps each query that failed
    SOME (not all) passes to its failure count, so consumers can
    discount those medians (ADVICE r08: a partial failure previously
    looked fully healthy). A query that fails every pass lands in
    ``errors``; one that fails some passes keeps the median of its
    successful runs."""
    runs: dict[str, list[float]] = {n: [] for n in names}
    last_err: dict[str, str] = {}
    for _ in range(repeats):
        pass_err: dict[str, str] = {}
        pass_t = _run_pass(spark, qs, names, pass_err)
        for n, t in pass_t.items():
            runs[n].append(t)
        last_err.update(pass_err)
    medians: dict[str, float] = {}
    flaky: dict[str, int] = {}
    spread = 0.0
    for n in names:
        ts = sorted(runs[n])
        if not ts:
            errors[n] = last_err.get(n, "failed every warm pass")
            continue
        if len(ts) < repeats:
            flaky[n] = repeats - len(ts)
        medians[n] = _median(ts)
        spread += (ts[-1] - ts[0]) / 2.0
    return (
        medians,
        {n: ts for n, ts in runs.items() if ts},
        round(spread, 3),
        flaky,
    )


def _calibration(spark) -> float:
    """Host-speed canary: a fixed, plan-stable full scan-count of
    lineitem (no filter, no shuffle beyond the count agg). Its runtime
    tracks host speed, not engine changes — per-round totals divided by
    this normalize out host drift like r04's uniform 1.45× slowdown
    (VERDICT r04 'Next round' #4). Timed warm (3 runs, min) so JIT and
    page-cache first-touch don't pollute the canary itself."""
    df = entrymod._t(spark, SF_DIR, "lineitem")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.count()
        best = min(best, time.time() - t0)
    return round(best, 4)


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = entrymod.queries()
    # the headline set is the closed list above — rounds stay comparable
    # only if nothing can join it implicitly
    names = [n for n in HEADLINE if n in qs]
    # COLD pass: first execution in a fresh JVM — includes codegen/JIT and
    # first-touch scan I/O (caches warm progressively as the pass runs, so
    # only the earliest queries see a truly cold page cache).
    # separate error maps per pass: a transient cold failure that
    # succeeds warm must not leave the artifact self-contradictory
    # (listed in errors AND contributing to the warm total)
    errors_cold: dict[str, str] = {}
    errors: dict[str, str] = {}
    cold = _run_pass(spark, qs, names, errors_cold)
    # Warm-up: pull every input table through the scan path once more
    # (page cache + parquet footers + codegen) so the warm pass measures
    # steady-state query cost, not first-touch I/O or JIT — the number
    # comparable across rounds.
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            entrymod._t(spark, SF_DIR, t).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    timings, warm_runs, warm_spread, warm_flaky = _run_warm_median(
        spark, qs, names, errors
    )
    # Extended panel gets the same median-of-3 treatment as of r09
    # (VERDICT r08 #2): single-shot extended timings left ANN/pagerank
    # deltas — the panel's dominant costs — unattributable to plan
    # changes vs host variance.
    errors_ext: dict[str, str] = {}
    extended, ext_runs, ext_spread, ext_flaky = _run_warm_median(
        spark, qs, [n for n in EXTENDED if n in qs], errors_ext
    )
    # the canary must not be able to kill the artifact: a broken
    # lineitem scan here would discard every timing already gathered
    # and leave the driver with parsed:null (the r03 failure mode the
    # per-query guards exist to prevent)
    try:
        calibration = _calibration(spark)
    except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
        print(f"bench: calibration failed: {exc}", file=sys.stderr)
        calibration = None
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # per-query MEDIAN of warm_repeats full warm passes (r08+; r07
        # and earlier were single-shot — see _run_warm_median)
        "queries": timings,
        "warm_repeats": 3,
        # summed per-query half-range across the warm repeats: the error
        # bar on `value`. Cross-round deltas smaller than ~2× this are
        # host variance, not engine changes.
        "warm_spread_sec": warm_spread,
        "warm_rel_spread": round(warm_spread / total, 4) if total else None,
        "queries_warm_runs": warm_runs,
        "cold_total": round(sum(cold.values()), 3),
        "queries_cold": cold,
        # host-speed canary + totals normalized by it: cross-round
        # comparisons should use *_normalized (dimensionless multiples
        # of the canary scan) to factor out host drift.
        "calibration": calibration,
        "value_normalized": round(total / calibration, 2) if calibration else None,
        "cold_total_normalized": (
            round(sum(cold.values()) / calibration, 2) if calibration else None
        ),
        # partial-total guard: value/cold_total cover n_timed of
        # n_queries — consumers must not compare totals across rounds
        # when n_errors > 0 (a dropped query shrinks the sum).
        "n_queries": len(names),
        "n_timed": len(timings),
        "n_errors": len(errors),
        "n_errors_cold": len(errors_cold),
        # round-5 operator panel, warm-only, excluded from `value`.
        # Per-query MEDIAN of extended_repeats passes (r09+; r08 and
        # earlier were single-shot — detect via absent extended_repeats).
        "queries_extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "extended_repeats": 3,
        "extended_spread_sec": ext_spread,
        "queries_extended_runs": ext_runs,
        "n_errors_extended": len(errors_ext),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if warm_flaky:
        payload["warm_flaky"] = warm_flaky
    if ext_flaky:
        payload["extended_flaky"] = ext_flaky
    if errors:
        payload["errors"] = errors
    if errors_cold:
        payload["errors_cold"] = errors_cold
    if errors_ext:
        payload["errors_extended"] = errors_ext
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(payload, f, indent=2)
    except OSError as exc:  # read-only checkout / disk full: the detail
        # file is a nicety — the compact line below must still be emitted
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)
    print(_compact_line(payload))
    spark.stop()


def _compact_line(payload: dict) -> str:
    """The driver keeps only the tail of stdout (~2 KB) and parses the
    final JSON line, so it must stay compact. Keeps every scalar plus the
    warm headline per-query map the contract requires; cold/extended
    per-query detail stays in BENCH_DETAIL.json."""
    compact = {
        k: payload[k]
        for k in (
            "metric", "value", "unit", "queries", "warm_repeats",
            "warm_spread_sec", "warm_rel_spread", "cold_total",
            "calibration", "value_normalized", "cold_total_normalized",
            "n_queries", "n_timed", "n_errors", "n_errors_cold",
            "extended_total", "extended_repeats", "extended_spread_sec",
            "n_errors_extended", "warm_flaky", "extended_flaky", "sf",
        )
        if k in payload
    }
    compact["detail"] = "BENCH_DETAIL.json"
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1600:
        # degrade, never die: shed the per-query map before the scalars —
        # a parseable headline total beats a complete-but-truncated line
        compact.pop("queries", None)
        line = json.dumps(compact, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
