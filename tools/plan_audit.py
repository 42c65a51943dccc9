"""Physical-plan audit → PLANS.md.

Extracts the scale-relevant properties of key query plans (pushed
filters, pruned read schemas, join strategies, window pushdowns,
exchange counts) as reviewable evidence that the engine produces the
plans a 100 TB deployment needs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"

AUDITS = {
    "agg_pricing_summary": "filter + projection pushdown into the parquet scan",
    "star_trips_fact": (
        "all four dim joins broadcast at sf0.1 (true dims hinted; orders is "
        "planner-chosen — sort-merge at the 100x probe, see SCALE_NOTES.md); "
        "fact side never shuffles"
    ),
    "dedup_keep_latest": "WindowGroupLimit pushes rank<=1 below the shuffle",
    "agg_top_k_global": "global top-k compiles to TakeOrderedAndProject",
    "agg_local_supplier_volume": "multi-way join mixes broadcast + shuffle sides; customer/supplier pre-filtered by broadcast semi-join on the region's nations before the chain (r20)",
    "win_rolling_rows": "single exchange feeds all window frames",
    "dedup_docs_minhash_lsh": "LSH pipeline: candidates from ONE groupBy(bkey) with in-array pair generation (r20 — no band-table self-join, singleton buckets dropped pre-exchange), no cross join",
    "join_asof_orders_events": "as-of join = union + window, no nested-loop join",
    "join_range_bucketed": "range predicate became a hash join on (key, bucket)",
    "agg_small_quantity_orders": "correlated scalar subquery decorrelated to an aggregate join",
    "agg_order_priority_checks": "EXISTS became a left-semi join; both sides filtered before the shuffle",
    "agg_returned_item_losses": "top-20 via TakeOrderedAndProject; nation dim broadcast",
    "agg_customer_order_distribution": "outer-join keeps the ON-clause predicate; two-level aggregate",
    "agg_large_volume_customers": "HAVING survivors broadcast back; only the groupBy shuffles the fact",
    "agg_dormant_customers": "scalar AVG subquery broadcast; NOT IN is a left-anti join",
    "agg_nation_trade_volume": "role-playing nation dim broadcast twice; pair disjunction post-join",
    "agg_important_part_values": "global-total scalar broadcast back over the same aggregate",
    "agg_top_revenue_suppliers": "max-equality scalar subquery broadcast, no driver collect",
    "agg_brand_promo_revenue": "OR-of-ANDs: quantity/size envelope pushed to scans, rest post-join",
    "agg_sole_return_suppliers": "EXISTS+NOT EXISTS decorrelated to one per-order aggregate pass",
    "agg_market_share": "Q8: role-playing nation broadcast twice; only lineitem-orders + final groupBy shuffle",
    "drift_psi_quantile_bins": "quantile edges computed in-plan (percentile_approx one-row broadcast), no driver action",
    "dedup_docs_clusters": "LSH-fed components: label-propagation rounds run over the PAIR-GRAPH MEMBERS only (r19 — singletons provably fixed, rejoined once at the end); last step over checkpointed edges, equi-joins only",
    "text_chunk_documents": "chunking is map-only: zero exchanges, posexplode in whole-stage codegen",
    "text_redact_pii": "regex scrub is map-only: zero exchanges",
    "text_contamination": "benchmark shingles broadcast; overlap from an equi-join, never all-pairs",
    "text_pack_chunks": "one hash exchange on doc_id feeds the packing window",
    "sample_mixing_weights": "partial+final aggregate; target mixture joined as broadcast literal",
    "sim_ivf_ann": "cell assignment is a literal-centroid expression: no KMeans fit, no assignment shuffle",
    "agg_quantile_rollup_hist": "mergeable quantiles: one raw scan into daily bin counts; merge, CDF window, and q-join all run over <=20-row-per-group summaries",
    "agg_rolling_quantile_hist": "trailing-window quantiles from the persisted daily histograms: grid densify (days x <=20 bins, broadcast), per-bin RANGE window, per-day CDF inversion — raw events scanned once",
    "dedup_docs_winnow_clusters": "winnow pairs feed the same pointer-doubling components as LSH/Jaccard pairs — iteration over pair members only (r19), equi-joins only",
    "sample_cluster_safe_split": "leakage-safe split: pointer-doubling components (pair-member-only iteration, r19) give the cluster key; split is a map-side hash filter after one doc->cluster join",
    "scale_row_diff": "keyed drill-down after checksum_diff: ONE full-outer equi-join on the key, null-safe column compares map-side",
    "pipeline_corpus_health": "per-source dashboard: every per-doc signal is a column expression, ONE corpus scan (test-pinned), output source-cardinality-sized",
    "dedup_docs_winnow_spans": "span forensics: the overlap-filtered pair table equi-joins positioned fingerprints twice on (doc, hash) — candidate-bounded",
    "sim_embedding_drift": "snapshot drift: one full-outer equi-join on the id, ONE (status, bin) aggregation covers matched/added/removed/null (r19: was four join recomputes) — no pairwise anything",
    "agg_contribution_analysis": "root-cause delta decomposition: ONE conditional-agg scan to dim-sized rows, one-row total broadcast back; global rank window over the bounded dim table",
    "quality_k_anonymity": "k-anonymity risk list: ONE hash aggregation on the QI columns, sub-k filter keeps only the risk surface",
    "agg_product_type_profit": "Q9 shape: three broadcast dims + one fact-fact join, LIKE pushed to the part scan, decimal-exact profit sums",
    "agg_min_cost_supplier": "Q2 shape: correlated per-part MIN as a window over the derived cost relation; all dims broadcast; fact pre-filtered by the broadcast p_size part list BEFORE the (part,supp) aggregation (r20 — exchange rows ~1/50)",
    "agg_promotion_suppliers": "Q20 shape: nested semi-join chain — qualifying (supplier, part) aggregate drives a left-semi on supplier",
    "clean_winsorize_hist": "scale-path winsorize: cutoffs from the <=20-row-per-group histogram (no per-group percentile buffer), broadcast back, map-side clamp",
    "quality_robust_outliers_hist": "scale-path median/MAD: two bounded histogram passes (broadcast median between them), deviations persisted for the MAD + outlier-count consumers (r19: 9 fact scans -> 2), no per-group percentile buffer",
    "behavior_rfm_hist": "scale-path RFM: per-customer rollup persisted (ONE fact scan, r19 — was 14), as-of derived from it; ONE fused histogram pass counts all three dimensions (r20 — was three rollup scans), literal-edge inversions fold into a single one-row cutoff broadcast, map-side scoring — the global ntile sort eliminated",
    "ts_cusum_alarms": "CUSUM via the reflected-walk identity: cumsum minus clamped running min — two window passes over the day-level rollup, no sequential recursion",
    "text_winnow_fingerprints": "winnowing: map-only kgram explode, ONE per-doc window pass for the rightmost-min selection, distinct — no joins",
    "dedup_docs_winnow": "passage dup pairs generated from df-capped per-hash doc arrays (ONE groupBy(fp_hash), never a self-join/all-pairs); array-domain map-only fingerprinting; capped groups persisted once for sizes + pairs",
    "text_token_rarity": "corpus stats from the tf table: raw token stream exploded+aggregated once",
    "text_tfidf_top_terms": "df derived from tf (one explode pass); per-doc top-k via WindowGroupLimit",
    "stream_corpus_dedup": "fingerprint dedup: one exchange on the 32-byte hash",
    "sim_quantize_embeddings": "int8 quantization is map-only: zero exchanges",
    "sample_fixed_k_per_source": "one exchange on the group column feeds the hash-order WindowGroupLimit",
    "sample_negative_pairs": "negative sampling is map+explode only: zero exchanges, no RNG state",
    "text_quality_percentile": "global percent_rank over the narrow scored projection, not full documents (small-scale oracle twin of text_quality_cutoff)",
    "text_quality_cutoff": "scale-safe dynamic gate: corpus map-bucketed, one agg to <=1000 histogram rows; the only SinglePartition exchange feeds the bounded histogram window, never corpus rows; cutoff broadcast back",
    "text_unigram_logprob": "token stream exploded+aggregated once into tf; totals derive from tf; grand total broadcasts back as a one-row literal; decimal-accumulated sum",
    "text_bigram_pmi": "bigram and unigram counts from two explode passes; integer min_count picks the set; the two scalar totals broadcast as one-row literals",
    "text_vocab_coverage": "global top-K compiles to TakeOrderedAndProject; rank/running-total windows only over the bounded K-row result",
    "sample_importance_weighted": "per-source weights from one aggregate, broadcast to the corpus; membership is a map-only hash threshold",
    "win_scd2_history": "both windows partition by the entity key: one shuffle on user_id, no global ordering",
    "pipeline_corpus_prep": "six-stage composition in one lazy plan; LSH banding equi-joins, map-only scrub/chunk, per-doc packing window",
    "dedup_docs_segments": "segment explode is map-only; one shuffle on the segment fingerprint; reassembly one groupBy(doc_id), order via array_sort not a sort exchange",
    "scale_skew_report": "per-key counts then TakeOrderedAndProject; rank/cum windows only over the bounded top-K",
    "agg_incremental_daily_revenue": "two partial states union + re-agg: decimal sums merge exactly, no re-scan of finalized measures",
    "scale_partition_plan": "one aggregation to partition-key cardinality; file-count arithmetic on the small plan table",
    "sim_pq_encode": "PQ encoding is a literal-codebook expression per subspace: map-only, no shuffle, no MLlib on the query path",
    "sim_pq_ann": "asymmetric-distance ANN: broadcast probes x m-byte codes, centroid lookup from literal arrays, per-query top-k window",
    "sim_ivf_ann_fixed": "hash-checked IVF twin: fixed formula centroids keep assignment a literal expression; probe ranking and within-cell cosine identical to sim_ivf_ann — same plan, now oracle-verified end to end",
    "sim_ivfpq_ann_fixed": "hash-checked IVF-PQ twin: both models literal (formula centroids + formula codebooks); cell pruning join + ADC over m-int codes identical to sim_ivfpq_ann — the composed billion-vector layout, oracle-verified end to end",
    "behavior_funnel": "milestone windows + per-user collapse share one hash partitioning on user_id (one event-stream exchange; the second is the one-row global-agg combine)",
    "behavior_cohort_retention": "events reduced to distinct (user, week) first; cohort-size window runs over the tiny rollup",
    "behavior_rfm_scores": "ntile sorts run over the per-customer aggregate (dimension-sized), never the order fact; as-of date broadcast",
    "link_fuzzy_pairs": "candidates from a blocking-key equi-join (sum of block^2, never n^2); Levenshtein JVM-side post-join",
    "agg_distinct_rollup_sketch": "daily HLL sketches union-merged to monthly: raw events aggregated once, rollup reads sketch blobs only",
    "stream_static_enrich": "customer dimension broadcast onto the event stream; aggregate state = one row per (segment, type)",
    "stream_stream_conversions": "interval self-join stays an equi-join on user_id with a post-join range filter, not a nested loop",
    "ts_resample_ffill": "grid exploded map-side from the per-series bounds table; fill window partitioned per series, no global sort",
    "graph_pagerank": "per iteration: ONE exchange — zero-seeded groupBy(dst) with map-side partial sums replaces the old groupBy + nodes left-join; rank table is the SHUFFLE_HASH build side so the persisted edge table is never re-sorted; iteration 1's constant rank inlined; rank lineage localCheckpoint-cut every 5 rounds",
    "join_point_in_time": "PIT = equi-join on the entity key + interval filter; candidates per probe bounded by that key's version count",
    "ml_freq_itemsets": "FPGrowth: parallel FP-trees per partition, no Apriori candidate blowup; baskets from one distinct+collect_set pass",
    "scale_checksum_diff": "replica diff joins two K-row checksum summaries; each data table scanned exactly once",
    "win_ewma_demand": "per-key ordered frame feeds the dyadic weighted fold; one shuffle on the series key",
    "sim_hard_negatives": "broadcast anchors x corpus; label filter runs before the per-anchor top-k window",
    "sim_prototype_confusion": "one-row prototype ARRAY broadcast; per-vector argmax is a map-side array argmin (no corpus window/exchange, r19); only the confusion count shuffles",
    "sim_cross_contamination": "benchmark side broadcast onto one training-corpus scan; threshold filter before the argmax window",
    "quality_robust_outliers": "two exact percentile passes + one counting pass, all grouped by the monitoring dimension; medians broadcast back",
    "pipeline_user_insights": "four user-keyed branches joined on user_id; session stats aggregate straight off the start flags (no per-session rollup, r19); as-of derives from the persisted per-user maxima",
    "behavior_transition_matrix": "lag window per user, one grouped count; row-share window over the k x k matrix, not events",
    "agg_rolling_distinct_exact": "deliberate BroadcastNestedLoopJoin: the BOUNDED day list (one row/day) broadcasts, reduced activity streams — small-scale oracle twin only; the sketch variant is the production path (plan-guard pinned)",
    "agg_revenue_gini": "rank window partitions by nation; final arithmetic over the 25-row per-group aggregate",
    "sql_segment_ltv": "SQL text through the same Catalyst path: pruned ReadSchema + broadcast customer join, identical to DataFrame plans",
    "behavior_attribution": "three attribution windows share ONE user-hash exchange with a value-RANGE frame; no per-conversion self-join",
    "behavior_window_funnel": "windowFunnel: next-stage pointers from one descending per-user window; chain walk is an equi-join on (user, exact ts), never a scan",
    "mm_sample_frames": "frame sampling is map-only mapInPandas (ArrowEvalPython): zero exchanges, output frame-sized not payload-sized",
    "quality_expectations": "four row-predicate rules fuse into ONE conditional-aggregation scan; unique = one hash-agg; ref-integrity = broadcast anti-join",
    "ts_seasonal_anomaly": "hourly rollup with map-side combine, (series x 24)-row profile broadcast back; no window, no global sort",
    "clean_winsorize_value": "per-group exact percentile cutoffs in one aggregate, broadcast-joined back; clamp is map-only, no window over the stream",
    "text_bpe_encode": "merge fold runs once per DISTINCT word; corpus word stream joins the segmented vocab broadcast, one final groupBy(doc)",
    "behavior_stickiness": "events deduped to (user, day) ONCE; DAU and the rolling window both derive from that reduced table, nothing re-scans events",
    "drift_ks_binned": "each side reduces to <= n_bins counts map-side; the cumulative window's SinglePartition exchange sees bin rows, never data rows",
    "metrics_calibration": "one bucketized pass over the scored table; decimal-exact sums make both means bit-reproducible; shuffle is bin-count-sized",
}

KEEP = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct|Exchange|WindowGroupLimit|"
    r"TakeOrderedAndProject|AQEShuffleRead"
)


def main() -> None:
    spark = get_spark("plan_audit")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit of key queries (sf0.1)",
        "",
        "Auto-generated by tools/plan_audit.py. For each query: the claim,",
        "then every scale-relevant line of the executed plan (joins,",
        "exchanges, pushdowns). Exchange count ≈ shuffle count.",
        "",
    ]
    for name, claim in AUDITS.items():
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines = [
            line.strip()[:160]
            for line in plan.splitlines()
            if KEEP.search(line)
        ]
        n_shuffle = sum(
            1 for l in lines if l.startswith("(") and ") Exchange" in l
        )
        out.append(f"## {name}")
        out.append(f"*Claim:* {claim} — {n_shuffle} shuffle exchange(s)")
        out.append("```")
        out.extend(lines or ["(no matching physical operators — pure scan/project)"])
        out.append("```")
        out.append("")
    spark.stop()
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
