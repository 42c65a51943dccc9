"""Interleaved A/B harness for the r20 optimization decisions.

VERDICT r19 requires the contested `ensure_min_parallelism` repartition
(agg_pricing_summary / star_trips_fact) to be re-measured INTERLEAVED in
one session (fresh-session single-query timings are polluted by JIT and
host windows), and the new LSH grouped-pair generation + lazy-checkpoint
components loop to be measured in-band. Each named experiment runs its
two variants strictly alternated (order swapping every round) with a
min-of-2 lineitem scan-count canary once per round, so both variants
share every host window; per-variant medians only count rounds whose
canary sits in the stable band unless --keep-all.

Usage: python tools/ab_r20.py [rounds] [experiment ...]
Experiments: lsh, pricing, star, clusters  (default: all)
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from distributed_mobility_data_pipeline_spark.session import get_spark
from distributed_mobility_data_pipeline_spark.operators import (
    aggregates as agg_ops,
    dedup_llm as ddllm_ops,
    layout as layout_ops,
    star as star_ops,
)
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _docs(spark):
    return entrymod._t(spark, SF_DIR, "documents")


def _lsh_old(spark):
    """r19 shape: banded-table self-join candidates (the pre-r20 code),
    everything else identical to minhash_lsh_pairs."""
    docs = _docs(spark)
    doc_tbl = ddllm_ops._minhash_doc_table(docs).persist()
    n_bands = ddllm_ops.N_PERM // ddllm_ops.BAND_SIZE
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"mh_{b * ddllm_ops.BAND_SIZE + j}").alias(f"v{j}")
                for j in range(ddllm_ops.BAND_SIZE)
            ],
        )
        for b in range(n_bands)
    ]
    banded = doc_tbl.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bkey")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, F.col("a.bkey") == F.col("b.bkey"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sets = doc_tbl.select("doc_id", F.col("_grams").alias("shs"))
    verified = (
        candidates.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("common"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "jaccard",
        (F.col("jaccard") >= 0.5).cast("int").alias("is_dup"),
    )


def _clusters_eager(spark):
    """r19 components loop: eager per-iteration localCheckpoint + a
    separate convergence-count job (the pre-r20 dup_labels), summarized
    exactly like dup_clusters."""
    docs = _docs(spark)
    pairs = ddllm_ops.minhash_lsh_pairs(docs)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = nodes.select(
        F.col("doc_id"), F.col("doc_id").alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(10):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "step_label"
            ),
            "label",
        )
        chase = stepped.select(
            F.col("doc_id").alias("_cd"), F.col("step_label").alias("_cl")
        )
        updated = stepped.join(chase, stepped.step_label == chase._cd, "left").select(
            "doc_id",
            F.least(
                F.col("step_label"), F.coalesce("_cl", F.col("step_label"))
            ).alias("new_label"),
            "label",
        )
        mat = updated.localCheckpoint(eager=True)  # <-- the r19 variant
        changed = mat.filter(F.col("new_label") != F.col("label")).count()
        labels = mat.select("doc_id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    singletons = (
        docs.select("doc_id")
        .join(nodes, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    full = labels.unionByName(singletons).select(
        "doc_id", F.col("label").alias("cluster_id")
    )
    return full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def _rfm_old(spark):
    """r19 shape: three per-dimension binned_value_histograms passes
    over the cached rollup (the pre-r20 rfm_scores_hist), rebuilt here
    inline; everything else identical."""
    from distributed_mobility_data_pipeline_spark.operators import sketches

    orders = entrymod._t(spark, SF_DIR, "orders")
    customer_col, date_col, amount_col = "o_custkey", "o_orderdate", "o_totalprice"
    n_tiles, n_bins = 4, 40
    r_range, f_range, m_range = (0.0, 4000.0), (0.0, 100.0), (0.0, 10_000_000.0)
    per0 = (
        orders.groupBy(customer_col)
        .agg(
            F.max(date_col).alias("last_order_date"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col(amount_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .persist()
    )
    asof = per0.agg(F.max("last_order_date").alias("_asof"))
    per = per0.crossJoin(F.broadcast(asof)).withColumn(
        "recency_days",
        F.datediff(F.col("_asof"), F.col("last_order_date")).cast("double"),
    )
    qs = [float(i) / n_tiles for i in range(1, n_tiles)]

    def _cut_rows(col, lo, hi, tag):
        hist = sketches.binned_value_histograms(per, [], col, lo, hi, n_bins)
        return sketches.quantiles_from_histograms(
            hist, [], qs, lo, hi, n_bins
        ).select(F.lit(tag).alias("_dim"), "q", "value_q")

    def _dim_arr(tag):
        return F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_dim") == tag, F.struct("q", "value_q"))
                )
            ),
            lambda s: s["value_q"],
        )

    cuts = (
        _cut_rows("recency_days", *r_range, "r")
        .unionByName(_cut_rows("frequency", *f_range, "f"))
        .unionByName(_cut_rows("monetary", *m_range, "m"))
        .groupBy()
        .agg(
            _dim_arr("r").alias("_rc"),
            _dim_arr("f").alias("_fc"),
            _dim_arr("m").alias("_mc"),
        )
    )

    def _score_above(value_col, cuts_col):
        return (
            F.lit(1)
            + F.size(F.filter(F.col(cuts_col), lambda c: c < F.col(value_col)))
        ).cast("int")

    def _score_below(value_col, cuts_col):
        return (
            F.lit(1)
            + F.size(F.filter(F.col(cuts_col), lambda c: c > F.col(value_col)))
        ).cast("int")

    scored = per.crossJoin(F.broadcast(cuts)).select(
        F.col(customer_col).alias("custkey"),
        F.col("recency_days").cast("bigint").alias("recency_days"),
        "frequency",
        "monetary",
        _score_below("recency_days", "_rc").alias("r_score"),
        _score_above("frequency", "_fc").alias("f_score"),
        _score_above("monetary", "_mc").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


def _min_cost_old(spark):
    """r19 shape: aggregate ALL of lineitem to (partkey, suppkey) before
    the selective p_size broadcast join."""
    from pyspark.sql import Window

    part = entrymod._t(spark, SF_DIR, "part")
    supplier = entrymod._t(spark, SF_DIR, "supplier")
    nation = entrymod._t(spark, SF_DIR, "nation")
    region = entrymod._t(spark, SF_DIR, "region")
    lineitem = entrymod._t(spark, SF_DIR, "lineitem")
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cost = lineitem.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    offers = (
        cost.join(
            F.broadcast(
                part.filter(F.col("p_size") == 5).select("p_partkey", "p_brand")
            ),
            F.col("partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("partkey")
    return (
        offers.withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .select(
            F.col("partkey").alias("p_partkey"),
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            "unit_cost",
        )
    )


def _q5_old(spark):
    """r19 shape: no customer/supplier nation pre-filter."""
    from distributed_mobility_data_pipeline_spark.functions.exact import dec

    region = entrymod._t(spark, SF_DIR, "region")
    nation = entrymod._t(spark, SF_DIR, "nation")
    customer = entrymod._t(spark, SF_DIR, "customer")
    orders = entrymod._t(spark, SF_DIR, "orders")
    lineitem = entrymod._t(spark, SF_DIR, "lineitem")
    supplier = entrymod._t(spark, SF_DIR, "supplier")
    one = F.lit(1).cast("decimal(18,6)")
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nations), supplier.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


EXPERIMENTS = {
    # name: (variant_a_label, build_a, variant_b_label, build_b)
    "lsh": (
        "selfjoin_r19",
        _lsh_old,
        "grouped_r20",
        lambda s: ddllm_ops.minhash_lsh_pairs(_docs(s)),
    ),
    "pricing": (
        "repartitioned",
        lambda s: agg_ops.pricing_summary(
            layout_ops.ensure_min_parallelism(entrymod._t(s, SF_DIR, "lineitem"))
        ),
        "plain",
        lambda s: agg_ops.pricing_summary(entrymod._t(s, SF_DIR, "lineitem")),
    ),
    "star": (
        "repartitioned",
        lambda s: star_ops.trips_fact(
            layout_ops.ensure_min_parallelism(entrymod._t(s, SF_DIR, "lineitem")),
            entrymod._t(s, SF_DIR, "orders"),
            entrymod._t(s, SF_DIR, "customer"),
            entrymod._t(s, SF_DIR, "supplier"),
            entrymod._t(s, SF_DIR, "part"),
        ),
        "plain",
        lambda s: star_ops.trips_fact(
            entrymod._t(s, SF_DIR, "lineitem"),
            entrymod._t(s, SF_DIR, "orders"),
            entrymod._t(s, SF_DIR, "customer"),
            entrymod._t(s, SF_DIR, "supplier"),
            entrymod._t(s, SF_DIR, "part"),
        ),
    ),
    "mincost": (
        "agg_first_r19",
        _min_cost_old,
        "prefiltered_r20",
        lambda s: agg_ops.min_cost_supplier(
            entrymod._t(s, SF_DIR, "part"),
            entrymod._t(s, SF_DIR, "supplier"),
            entrymod._t(s, SF_DIR, "nation"),
            entrymod._t(s, SF_DIR, "region"),
            entrymod._t(s, SF_DIR, "lineitem"),
        ),
    ),
    "q5": (
        "unfiltered_r19",
        _q5_old,
        "semifiltered_r20",
        lambda s: agg_ops.local_supplier_volume(
            entrymod._t(s, SF_DIR, "region"),
            entrymod._t(s, SF_DIR, "nation"),
            entrymod._t(s, SF_DIR, "customer"),
            entrymod._t(s, SF_DIR, "orders"),
            entrymod._t(s, SF_DIR, "lineitem"),
            entrymod._t(s, SF_DIR, "supplier"),
            "ASIA",
        ),
    ),
    "rfm": (
        "three_hist_r19",
        _rfm_old,
        "fused_hist_r20",
        lambda s: __import__(
            "distributed_mobility_data_pipeline_spark.operators.behavior",
            fromlist=["behavior"],
        ).rfm_scores_hist(entrymod._t(s, SF_DIR, "orders")),
    ),
    "clusters": (
        "eager_ckpt_r19",
        _clusters_eager,
        "lazy_ckpt_r20",
        lambda s: ddllm_ops.dup_clusters(
            _docs(s), ddllm_ops.minhash_lsh_pairs(_docs(s))
        ),
    ),
}


def _canary_min2(spark):
    samples = []
    for _ in range(2):
        df = entrymod._t(spark, SF_DIR, "lineitem")
        t0 = time.time()
        df.count()
        samples.append(time.time() - t0)
    return round(min(samples), 4)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    wanted = sys.argv[2:] or list(EXPERIMENTS)
    spark = get_spark("ab_r20")
    # warm-up: scan path + count-agg codegen
    for t in ("lineitem", "orders", "customer", "supplier", "part", "documents"):
        _noop(entrymod._t(spark, SF_DIR, t))
    _canary_min2(spark)
    for name in wanted:
        la, fa, lb, fb = EXPERIMENTS[name]
        # one throwaway run per variant: JIT + persist-cache warm-up so
        # round 1 sees the same cache state later rounds see
        spark.sparkContext.setJobDescription(f"ab:{name}:warmup")
        _noop(fa(spark))
        _noop(fb(spark))
        runs_a, runs_b, canaries = [], [], []
        for r in range(rounds):
            canaries.append(_canary_min2(spark))
            order = [(la, fa, runs_a), (lb, fb, runs_b)]
            if r % 2:
                order.reverse()
            for label, fn, out in order:
                spark.sparkContext.setJobDescription(f"ab:{name}:{label}:r{r}")
                t0 = time.time()
                _noop(fn(spark))
                out.append(round(time.time() - t0, 3))
        med_a, med_b = statistics.median(runs_a), statistics.median(runs_b)
        print(json.dumps({
            "experiment": name,
            "variant_a": la, "runs_a": runs_a, "median_a": round(med_a, 3),
            "variant_b": lb, "runs_b": runs_b, "median_b": round(med_b, 3),
            "b_over_a_speedup": round(med_a / med_b, 3) if med_b else None,
            "round_canaries": canaries,
        }))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
