"""ANN quality on clustered synthetic embeddings: with well-separated
clusters, IVF (and brute force) must achieve perfect recall@1 — the
structural guarantee that the coarse quantizer probes the right cell
(regression test for ranking cells by Euclidean distance, not raw dot)."""

from __future__ import annotations

import numpy as np
import pytest

from distributed_mobility_data_pipeline_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(0, 10, size=(3, 16))
    rows = []
    vid = 0
    for label, c in enumerate(centers):
        for _ in range(30):
            v = c + rng.normal(0, 0.1, size=16)
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_brute_force_top1_stays_in_cluster(clustered):
    out = similarity.cosine_topk(clustered, [0, 30, 60], 1).collect()
    assert len(out) == 3
    for r in out:
        assert r.c_label == r.qid // 30  # nearest neighbor shares the cluster


def test_ivf_recall_at_1_on_separated_clusters(clustered):
    truth = {
        r.qid: r.vid
        for r in similarity.cosine_topk(clustered, [0, 30, 60], 1).collect()
    }
    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=3)
    approx = {
        r.qid: r.vid
        for r in similarity.ivf_ann(
            clustered, [0, 30, 60], n_clusters=3, n_probe=1, k=1, centroids=cents
        ).collect()
    }
    # n_probe=1 forces reliance on correct cell ranking: the query's own
    # (Euclidean-nearest) cell must be the one probed
    assert approx == truth


def test_ivf_results_are_valid_cosines(clustered):
    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=3)
    out = similarity.ivf_ann(
        clustered, [0, 30, 60], n_clusters=3, centroids=cents
    ).collect()
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in out)
    assert all(r.rank <= 3 for r in out)


def test_ivf_prefit_quantizer_matches_inline_fit(clustered):
    # the offline path: fit once, pass centroids in — results must be
    # identical to the convenience in-query fit (same seed, same metric),
    # and the query plan must carry no KMeans training. The inline fit
    # intentionally exercises the warned convenience path.
    import warnings

    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=3)
    assert len(cents) == 3 and all(len(c) == 16 for _, c in cents)
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore",
            message=".*without precomputed centroids.*",
            category=RuntimeWarning,
        )
        inline = sorted(map(tuple, similarity.ivf_ann(
            clustered, [0, 30, 60], n_clusters=3).collect()))
    prefit = sorted(map(tuple, similarity.ivf_ann(
        clustered, [0, 30, 60], n_clusters=3, centroids=cents).collect()))
    assert inline == prefit


def test_assign_ivf_cells_is_euclidean_argmin(clustered):
    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=3)
    rows = similarity.assign_ivf_cells(clustered, cents).collect()
    cent_map = {cell: np.array(c) for cell, c in cents}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        best = min(cent_map, key=lambda k: float(np.sum((v - cent_map[k]) ** 2)))
        assert r.cell == best, f"vec {r.vec_id}: got {r.cell}, want {best}"


def test_pq_encode_is_subspace_argmin(clustered):
    books = similarity.fit_pq_codebooks(clustered, m=4, k=3)
    assert len(books) == 4 and all(len(b) == 3 for b in books)
    rows = similarity.encode_pq(clustered, books).collect()
    for r in rows[:20]:
        v = np.array(r.embedding, dtype=np.float64)
        for j, book in enumerate(books):
            sub = v[j * 4 : (j + 1) * 4]
            best = min(
                book, key=lambda kc: float(np.sum((sub - np.array(kc[1])) ** 2))
            )[0]
            assert r.codes[j] == best, f"vec {r.vec_id} sub {j}"


def test_pq_ann_recall_at_1_on_separated_clusters(clustered):
    # well-separated clusters: even 3-code-per-subspace compression must
    # keep the top-1 neighbor inside the right cluster
    books = similarity.fit_pq_codebooks(clustered, m=4, k=3)
    out = similarity.pq_ann(clustered, [0, 30, 60], books, k=1).collect()
    assert len(out) == 3
    for r in out:
        assert r.c_label == r.qid // 30


def test_pq_encode_layout_independent(clustered):
    books = similarity.fit_pq_codebooks(clustered, m=4, k=3)
    a = {r.vec_id: list(r.codes) for r in similarity.encode_pq(clustered, books).collect()}
    b = {
        r.vec_id: list(r.codes)
        for r in similarity.encode_pq(clustered.repartition(7), books).collect()
    }
    assert a == b


def test_hard_negatives_label_and_order(spark, sf_dir):
    from distributed_mobility_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = sim.hard_negatives(emb, [0, 1, 2], k=4).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert labels[r.qid] == r.q_label
        assert r.neg_label != r.q_label  # every mined pair is a true negative
        by_q.setdefault(r.qid, []).append((r.rank, r.cos_sim))
    for sims in by_q.values():
        ordered = [s for _, s in sorted(sims)]
        assert ordered == sorted(ordered, reverse=True)  # similarity desc by rank


def test_prototype_confusion_sums_and_diagonal(spark, sf_dir):
    from distributed_mobility_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    conf = sim.prototype_confusion(emb).collect()
    total = sum(r.n for r in conf)
    assert total == emb.count()  # every vector classified exactly once
    diag = sum(r.n for r in conf if r.true_label == r.predicted_label)
    # embeddings are generated in label clusters -> nearest-centroid
    # should beat random assignment by a wide margin
    n_labels = emb.select("label").distinct().count()
    assert diag / total > 2.0 / n_labels


def test_label_centroids_partitioning_independent(spark, sf_dir):
    from distributed_mobility_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {(r.label, tuple(r.centroid)) for r in sim.label_centroids(emb).collect()}
    b = {
        (r.label, tuple(r.centroid))
        for r in sim.label_centroids(emb.repartition(17)).collect()
    }
    assert a == b  # decimal accumulation: bit-identical at any layout


def test_ivfpq_recall_at_1_on_separated_clusters(clustered):
    # the composed index: cells prune + codes compress; on well-
    # separated clusters the top-1 must stay in the anchor's cluster
    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=6)
    books = similarity.fit_pq_codebooks(clustered, m=4, k=3)
    out = similarity.ivfpq_ann(
        clustered, [0, 30, 60], cents, books, n_probe=2, k=1
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.c_label == r.qid // 30


def test_ivfpq_prunes_to_probed_cells(clustered):
    cents = similarity.fit_ivf_quantizer(clustered, n_clusters=6)
    books = similarity.fit_pq_codebooks(clustered, m=4, k=3)
    # n_probe = all cells degenerates to full PQ ranking: results must
    # match pq_ann exactly (same codes, same asymmetric distance)
    full = {
        (r.qid, r.rank): r.vid
        for r in similarity.pq_ann(clustered, [0, 30], books, k=3).collect()
    }
    probed = {
        (r.qid, r.rank): r.vid
        for r in similarity.ivfpq_ann(
            clustered, [0, 30], cents, books, n_probe=6, k=3
        ).collect()
    }
    assert probed == full


def test_fixed_ivf_centroids_deterministic_shape():
    cents = similarity.fixed_ivf_centroids(16, n_clusters=5)
    assert [cell for cell, _ in cents] == [0, 1, 2, 3, 4]
    assert all(len(c) == 16 for _, c in cents)
    # pure formula: a second call is bitwise-identical
    assert cents == similarity.fixed_ivf_centroids(16, n_clusters=5)


def test_ivf_fixed_centroids_full_probe_matches_brute_force(clustered):
    # with n_probe = n_clusters the IVF pipeline degenerates to exact
    # cosine top-k regardless of centroid quality — pins the fixed-
    # centroid path (the sim_ivf_ann_fixed oracle twin) end to end
    cents = similarity.fixed_ivf_centroids(16, n_clusters=4)
    truth = {
        (r.qid, r.rank): r.vid
        for r in similarity.cosine_topk(clustered, [0, 30, 60], 3).collect()
    }
    fixed = {
        (r.qid, r.rank): r.vid
        for r in similarity.ivf_ann(
            clustered, [0, 30, 60], n_probe=4, k=3, centroids=cents
        ).collect()
    }
    assert fixed == truth


def test_ivfpq_fixed_full_probe_matches_pq_ann(clustered):
    # with n_probe = n_clusters the IVF stage prunes nothing, so the
    # composed index must return exactly what pure PQ ADC returns with
    # the same codebooks — pins the fixed-model composition (the
    # sim_ivfpq_ann_fixed oracle twin) end to end: assignment and probe
    # machinery can only REMOVE candidates, never change a score
    cents = similarity.fixed_ivf_centroids(16, n_clusters=4)
    books = similarity.fixed_pq_codebooks(16, m=4, k=8)
    pure_pq = {
        (r.qid, r.rank): (r.vid, round(r.approx_dot, 9))
        for r in similarity.pq_ann(clustered, [0, 30, 60], books, k=3).collect()
    }
    composed = {
        (r.qid, r.rank): (r.vid, round(r.approx_dot, 9))
        for r in similarity.ivfpq_ann(
            clustered, [0, 30, 60], cents, books, n_probe=4, k=3
        ).collect()
    }
    assert composed == pure_pq
