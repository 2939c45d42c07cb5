"""Distributed k-means IVF codebook training (VERDICT r4 #2): trained
codebooks must beat a degenerate handpicked one on recall, be
deterministic, and keep the corpus shuffle-free during assignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from weaver_spark.operators.similarity import (
    knn_bruteforce,
    knn_ivf,
    recall_at_k,
    train_ivf_codebook,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    rows = []
    for c in range(3):
        center = rng.normal(size=16) * 10
        for i in range(30):
            v = center + rng.normal(size=16)
            rows.append((c * 30 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_trained_codebook_beats_degenerate_init(spark, vectors):
    queries = vectors.where(F.col("vec_id").isin(5, 35, 65))
    exact = knn_bruteforce(vectors, queries, k=5)

    # degenerate handpicked codebook: 3 lowest ids are all in cluster 0,
    # so clusters 1/2 collapse into one cell and single-probe recall dies
    bad = vectors.where(F.col("vec_id") < 3)
    bad_recall = recall_at_k(exact, knn_ivf(vectors, queries, bad, k=5, n_probe=1), k=5)

    trained = train_ivf_codebook(vectors, n_cells=3, n_iters=5)
    good_recall = recall_at_k(
        exact, knn_ivf(vectors, queries, trained, k=5, n_probe=1), k=5
    )
    assert good_recall == 1.0
    assert good_recall > bad_recall


def test_training_is_deterministic(spark, vectors):
    a = train_ivf_codebook(vectors, n_cells=3, n_iters=3).collect()
    b = train_ivf_codebook(vectors, n_cells=3, n_iters=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_trained_centroids_are_unit_norm(spark, vectors):
    rows = train_ivf_codebook(vectors, n_cells=3, n_iters=3).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-9


def test_init_limit_subset_init(spark, vectors):
    # init over the 40 lowest ids (clusters 0 + part of 1) still
    # converges to a full-corpus codebook through the Lloyd iterations
    trained = train_ivf_codebook(vectors, n_cells=3, n_iters=8, init_limit=40)
    queries = vectors.where(F.col("vec_id").isin(5, 35, 65))
    exact = knn_bruteforce(vectors, queries, k=5)
    r = recall_at_k(exact, knn_ivf(vectors, queries, trained, k=5, n_probe=2), k=5)
    assert r >= 0.8


def test_assignment_never_shuffles_corpus(spark, vectors):
    """The per-iteration job = map-side assignment + partial agg: the
    ONLY exchange is the n_cells-row aggregate shuffle — the corpus
    itself must not repartition (the 100 TB property)."""
    from weaver_spark.operators.similarity import (
        _as_double,
        _cell_structs,
        _norm_col,
    )

    cents = [(0, [1.0] * 16), (1, [-1.0] * 16)]
    base = vectors.select(_as_double(F.col("embedding")).alias("v")).withColumn(
        "vn", _norm_col(F.col("v"))
    )
    assigned = base.withColumn(
        "cell", -F.array_max(_cell_structs(F.col("v"), F.col("vn"), cents))["negcell"]
    )
    agg = assigned.groupBy("cell").agg(
        F.count("*").alias("n"),
        *[F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}") for i in range(16)],
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: hashpartitioning(cell) of the partial aggs
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(cell" in plan


def test_init_job_count_is_logarithmic(spark, vectors):
    """VERDICT r5 #3: init must run O(log n_cells) Spark jobs, not one
    agg job per centroid. n_cells=24 -> rounds = ceil(log2 24) = 5;
    with <= ~3 jobs/round (TakeOrdered + checkpoint) plus setup and one
    Lloyd iteration the whole call stays far under the 24+ jobs the
    per-centroid init needed for its init alone."""
    sc = spark.sparkContext
    sc.setJobGroup("ivf-init-count", "job-count assertion")
    try:
        train_ivf_codebook(vectors, n_cells=24, n_iters=1)
    finally:
        sc.setJobGroup(None, None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("ivf-init-count"))
    assert n_jobs <= 3 * 5 + 8, n_jobs


def test_empty_cells_keep_previous_centroid(spark):
    # 2 tight points, 3 cells: one cell never owns a point and must
    # survive with its init vector instead of NaN-ing out
    rows = [(0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = train_ivf_codebook(df, n_cells=3, n_iters=4).collect()
    assert len(out) == 3
    for r in out:
        assert all(np.isfinite(x) for x in r["embedding"])
