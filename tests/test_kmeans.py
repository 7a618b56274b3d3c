"""kmeans_refine (queries/similarity.py) must match a pure-numpy Lloyd
reference exactly: same deterministic init (k lowest vec_ids), same cosine
assignment, same empty-cluster handling — the distributed map-side-partial
/ driver-fold structure is an implementation detail, not a semantics
change."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bsc_project_spark.queries.similarity import (
    _KMEANS_ITERS,
    _KMEANS_K,
    _unit_rows,
    kmeans_refine,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(E: np.ndarray, vec_ids: np.ndarray, k: int, iters: int):
    order = np.argsort(vec_ids)
    E = E[order]
    vec_ids = vec_ids[order]
    cents = E[:k].copy()  # vec_ids are 0..n-1 in testdata; init = lowest k
    for _ in range(iters):
        cid = np.argmax(_unit_rows(E) @ _unit_rows(cents).T, axis=1)
        new = cents.copy()
        for j in range(k):
            mask = cid == j
            if mask.any():
                new[j] = E[mask].mean(axis=0)
        cents = new
    sims = _unit_rows(E) @ _unit_rows(cents).T
    cid = np.argmax(sims, axis=1)
    return cents, dict(zip(vec_ids.tolist(), cid.tolist()))


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    yield df
    df.unpersist()


def test_kmeans_matches_numpy_reference(spark, emb):
    rows = emb.collect()
    vec_ids = np.array([r.vec_id for r in rows])
    E = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
    ref_cents, ref_assign = _numpy_kmeans(E, vec_ids, _KMEANS_K, _KMEANS_ITERS)

    cents, assigned = kmeans_refine(emb)
    assert np.allclose(cents, ref_cents, rtol=1e-9, atol=1e-12)
    got = {r.vec_id: r.centroid_id for r in assigned.collect()}
    assert got == ref_assign


def test_kmeans_refinement_improves_inertia(spark, emb):
    """Trained centroids must fit at least as well as the untrained init
    (mean best-cosine is non-decreasing)."""
    rows = emb.collect()
    E = np.stack([np.asarray(r.v, dtype=np.float64) for r in rows])
    init = E[np.argsort([r.vec_id for r in rows])][:_KMEANS_K]
    cents, assigned = kmeans_refine(emb)
    before = np.max(_unit_rows(E) @ _unit_rows(init).T, axis=1).mean()
    after = np.mean([r.cosine for r in assigned.collect()])
    assert after >= before - 1e-9


def test_kmeans_seeds_k_centroids_with_sparse_ids(spark, emb):
    """Offset/sparse vec_id spaces (ids not starting at 0, gaps) must
    still seed exactly k centroids — the k lowest ids, deterministically."""
    sparse = emb.withColumn("vec_id", F.col("vec_id") * 7 + 1000)
    cents, assigned = kmeans_refine(sparse, k=5, iters=1)
    assert cents.shape[0] == 5
    rows = assigned.collect()
    assert {r.centroid_id for r in rows} <= set(range(5))
    assert len(rows) == emb.count()
    # determinism: same input -> identical centroids
    cents2, _ = kmeans_refine(sparse, k=5, iters=1)
    assert np.array_equal(cents, cents2)
