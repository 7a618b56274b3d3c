"""Scale-shape pins for the trained-centroid SemDeDup (queries/similarity.py).

Round-3 review flagged two scale defects in q_semantic_dedup: K hard-coded
to 8 (within-cluster pairwise cost N^2/8 — unbounded per-cluster
populations as the corpus grows) and naive `vec_id < 8` centroids.  The
round-4 rewrite derives K from corpus size (K = max(8, ceil(N / 64))) and
trains centroids with exact quantized Lloyd (``lloyd_assign``; DuckDB
replays it via ``lloyd_duck_ctes`` — the oracle hash match is the
equivalence proof).  These tests pin:

  1. K really is derived from N (the query trains K = ceil(N/64) clusters
     and all of them are populated under well-separated seeds);
  2. under a PLANTED SKEWED embedding distribution, the trained
     clustering keeps the within-cluster pair count bounded — orders of
     magnitude below N^2 and below fixed K=8 on the same data;
  3. the assignment plan never funnels the corpus through a single task
     (no SinglePartition exchange: centroids broadcast, the argmax
     window partitions by vec_id).

Reference analogue: none — the reference repo (rmw874/bsc_project) has no
clustering; this is the engine's LLM-data-pipeline surface.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bsc_project_spark.queries.similarity import (
    _SEMDEDUP_TARGET_POP,
    lloyd_assign,
)

D = 16  # embedding dim for the planted corpus
N = 1024


@pytest.fixture(scope="module")
def skew_corpus(spark):
    """1024 vectors: ids 0-15 are 16 well-separated subcluster anchors,
    ids 16-783 pile 48 more points around each anchor (the skew: 75% of
    the corpus lives in one 'dense region' of 16 tight subclusters),
    ids 784-1023 are spread-out singletons."""
    rng = np.random.RandomState(7)
    anchors = rng.randn(16, D) * 10.0
    rows = []
    for i in range(16):
        rows.append((i, anchors[i].tolist()))
    vid = 16
    for i in range(16):
        for _ in range(48):
            rows.append((vid, (anchors[i] + rng.randn(D) * 0.05).tolist()))
            vid += 1
    for _ in range(N - vid):
        rows.append((vid, (rng.randn(D) * 10.0).tolist()))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _pairs(df) -> int:
    pops = [
        r["c"]
        for r in df.groupBy("centroid_id").agg(F.count("*").alias("c")).collect()
    ]
    return sum(p * (p - 1) // 2 for p in pops)


def test_k_is_derived_from_corpus_size(spark, skew_corpus):
    k = max(8, math.ceil(N / _SEMDEDUP_TARGET_POP))
    assert k == 16  # the derivation the query applies to its corpus count
    got = lloyd_assign(spark, skew_corpus, iters=2, k=k)
    # all 16 derived clusters are populated (seeds are distinct anchors)
    assert got.select("centroid_id").distinct().count() == 16


def test_within_cluster_pairs_bounded_under_skew(spark, skew_corpus):
    k = max(8, math.ceil(N / _SEMDEDUP_TARGET_POP))
    derived = lloyd_assign(spark, skew_corpus, iters=2, k=k)
    pairs = _pairs(derived)
    # all-pairs would be n*(n-1)/2 = 523 776; the derived-K trained
    # clustering must stay within a small constant of the balanced ideal
    # (K * (n/K choose 2) ~= 32 256 at K=16)
    balanced = k * ((N // k) * (N // k - 1) // 2)
    assert pairs <= 4 * balanced, (pairs, balanced)
    assert pairs < N * (N - 1) // 2 / 8

    # and it must beat the round-3 shape (fixed K=8) on the same data —
    # fewer candidate pairs means less within-cluster O(pop^2) work
    old_pairs = _pairs(lloyd_assign(spark, skew_corpus, iters=2, k=8))
    assert pairs < old_pairs


def test_lloyd_assignment_plan_has_no_single_partition(spark, skew_corpus):
    """Centroids broadcast, per-vector argmax windows partition by
    vec_id, partial sums combine map-side — nothing in the returned
    assignment plan may funnel the corpus through one task."""
    got = lloyd_assign(spark, skew_corpus, iters=1, k=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
