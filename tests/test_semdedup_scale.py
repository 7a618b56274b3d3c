"""Scale-shape pins for the trained-centroid SemDeDup (queries/similarity.py).

Round-3 review flagged two scale defects in q_semantic_dedup: K hard-coded
to 8 (within-cluster pairwise cost N^2/8 — unbounded per-cluster
populations as the corpus grows) and naive `vec_id < 8` centroids.  The
round-4 rewrite derives K from corpus size (K = max(8, ceil(N / 64))) and
trains centroids with the exact quantized-Lloyd chain.  These tests pin:

  1. K really is derived from N inside the query (both engines);
  2. under a PLANTED SKEWED embedding distribution, the trained
     clustering keeps the within-cluster pair count bounded — orders of
     magnitude below N^2 and below what the old fixed-K naive seeding
     produced on the same data;
  3. the Lloyd plan never funnels the corpus through a single task:
     every Exchange SinglePartition in the physical plan receives only
     map-side-combined partial-aggregate state (the bounded seed fold /
     scalar K count), never a Sort (which would be a global-order window).

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
    lloyd_ctes,
)

D = 16  # embedding dim for the planted corpus


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
    for _ in range(1024 - vid):
        rows.append((vid, (rng.randn(D) * 10.0).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    df.createOrReplaceTempView("skew_corpus")
    return rows


def _assign(spark, k_filter, extra=()):
    chain = lloyd_ctes(
        "spark", "SELECT vec_id, v FROM skew_corpus", 2, k_filter, extra
    )
    return spark.sql(f"WITH {chain} SELECT vec_id, centroid_id FROM ll_assign")


_KK = (
    "ll_kk AS (SELECT GREATEST(8, CAST(CEIL(COUNT(*) / "
    f"{_SEMDEDUP_TARGET_POP}.0) AS INT)) AS k FROM ll_vq)"
)


def test_k_is_derived_from_corpus_size(spark, skew_corpus):
    got = _assign(spark, "(SELECT k FROM ll_kk)", (_KK,))
    n_clusters = got.select("centroid_id").distinct().count()
    # N=1024, target pop 64 -> K=16 derived; all 16 seeds are distinct
    # anchors, so all 16 clusters must be populated.
    assert n_clusters == 16


def test_within_cluster_pairs_bounded_under_skew(spark, skew_corpus):
    n = len(skew_corpus)
    derived = _assign(spark, "(SELECT k FROM ll_kk)", (_KK,))
    pops = [r["c"] for r in derived.groupBy("centroid_id").agg(
        F.count("*").alias("c")).collect()]
    pairs = sum(p * (p - 1) // 2 for p in pops)
    # all-pairs would be n*(n-1)/2 = 523 776; the derived-K trained
    # clustering must stay within a small constant of the balanced ideal
    # (K * (n/K choose 2) ~= 33 264 at K=16).
    k = max(8, math.ceil(n / _SEMDEDUP_TARGET_POP))
    balanced = k * ((n // k) * (n // k - 1) // 2)
    assert pairs <= 4 * balanced, (pairs, balanced, sorted(pops, reverse=True))
    assert pairs < n * (n - 1) // 2 / 8

    # and it must beat the round-3 shape (fixed K=8) on the same data —
    # fewer candidate pairs means less within-cluster O(pop^2) work.
    old = _assign(spark, "8")
    old_pops = [r["c"] for r in old.groupBy("centroid_id").agg(
        F.count("*").alias("c")).collect()]
    old_pairs = sum(p * (p - 1) // 2 for p in old_pops)
    assert pairs < old_pairs


def test_lloyd_plan_has_no_global_sort_task(spark, skew_corpus):
    """Every Exchange SinglePartition in the Lloyd physical plan must be
    fed by a partial (map-side-combined) keyless aggregate — the bounded
    seed fold or the scalar K count — never by a Sort, which is the
    signature of a global-order window funneling all rows to one task."""
    for kf, extra in (("(SELECT k FROM ll_kk)", (_KK,)), ("16", ())):
        plan = (
            _assign(spark, kf, extra)
            ._jdf.queryExecution().executedPlan().toString()
        )
        lines = plan.splitlines()
        hits = 0
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            hits += 1
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert "partial_" in child and "keys=[]" in child, (
                "SinglePartition exchange fed by non-partial child "
                f"(global sort/window?):\n{line}\n{child}"
            )
            assert "Sort" not in child
        assert hits >= 1  # the bounded seed fold is expected to be there
