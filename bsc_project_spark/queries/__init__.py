"""Driver-checkable query registry.

Each query is a QuerySpec: a Spark callable (spark, sf_dir) -> DataFrame and
an optional DuckDB oracle SQL string over the same parquet tables.  Column
names/aliases match exactly between the two sides (the driver sorts columns
by name before value-hashing); double-valued outputs are rounded identically
on both sides.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


# Seen-dirs cache keyed by the LIVE session object (weakly): keying by
# id(spark) collides when a stopped session is garbage-collected and a
# new one reuses its id, silently skipping registration on a session
# that never had the views.  Tests .clear() this to force rebinding.
_REGISTERED_DIRS: "weakref.WeakKeyDictionary[SparkSession, set[str]]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata parquet files as temp views (idempotent per
    session+dir).  The cache is only trusted while every view still
    EXISTS: callers that shadow a table with their own frame and
    dropTempView it afterwards (several tests do) would otherwise leave
    the cache claiming a registration the catalog no longer has, and the
    next query dies with TABLE_OR_VIEW_NOT_FOUND.  One listTables RPC
    per call is the price of making the cache self-healing."""
    seen = _REGISTERED_DIRS.setdefault(spark, set())
    if sf_dir in seen:
        names = {t.name for t in spark.catalog.listTables()}
        if all(t in names for t in TABLES):
            return
        seen.discard(sf_dir)
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    seen.add(sf_dir)


def sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    """Build a (spark, sf_dir) -> DataFrame callable for a SQL text.

    The token ``__P__`` is replaced at CALL time with the session's
    default parallelism (derived from the local master / cluster, i.e.
    $SPARK_GRAFT_CPUS here — scale-adaptive, never a hard-coded core
    count).  Heavy queries use it in ``/*+ REPARTITION(__P__) */`` hints
    placed between a scan and wide narrow work (explodes, per-row
    hashing): the sf parquet files are single-row-group, so without the
    hint the whole pre-shuffle pipeline of a query runs in ONE scan
    task regardless of cores."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        s = sql
        if "__P__" in s:
            s = s.replace("__P__", str(max(spark.sparkContext.defaultParallelism, 1)))
        return spark.sql(s)

    return run


# The driver's correctness gate checks a 50-query PREFIX of this registry,
# so with 100+ registered queries the ordering decides which get a row in
# the driver's hard signal.  Priority rationale lives on _CHECK_FIRST below;
# union of the driver files across rounds covers every registered query, and
# scripts/check_oracle.py remains the local all-queries gate every session.
_CHECK_FIRST = [
    # --- the driver gate checks a 50-row PREFIX.  Round-5 rotation:
    # (1) the seven round-5 ops (never driver-checked): four maintenance
    #     ops, q_dsir, q_incremental_dedup, q_temperature_mix,
    # (2) queries whose implementation changed since the r04 gate commit
    #     (q_data_quality's HUGEINT oracle cast; q_cdc_chunks' mod-p hash;
    #     q_winnowing's widened position packing) — enforced mechanically
    #     by scripts/check_gate_prefix.py,
    # (3) the Lloyd-path family (shared lloyd_assign helper rewritten to
    #     the inlined-centroid map-only argmax in 993277f — the prefix
    #     guard's fingerprint hashes only the QuerySpec callables, so
    #     these are rotated in by hand),
    # (4) 40 of the 48 queries whose freshest driver row is r02 vintage
    #     (every other registered query has an r03/r04 row).  The eight
    #     r02 repeats that don't fit (_CHECK_LAST) are the lowest-churn
    #     single-expression queries, all green under the local
    #     scripts/check_oracle.py dtype-aware gate every session.
    "q_skew_profile",
    "q_compaction_plan",
    "q_ks_distance",
    "q_vocab_growth",
    "q_dsir",
    "q_incremental_dedup",
    "q_temperature_mix",
    "q_data_quality",
    "q_cdc_chunks",
    "q_winnowing",
    "q_prefix_join",
    "q_ivf_kmeans",
    "q_semantic_dedup",
    "q_pq_codes",
    "q_sort_rank",
    "q_row_cluster",
    "q_boundary_f1",
    "q_instance_sep",
    "q_pixel_diff",
    "q_dedup_survivors",
    "q_minhash_est",
    "q_dup_clusters",
    "q_simhash",
    "q_tfidf_topk",
    "q_contamination",
    "q_char_lm_score",
    "q_domain_stats",
    "q_kmv_sketch",
    "q_training_mix",
    "q_stratified_sample",
    "q_cosine_topk",
    "q_ann_lsh_buckets",
    "q_embed_near_dup",
    "q_ivf_assign",
    "q_ivf_search",
    "q_pivot_matrix",
    "q_resume_anti",
    "q_train_test_split",
    "q_seg_metrics",
    "q_confusion",
    "q_box_mad",
    "q_dedup_exact",
    "q_lsh_pairs",
    "q_minhash_sig",
    "q_ffill",
    "q_cer",
    "q_topk_orders",
    "q_quality_score",
    "q_lang_id",
    "q_pixel_accuracy",
    # ---- 50-row prefix boundary ----
]
_CHECK_LAST = [
    # r02-vintage repeats deferred below the boundary (simple
    # single-expression queries, untouched since r01/r02, local-gate
    # green; everything between the boundary and these has an r03/r04
    # driver row).  q_worst_cer / q_cer_stats share q_cer's Levenshtein
    # machinery, so q_cer in the prefix covers the shared path.
    "q_worst_cer",
    "q_cer_stats",
    # shingling machinery covered in-prefix by the minhash family
    "q_ngram_jaccard",
    "q_doc_fingerprint",
    "q_dot_to_null",
    "q_clean_year",
    "q_union_pages",
    "q_pair_join",
    "q_merge_lineage",
    "q_crop_filter",
    "q_box_counts",
    "q_token_count",
]

def all_queries() -> dict[str, QuerySpec]:
    from . import (
        eventops,
        graphops,
        maintenance,
        relational,
        similarity,
        skew,
        textops,
        visual,
        webtext,
    )

    out: dict[str, QuerySpec] = {}
    out.update(relational.QUERIES)
    out.update(textops.QUERIES)
    out.update(maintenance.QUERIES)
    out.update(similarity.QUERIES)
    out.update(eventops.QUERIES)
    out.update(webtext.QUERIES)
    out.update(visual.QUERIES)
    out.update(skew.QUERIES)
    out.update(graphops.QUERIES)
    missing = [n for n in (*_CHECK_FIRST, *_CHECK_LAST) if n not in out]
    assert not missing, f"priority lists name unregistered queries: {missing}"
    ordered = {n: out[n] for n in _CHECK_FIRST}
    for n, spec in out.items():
        if n not in _CHECK_FIRST and n not in _CHECK_LAST:
            ordered[n] = spec
    for n in _CHECK_LAST:
        ordered[n] = out[n]
    return ordered
