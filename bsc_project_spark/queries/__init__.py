"""Driver-checkable query registry.

Each query is a QuerySpec: a Spark callable (spark, sf_dir) -> DataFrame and
an optional DuckDB oracle SQL string over the same parquet tables.  Column
names/aliases match exactly between the two sides (the driver sorts columns
by name before value-hashing); double-valued outputs are rounded identically
on both sides.
"""

from __future__ import annotations

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


_REGISTERED_DIRS: dict[tuple[int, str], bool] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata parquet files as temp views (idempotent per
    session+dir)."""
    key = (id(spark), sf_dir)
    if _REGISTERED_DIRS.get(key):
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED_DIRS[key] = True


def sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


# The driver's correctness gate checks a 50-query PREFIX of this registry,
# so with 100+ registered queries the ordering decides which get a row in
# the driver's hard signal.  Priority rationale lives on _CHECK_FIRST below;
# union of the driver files across rounds covers every registered query, and
# scripts/check_oracle.py remains the local all-queries gate every session.
_CHECK_FIRST = [
    # --- the driver gate checks a 50-row PREFIX (r01 = 35/36, r02 = 50/64,
    # r03 = 50/137).  Round-4 priority: (1) the 39 queries the driver has
    # NEVER checked (union of CORRECTNESS_r01-r03 covers the other 98; all 39
    # are green under scripts/check_oracle.py, the byte-identical local gate,
    # at sf0.001 and sf0.01), then (2) every query whose implementation
    # changes this round, so the hard signal re-covers them.  With this
    # rotation the r01-r04 union covers all 137 registered queries.
    # scripts/check_gate_prefix.py enforces (2) mechanically from git diffs.
    "q_ann_recall",
    "q_pagerank",
    "q_triangle_count",
    "q_bfs_distance",
    "q_zorder_layout",
    "q_url_canon",
    "q_markov_transitions",
    "q_random_walks",
    "q_window_dedup",
    "q_grid_radius_join",
    "q_label_prop",
    "q_source_kl",
    "q_robots_filter",
    "q_quantized_ann",
    "q_shard_assign",
    "q_chi2_independence",
    "q_data_quality",
    "q_burst_detection",
    "q_session_paths",
    "q_basket_pairs",
    "q_k_anonymity",
    "q_hits_scores",
    "q_lang_confusion",
    "q_wilson_ranking",
    "q_ngram_novelty",
    "q_json_schema_profile",
    "q_degree_histogram",
    "q_sample_apportion",
    "q_sorted_neighborhood",
    "q_corpus_diversity",
    "q_audience_overlap",
    "q_dedup_savings",
    "q_rfm_features",
    "q_type_token_ratio",
    "q_pareto_users",
    "q_dow_profile",
    "q_prefix_join",
    "q_embed_covariance",
    "q_cooccurrence",
    # changed this round (parameterized K / trained-centroid seeding; oracle
    # added for the kmeans assignment) — must re-earn their driver rows
    "q_semantic_dedup",
    "q_ivf_kmeans",
    # new in round 4 — never driver-checked, must be inside the prefix
    # (scripts/check_gate_prefix.py enforces this from git diffs)
    "q_kcore",
    "q_sparse_knn",
    "q_pq_codes",
    "q_winnowing",
    "q_containment",
    "q_cdc_chunks",
    # remaining slots: flagship repeats (highest churn risk if the
    # two-phase rank machinery is touched this round).  Six double-green
    # (r02+r03, unchanged since) repeats rotated out below the boundary
    # to make room for the six round-4 ops.
    "q_sequence_pack",
    "q_domain_cap",
    "q_phash_pairs",
    # ---- 50-row prefix boundary ----
    "q_sort_rank",
    "q_length_quantiles",
    "q_quality_curriculum",
    "q_weighted_sample",
    "q_web_pipeline",
    "q_funnel",
    # 51+: green driver rows in r01/r02/r03 and unchanged since; the local
    # gate (scripts/check_oracle.py) still runs them all every session.
    "q_sessionize_batch",
    "q_event_windows",
    "q_json_props",
    "q_pricing_summary",
    "q_segment_revenue",
    "q_asof_join",
    "q_main_content",
    "q_repetition_filter",
    "q_paragraph_dedup",
    "q_simhash_pairs",
    "q_pii_scrub",
    "q_range_join",
    "q_corpus_curation",
    "q_kmv_merge",
    "q_cms_topk",
    "q_norm_dedup",
    "q_hll_distinct",
    "q_substring_dedup",
    "q_inverted_index",
    "q_regional_revenue",
    "q_bloom_prune",
    "q_salted_join",
    "q_rollup_cube",
    "q_hopping_windows",
    "q_anchor_text",
    "q_bpe_tokens",
    "q_bm25",
    "q_cohort_retention",
    "q_group_percentiles",
    "q_fuzzy_join",
    "q_char_entropy",
    "q_chunk_windows",
    "q_decay_score",
    "q_attribution",
    "q_skyline",
    "q_bpe_pairs",
    "q_mad_outliers",
    "q_oov_rate",
    "q_scd2_history",
    "q_gap_fill",
]
_CHECK_LAST = [
    # double-green in CORRECTNESS_r01 AND _r02, untouched since — deferred
    # to make prefix room for the 7 round-3 additions above
    "q_pivot_matrix",
    "q_resume_anti",
    "q_train_test_split",
    "q_seg_metrics",
    "q_confusion",
    "q_box_mad",
    "q_dedup_exact",
    "q_lsh_pairs",
    "q_minhash_sig",
    "q_ngram_jaccard",
    "q_pair_join",
    "q_merge_lineage",
    "q_union_pages",
    "q_dot_to_null",
    "q_clean_year",
    "q_ffill",
    "q_cer",
    "q_worst_cer",
    "q_cer_stats",
    "q_crop_filter",
    "q_topk_orders",
    "q_box_counts",
    "q_token_count",
    "q_quality_score",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_pixel_accuracy",
]


def all_queries() -> dict[str, QuerySpec]:
    from . import eventops, graphops, relational, similarity, skew, textops, visual, webtext

    out: dict[str, QuerySpec] = {}
    out.update(relational.QUERIES)
    out.update(textops.QUERIES)
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
