"""Relational operators Q1-Q15 + metric queries (SURVEY.md §2c/§2d).

Pipeline-shaped inputs (row/col/text triples, y-centers, file pairs, bboxes,
pred/truth masks) are derived deterministically from the driver's testdata
columns so every oracle stays pure SQL (FIXTURES.md §8).  Where Spark SQL
and DuckDB dialects agree the SAME string is used for both sides; dialect
differences (regexp flags, IGNORE NULLS placement, percentile names) get
two variants with identical output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, register_views, sql_query

QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, spark_fn, oracle: str | None, description: str = "") -> None:
    QUERIES[name] = QuerySpec(spark=spark_fn, oracle=oracle, description=description)


# ---------------------------------------------------------------------------
# Q1 pivot — (row, col, text) triples -> wide matrix
# (reference scripts/imgs2csv.py:224-248 create_ocr_matrix)
# ---------------------------------------------------------------------------

def _pivot_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    base = spark.sql(
        "SELECT l_orderkey % 97 AS rw, l_partkey % 5 AS cl, l_returnflag AS txt FROM lineitem"
    )
    out = base.groupBy("rw").pivot("cl", [0, 1, 2, 3, 4]).agg(F.min("txt"))
    return out.toDF("rw", "year", "date_s", "latitude", "longitude", "temperature")


_q(
    "q_pivot_matrix",
    _pivot_spark,
    """
    SELECT l_orderkey % 97 AS rw,
           min(CASE WHEN l_partkey % 5 = 0 THEN l_returnflag END) AS year,
           min(CASE WHEN l_partkey % 5 = 1 THEN l_returnflag END) AS date_s,
           min(CASE WHEN l_partkey % 5 = 2 THEN l_returnflag END) AS latitude,
           min(CASE WHEN l_partkey % 5 = 3 THEN l_returnflag END) AS longitude,
           min(CASE WHEN l_partkey % 5 = 4 THEN l_returnflag END) AS temperature
    FROM lineitem GROUP BY 1
    """,
    "matrix assembly pivot (reference imgs2csv.py:224-248)",
)

# ---------------------------------------------------------------------------
# Q2 union of page matrices with missing columns
# (reference scripts/imgs2csv.py:102-121 merge_page_dataframes)
# ---------------------------------------------------------------------------

def _union_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    top = spark.sql("SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0")
    bottom = spark.sql("SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1")
    return top.unionByName(bottom, allowMissingColumns=True)


_q(
    "q_union_pages",
    _union_spark,
    """
    SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1
    """,
    "top+bottom page concat (reference imgs2csv.py:109)",
)

# ---------------------------------------------------------------------------
# Q3 regex dot -> NULL (reference scripts/imgs2csv.py:112-114)
# ---------------------------------------------------------------------------

_DOT_CELL = """
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN ' . '
                WHEN doc_id % 7 = 1 THEN '.'
                WHEN doc_id % 7 = 2 THEN ' .'
                ELSE substring(source, 1, 3) END AS cell
    FROM documents
"""

_q(
    "q_dot_to_null",
    sql_query(
        f"""
        SELECT doc_id,
               CASE WHEN cell RLIKE '^\\\\s*\\\\.\\\\s*$' THEN NULL ELSE cell END AS cleaned
        FROM ({_DOT_CELL})
        """
    ),
    f"""
    SELECT doc_id,
           CASE WHEN regexp_matches(cell, '^\\s*\\.\\s*$') THEN NULL ELSE cell END AS cleaned
    FROM ({_DOT_CELL})
    """,
    "dot cells nulled (reference imgs2csv.py:112-114)",
)

# ---------------------------------------------------------------------------
# Q4 year cleaning (reference scripts/imgs2csv.py:73-100)
# ---------------------------------------------------------------------------

_RAW_YEAR = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 4 = 0 THEN y
                WHEN o_orderkey % 4 = 1 THEN concat('Yr ', y, '!')
                WHEN o_orderkey % 4 = 2 THEN concat(y, '9')
                ELSE substring(y, 1, 3) END AS raw
    FROM (SELECT o_orderkey, CAST(1900 + o_orderkey % 120 AS STRING) AS y FROM orders)
"""

_CLEAN_YEAR_TEMPLATE = """
    SELECT o_orderkey, raw,
           CASE WHEN length(digits) = 4 THEN digits
                WHEN length(digits) > 4 THEN substring(digits, 1, 4)
                ELSE NULL END AS year_clean
    FROM (SELECT o_orderkey, raw, {digits_expr} AS digits FROM ({raw}))
"""

_q(
    "q_clean_year",
    sql_query(
        _CLEAN_YEAR_TEMPLATE.format(
            digits_expr="regexp_replace(raw, '[^0-9]', '')", raw=_RAW_YEAR
        )
    ),
    _CLEAN_YEAR_TEMPLATE.format(
        digits_expr="regexp_replace(raw, '[^0-9]', '', 'g')",
        raw=_RAW_YEAR.replace("AS STRING", "AS VARCHAR"),
    ),
    "digit filtering + truncation (reference imgs2csv.py:86-95)",
)

# ---------------------------------------------------------------------------
# Q5 forward-fill window (reference scripts/imgs2csv.py:98,119)
# ---------------------------------------------------------------------------

_FFILL_BASE = """
    SELECT event_id, user_id % 10 AS grp,
           CASE WHEN event_id % 3 = 0 THEN event_type END AS val
    FROM events
"""

_q(
    "q_ffill",
    sql_query(
        f"""
        SELECT event_id, grp,
               last(val) IGNORE NULLS OVER (
                 PARTITION BY grp ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM ({_FFILL_BASE})
        """
    ),
    f"""
    SELECT event_id, grp,
           last_value(val IGNORE NULLS) OVER (
             PARTITION BY grp ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM ({_FFILL_BASE})
    """,
    "ffill via last IGNORE NULLS window (reference imgs2csv.py:98)",
)

# ---------------------------------------------------------------------------
# Q6 row clustering: lag + cumulative sum
# (relational form of reference scripts/post_process.py:225-237)
# ---------------------------------------------------------------------------

_ROW_CLUSTER_SQL = """
    WITH e AS (
      SELECT event_id, user_id % 20 AS page, (event_id * 37) % 997 AS y FROM events
    ),
    l AS (
      SELECT e.*, lag(y) OVER (PARTITION BY page ORDER BY y, event_id) AS py FROM e
    )
    SELECT event_id, page, y,
           CAST(sum(CASE WHEN py IS NOT NULL AND y - py > 40 THEN 1 ELSE 0 END) OVER (
             PARTITION BY page ORDER BY y, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS row_id
    FROM l
"""

_q("q_row_cluster", sql_query(_ROW_CLUSTER_SQL), _ROW_CLUSTER_SQL,
   "y-center gap clustering as lag+cumsum window (reference post_process.py:225-237)")

# ---------------------------------------------------------------------------
# Q7 union-all + lineage column (reference scripts/imgs2csv.py:335-349)
# ---------------------------------------------------------------------------

_MERGE_LINEAGE_SQL = """
    SELECT doc_id, text, 'pageA_matrix.csv' AS source_file FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, text, 'pageB_matrix.csv' AS source_file FROM documents WHERE doc_id % 3 = 1
"""

_q("q_merge_lineage", sql_query(_MERGE_LINEAGE_SQL), _MERGE_LINEAGE_SQL,
   "merged database with source_file lineage (reference imgs2csv.py:339)")

# ---------------------------------------------------------------------------
# Q8 pair-discovery join (reference scripts/imgs2csv.py:35-42)
# ---------------------------------------------------------------------------

_PAIR_JOIN_TEMPLATE = """
    WITH tops AS (
      SELECT concat('page_', CAST(doc_id AS {st}), '-t') AS top_file FROM documents WHERE doc_id % 3 = 0
    ),
    bottoms AS (
      SELECT concat('page_', CAST(doc_id AS {st}), '-b') AS bottom_file FROM documents WHERE doc_id % 2 = 0
    )
    SELECT t.base, t.top_file, b.bottom_file
    FROM (SELECT top_file, regexp_replace(top_file, '-[tb]$', '') AS base FROM tops) t
    JOIN (SELECT bottom_file, regexp_replace(bottom_file, '-[tb]$', '') AS base FROM bottoms) b
      ON t.base = b.base
"""

_q(
    "q_pair_join",
    sql_query(_PAIR_JOIN_TEMPLATE.format(st="STRING")),
    _PAIR_JOIN_TEMPLATE.format(st="VARCHAR"),
    "suffix-stripped inner equi-join of top/bottom pages (reference imgs2csv.py:35-42)",
)

# ---------------------------------------------------------------------------
# Q9 box counts per class (reference scripts/evaluate_post_process.py:12-29)
# ---------------------------------------------------------------------------

_BOX_COUNTS_SQL = """
    SELECT l_partkey % 5 AS cls, count(*) AS n_boxes
    FROM lineitem
    WHERE (l_partkey * l_linenumber) % 1000 > 100
    GROUP BY 1
"""

_q("q_box_counts", sql_query(_BOX_COUNTS_SQL), _BOX_COUNTS_SQL,
   "connected regions with area>threshold per class (reference evaluate_post_process.py:12-29)")

# ---------------------------------------------------------------------------
# M7 CER + Q10 worst-k + Q13 stats (reference scripts/evaluate_ocr.py)
# ---------------------------------------------------------------------------

_CER_SQL = """
    SELECT doc_id,
           round(CASE WHEN length(truth) = 0 THEN CASE WHEN pred <> '' THEN 1e0 ELSE 0e0 END
                 ELSE levenshtein(pred, truth) * 1e0 / length(truth) END, 6) AS cer
    FROM (SELECT doc_id, substring(text, 1, 20) AS truth,
                 replace(substring(text, 1, 20), 'a', 'o') AS pred
          FROM documents) t
"""

_q("q_cer", sql_query(_CER_SQL), _CER_SQL,
   "CER = levenshtein/len with empty-truth guard (reference evaluate_ocr.py:13-38)")

_WORST_CER_SQL = f"SELECT doc_id, cer FROM ({_CER_SQL}) ORDER BY cer DESC, doc_id LIMIT 10"
_q("q_worst_cer", sql_query(_WORST_CER_SQL), _WORST_CER_SQL,
   "top-k worst transcriptions (reference evaluate_ocr.py:73-74)")

_CER_STATS_TEMPLATE = """
    SELECT count(*) AS n,
           round(avg(cer), 4) AS mean_cer,
           round({p50}, 4) AS median_cer,
           round(stddev_samp(cer), 4) AS sd_cer,
           round(min(cer), 4) AS min_cer,
           round(max(cer), 4) AS max_cer,
           round({p25}, 4) AS q25_cer,
           round({p75}, 4) AS q75_cer
    FROM ({cer})
"""

_q(
    "q_cer_stats",
    sql_query(
        _CER_STATS_TEMPLATE.format(
            p50="percentile(cer, 0.5)", p25="percentile(cer, 0.25)",
            p75="percentile(cer, 0.75)", cer=_CER_SQL,
        )
    ),
    _CER_STATS_TEMPLATE.format(
        p50="quantile_cont(cer, 0.5)", p25="quantile_cont(cer, 0.25)",
        p75="quantile_cont(cer, 0.75)", cer=_CER_SQL,
    ),
    "aggregate CER stats (reference evaluate_ocr.py:96-104)",
)

# ---------------------------------------------------------------------------
# Q11 crop selection filter (reference scripts/ocr_generate_more_crops.py:28-43)
# ---------------------------------------------------------------------------

_CROP_FILTER_SQL = """
    SELECT l_orderkey, l_partkey, colc, h, w
    FROM (SELECT l_orderkey, l_partkey, l_suppkey % 5 AS colc,
                 l_orderkey % 250 AS h, l_partkey % 300 AS w
          FROM lineitem)
    WHERE colc = 1 AND h BETWEEN 20 AND 200 AND w >= 0.5 * h
"""

_q("q_crop_filter", sql_query(_CROP_FILTER_SQL), _CROP_FILTER_SQL,
   "column + size crop filter (reference ocr_generate_more_crops.py:28-43)")

# ---------------------------------------------------------------------------
# Q12 resume anti-join (reference scripts/ocr_generate_more_crops.py:69-76)
# ---------------------------------------------------------------------------

def _resume_anti_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    pending = spark.table("documents").select("doc_id")
    committed = spark.sql("SELECT doc_id FROM documents WHERE doc_id % 3 = 0")
    return pending.join(committed, on="doc_id", how="left_anti")


_q(
    "q_resume_anti",
    _resume_anti_spark,
    """
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM documents c WHERE c.doc_id % 3 = 0 AND c.doc_id = d.doc_id)
    """,
    "pending \\ committed anti-join — checkpoint-resume seed (reference ocr_generate_more_crops.py:69-76)",
)

# ---------------------------------------------------------------------------
# Q10b top-k limit, Q14 split, Q15 sort-rank
# ---------------------------------------------------------------------------

_TOPK_SQL = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
"""
_q("q_topk_orders", sql_query(_TOPK_SQL), _TOPK_SQL,
   "deterministic top-k (reference imgs2csv.py:280-290 debug limits)")

# White-row-probe split (reference notebooks/select_for_training.ipynb
# cells 5-11): probe ONE fixed row of the page for ink; pages whose probe
# row is clear go to training.  The real media op is
# pipeline/media_ops.white_row_probe (binarize-at-25, probe row 20 /
# h-20); this SQL analogue probes a fixed window of each document's text
# for a "dark" character so the driver's DuckDB oracle can check the same
# clear-row routing shape.
_SPLIT_SQL = """
    SELECT is_train, count(*) AS n FROM (
      SELECT CASE WHEN instr(substring(text, 21, 20), 'e') = 0
                  THEN 1 ELSE 0 END AS is_train
      FROM documents
    ) GROUP BY is_train
"""
_q("q_train_test_split", sql_query(_SPLIT_SQL), _SPLIT_SQL,
   "white-row-probe train/test routing: probe window clear -> train "
   "(reference notebooks/select_for_training.ipynb cells 5-11; media op: "
   "pipeline/media_ops.white_row_probe)")

_SORT_RANK_SQL = """
    SELECT doc_id, row_number() OVER (ORDER BY source, doc_id) AS rnk FROM documents
"""


def _sort_rank_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank WITHOUT the single-partition window.

    ``row_number() OVER (ORDER BY ...)`` moves the whole table to one task
    (Spark warns exactly that) — a scale wall the oracle SQL is allowed to
    hit but the engine is not.  The two-phase machinery (range-partition ->
    local rank -> driver prefix over P counts -> broadcast offsets) lives
    in :mod:`.prefix` and is shared with ``q_sequence_pack`` /
    ``q_corpus_curation``.
    """
    from .prefix import global_row_number

    register_views(spark, sf_dir)
    df = spark.table("documents").select("doc_id", "source")
    ranked = global_row_number(df, ["source", "doc_id"], "rnk")
    return ranked.select("doc_id", F.col("rnk").cast("int").alias("rnk"))


_q("q_sort_rank", _sort_rank_spark, _SORT_RANK_SQL,
   "deterministic global sort order via two-phase parallel rank "
   "(reference dataset.py:66-67)")

# ---------------------------------------------------------------------------
# M1-M4 segmentation metrics from a derived pred/truth labeling
# (reference scripts/metrics.py:13-106)
# ---------------------------------------------------------------------------

_PRED_TRUTH = """
    SELECT doc_id % 6 AS pred, CAST(floor(doc_id / 6.0) AS BIGINT) % 6 AS truth FROM documents
"""

_SEG_METRICS_SQL = f"""
    WITH p AS ({_PRED_TRUTH}),
    k AS (SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5)) AS t(cls))
    SELECT cls,
           round(SUM(CASE WHEN pred = cls AND truth = cls THEN 1 ELSE 0 END) * 1e0
                 / NULLIF(SUM(CASE WHEN pred = cls OR truth = cls THEN 1 ELSE 0 END), 0), 6) AS iou,
           round(2e0 * SUM(CASE WHEN pred = cls AND truth = cls THEN 1 ELSE 0 END)
                 / NULLIF(SUM(CASE WHEN pred = cls THEN 1 ELSE 0 END)
                          + SUM(CASE WHEN truth = cls THEN 1 ELSE 0 END), 0), 6) AS dice,
           round(SUM(CASE WHEN pred = cls AND truth = cls THEN 1 ELSE 0 END) * 1e0
                 / NULLIF(SUM(CASE WHEN pred = cls THEN 1 ELSE 0 END), 0), 6) AS prec,
           round(SUM(CASE WHEN pred = cls AND truth = cls THEN 1 ELSE 0 END) * 1e0
                 / NULLIF(SUM(CASE WHEN truth = cls THEN 1 ELSE 0 END), 0), 6) AS recall
    FROM k CROSS JOIN p
    GROUP BY cls
"""

_q("q_seg_metrics", sql_query(_SEG_METRICS_SQL), _SEG_METRICS_SQL,
   "per-class IoU/Dice/precision/recall from confusion counts (reference metrics.py:38-106)")

_CONFUSION_SQL = f"""
    SELECT pred, truth, count(*) AS n FROM ({_PRED_TRUTH}) GROUP BY pred, truth
"""
_q("q_confusion", sql_query(_CONFUSION_SQL), _CONFUSION_SQL,
   "confusion-matrix counts (reference metrics.py:13-28)")

_ACCURACY_SQL = f"""
    SELECT round(avg(CASE WHEN pred = truth THEN 1e0 ELSE 0e0 END), 6) AS accuracy
    FROM ({_PRED_TRUTH})
"""
_q("q_pixel_accuracy", sql_query(_ACCURACY_SQL), _ACCURACY_SQL,
   "pixel accuracy (reference metrics.py:69-80)")

# ---------------------------------------------------------------------------
# M8 box-count mean absolute difference
# (reference scripts/evaluate_post_process.py:123-195)
# ---------------------------------------------------------------------------

_BOX_MAD_SQL = """
    WITH pred AS (
      SELECT l_partkey % 5 AS cls, count(*) AS n FROM lineitem
      WHERE (l_partkey * l_linenumber) % 1000 > 100 GROUP BY 1
    ),
    gt AS (
      SELECT l_suppkey % 5 AS cls, count(*) AS n FROM lineitem
      WHERE (l_suppkey * l_linenumber) % 1000 > 100 GROUP BY 1
    )
    SELECT round(avg(abs(pred.n - gt.n) * 1e0), 6) AS box_mad
    FROM pred JOIN gt ON pred.cls = gt.cls
"""

_q("q_box_mad", sql_query(_BOX_MAD_SQL), _BOX_MAD_SQL,
   "box-count MAD pred vs gt (reference evaluate_post_process.py:123-195)")

# ---------------------------------------------------------------------------
# M5 boundary F1 / M6 instance separation / M9 pixel-diff % — the SQL
# aggregation halves of kernels/metrics.py:90,117,164.  The per-pixel /
# per-region halves (Sobel threshold, CC labeling) run in-UDF per page; here
# the boundary flags and instance counts are derived deterministically from
# lineitem (same fixture pattern as _PRED_TRUTH) so the driver's DuckDB
# oracle can check the aggregation exactly.  Epsilon 1e-7 matches the
# reference formulas (metrics.py:108-177, evaluate_post_process.py:85-88).
# ---------------------------------------------------------------------------

# Aggregation-half templates, parameterized on the flag/count source so
# tests can run the IDENTICAL SQL over counts produced by the numpy kernels
# (tests/test_metric_queries.py) while the driver-checked queries feed them
# lineitem-derived fixtures.

_BOUNDARY_F1_AGG = """
    WITH px AS ({px}),
    per AS (
      SELECT cls,
             count(CASE WHEN pb AND tb THEN 1 END) AS tp,
             count(CASE WHEN pb AND NOT tb THEN 1 END) AS fp,
             count(CASE WHEN NOT pb AND tb THEN 1 END) AS fn
      FROM px GROUP BY cls
    ),
    pr AS (
      SELECT tp / (tp + fp + 1e-7) AS prec, tp / (tp + fn + 1e-7) AS recall
      FROM per WHERE tp + fn > 0
    )
    SELECT round(avg(prec), 6) AS boundary_precision,
           round(avg(recall), 6) AS boundary_recall,
           round(avg(2 * prec * recall / (prec + recall + 1e-7)), 6) AS boundary_f1
    FROM pr
"""

_BOUNDARY_F1_SQL = _BOUNDARY_F1_AGG.format(
    px="""
      SELECT l_orderkey % 6 AS cls,
             (l_partkey * 31 + l_linenumber) % 19 < 4 AS pb,
             (l_suppkey * 17 + l_linenumber) % 19 < 4 AS tb
      FROM lineitem
    """
)

_q("q_boundary_f1", sql_query(_BOUNDARY_F1_SQL), _BOUNDARY_F1_SQL,
   "boundary precision/recall/F1 over valid classes from per-class edge "
   "counts (M5 aggregation half; reference metrics.py:108-149)")

_INSTANCE_SEP_AGG = """
    WITH r AS ({r}),
    sc AS (
      SELECT batch,
             greatest(0e0, least(1e0, 1e0 - abs(pred_n - target_n) * 1e0 / target_n)) AS score
      FROM r WHERE target_n > 0
    ),
    bm AS (SELECT batch, avg(score) AS bscore FROM sc GROUP BY batch)
    SELECT round(avg(bscore), 6) AS instance_separation FROM bm
"""

_INSTANCE_SEP_SQL = _INSTANCE_SEP_AGG.format(
    r="""
      SELECT l_orderkey % 8 AS batch, l_partkey % 6 AS cls,
             count(CASE WHEN (l_partkey * l_linenumber) % 11 < 5 THEN 1 END) AS pred_n,
             count(CASE WHEN (l_suppkey * l_linenumber) % 11 < 5 THEN 1 END) AS target_n
      FROM lineitem GROUP BY 1, 2
    """
)

_q("q_instance_sep", sql_query(_INSTANCE_SEP_SQL), _INSTANCE_SEP_SQL,
   "clamped instance-count agreement, per-batch then overall mean "
   "(M6 aggregation half; reference metrics.py:151-177)")

_PIXEL_DIFF_AGG = """
    WITH px AS ({px})
    SELECT page,
           count(CASE WHEN pred <> gt THEN 1 END) AS n_diff,
           round(count(CASE WHEN pred <> gt THEN 1 END) * 100e0 / count(*), 6) AS pixel_diff_pct
    FROM px GROUP BY page
"""

_PIXEL_DIFF_SQL = _PIXEL_DIFF_AGG.format(
    px="""
      SELECT l_orderkey % 40 AS page, l_partkey % 6 AS pred, l_suppkey % 6 AS gt
      FROM lineitem
    """
)

_q("q_pixel_diff", sql_query(_PIXEL_DIFF_SQL), _PIXEL_DIFF_SQL,
   "per-page differing-pixel count and percentage "
   "(M9 aggregation half; reference evaluate_post_process.py:85-88)")

# ---------------------------------------------------------------------------
# Data-quality audit — the dbt-style constraint suite every ingest runs
# before training-data jobs consume a drop: referential integrity
# (orphaned foreign keys via anti-join), primary-key uniqueness,
# not-null / non-empty, and domain constraints, each reported as
# (check, n_checked, n_violations) so a scheduler can gate on ANY
# violation row.  The checks run as UNION ALL of independent
# aggregates: Spark executes them as parallel map-side-combinable
# rollups + broadcast/shuffle anti-joins — no check ever materializes
# violating ROWS to the driver, only counts.
#
# Scale notes: the orphan checks are left-anti equi-joins on the
# foreign key (the 100 TB shape: dim side broadcast when small, shuffle
# otherwise — planner's choice); everything else is one scan per table
# with counting aggregates.
# ---------------------------------------------------------------------------

_DQ_SQL = """
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           (SELECT count(*) FROM lineitem) AS n_checked,
           count(*) AS n_violations
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT count(*) FROM orders),
           count(*)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'documents_duplicate_pk',
           (SELECT count(*) FROM documents),
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT doc_id, count(*) AS n FROM documents GROUP BY doc_id) d
    WHERE n > 1
    UNION ALL
    SELECT 'documents_null_or_empty_text',
           (SELECT count(*) FROM documents),
           count(*)
    FROM documents WHERE text IS NULL OR length(trim(text)) = 0
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           (SELECT count(*) FROM lineitem),
           count(*)
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'events_null_user',
           (SELECT count(*) FROM events),
           count(*)
    FROM events WHERE user_id IS NULL
    UNION ALL
    SELECT 'embeddings_dim_drift',
           (SELECT count(*) FROM embeddings),
           count(*)
    FROM embeddings
    WHERE {veclen}(embedding) <> (SELECT {agg_mode}
                                  FROM (SELECT {veclen}(embedding) AS d
                                        FROM embeddings) dd)
"""

_DQ_SPARK = _DQ_SQL.format(veclen="size", agg_mode="max(d)")
_DQ_DUCK = _DQ_SQL.format(veclen="len", agg_mode="max(d)")

QUERIES["q_data_quality"] = QuerySpec(
    spark=sql_query(_DQ_SPARK),
    oracle=_DQ_DUCK,
    description=(
        "dbt-style data-quality audit: FK orphans via anti-joins, PK "
        "uniqueness, not-null/non-empty, domain and embedding-dim "
        "checks — counts only, no violating rows to the driver"
    ),
)

# ---------------------------------------------------------------------------
# Market-basket association mining — support / confidence / lift over
# parts co-occurring in the same order (the classic Apriori first pass,
# and the item-item statistic collaborative filters start from).  The
# pair explosion is bounded by BASKET size (a TPC-H order carries <= 7
# lineitems), never by catalog or order count: the self-join is an
# equi-join on l_orderkey whose per-key fan-out is C(7,2) — the same
# bounded-explosion discipline as q_cooccurrence's top-32 vocab cap.
#
# Exactness: support and item counts are integers; confidence and lift
# are integer-ppm (cross-multiplied div) so the gate hash-checks the
# association table.  Output keeps pairs with support >= 3 — at 100 TB
# the same threshold prunes map-side via the count rollup.
# ---------------------------------------------------------------------------

_BASKET_BODY = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    nb AS (SELECT count(DISTINCT okey) AS n FROM items),
    icnt AS (SELECT part, count(*) AS cnt FROM items GROUP BY part),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b, count(*) AS support
      FROM items a JOIN items b ON b.okey = a.okey AND a.part < b.part
      GROUP BY a.part, b.part
    )
    SELECT CAST(p.part_a AS BIGINT) AS part_a,
           CAST(p.part_b AS BIGINT) AS part_b,
           CAST(p.support AS BIGINT) AS support,
           CAST((p.support * 1000000) {idiv} ca.cnt AS BIGINT) AS conf_ppm,
           CAST((p.support * nb.n * 1000000) {idiv} (ca.cnt * cb.cnt) AS BIGINT)
             AS lift_ppm
    FROM pairs p
    JOIN icnt ca ON ca.part = p.part_a
    JOIN icnt cb ON cb.part = p.part_b
    CROSS JOIN nb
    WHERE p.support >= 3
"""

QUERIES["q_basket_pairs"] = QuerySpec(
    spark=sql_query(_BASKET_BODY.format(idiv="div")),
    oracle=_BASKET_BODY.format(idiv="//"),
    description=(
        "market-basket association pairs (support / confidence / lift in "
        "exact integer ppm): per-order self-join bounded by basket size, "
        "support threshold prunes the rollup map-side"
    ),
)

# ---------------------------------------------------------------------------
# Wilson lower-bound ranking — the "how to not sort by average rating"
# classic: rank parts by the 95% Wilson score lower bound of their
# return-flag proportion, so a part with 2/2 returns ranks below one
# with 40/50 (small samples get pulled toward zero).  The statistic
# every top-k over a rate needs once counts are small — review scores,
# defect rates, click-throughs.
#
# Float determinism: inputs are exact integer counts; p-hat, the z^2
# terms, sqrt (IEEE-exact), and the final ratio run the identical op
# sequence in both engines, then floor to integer ppm — drift-free, the
# gate hash-checks the ranking AND the scores.  One rollup over
# lineitem + a TakeOrdered top-20; no window, no global sort.
# ---------------------------------------------------------------------------

_WILSON_BODY = """
    WITH counts AS (
      SELECT l_partkey AS part,
             count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
      FROM lineitem GROUP BY l_partkey
    ),
    scored AS (
      SELECT part, n, k,
             CAST(floor((
               (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
               + (1.96e0 * 1.96e0) / (2.0e0 * CAST(n AS DOUBLE))
               - 1.96e0 * sqrt(
                   ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1.0e0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    + (1.96e0 * 1.96e0) / (4.0e0 * CAST(n AS DOUBLE)))
                   / CAST(n AS DOUBLE))
             ) / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n AS DOUBLE)) * 1.0e6)
             AS BIGINT) AS wilson_ppm
      FROM counts WHERE n >= 5
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(n AS BIGINT) AS n_lineitems,
           CAST(k AS BIGINT) AS n_returns,
           wilson_ppm
    FROM scored
    ORDER BY wilson_ppm DESC, part ASC
    LIMIT 20
"""

QUERIES["q_wilson_ranking"] = QuerySpec(
    spark=sql_query(_WILSON_BODY),
    oracle=_WILSON_BODY,
    description=(
        "95% Wilson lower-bound ranking of per-part return rates: exact "
        "integer counts in, drift-free double score floored to ppm, "
        "TakeOrdered top-20 — ranking under small-sample uncertainty"
    ),
)
