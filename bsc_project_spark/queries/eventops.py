"""Event-log and classic-OLAP queries (driver-checkable vs DuckDB).

The streaming module (streaming/events.py) implements sessionization and
windowed rollups as Structured Streaming jobs verified against batch
oracles in pytest; the queries here are the BATCH forms of the same
semantics, expressed declaratively so the driver's oracle gate sees them:

- q_sessionize_batch: gap-based sessionization as two windows (lag -> gap
  flag -> cumulative sum) + per-session aggregation.  This is the exact
  relational shape of the reference's sequential row clustering
  (/root/reference/scripts/post_process.py:225-237) applied to the time
  axis, and the batch oracle for streaming/events.py:sessionize.
- q_event_windows: tumbling-window rollup via Spark's native window()
  grouping (the batch twin of the streaming windowed_counts job).
- q_json_props: JSON property extraction (S6 JSON-source surface,
  /root/reference/scripts/ocr_generate_crops.py:109-111) as a native
  get_json_object column, no UDF.
- q_pricing_summary / q_segment_revenue: classic scan-heavy aggregation
  and 3-way join w/ broadcast dimension — the OLAP shapes every engine
  user runs.  Money math is exact DECIMAL inside the aggregate (bit-equal
  across engines and across Spark's nondeterministic partial-agg order),
  cast to DOUBLE only at the end.

Scale notes: sessionization shuffles once on user_id and both windows
reuse that single sort; at 100 TB the partition key is user_id so state
never concentrates (skewed power-users are bounded by per-user event
caps upstream).  q_event_windows is a single map-side-combinable
groupBy.  q_segment_revenue broadcasts the filtered customer dim
(3/5 of customers -> still dim-sized) so the fact scan never shuffles
for the join; only the final groupBy shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register_views, sql_query

QUERIES: dict[str, QuerySpec] = {}


def _q(name: str, spark_fn, oracle: str | None, description: str = "") -> None:
    QUERIES[name] = QuerySpec(spark=spark_fn, oracle=oracle, description=description)


# ---------------------------------------------------------------------------
# Batch sessionization: 12h inactivity gap closes a session.
# Epoch-microsecond arithmetic keeps both engines in exact int64 land.
# ---------------------------------------------------------------------------

_GAP_US = 12 * 3600 * 1_000_000

_SESSIONIZE_BODY = """
    g AS (
      SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > {gap} THEN 1 ELSE 0 END AS new_s
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, event_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(us) AS start_us,
           MAX(us) AS end_us
    FROM s GROUP BY user_id, session_id
"""

# Parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4; epoch math is done
# with timestampdiff against an NTZ epoch literal so the result is identical
# to DuckDB's epoch_us regardless of the session timezone.
_SPARK_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"

_SESSIONIZE_SPARK = (
    f"WITH t AS (SELECT user_id, event_id, {_SPARK_EPOCH_US.format(c='ts')} AS us FROM events),"
    + _SESSIONIZE_BODY.format(gap=_GAP_US)
)

_SESSIONIZE_DUCK = (
    "WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),"
    + _SESSIONIZE_BODY.format(gap=_GAP_US)
)

_q(
    "q_sessionize_batch",
    sql_query(_SESSIONIZE_SPARK),
    _SESSIONIZE_DUCK,
    "gap-based sessionization (lag + cumulative-sum windows, one shuffle on user_id)",
)

# ---------------------------------------------------------------------------
# Tumbling-window rollup (batch twin of streaming windowed_counts).
# ---------------------------------------------------------------------------

def _event_windows_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("sum_value"),
        )
        .select(
            F.expr(_SPARK_EPOCH_US.format(c="w.start")).alias("win_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_EVENT_WINDOWS_DUCK = """
    SELECT epoch_us(date_trunc('day', ts)) AS win_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
"""

_q(
    "q_event_windows",
    _event_windows_spark,
    _EVENT_WINDOWS_DUCK,
    "tumbling 1-day window rollup via native window() grouping (map-side combinable)",
)

# ---------------------------------------------------------------------------
# JSON property extraction — native column expr, no UDF.
# ---------------------------------------------------------------------------

_JSON_SPARK = """
    WITH k AS (
      SELECT event_type, CAST(get_json_object(props, '$.k') AS INT) AS k
      FROM events
    )
    SELECT event_type, COUNT(*) AS n, SUM(CAST(k AS BIGINT)) AS sum_k,
           MIN(k) AS min_k, MAX(k) AS max_k
    FROM k GROUP BY event_type
"""

_JSON_DUCK = """
    WITH k AS (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events
    )
    SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k, MAX(k) AS max_k
    FROM k GROUP BY event_type
"""

_q(
    "q_json_props",
    sql_query(_JSON_SPARK),
    _JSON_DUCK,
    "JSON annotation extraction (S6 surface) as native get_json_object, no UDF",
)

# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): one fact scan, map-side-combinable agg,
# exact DECIMAL money math inside the aggregate.
# ---------------------------------------------------------------------------

_PRICING_BODY = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= {ts_lit} '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""

_q(
    "q_pricing_summary",
    sql_query(_PRICING_BODY.format(ts_lit="TIMESTAMP_NTZ")),
    _PRICING_BODY.format(ts_lit="TIMESTAMP"),
    "pricing summary (TPC-H Q1 shape): pushed-down date filter + exact-decimal agg",
)

# ---------------------------------------------------------------------------
# Segment revenue (TPC-H Q3 shape): broadcast the filtered customer dim,
# join fact tables, top-k revenue.
# ---------------------------------------------------------------------------

def _segment_revenue_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'")
    )
    rev = F.expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                            .select("o_orderkey", "o_orderdate")),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.expr(_SPARK_EPOCH_US.format(c="o_orderdate")).alias("odate_us"),
            "revenue",
        )
    )


_SEGMENT_REVENUE_DUCK = """
    SELECT l_orderkey,
           epoch_us(o_orderdate) AS odate_us,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

_q(
    "q_segment_revenue",
    _segment_revenue_spark,
    _SEGMENT_REVENUE_DUCK,
    "segment revenue top-k (TPC-H Q3 shape): broadcast dims, one fact shuffle",
)

# ---------------------------------------------------------------------------
# AS-OF join — an operator Spark lacks natively (DuckDB ships ASOF JOIN;
# kdb/Flink/Pandas call it asof/merge_asof).  For every 'click' event, the
# latest 'purchase' value for the same user at-or-before the click.
#
# Spark-first formulation: NO join at all.  Union both streams tagged,
# one window pass per user ordered by (time, rate-rows-first), and
# last(rate) IGNORE NULLS fills each click with the most recent rate.
# This is the scale-correct shape: a naive range join explodes to
# O(clicks x rates-per-user); the union+window is one shuffle on user_id
# and a linear scan within each partition — the same single-sort plan
# sessionization uses, so at 100 TB the two operators share partitioning.
# Rate rows are pre-aggregated per (user, ts) so at-same-instant
# duplicates are deterministic in both engines.
# ---------------------------------------------------------------------------

_ASOF_SPARK = f"""
    WITH clicks AS (
      SELECT event_id, user_id, {_SPARK_EPOCH_US.format(c='ts')} AS us
      FROM events WHERE event_type = 'click'
    ),
    rates AS (
      SELECT user_id, {_SPARK_EPOCH_US.format(c='ts')} AS us, max(value) AS rate
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    merged AS (
      SELECT user_id, us, 1 AS is_rate, CAST(NULL AS BIGINT) AS event_id, rate
      FROM rates
      UNION ALL
      SELECT user_id, us, 0 AS is_rate, event_id, CAST(NULL AS DOUBLE) AS rate
      FROM clicks
    ),
    filled AS (
      SELECT user_id, us, is_rate, event_id,
             last(rate) IGNORE NULLS OVER (
               PARTITION BY user_id ORDER BY us, is_rate DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate
      FROM merged
    )
    SELECT event_id, user_id, us, rate FROM filled WHERE is_rate = 0
"""

_ASOF_DUCK = """
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'
    ),
    rates AS (
      SELECT user_id, epoch_us(ts) AS us, max(value) AS rate
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.us, r.rate
    FROM clicks c
    ASOF LEFT JOIN rates r ON c.user_id = r.user_id AND c.us >= r.us
"""

_q(
    "q_asof_join",
    sql_query(_ASOF_SPARK),
    _ASOF_DUCK,
    "as-of join (latest purchase value at-or-before each click) as a "
    "single union+window pass per user — no range-join explosion",
)
