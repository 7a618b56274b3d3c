"""Structured Streaming: windowed aggregation matches the batch result on a
drained stream; the stateful sessionizer matches batch sessionization for
all closed sessions."""

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from bsc_project_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
EVENTS = f"{SF_DIR}/events.parquet"


def test_windowed_counts_stream_equals_batch(spark):
    got = run_stream_to_memory(
        spark, EVENTS, windowed_event_counts, "win_counts", output_mode="complete"
    )
    batch = windowed_event_counts(spark.read.parquet(EVENTS))
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    assert got.count() > 0


def test_sessionize_stream_matches_batch_closed_sessions(spark):
    gap = 600  # 10 minutes
    got = run_stream_to_memory(
        spark, EVENTS, lambda df: sessionize(df, gap), "sessions", output_mode="append"
    )
    # batch oracle: lag/cumsum sessionization; drop each user's LAST session
    # (still open in the stream's state when the availableNow drain ends)
    batch = spark.sql(
        f"""
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                   FROM parquet.`{EVENTS}`),
        l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) AS pts FROM e),
        s AS (SELECT *, sum(CASE WHEN pts IS NOT NULL
                                  AND (unix_timestamp(ts) - unix_timestamp(pts)) > {gap}
                             THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, value
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
              FROM l),
        agg AS (SELECT user_id, sess, min(ts) AS session_start, max(ts) AS session_end,
                       count(*) AS n_events, sum(value) AS sum_value
                FROM s GROUP BY user_id, sess),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sess DESC) AS rn
                   FROM agg)
        SELECT user_id, session_start, session_end, n_events, sum_value
        FROM ranked WHERE rn > 1
        """
    )
    got_c = got.select("user_id", "session_start", "session_end", "n_events", "sum_value")
    assert got_c.exceptAll(batch).count() == 0
    assert batch.exceptAll(got_c).count() == 0
