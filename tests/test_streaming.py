"""Structured Streaming: windowed aggregation matches the batch result on a
drained stream; the stateful sessionizer matches batch sessionization for
all closed sessions."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from bsc_project_spark.streaming.events import (
    dedup_events,
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


EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(spark, tmp_path, rows):
    path = str(tmp_path / "events_src")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _pandas_sessions(rows, gap_s):
    """Closed-session oracle: per-user sort by ts, gap scan, drop the last
    (still-open) session."""
    out = []
    by_user = {}
    for _eid, ts, uid, _et, val in rows:
        by_user.setdefault(uid, []).append((ts, val))
    for uid, evs in by_user.items():
        evs.sort()
        sessions = []
        start = last = evs[0][0]
        n, sv = 1, evs[0][1]
        for ts, val in evs[1:]:
            if (ts - last).total_seconds() > gap_s:
                sessions.append((uid, start, last, n, sv))
                start = last = ts
                n, sv = 1, val
            else:
                last = max(last, ts)
                n += 1
                sv += val
        # final session stays open -> not emitted under availableNow
        out.extend(sessions)
    return sorted(out)


def test_sessionize_out_of_order_within_trigger(spark, tmp_path):
    # rows deliberately NOT in time order: without a buffer-all-then-sort
    # scan, the 2000s event seen first would swallow t0 into its session
    # and corrupt session_start
    t0 = datetime(2024, 1, 1, 10, 0, 0)
    s = timedelta(seconds=1)
    rows = [
        (1, t0 + 2000 * s, 7, "click", 1.0),
        (2, t0, 7, "click", 2.0),
        (3, t0 + 2005 * s, 7, "click", 4.0),
        (4, t0 + 5 * s, 7, "click", 8.0),
    ]
    path = _write_events(spark, tmp_path, rows)
    got = run_stream_to_memory(
        spark, path, lambda df: sessionize(df, 600), "sess_ooo", output_mode="append"
    ).collect()
    assert [(r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value) for r in got] == [
        (7, t0, t0 + 5 * s, 2, 10.0)
    ]


def test_sessionize_available_now_keeps_open_session(spark, tmp_path):
    # all events within one gap -> the only session stays OPEN in state and
    # availableNow emits nothing (ProcessingTimeTimeout needs a later
    # trigger) — the documented finite-drain caveat
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, t0 + timedelta(seconds=10 * i), 3, "view", 1.0) for i in range(5)]
    path = _write_events(spark, tmp_path, rows)
    got = run_stream_to_memory(
        spark, path, lambda df: sessionize(df, 600), "sess_open", output_mode="append"
    )
    assert got.count() == 0


def test_dedup_events_stream_drops_within_watermark(spark, tmp_path):
    t0 = datetime(2024, 3, 1, 9, 0, 0)
    base = [(i, t0 + timedelta(seconds=30 * i), i % 3, "e", float(i)) for i in range(10)]
    rows = base + base[::2] + base[:3]  # exact duplicates, out of arrival order
    path = _write_events(spark, tmp_path, rows)
    got = run_stream_to_memory(
        spark, path, dedup_events, "dedup_stream", output_mode="append"
    )
    assert got.count() == 10
    assert sorted(r.event_id for r in got.collect()) == list(range(10))
    # batch path: same operator, same result
    batch = dedup_events(spark.read.parquet(path))
    assert batch.count() == 10


@pytest.mark.parametrize("seed", [0, 1])
def test_sessionize_randomized_matches_pandas_oracle(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    t0 = datetime(2024, 2, 1, 0, 0, 0)
    gap_s = 300
    rows = []
    eid = 0
    for uid in range(4):
        t = 0.0
        for _ in range(rng.randint(3, 12)):
            # mix of intra-session steps and gap-crossing jumps
            t += rng.choice([5, 30, 90, 400, 900])
            rows.append(
                (eid, t0 + timedelta(seconds=t), uid, "e", float(rng.randint(1, 9)))
            )
            eid += 1
    rng.shuffle(rows)  # arrival order decoupled from event time
    path = _write_events(spark, tmp_path, rows)
    got = run_stream_to_memory(
        spark, path, lambda df: sessionize(df, gap_s), f"sess_rand_{seed}", output_mode="append"
    ).collect()
    got_t = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value) for r in got
    )
    assert got_t == _pandas_sessions(rows, gap_s)


def test_enrich_with_dim_stream_equals_batch(spark):
    from bsc_project_spark.streaming.events import enrich_with_dim

    dim = spark.sql(
        "SELECT DISTINCT user_id, CASE WHEN user_id % 3 = 0 THEN 'a' ELSE 'b' END"
        f" AS segment FROM parquet.`{EVENTS}` WHERE user_id % 5 <> 4"
    )  # incomplete dim: some events must land in the NULL-segment bucket
    got = run_stream_to_memory(
        spark,
        EVENTS,
        lambda df: enrich_with_dim(df, dim),
        "enriched",
        output_mode="complete",
    )
    batch = enrich_with_dim(spark.read.parquet(EVENTS), dim)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    # the left join must retain dim-less events as a NULL bucket
    assert got.filter("segment IS NULL").count() > 0


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream interval join (click -> purchase within 1h, per user)
    drained with availableNow matches the identical join run as batch —
    both sides keyed state, event-time range bound in the predicate."""
    from bsc_project_spark.streaming.events import interval_join

    def attrib(df):
        return interval_join(
            df.filter("event_type = 'click'"),
            df.filter("event_type = 'purchase'"),
            lag_seconds=3600,
        )

    got = run_stream_to_memory(spark, EVENTS, attrib, "attrib", output_mode="append")
    batch_events = spark.read.parquet(EVENTS)
    batch = attrib(batch_events)
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_streaming_checkpoint_restart_preserves_dedup_state(spark, tmp_path):
    """Stop a stateful streaming query, add more source files (including
    duplicates of already-processed events), restart with the SAME
    checkpointLocation: the restarted query resumes from the committed
    offsets/state and still drops the cross-restart duplicates —
    exactly-once across restarts, the property checkpoint-resume gives
    the batch job."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "restart_src")
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")
    t0 = datetime(2024, 5, 1, 12, 0, 0)

    def rows(ids):
        return [(i, t0 + timedelta(seconds=10 * i), i % 3, "e", float(i)) for i in ids]

    schema = spark.createDataFrame(rows([0]), EVENT_SCHEMA).schema

    def drain(batch_rows, fname):
        staged = str(tmp_path / fname)
        spark.createDataFrame(batch_rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        os.makedirs(src, exist_ok=True)
        # the file source lists leaf files, not nested dirs: link the part
        # files of this batch into the source dir under unique names
        for i, part in enumerate(sorted(os.listdir(staged))):
            if part.endswith(".parquet"):
                os.symlink(
                    os.path.join(staged, part),
                    os.path.join(src, f"{fname}_{i}.parquet"),
                )
        q = (
            spark.readStream.schema(schema).parquet(src)
            .transform(dedup_events)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # drain explicitly: self-termination of availableNow queries is not
        # reliable once stateful operators hold state, and a query left
        # running stalls the session-fixture teardown
        from bsc_project_spark.streaming.events import _drain_and_stop

        _drain_and_stop(q)

    # run 1: events 0..9 with in-batch duplicates
    drain(rows([0, 1, 2, 3, 4, 0, 2, 4, 5, 6, 7, 8, 9]), "batch1")
    first = spark.read.parquet(sink)
    assert sorted(r.event_id for r in first.collect()) == list(range(10))

    # run 2 (restart): duplicates of 0..9 plus genuinely-new 10..14
    drain(rows([0, 3, 6, 9]) + rows([10, 11, 12, 13, 14]), "batch2")
    final = spark.read.parquet(sink)
    assert sorted(r.event_id for r in final.collect()) == list(range(15)), (
        "restart reprocessed or dropped events: checkpointed dedup state "
        "did not survive the query restart"
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interval_join_randomized_out_of_order_matches_batch(spark, tmp_path, seed):
    """Property test (round-2 verdict item 8): random clicks/purchases in
    randomized ARRIVAL order across several triggers, streamed through the
    stream-stream interval join, must equal the identical join run as
    batch when the watermark covers the event-time span (no row is ever
    late); with a tight watermark the streamed result must still be a
    subset of the batch result (eviction may drop, never invent)."""
    import random

    from bsc_project_spark.streaming.events import interval_join

    rng = random.Random(100 + seed)
    t0 = datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for uid in range(5):
        for _ in range(rng.randint(4, 14)):
            t = rng.randint(0, 7200)
            et = rng.choice(["click", "purchase"])
            rows.append((eid, t0 + timedelta(seconds=t), uid, et, float(rng.randint(1, 9))))
            eid += 1
    rng.shuffle(rows)  # arrival order fully decoupled from event time
    src = str(tmp_path / f"ij_src_{seed}")
    os.makedirs(src)
    for i in range(4):  # 4 files -> 4 triggers with maxFilesPerTrigger=1
        chunk = rows[i::4]
        staged = str(tmp_path / f"ij_stage_{seed}_{i}")
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staged)
        for j, part in enumerate(sorted(os.listdir(staged))):
            if part.endswith(".parquet"):
                os.symlink(os.path.join(staged, part), os.path.join(src, f"b{i}_{j}.parquet"))

    def attrib(wm):
        def f(df):
            return interval_join(
                df.filter("event_type = 'click'"),
                df.filter("event_type = 'purchase'"),
                lag_seconds=600,
                watermark=wm,
            )
        return f

    batch = attrib("4 hours")(spark.read.parquet(src))
    assert batch.count() > 0

    got = run_stream_to_memory(
        spark, src, attrib("4 hours"), f"ij_rand_{seed}",
        output_mode="append", max_files_per_trigger=1,
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0

    tight = run_stream_to_memory(
        spark, src, attrib("5 minutes"), f"ij_tight_{seed}",
        output_mode="append", max_files_per_trigger=1,
    )
    assert tight.exceptAll(batch).count() == 0  # never invents pairs


def test_sliding_windowed_counts_stream_equals_batch(spark):
    """Hopping-window streaming agg (window=2min, slide=1min): drained
    stream == batch plan, and every event is counted exactly
    window/slide = 2 times across windows of its event type."""
    slide = lambda df: windowed_event_counts(df, window="2 minutes", slide="1 minute")
    got = run_stream_to_memory(
        spark, EVENTS, slide, "slide_counts", output_mode="complete"
    )
    batch = slide(spark.read.parquet(EVENTS))
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    n_events = spark.read.parquet(EVENTS).count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events
