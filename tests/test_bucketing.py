"""Bucketed-table co-location: the media_ref join over two co-bucketed
tables must plan with ZERO shuffles (no Exchange) — the storage-level
co-partitioning the 100 TB design relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bsc_project_spark.pipeline.bucketing import (
    bucketed_join,
    write_bucketed_cells,
    write_bucketed_media,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, corpus):
    from bsc_project_spark.fixtures.spark_io import media_df

    media = media_df(spark, corpus)
    cells = media.select(
        "media_ref",
        F.lit(0).alias("row"),
        F.lit(1).alias("col"),
        F.lit("x").alias("text"),
    )
    # disable broadcast so the join exercises the bucketed sort-merge path
    # (tiny test tables would otherwise broadcast and hide a regression)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed_media(media.select("media_ref", "width", "height"), 4)
    write_bucketed_cells(cells, 4)
    yield "media_bucketed", "cells_bucketed"
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS media_bucketed")
    spark.sql("DROP TABLE IF EXISTS cells_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "media_ref")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_correct(spark, corpus, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "media_ref")
    assert joined.count() == len(corpus.media)
    # every ref joined exactly once (both tables keyed uniquely)
    assert joined.select("media_ref").distinct().count() == len(corpus.media)


def test_unbucketed_same_join_does_shuffle(spark, bucketed_tables):
    """Control: the identical join over plain (non-bucketed) frames plans
    an Exchange on both sides — proving the bucketing is what removed it."""
    left, right = bucketed_tables
    # fresh non-bucketed copies of the same data
    a = spark.createDataFrame(spark.table(left).collect(), spark.table(left).schema)
    b = spark.createDataFrame(spark.table(right).collect(), spark.table(right).schema)
    plan = a.join(b, "media_ref")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
