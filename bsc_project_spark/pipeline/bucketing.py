"""Bucketed-table co-location for the engine's recurring join keys.

At warehouse scale the two hot joins are keyed on ``media_ref`` (media
pages <-> distinct refs / extracted cells) and ``doc_id`` (spans <->
lineage / resume anti-join).  Writing both sides of a recurring join as
Spark BUCKETED tables with the same bucket count makes the sort-merge
join read co-located buckets directly — NO Exchange on either side, at
any table size — which is the storage-level analogue of the in-job
broadcast semi-join used for one-shot runs.

This is the "media would be a bucketed table co-partitioned by
media_ref" design note in pipeline/extract.py made concrete; a plan test
(tests/test_bucketing.py) asserts the shuffle elimination.

Spark bucketing requires the table catalog (``saveAsTable``): bucket
membership is recorded in the metastore, and plain ``.parquet()`` writes
cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Write ``df`` as a bucketed (and in-bucket sorted) catalog table.
    Sorting by the key lets the sort-merge join skip its sort too."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def write_bucketed_media(media: DataFrame, n_buckets: int, table: str = "media_bucketed") -> None:
    write_bucketed(media, table, "media_ref", n_buckets)


def write_bucketed_cells(cells: DataFrame, n_buckets: int, table: str = "cells_bucketed") -> None:
    write_bucketed(cells, table, "media_ref", n_buckets)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With both
    sides bucketed+sorted, the physical plan is a SortMergeJoin with zero
    Exchange and zero Sort operators."""
    return spark.table(left_table).join(spark.table(right_table), on=key)
