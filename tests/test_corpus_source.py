"""Custom Python Data Source (logbook_corpus): parity with the driver-side
builder, partition planning, and equality-predicate pushdown pruning."""

import pytest

from pyspark.sql import functions as F

from bsc_project_spark.fixtures import spark_io
from bsc_project_spark.fixtures.corpus import build_corpus
from bsc_project_spark.sources.corpus_source import (
    LogbookCorpusDataSource,
    _CorpusReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LogbookCorpusDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _src(spark, table, n_docs, **opts):
    r = (
        spark.read.format("logbook_corpus")
        .option("table", table)
        .option("n_docs", n_docs)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_documents_match_driver_builder(spark):
    corpus = build_corpus(n_docs=6, skew_every=3, skew_spans=5, compute_golden=False)
    want = spark_io.documents_df(spark, corpus)
    got = _src(spark, "documents", 6, skew_every=3, skew_spans=5)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_media_match_driver_builder(spark):
    corpus = build_corpus(n_docs=2, compute_golden=False)
    want = spark_io.media_df(spark, corpus).select(
        "media_ref", F.md5(F.col("content")).alias("h"), "width", "height", "layout_id"
    )
    got = _src(spark, "media", 2).select(
        "media_ref", F.md5(F.col("content")).alias("h"), "width", "height", "layout_id"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partition_planning(spark):
    df = _src(spark, "documents", 16, n_partitions=4)
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4
    assert df.count() == 16


def test_equality_pushdown_prunes_generation(spark):
    # unit level: pushFilters narrows the generated range and returns
    # unsupported predicates for Spark to re-apply
    from pyspark.sql.datasource import EqualTo, IsNotNull

    r = _CorpusReader({"table": "documents", "n_docs": 100})
    remaining = list(
        r.pushFilters([EqualTo(("doc_id",), "doc_000042"), IsNotNull(("doc_id",))])
    )
    assert [type(f).__name__ for f in remaining] == ["IsNotNull"]
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 1
    assert parts[0].start == 42

    # media pruning via the ref suffix convention
    r2 = _CorpusReader({"table": "media", "n_docs": 100})
    assert list(r2.pushFilters([EqualTo(("media_ref",), "page_00007-b")])) == []
    assert [(p.start, p.end) for p in r2.partitions() if p.end > p.start] == [(15, 16)]

    # end-to-end: the pruned read returns exactly the requested row
    got = _src(spark, "documents", 100).where("doc_id = 'doc_000042'").collect()
    assert [row.doc_id for row in got] == ["doc_000042"]

    # non-canonical values must NOT be consumed by pushdown (the parse
    # once accepted 'doc_42' and returned doc_000042 for it): the filter
    # goes back to Spark and the correct result is empty
    for bad in ("doc_42", "doc_+0042", "doc_ 42", "page", None):
        assert _src(spark, "documents", 100).where(
            F.col("doc_id") == F.lit(bad) if bad is not None else F.col("doc_id").isNull()
        ).count() == 0
    assert _src(spark, "media", 100).where("media_ref = 'page_00007-t-t'").count() == 0


def test_in_list_pushdown(spark):
    from pyspark.sql.datasource import In

    # all-canonical IN list -> consumed, partitions = exactly those ids
    r = _CorpusReader({"table": "documents", "n_docs": 100})
    remaining = list(
        r.pushFilters([In(("doc_id",), ("doc_000003", "doc_000090", "doc_999999"))])
    )
    assert remaining == []
    assert [(p.start, p.end) for p in r.partitions()] == [(3, 4), (90, 91)]

    # any non-canonical element -> the whole IN goes back to Spark
    r2 = _CorpusReader({"table": "documents", "n_docs": 100})
    remaining2 = list(r2.pushFilters([In(("doc_id",), ("doc_000003", "doc_9"))]))
    assert len(remaining2) == 1
    assert r2.id_set is None

    # end-to-end: only the listed docs come back
    got = (
        _src(spark, "documents", 100)
        .where(F.col("doc_id").isin("doc_000003", "doc_000090", "nope"))
        .collect()
    )
    assert sorted(row.doc_id for row in got) == ["doc_000003", "doc_000090"]


def test_stream_reader_serves_docs_in_bounded_batches(spark):
    """readStream over the source drains all docs via availableNow in
    docs_per_batch-sized micro-batches, matching the batch read exactly."""
    stream = (
        spark.readStream.format("logbook_corpus")
        .option("table", "documents")
        .option("n_docs", 6)
        .option("docs_per_batch", 2)
        .load()
    )
    # availableNow snapshots the FIRST prefetched offset for simple
    # stream readers (one batch), so drain with a continuous trigger and
    # stop once every doc arrived
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("corpus_stream")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if spark.table("corpus_stream").count() >= 6:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(60)
    got = spark.table("corpus_stream")
    want = _src(spark, "documents", 6)
    assert got.count() == 6
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # bounded arrival: no batch carried more than docs_per_batch rows
    batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert batches and max(batches) <= 2


def test_extraction_runs_from_source_frames(spark):
    """The flagship pipeline consumes source-served frames unchanged and
    reproduces the golden spans."""
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG
    from bsc_project_spark.pipeline.extract import extract_spans

    corpus = build_corpus(n_docs=2, compute_golden=True)
    docs = _src(spark, "documents", 2)
    media = _src(spark, "media", 2)
    got = extract_spans(docs, media, FIXTURE_CONFIG)
    want = spark_io.golden_df(spark, corpus)
    cols = ["doc_id", "order", "kind", "text", "media_ref"]
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0
