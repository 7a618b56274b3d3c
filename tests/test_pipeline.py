"""Distributed pipeline correctness: exact span-sequence equality vs the
single-process golden (the north-rule invariant), plan hygiene, skew
spreading, lineage, and reassembly."""

from pyspark.sql import functions as F

from bsc_project_spark.fixtures import spark_io
from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG
from bsc_project_spark.pipeline.extract import (
    explode_spans,
    extract_spans,
    reassemble,
    run_extract_stage,
)


def test_span_equality_vs_golden(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    golden = spark_io.golden_df(spark, corpus)
    extracted = extract_spans(docs, media, FIXTURE_CONFIG)
    assert extracted.exceptAll(golden).count() == 0
    assert golden.exceptAll(extracted).count() == 0


def test_skew_doc_equality_and_spreading(spark, skew_corpus):
    docs = spark_io.documents_df(spark, skew_corpus)
    media = spark_io.media_df(spark, skew_corpus)
    golden = spark_io.golden_df(spark, skew_corpus)
    extracted, lineage, _ = run_extract_stage(docs, media, FIXTURE_CONFIG, persist=True)
    extracted = extracted.cache()
    assert extracted.exceptAll(golden).count() == 0
    assert golden.exceptAll(extracted).count() == 0
    # the heavy docs' media spans must spread across partitions: no single
    # partition may have processed more than half of all media spans
    rows = lineage.collect()
    total = sum(r.span_count for r in rows)
    busiest = max(r.span_count for r in rows)
    active = sum(1 for r in rows if r.doc_count > 0)
    assert active >= 4, f"expected spreading, got {active} active partitions"
    assert busiest <= total * 0.5, f"one partition did {busiest}/{total} spans"


def test_lineage_totals(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    extracted, lineage, _ = run_extract_stage(docs, media, FIXTURE_CONFIG, persist=True)
    ocr = extracted.filter("kind = 'ocr'")
    n_spans = ocr.count()
    n_chars = ocr.select(F.sum(F.length("text"))).collect()[0][0] or 0
    lin = lineage.agg(
        F.sum("span_count").alias("s"), F.sum("ocr_char_count").alias("c")
    ).collect()[0]
    assert lin.s == n_spans
    assert lin.c == n_chars


def test_reassemble_round_trip(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    extracted = extract_spans(docs, media, FIXTURE_CONFIG)
    out = reassemble(extracted)
    rows = {r.doc_id: r.spans for r in out.collect()}
    assert set(rows) == {r.doc_id for r in corpus.documents.itertuples()}
    for doc_id, spans in rows.items():
        offsets = [s.offset for s in spans]
        assert offsets == sorted(offsets) == list(range(len(spans)))
        # pass-through text spans preserved in order
        texts = [s.text for s in spans if s.kind == "text"]
        gold = [
            g.text
            for g in corpus.golden.itertuples()
            if g.doc_id == doc_id and g.kind == "text"
        ]
        assert texts == gold


def test_explode_is_narrow(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    plan = explode_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "explode must not shuffle"


def test_no_row_python_udfs_in_pipeline(spark, corpus):
    # north rule: zero per-row Python — the only Python boundary is the
    # Arrow-vectorized MapInPandas stage
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    extracted = extract_spans(docs, media, FIXTURE_CONFIG)
    plan = extracted._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF found"
    assert "MapInPandas" in plan
