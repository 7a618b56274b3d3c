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
    extracted, lineage, _, _ = run_extract_stage(docs, media, FIXTURE_CONFIG, persist=True)
    extracted = extracted.cache()
    assert extracted.exceptAll(golden).count() == 0
    assert golden.exceptAll(extracted).count() == 0
    # heavy-doc skew must not concentrate the image work: pages spread
    # across partitions, and no partition does more than half the pages
    rows = lineage.collect()
    total = sum(r.page_count for r in rows)
    busiest = max(r.page_count for r in rows)
    active = sum(1 for r in rows if r.page_count > 0)
    assert active >= 4, f"expected spreading, got {active} active partitions"
    assert busiest <= total * 0.5, f"one partition did {busiest}/{total} pages"
    # dedup: the image stage ran once per unique page, not once per span
    n_unique = len({
        s["media_ref"]
        for r in skew_corpus.documents.itertuples()
        for s in r.spans
        if s["kind"] == "media"
    })
    assert total == n_unique


def test_lineage_totals(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    extracted, lineage, _, _ = run_extract_stage(docs, media, FIXTURE_CONFIG, persist=True)
    # lineage counts are per UNIQUE page; compare against golden cells of
    # the distinct referenced pages
    referenced = {
        s["media_ref"]
        for r in corpus.documents.itertuples()
        for s in r.spans
        if s["kind"] == "media"
    }
    # golden repeats cells per referencing doc; count each page once
    exp_cells = 0
    exp_chars = 0
    seen = set()
    for r in corpus.golden.itertuples():
        if r.kind != "ocr" or r.media_ref in seen:
            continue
        page_rows = [
            g for g in corpus.golden.itertuples()
            if g.kind == "ocr" and g.media_ref == r.media_ref and g.doc_id == r.doc_id
        ]
        exp_cells += len(page_rows)
        exp_chars += sum(len(g.text) for g in page_rows)
        seen.add(r.media_ref)
    lin = lineage.agg(
        F.sum("cell_count").alias("s"),
        F.sum("ocr_char_count").alias("c"),
        F.sum("page_count").alias("p"),
    ).collect()[0]
    assert lin.p == len(referenced)
    assert lin.s == exp_cells
    assert lin.c == exp_chars
    # fan-out consistency: extracted OCR spans >= unique-page cells
    assert extracted.filter("kind = 'ocr'").count() >= exp_cells


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


def test_unresolved_media_refs_quarantined(spark, corpus):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    extra = spark.createDataFrame(
        [("doc_dangling",
          [("media", None, "page_99999-t", 0), ("text", "tail", None, 1)])],
        spark_io.DOCUMENTS_SCHEMA,
    )
    res = run_extract_stage(docs.unionByName(extra), media, FIXTURE_CONFIG)
    bad = res.unresolved.collect()
    assert [(r.doc_id, r.offset, r.media_ref) for r in bad] == [
        ("doc_dangling", 0, "page_99999-t")
    ]
    # the doc's resolvable spans still extract
    tail = res.extracted.filter("doc_id = 'doc_dangling'").collect()
    assert [(r.order, r.kind, r.text) for r in tail] == [(0, "text", "tail")]


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
