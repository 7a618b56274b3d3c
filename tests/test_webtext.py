"""Semantic pins for the web-curation operators (queries/webtext.py):
boilerplate actually stripped, clone paragraphs actually dropped, planted
SimHash clones found at Hamming 0, PII actually redacted, and the range
join planned as a bucket equi-join (never a nested loop).  Cross-engine
value parity is covered by tests/test_queries_oracle.py."""

import os

from bsc_project_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = all_queries()


def test_main_content_strips_chrome_and_keeps_payload(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    out = {r.doc_id: r for r in QUERIES["q_main_content"].spark(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for doc_id, r in out.items():
        # nav/aside/footer chrome never leaks into the extracted text
        assert "copyright" not in r.main_text
        assert "home about contact" not in r.main_text
        assert "buy now limited offer" not in r.main_text
        # the p payload survives verbatim whenever it clears the 5-word
        # density bar (every fixture doc does)
        assert r.main_text == docs[doc_id].strip()
        assert r.n_dropped >= 3  # nav + h1 + footer at minimum


def test_paragraph_dedup_strips_clone_docs(spark):
    rows = QUERIES["q_paragraph_dedup"].spark(spark, SF_DIR).collect()
    clones = [r for r in rows if r.doc_id >= 1_000_000]
    originals = {r.doc_id: r for r in rows if r.doc_id < 1_000_000}
    assert clones, "planted clone docs missing from the output"
    for r in clones:
        # every clone paragraph already occurred at the original doc_id
        assert r.n_kept == 0
        assert r.clean_text == ""
        # and the original kept at least one paragraph
        assert originals[r.doc_id - 1_000_000].n_kept >= 1


def test_simhash_pairs_find_planted_clones(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in QUERIES["q_simhash_pairs"].spark(spark, SF_DIR).collect()
    }
    planted = [(d, d + 1_000_000) for d in range(0, n_docs, 50)]
    for p in planted:
        assert pairs.get(p) == 0, f"planted clone pair {p} not found at Hamming 0"


def test_pii_scrub_redacts_everything(spark):
    rows = QUERIES["q_pii_scrub"].spark(spark, SF_DIR).collect()
    for r in rows:
        assert "<EMAIL>" in r.clean_text
        assert "<PHONE>" in r.clean_text
        assert "@" not in r.clean_text
        assert "+1-555-" not in r.clean_text
        assert r.n_emails >= 1 and r.n_phones >= 1


def test_range_join_plans_as_equi_join(spark):
    """The bucketed formulation must reach the executor as a hash
    equi-join on the bucket key — a plain inequality join would plan as
    BroadcastNestedLoopJoin and go quadratic at scale."""
    df = QUERIES["q_range_join"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan
