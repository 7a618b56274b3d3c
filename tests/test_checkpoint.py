"""Checkpoint-resume: kill after bucket k, rerun, identical final table,
committed buckets not recomputed."""

import os

import pytest

from bsc_project_spark.fixtures import spark_io
from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG
from bsc_project_spark.pipeline.checkpoint import (
    read_extracted,
    read_lineage,
    read_manifest,
    run_extraction_job,
)
from bsc_project_spark.pipeline.extract import extract_spans


def _mtimes(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_kill_and_resume(spark, corpus, tmp_path):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    out_dir = str(tmp_path / "job")

    # run 1: crash injected after bucket 1 commits
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(
            docs, media, FIXTURE_CONFIG, out_dir, n_buckets=4, fail_after_bucket=1
        )
    m1 = read_manifest(out_dir)
    assert m1["committed_buckets"] == [0, 1]
    committed_files = {
        b: _mtimes(os.path.join(out_dir, f"data/bucket={b}")) for b in (0, 1)
    }

    # run 2: resume completes the remaining buckets without touching 0/1
    m2 = run_extraction_job(docs, media, FIXTURE_CONFIG, out_dir, n_buckets=4)
    assert m2["committed_buckets"] == [0, 1, 2, 3]
    assert m2["run_id"] == m1["run_id"]
    for b in (0, 1):
        assert _mtimes(os.path.join(out_dir, f"data/bucket={b}")) == committed_files[b], (
            f"bucket {b} was recomputed on resume"
        )

    # final table == one-shot extraction
    final = read_extracted(spark, out_dir)
    oneshot = extract_spans(docs, media, FIXTURE_CONFIG)
    assert final.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(final).count() == 0

    # lineage covers all buckets with consistent run_id
    lin = read_lineage(spark, out_dir)
    rows = lin.collect()
    assert {r.bucket for r in rows} == {0, 1, 2, 3}
    assert {r.run_id for r in rows} == {m2["run_id"]}


def test_bucket_count_mismatch_rejected(spark, corpus, tmp_path):
    docs = spark_io.documents_df(spark, corpus)
    media = spark_io.media_df(spark, corpus)
    out_dir = str(tmp_path / "job2")
    with pytest.raises(RuntimeError):
        run_extraction_job(
            docs, media, FIXTURE_CONFIG, out_dir, n_buckets=2, fail_after_bucket=0
        )
    with pytest.raises(ValueError, match="bucket count mismatch"):
        run_extraction_job(docs, media, FIXTURE_CONFIG, out_dir, n_buckets=8)
