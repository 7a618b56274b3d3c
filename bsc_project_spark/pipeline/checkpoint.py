"""Snapshot-commit extraction job with per-bucket lineage + resume.

The north rule requires the job to be resumable from the last committed
snapshot with per-partition lineage rows.  pyspark 4.1.2 in this sandbox
ships no Iceberg runtime, so commits are emulated with identical semantics
(documented fallback, SURVEY.md §7 step 5):

- the document keyspace is split into ``n_buckets`` hash buckets
  (pmod(xxhash64(doc_id), n)) — the commit granularity
- each bucket's extracted spans land under ``data/bucket=K/`` and its
  lineage rows under ``lineage/bucket=K/``; a bucket becomes *committed*
  only when the manifest JSON is atomically replaced (write-temp + rename,
  the same atomicity primitive an Iceberg snapshot commit relies on)
- resume = re-running the job: committed buckets are skipped (the
  anti-join-against-committed-lineage idea of SURVEY.md Q12; with hash
  buckets the anti-join reduces to skipping bucket ids, zero recompute)

The reference's analogue is ``ocr_generate_more_crops`` resuming crop
numbering from files already on disk (reference
scripts/ocr_generate_more_crops.py:11-18,69-76).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ExtractConfig
from .extract import LINEAGE_SCHEMA, run_extract_stage


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str) -> dict:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {"run_id": None, "committed_buckets": [], "n_buckets": None}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))  # atomic snapshot commit


def run_extraction_job(
    documents: DataFrame,
    media: DataFrame,
    cfg: ExtractConfig,
    out_dir: str,
    n_buckets: int = 4,
    run_id: str | None = None,
    fail_after_bucket: int | None = None,
) -> dict:
    """Run (or resume) the bucketed extraction job.  Returns the manifest.

    ``fail_after_bucket`` injects a crash after committing that bucket —
    test hook for the kill/rerun resume test (SURVEY.md §5.5).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    if manifest["n_buckets"] not in (None, n_buckets):
        raise ValueError(
            f"bucket count mismatch: manifest has {manifest['n_buckets']}, got {n_buckets}"
        )
    run_id = manifest["run_id"] or run_id or uuid.uuid4().hex[:12]
    committed = set(manifest["committed_buckets"])

    bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    for bucket in range(n_buckets):
        if bucket in committed:
            continue
        docs_b = documents.filter(bucket_col == bucket)
        result = run_extract_stage(docs_b, media, cfg, persist=True)
        t0 = time.monotonic()
        result.extracted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"data/bucket={bucket}")
        )
        lineage = result.lineage
        if lineage.limit(1).count() == 0:
            # empty bucket: still commit an explicit zero lineage row so the
            # lineage table covers every committed bucket
            lineage = documents.sparkSession.createDataFrame(
                [(-1, 0, 0, 0, 0)], LINEAGE_SCHEMA
            )
        (
            lineage.withColumn("run_id", F.lit(run_id))
            .withColumn("bucket", F.lit(bucket))
            .withColumn("committed_at_ms", F.lit(int(time.time() * 1000)))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"lineage/bucket={bucket}"))
        )
        result.unresolved.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"errors/bucket={bucket}")
        )
        result.stage.unpersist()
        committed.add(bucket)
        manifest = {
            "run_id": run_id,
            "committed_buckets": sorted(committed),
            "n_buckets": n_buckets,
            "last_bucket_wall_ms": int((time.monotonic() - t0) * 1000),
        }
        _commit_manifest(out_dir, manifest)
        if fail_after_bucket is not None and bucket >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {bucket}")
    return manifest


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back only COMMITTED buckets (uncommitted files are invisible,
    like reading an Iceberg snapshot)."""
    manifest = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"data/bucket={b}") for b in manifest["committed_buckets"]
    ]
    if not paths:
        raise ValueError(f"no committed buckets under {out_dir}")
    return spark.read.parquet(*paths)


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    manifest = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"lineage/bucket={b}") for b in manifest["committed_buckets"]
    ]
    if not paths:
        raise ValueError(f"no committed lineage under {out_dir}")
    return spark.read.parquet(*paths)
