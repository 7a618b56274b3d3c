"""spark-submit entry point for the extraction job.

    python scripts/make_pyfiles.py                 # build dist/bsc_project_spark.zip
    spark-submit --master local[32] \
        --py-files dist/bsc_project_spark.zip \
        scripts/run_job.py \
        --documents /data/documents.parquet --media /data/media.parquet \
        --out /data/extracted --buckets 16 [--profile fixture|reference]

Runs (or resumes) the snapshot-committed bucketed extraction; prints a
one-line JSON summary.  On a cluster the same invocation works with
--master yarn/k8s — nothing here is local-mode specific.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--media", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--profile", choices=["fixture", "reference"], default="fixture")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bsc-extract").getOrCreate()

    from bsc_project_spark.config import REFERENCE_CONFIG
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG
    from bsc_project_spark.pipeline.checkpoint import (
        read_doc_lineage,
        read_extracted,
        read_lineage,
        run_extraction_job,
    )

    cfg = FIXTURE_CONFIG if args.profile == "fixture" else REFERENCE_CONFIG
    documents = spark.read.parquet(args.documents)
    media = spark.read.parquet(args.media)

    t0 = time.monotonic()
    manifest = run_extraction_job(
        documents, media, cfg, args.out, n_buckets=args.buckets, run_id=args.run_id
    )
    wall = time.monotonic() - t0

    extracted = read_extracted(spark, args.out)
    lineage = read_lineage(spark, args.out)
    n_spans = extracted.count()
    totals = lineage.groupBy().sum("page_count", "ocr_char_count").collect()[0]
    doc_totals = read_doc_lineage(spark, args.out).groupBy().sum(
        "doc_count", "unresolved_count"
    ).collect()[0]
    print(
        json.dumps(
            {
                "run_id": manifest["run_id"],
                "committed_buckets": manifest["committed_buckets"],
                "committed_page_buckets": manifest["committed_page_buckets"],
                "docs": int(doc_totals[0] or 0),
                "spans": n_spans,
                "pages": int(totals[0] or 0),
                "ocr_chars": int(totals[1] or 0),
                "unresolved": int(doc_totals[1] or 0),
                "wall_sec": round(wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
