"""Dump .explain("formatted") for the round-6-touched queries into
plans/r06/<query>_{before,after}.txt.

Run once from the ROUND-START worktree with SUFFIX=before and once from
HEAD with SUFFIX=after; OUT_DIR points at the repo's plans/r06 either
way.  Plan-only (no job execution beyond tiny probe head/collect jobs
some builders run at plan time)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT_DIR = os.environ.get("PLANS_OUT", os.path.join(HERE, "plans", "r06"))
SUFFIX = os.environ.get("SUFFIX", "after")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

QUERIES = [
    "q_semantic_dedup",
    "q_ivf_kmeans",
    "q_containment",
    "q_prefix_join",
    "q_sparse_knn",
    "q_phash_pairs",
    "q_simhash_pairs",
    "q_char_entropy",
    "q_cdc_chunks",
    "q_winnowing",
    "q_ngram_novelty",
    "q_tfidf_topk",
    "q_cooccurrence",
    "q_dsir",
    "q_embed_covariance",
    "q_embed_near_dup",
    "q_ann_recall",
    "q_cosine_topk",
    "q_minhash_est",
    "q_pagerank",
    "q_kcore",
    "q_triangle_count",
    "q_skew_profile",
    "q_ks_distance",
]


def main() -> None:
    from bsc_project_spark.pipeline.session import get_spark
    from bsc_project_spark.queries import all_queries

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans_r06")
    qs = all_queries()
    for name in QUERIES:
        try:
            df = qs[name].spark(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue().rstrip()
        except Exception as exc:  # pragma: no cover
            text = f"PLAN FAILED: {exc!r}"
        path = os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(text + "\n")
        print("wrote", path, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
