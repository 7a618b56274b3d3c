"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship job — build the deterministic interleaved
  text+media corpus (the BASELINE.json ``input_hint`` shape; no external
  data), run the full distributed extraction pipeline (explode -> salted
  repartition -> one vectorized mapInPandas kernel stage -> window
  order-restore), and return the extracted span table.
- ``queries()`` / ``oracle_sql()``: every relational / text / similarity
  operator from SURVEY.md §2c-2d plus the training-data ops (dedup,
  MinHash-LSH, SimHash, n-gram Jaccard, lang-id, quality, token count,
  fingerprint, cosine top-k, ANN LSH buckets), each with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction over the synthesized interleaved corpus."""
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG, build_corpus
    from bsc_project_spark.fixtures.spark_io import documents_df, media_df
    from bsc_project_spark.pipeline.extract import extract_spans

    corpus = build_corpus(n_docs=4, skew_every=4, skew_spans=12, compute_golden=False)
    docs = documents_df(spark, corpus)
    media = media_df(spark, corpus)
    return extract_spans(docs, media, FIXTURE_CONFIG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bsc_project_spark.queries import all_queries

    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from bsc_project_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
