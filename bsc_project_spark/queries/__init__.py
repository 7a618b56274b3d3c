"""Driver-checkable query registry.

Each query is a QuerySpec: a Spark callable (spark, sf_dir) -> DataFrame and
an optional DuckDB oracle SQL string over the same parquet tables.  Column
names/aliases match exactly between the two sides (the driver sorts columns
by name before value-hashing); double-valued outputs are rounded identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


_REGISTERED_DIRS: dict[tuple[int, str], bool] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata parquet files as temp views (idempotent per
    session+dir)."""
    key = (id(spark), sf_dir)
    if _REGISTERED_DIRS.get(key):
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED_DIRS[key] = True


def sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


def all_queries() -> dict[str, QuerySpec]:
    from . import eventops, relational, similarity, textops, visual, webtext

    out: dict[str, QuerySpec] = {}
    out.update(relational.QUERIES)
    out.update(textops.QUERIES)
    out.update(similarity.QUERIES)
    out.update(eventops.QUERIES)
    out.update(webtext.QUERIES)
    out.update(visual.QUERIES)
    return out
