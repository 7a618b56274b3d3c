"""Similarity search over the embeddings table.

- q_cosine_topk: brute-force cosine top-k for a query set — the exactness
  baseline.  Both sides compute the dot product in DOUBLE with identical
  left-to-right accumulation so rounded values agree bit-for-bit.
- q_ann_lsh_buckets: random-hyperplane LSH bucket assignment (8 bits) — the
  scale path: at 100 TB the bucket id becomes the shuffle key and only
  same-bucket pairs are compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register_views

QUERIES: dict[str, QuerySpec] = {}

_TOPK = 5
_N_QUERIES = 8


def _cosine_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # broadcast the tiny query side; candidates stream through one stage
    return spark.sql(
        f"""
        WITH q AS (SELECT vec_id AS q_id,
                          transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                   FROM embeddings WHERE vec_id < {_N_QUERIES}),
        c AS (SELECT vec_id AS c_id,
                     transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
              FROM embeddings),
        p AS (
          SELECT /*+ BROADCAST(q) */ q_id, c_id,
                 aggregate(zip_with(qv, cv, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b) AS dot,
                 sqrt(aggregate(transform(qv, x -> x * x), CAST(0 AS DOUBLE), (a, b) -> a + b)) AS nq,
                 sqrt(aggregate(transform(cv, x -> x * x), CAST(0 AS DOUBLE), (a, b) -> a + b)) AS nc
          FROM c CROSS JOIN q
          WHERE q_id <> c_id
        ),
        s AS (SELECT q_id, c_id, round(dot / (nq * nc), 5) AS cosine FROM p)
        SELECT q_id, c_id, cosine FROM (
          SELECT s.*, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
          FROM s
        ) WHERE rn <= {_TOPK}
        """
    )


_COSINE_TOPK_DUCK = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
    p AS (
      SELECT q_id, c_id,
             list_dot_product(qv, cv) AS dot,
             sqrt(list_dot_product(qv, qv)) AS nq,
             sqrt(list_dot_product(cv, cv)) AS nc
      FROM c CROSS JOIN q
      WHERE q_id <> c_id
    ),
    s AS (SELECT q_id, c_id, round(dot / (nq * nc), 5) AS cosine FROM p)
    SELECT q_id, c_id, cosine FROM (
      SELECT s.*, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
      FROM s
    ) t WHERE rn <= {_TOPK}
"""

QUERIES["q_cosine_topk"] = QuerySpec(
    spark=_cosine_topk_spark,
    oracle=_COSINE_TOPK_DUCK,
    description="brute-force cosine top-k (broadcast query set)",
)


def _sign(i_expr: str, j: int) -> str:
    """Deterministic pseudo-random ±1 for hyperplane j, dimension i (exact
    integer arithmetic in both engines)."""
    return f"(CASE WHEN (({i_expr} * 2654435761 + {j} * 40503) % 97) % 2 = 0 THEN 1.0 ELSE -1.0 END)"


_N_PLANES = 8


def _ann_lsh_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    bit_cols = ", ".join(
        f"""(CASE WHEN aggregate(
                zip_with(transform(embedding, x -> CAST(x AS DOUBLE)),
                         sequence(1, size(embedding)),
                         (x, i) -> x * {_sign('i', j)}),
                CAST(0 AS DOUBLE), (a, b) -> a + b) >= 0 THEN '1' ELSE '0' END) AS b{j}"""
        for j in range(_N_PLANES)
    )
    concat_bits = ", ".join(f"b{j}" for j in range(_N_PLANES))
    return spark.sql(
        f"""
        SELECT vec_id, concat({concat_bits}) AS bucket
        FROM (SELECT vec_id, {bit_cols} FROM embeddings)
        """
    )


_DUCK_BITS = ", ".join(
    f"(CASE WHEN sum(x * {_sign('i', j)}) >= 0 THEN '1' ELSE '0' END) AS b{j}"
    for j in range(_N_PLANES)
)
_DUCK_CONCAT = ", ".join(f"b{j}" for j in range(_N_PLANES))

_ANN_LSH_DUCK = f"""
    WITH pos AS (
      SELECT vec_id, g.i AS i, embedding[g.i]::DOUBLE AS x
      FROM embeddings e,
      LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) g
    ),
    bits AS (SELECT vec_id, {_DUCK_BITS} FROM pos GROUP BY vec_id)
    SELECT vec_id, concat({_DUCK_CONCAT}) AS bucket FROM bits
"""

QUERIES["q_ann_lsh_buckets"] = QuerySpec(
    spark=_ann_lsh_spark,
    oracle=_ANN_LSH_DUCK,
    description="random-hyperplane LSH bucket per embedding (ANN scale path)",
)
