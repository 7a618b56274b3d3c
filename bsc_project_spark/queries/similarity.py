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


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (LSH-bucketed candidates, exact
# verify) over a corpus with planted duplicates — the embedding analogue of
# q_lsh_pairs.  And an IVF-style coarse assignment (nearest of K centroids),
# the scale path where the centroid id becomes the shuffle/prune key.
# ---------------------------------------------------------------------------

_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (p, q) -> p + q)"
)


def _spark_bits_expr(vec: str) -> str:
    bits = ", ".join(
        f"""(CASE WHEN aggregate(
                zip_with({vec}, sequence(1, size({vec})), (x, i) -> x * {_sign('i', j)}),
                CAST(0 AS DOUBLE), (p, q) -> p + q) >= 0 THEN '1' ELSE '0' END)"""
        for j in range(_N_PLANES)
    )
    return f"concat({bits})"


def _near_dup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH corpus AS (
          SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000, transform(embedding, x -> CAST(x AS DOUBLE))
          FROM embeddings WHERE vec_id % 100 = 0
        ),
        b AS (SELECT vec_id, v, {_spark_bits_expr('v')} AS bucket,
                     sqrt({_SPARK_DOT.format(a='v', b='v')}) AS nrm
              FROM corpus)
        SELECT x.vec_id AS a_id, y.vec_id AS b_id,
               round({_SPARK_DOT.format(a='x.v', b='y.v')} / (x.nrm * y.nrm), 5) AS cosine
        FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE {_SPARK_DOT.format(a='x.v', b='y.v')} / (x.nrm * y.nrm) > 0.999
        """
    )


_DUCK_POS = """
      SELECT vec_id, g.i AS i, embedding[g.i]::DOUBLE AS x
      FROM corpus e,
      LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) g
"""

_DUCK_BITS2 = ", ".join(
    f"(CASE WHEN sum(x * {_sign('i', j)}) >= 0 THEN '1' ELSE '0' END) AS b{j}"
    for j in range(_N_PLANES)
)

_NEAR_DUP_DUCK = f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 100 = 0
    ),
    pos AS ({_DUCK_POS}),
    bits AS (SELECT vec_id, {_DUCK_BITS2} FROM pos GROUP BY vec_id),
    b AS (SELECT c.vec_id, c.embedding::DOUBLE[] AS v,
                 concat({_DUCK_CONCAT}) AS bucket,
                 sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) AS nrm
          FROM corpus c JOIN bits ON bits.vec_id = c.vec_id)
    SELECT x.vec_id AS a_id, y.vec_id AS b_id,
           round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 5) AS cosine
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) > 0.999
"""

QUERIES["q_embed_near_dup"] = QuerySpec(
    spark=_near_dup_spark,
    oracle=_NEAR_DUP_DUCK,
    description="embedding-cosine near-dup pairs via LSH bucket candidates + exact verify",
)


def _ivf_assign_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH c AS (SELECT vec_id AS centroid_id,
                          transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
                   FROM embeddings WHERE vec_id < 8),
        v AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
              FROM embeddings),
        s AS (
          SELECT /*+ BROADCAST(c) */ vec_id, centroid_id,
                 round({_SPARK_DOT.format(a='vv', b='cv')}
                       / (sqrt({_SPARK_DOT.format(a='vv', b='vv')})
                          * sqrt({_SPARK_DOT.format(a='cv', b='cv')})), 5) AS cosine
          FROM v CROSS JOIN c
        )
        SELECT vec_id, centroid_id, cosine FROM (
          SELECT s.*, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cosine DESC, centroid_id) AS rn
          FROM s
        ) WHERE rn = 1
        """
    )


_IVF_DUCK = """
    WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id < 8),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
    s AS (
      SELECT vec_id, centroid_id,
             round(list_dot_product(vv, cv)
                   / (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(cv, cv))), 5) AS cosine
      FROM v CROSS JOIN c
    )
    SELECT vec_id, centroid_id, cosine FROM (
      SELECT s.*, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cosine DESC, centroid_id) AS rn
      FROM s
    ) t WHERE rn = 1
"""

QUERIES["q_ivf_assign"] = QuerySpec(
    spark=_ivf_assign_spark,
    oracle=_IVF_DUCK,
    description="IVF coarse assignment: nearest of K centroids per embedding",
)
