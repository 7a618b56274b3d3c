"""Skew-mitigated join machinery + its driver-checkable query.

Salting is the standard fix for a shuffle join whose key distribution is
heavy-tailed (one hot key -> one straggler reducer).  The helper here is
the explicit form: fact rows get a deterministic salt derived from a
row-unique column set (NOT from the join key — splitting the hot key
across reducers is the whole point), the dim side is replicated once per
salt value, and the join key becomes (key, salt).  Results are identical
to the unsalted join; only the physical distribution changes.  Spark's
AQE skew-join handles the same problem adaptively at runtime (and the
extract pipeline leans on it, pipeline/extract.py); the explicit form is
what you reach for when the skew is known ahead of time or AQE's
post-shuffle splitting cannot help (e.g. a skewed build side).

`q_salted_join` plants a deliberately skewed key (70% of lineitem rows
collapse onto key 0) and runs the salted join with broadcast disabled via
a shuffle_hash hint so the distributed path is the one exercised; the
DuckDB oracle computes the same join unsalted — passing the driver's
hash-compare IS the proof that salting preserves semantics.  A plan test
(tests/test_plans.py) pins that the physical join really is a non-
broadcast join keyed on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register_views

QUERIES: dict[str, QuerySpec] = {}

_N_SALT = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_cols: list[str],
    n_salt: int = _N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` with a small-but-not-broadcastable `dim` on `on`,
    splitting every fact key across `n_salt` reducers.

    salt_cols must identify fact rows (well) enough that the salt spreads
    uniformly — any row-unique or near-unique column set works; the salt
    is pmod(xxhash64(salt_cols), n_salt), so it is deterministic (no RNG,
    re-runs and retries route rows identically).  The dim side is
    replicated n_salt times via an explode — acceptable exactly when the
    dim is orders of magnitude smaller than the fact, which is the only
    regime where salting beats a plain shuffle join anyway.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).hint("shuffle_hash")
    joined = salted_fact.join(salted_dim, [*on, "_salt"], how)
    return joined.drop("_salt")


def _salted_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    fact = spark.table("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        F.expr(
            "CASE WHEN l_orderkey % 10 < 7 THEN CAST(0 AS BIGINT)"
            " ELSE 1 + l_orderkey % 96 END"
        ).alias("sk"),
    )
    dim = (
        spark.table("part")
        .groupBy((F.col("p_partkey") % 97).cast("bigint").alias("sk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dim_n"),
            F.min("p_retailprice").alias("dim_min_price"),
        )
    )
    joined = salted_join(fact, dim, on=["sk"], salt_cols=["l_orderkey", "l_linenumber"])
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("dim_n").cast("bigint").alias("sum_dim_n"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
            " * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"
        ).alias("revenue"),
    )


_SALTED_JOIN_DUCK = """
    WITH fact AS (
      SELECT l_returnflag, l_extendedprice, l_discount,
             CASE WHEN l_orderkey % 10 < 7 THEN 0
                  ELSE 1 + l_orderkey % 96 END AS sk
      FROM lineitem
    ),
    dim AS (
      SELECT p_partkey % 97 AS sk, count(*) AS dim_n,
             min(p_retailprice) AS dim_min_price
      FROM part GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(dim_n) AS BIGINT) AS sum_dim_n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM fact JOIN dim USING (sk)
    GROUP BY l_returnflag
"""

QUERIES["q_salted_join"] = QuerySpec(
    spark=_salted_join_spark,
    oracle=_SALTED_JOIN_DUCK,
    description=(
        "skew-mitigated salted join (70% of fact rows share one key): "
        "deterministic row-salt x dim replication, shuffle-hash path, "
        "result hash-equal to the unsalted oracle join"
    ),
)
