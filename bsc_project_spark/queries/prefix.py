"""Two-phase global prefix sums — the scale-safe replacement for
``SUM(...) OVER (ORDER BY ...)`` with no PARTITION BY.

A global-order window moves the entire table through ONE task (Spark
itself warns "No Partition Defined for Window operation"), which is a
scale wall at 10^12 rows.  The standard fix, already proven by
``q_sort_rank`` (relational.py), generalizes to any running aggregate:

1. range-partition on the order key (contiguous key ranges per
   partition — Spark samples the boundaries),
2. run the window WITHIN each range partition (parallel over P),
3. aggregate one subtotal per partition, prefix-sum those P numbers on
   the driver, and broadcast the per-partition offsets back.

Global prefix = partition offset + local prefix.  Only skinny columns
shuffle; the driver folds P integers no matter the table size.  The
result is EXACT (not approximate) and independent of where the sampled
range boundaries fall, provided the order key is a total order (unique
key tuples) — with duplicate keys the ROWS-frame running sum is
order-ambiguous in plain SQL too.

Reference analogue: the global row order of the merged matrix assembly,
/root/reference/scripts/imgs2csv.py:320-357.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_pp_pid"
_LOCAL = "_pp_local"
_OFF = "_pp_off"


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running SUM(``value_col``) over the global
    ORDER BY ``order_cols`` (ROWS UNBOUNDED PRECEDING .. CURRENT ROW),
    computed with the two-phase plan above — no single-task window.

    ``order_cols`` must form a total order (unique tuples).  The output
    column is BIGINT.  The input is persisted so the subtotal job and
    the final job see the SAME sampled range boundaries (each action
    would otherwise re-plan the range exchange; the persisted frame is
    skinny — order key + value — so the cache is cheap at any scale).
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    local = ranged.withColumn(
        _LOCAL,
        F.sum(F.col(value_col).cast("long")).over(
            Window.partitionBy(_PID)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    subtotals = sorted(
        (r[_PID], r.s)
        for r in ranged.groupBy(_PID)
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in subtotals:
        offsets.append((pid, acc))
        acc += int(s or 0)
    if not offsets:  # empty input: VALUES with no tuples is a parse error
        return (
            local.drop(_PID, _LOCAL)
            .withColumn(out_col, F.lit(None).cast("long"))
            .where(F.lit(False))
        )
    # inline VALUES, not createDataFrame: a Python-list createDataFrame
    # plans as a pickled-RDD scan (defaultParallelism tasks + Python
    # worker cold start for a P-row frame); a VALUES literal is a
    # LocalRelation Catalyst folds straight into the broadcast
    values = ", ".join(f"({pid}, {off}L)" for pid, off in offsets)
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t({_PID}, {_OFF})")
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY order_cols)`` via the same
    two-phase plan (a row number is the running sum of 1s)."""
    counted = global_cumsum(
        df.withColumn("_pp_one", F.lit(1)), order_cols, "_pp_one", out_col, n_parts
    )
    return counted.drop("_pp_one")
