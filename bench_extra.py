"""Extra per-query benchmark harness (guide §1) — bench.py stays frozen.

Times individual registered queries with the SAME methodology as bench.py
(builder call + .count()), optionally repeated, against any sf dir.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [-n N] [q ...]

With no query names, runs every registered query once.  Prints one JSON
line: {"sf": ..., "n": N, "queries": {name: [secs...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    args = sys.argv[1:]
    n = 1
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bsc_project_spark.pipeline.session import get_spark
    from bsc_project_spark.queries import all_queries

    spark = get_spark("bench_extra")
    log("spark master:", spark.sparkContext.master)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm(it):
        import numpy as _np  # noqa: F401
        for pdf in it:
            yield pdf

    n_workers = os.cpu_count() or 32
    spark.range(n_workers * 4).repartition(n_workers * 4).mapInPandas(
        _warm, "id long"
    ).count()

    specs = all_queries()
    # sorted to match bench.py's methodology (alphabetical execution order)
    names = args or sorted(specs)
    times: dict[str, list[float]] = {}
    for name in names:
        spec = specs[name]
        times[name] = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} (rep {i})")
            t0 = time.monotonic()
            df = spec.spark(spark, sf_dir)
            cnt = df.count()
            dt = round(time.monotonic() - t0, 3)
            times[name].append(dt)
            log(f"{name}[{i}]: {dt}s ({cnt} rows)")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "n": n, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
