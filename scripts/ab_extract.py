"""Same-window A/B of the extraction stage between two checkouts.

Round-3 verdict flagged a possible extraction regression (34.9 -> 25.6
docs/s across driver windows, 5.5 s -> 7.45 s QUERYBENCH median) that the
per-round single-window benches cannot distinguish from host contention
(documented 1.5-2x minute-to-minute drift on this box).  This script
settles it with the interleaved back-to-back methodology BENCH/BASELINE.md
already uses for scaling: alternate (A, B, A, B, ...) in ONE window, N
rounds each, fresh Spark session per run (subprocess), report per-round
walls and medians.

Usage: python scripts/ab_extract.py <tree_a> <tree_b> [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

_RUNNER = r"""
import json, os, sys, time
root = sys.argv[1]
os.chdir(root)
sys.path.insert(0, root)
from bsc_project_spark.pipeline.session import get_spark
sys.path.insert(0, os.path.dirname(os.path.abspath(sys.argv[2])))
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", sys.argv[2])
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
corpus_dir = bench.ensure_corpus(int(sys.argv[3]))
spark = get_spark("ab-extract")
spark.range(1000).selectExpr("sum(id)").collect()
def _warm(it):
    import numpy as _np  # noqa: F401
    for pdf in it:
        yield pdf
n_workers = os.cpu_count() or 32
spark.range(n_workers * 4).repartition(n_workers * 4).mapInPandas(
    _warm, "id long").count()
res = bench.bench_extraction(spark, corpus_dir)
print("ABRESULT " + json.dumps(res))
"""


def run_once(tree: str, n_docs: int) -> dict:
    bench_py = os.path.join(tree, "bench.py")
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUNNER)
        runner = f.name
    try:
        out = subprocess.run(
            [sys.executable, runner, tree, bench_py, str(n_docs)],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "PYTHONPATH": tree},
        )
        for line in out.stdout.splitlines():
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"no result from {tree}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )
    finally:
        os.unlink(runner)


def main() -> None:
    tree_a = os.path.abspath(sys.argv[1])
    tree_b = os.path.abspath(sys.argv[2])
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "192"))

    walls: dict[str, list[float]] = {tree_a: [], tree_b: []}
    rates: dict[str, list[float]] = {tree_a: [], tree_b: []}
    for r in range(rounds):
        for tree in (tree_a, tree_b):
            res = run_once(tree, n_docs)
            walls[tree].append(res["extract_sec"])
            rates[tree].append(res["docs_per_sec"])
            print(
                f"round {r}: {os.path.basename(tree)} "
                f"extract={res['extract_sec']}s {res['docs_per_sec']} docs/s",
                flush=True,
            )
    summary = {
        "n_docs": n_docs,
        "rounds": rounds,
        "trees": {
            os.path.basename(t): {
                "walls_sec": walls[t],
                "median_wall_sec": round(statistics.median(walls[t]), 3),
                "docs_per_sec": rates[t],
                "median_docs_per_sec": round(statistics.median(rates[t]), 3),
            }
            for t in (tree_a, tree_b)
        },
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
