"""Regenerate BENCH/QUERYBENCH.md: run `bench.py` N times back-to-back
(default 3) and record the per-query MEDIAN walls — the stable reference
to read a single noisy-window BENCH_r{N}.json against.

Usage: python scripts/querybench.py  (env: SPARK_GRAFT_QB_RUNS)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    runs = int(os.environ.get("SPARK_GRAFT_QB_RUNS", "3"))
    results = []
    for i in range(runs):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(
            f"run {i}: total {results[-1]['total_sec']} s, "
            f"{results[-1]['extraction']['docs_per_sec']} docs/s",
            file=sys.stderr,
        )

    queries = sorted(results[0]["queries"])
    medians = {
        q: statistics.median(r["queries"][q] for r in results) for q in queries
    }
    totals = ", ".join(f"{r['total_sec']:.1f} s" for r in results)
    med_total = statistics.median(r["total_sec"] for r in results)
    dps = ", ".join(f"{r['extraction']['docs_per_sec']:.1f}" for r in results)
    rows = "\n".join(
        f"| {q} | {medians[q]:.3f} |"
        for q in sorted(medians, key=medians.get, reverse=True)
    )
    md = f"""# Per-query bench reference (median of {runs} back-to-back runs)

`python bench.py` x{runs}, sf0.1, local[32], same session config as the
driver's per-round BENCH_r{{N}}.json run.  Host contention on this
shared sandbox moves any SINGLE run's totals by 1.5-2x minute to
minute; the medians below are the stable reference to read a
noisy-window BENCH_r{{N}}.json against.

Totals across the {runs} runs: {totals} (median {med_total:.1f} s); extraction throughput {dps} docs/s.

| query | median sec |
|---|---|
{rows}

Regenerate: `python scripts/querybench.py`
"""
    with open(os.path.join(REPO, "BENCH", "QUERYBENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/QUERYBENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
