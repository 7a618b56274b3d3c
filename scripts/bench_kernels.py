"""Kernel-level concurrency bench: golden extract_page throughput at two
worker counts, WITHOUT Spark — isolates the numpy kernels' scaling from
JVM/shuffle overhead.  The per-worker throughput ratio between N and 4N
workers bounds what any orchestration layer can achieve on this box
(memory bandwidth is shared; see BENCH/BASELINE.md).

Prints one JSON line.  Env: SPARK_GRAFT_KBENCH_REPS (default 6).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _work(args: tuple[int, int]) -> float:
    idx, reps = args
    sys.path.insert(0, REPO)
    from bsc_project_spark.fixtures.corpus import FIXTURE_CONFIG, page_spec
    from bsc_project_spark.fixtures.render import GLYPH_SCALE, render_page
    from bsc_project_spark.kernels.golden import extract_page

    img = render_page(page_spec(idx % 16))
    t0 = time.perf_counter()
    for _ in range(reps):
        extract_page(img, FIXTURE_CONFIG, GLYPH_SCALE)
    return time.perf_counter() - t0


def run(workers: int, reps: int) -> float:
    """pages/sec with `workers` concurrent processes."""
    with mp.Pool(workers) as pool:
        pool.map(_work, [(0, 1)] * workers)  # warm imports + first render
        t0 = time.perf_counter()
        pool.map(_work, [(i, reps) for i in range(workers)])
        wall = time.perf_counter() - t0
    return workers * reps / wall


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_KBENCH_REPS", "6"))
    trials = int(os.environ.get("SPARK_GRAFT_KBENCH_TRIALS", "3"))
    # interleave trials across levels (shared-host noise drifts on a
    # minutes scale) and keep the best throughput per level
    best: dict[int, float] = {}
    for _ in range(trials):
        for w in (4, 16):
            tput = run(w, reps)
            best[w] = max(best.get(w, 0.0), tput)
    out = {}
    for w, tput in best.items():
        out[f"pages_per_sec_{w}w"] = round(tput, 2)
        out[f"per_worker_{w}w"] = round(tput / w, 3)
    out["kernel_scaling_efficiency_4_to_16"] = round(
        out["per_worker_16w"] / out["per_worker_4w"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
