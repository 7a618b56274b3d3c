"""Calm-window campaign for ONE scaling pair (default 4 -> 16): K
back-to-back rounds of local[N] then local[4N] on the same corpus,
reporting every per-round efficiency and the median.

The full matrix in scripts/bench_scaling.py interleaves five widths, so
any single pair's two walls are ~10 minutes apart — wide enough for this
shared host's contention to drift between them.  Here the pair's two
runs are strictly adjacent (seconds apart), which is the closest this
sandbox gets to a controlled A/B.  A load probe runs before each round
and its 1-minute loadavg is recorded so a blown round is attributable.

Usage: python scripts/scaling_campaign.py [N] [rounds]
  (default N=4 -> pair 4->16, rounds=3; env SPARK_GRAFT_SCALING_DOCS)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import _median, run_level  # noqa: E402  (same dir)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n4 = n * 4
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "768"))
    from bench import ensure_corpus

    corpus_dir = ensure_corpus(n_docs)
    effs: list[float] = []
    detail: list[dict] = []
    for r in range(rounds):
        load1 = os.getloadavg()[0]
        lo = run_level(n, corpus_dir, 1)
        hi = run_level(n4, corpus_dir, 1)
        eff = (lo["wall"] / hi["wall"]) / (n4 / n)
        effs.append(eff)
        detail.append(
            {
                "round": r,
                "loadavg_before": round(load1, 2),
                f"t_local{n}_sec": round(lo["wall"], 3),
                f"t_local{n4}_sec": round(hi["wall"], 3),
                "efficiency": round(eff, 3),
            }
        )
        print(
            f"round {r}: load {load1:.1f}  local[{n}] {lo['wall']:.2f}s  "
            f"local[{n4}] {hi['wall']:.2f}s  eff {eff:.3f}",
            file=sys.stderr,
        )
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    summary = {
        "pair": f"{n}->{n4}",
        "docs": n_docs,
        "rounds": detail,
        "median_efficiency": round(_median(effs), 3),
        "best_efficiency": round(max(effs), 3),
        "measured_at_commit": commit,
        "measured_at_unix": int(time.time()),
    }
    out = os.path.join(REPO, "BENCH", f"campaign_{n}_{n4}_{n_docs}docs.json")
    # merge BEFORE printing (r5 advice: the stdout JSON used to carry
    # this run's rounds only, disagreeing with the merged file written
    # after it); append rounds if a campaign at this (pair, docs)
    # already ran — the median sharpens across calm windows instead of
    # clobbering them.  Per-round commit stamps record which build each
    # contributed round was measured at.
    for d in detail:
        d.setdefault("commit", commit)
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f)
        detail = prev["rounds"] + [
            {**d, "round": d["round"] + len(prev["rounds"])} for d in detail
        ]
        effs = [d["efficiency"] for d in detail]
        summary["rounds"] = detail
        summary["median_efficiency"] = round(_median(effs), 3)
        summary["best_efficiency"] = round(max(effs), 3)
        summary["contributing_commits"] = sorted(
            {d.get("commit", "unknown") for d in detail}
        )
    print(json.dumps(summary, indent=2))
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
