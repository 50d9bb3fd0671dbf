"""Derive the protocol statistic from BENCH/scaling_runs.jsonl.

The scaling evidence's headline number is the MEDIAN docs/sec per
(corpus size, master) over ALL completed runs recorded in the
append-only jsonl — including runs whose bench process was later
killed (host restarts happen in this sandbox; the per-run append
means nothing is lost). This script recomputes that statistic
mechanically so BENCH/BASELINE.md's table is reproducible:

    python scripts/scaling_median.py [--n-docs 1024000]
    python scripts/scaling_median.py --all

Efficiency = (median docs/sec at 4N) / (4 * median docs/sec at N),
the same formula scaling_bench.py uses; rep-pair efficiencies are
shown as supplementary diagnostics only.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")

N_MASTER, N4_MASTER = "local[1]", "local[4]"


def load_runs() -> dict[int, dict[str, list[float]]]:
    by: dict[int, dict[str, list[float]]] = defaultdict(lambda: defaultdict(list))
    with open(RUNS) as f:
        for line in f:
            rec = json.loads(line)
            if "docs_per_sec" in rec and "master" in rec:
                by[rec["n_docs"]][rec["master"]].append(rec["docs_per_sec"])
    return by


def summarize(n_docs: int, levels: dict[str, list[float]]) -> dict:
    n, n4 = levels.get(N_MASTER, []), levels.get(N4_MASTER, [])
    out = {"n_docs": n_docs,
           "reps_N": len(n), "reps_4N": len(n4),
           "docs_per_sec_N": sorted(n), "docs_per_sec_4N": sorted(n4)}
    if n and n4:
        med_n, med_4n = statistics.median(n), statistics.median(n4)
        out.update({
            "median_N": round(med_n, 2), "median_4N": round(med_4n, 2),
            "scaling_efficiency": round((med_4n / med_n) / 4.0, 3),
            "per_pair_efficiency": [round((b / a) / 4.0, 3)
                                    for a, b in zip(n, n4)],
            "target": 0.8,
        })
        out["meets_target"] = out["scaling_efficiency"] >= 0.8
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1024000)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    by = load_runs()
    sizes = sorted(by) if args.all else [args.n_docs]
    for s in sizes:
        print(json.dumps(summarize(s, by[s])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
