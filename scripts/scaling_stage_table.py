"""Per-stage N->4N scaling decomposition from BENCH/scaling_runs.jsonl.

For one engine tag + corpus size, prints a markdown table of median
per-stage write walls at each level and the stage speedup — the
evidence for WHICH parts of the job scale and which carry fixed cost.

    python scripts/scaling_stage_table.py --tag 4c2f84a [--n-docs 1024000]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--n-docs", type=int, default=1024000)
    args = ap.parse_args()

    stages: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list))
    walls: dict[str, list[float]] = defaultdict(list)
    with open(RUNS) as f:
        for line in f:
            rec = json.loads(line)
            if (rec.get("code") != args.tag
                    or rec.get("n_docs") != args.n_docs
                    or not isinstance(rec.get("rep"), int)
                    or not rec.get("stage_write_secs")):
                continue
            m = rec["master"]
            walls[m].append(rec["wall_sec"])
            for st, sec in rec["stage_write_secs"].items():
                stages[st][m].append(sec)

    order = ["plan_build", "input_count", "core_chain", "nodes", "ways",
             "relations", "tile_assignments", "echo", "points"]
    print(f"| stage | {N_MASTER} median s | {N4_MASTER} median s | speedup |")
    print("|---|---|---|---|")
    for st in order:
        if st not in stages:
            continue
        n = statistics.median(stages[st][N_MASTER]) if stages[st][N_MASTER] else None
        n4 = statistics.median(stages[st][N4_MASTER]) if stages[st][N4_MASTER] else None
        sp = f"{n / n4:.2f}x" if n and n4 else "—"
        print(f"| {st} | {round(n, 2) if n is not None else '—'} "
              f"| {round(n4, 2) if n4 is not None else '—'} | {sp} |")
    wn = statistics.median(walls[N_MASTER]) if walls[N_MASTER] else None
    w4 = statistics.median(walls[N4_MASTER]) if walls[N4_MASTER] else None
    if wn and w4:
        print(f"| **whole job** | {round(wn, 2)} | {round(w4, 2)} "
              f"| **{wn / w4:.2f}x** |")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
