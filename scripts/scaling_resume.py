"""Resume an interrupted scaling campaign: run ONLY the missing reps.

The sandbox host can restart mid-campaign (BENCH/SCALING_NOTES.md);
scaling_runs.jsonl keeps every completed run, so recovery = relaunch
exactly the (master) runs still needed for a 3-rep median and let
scripts/scaling_median.py recompute the protocol statistic.

Deliberately does NOT rebuild engine.zip: the campaign's engine must
stay frozen across all reps (an overwrite would silently switch the
measured engine mid-campaign). Pass --masters in the order to run.

    python scripts/scaling_resume.py --n-docs 1024000 \
        --masters 'local[4]' 'local[1]' 'local[4]'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, submit  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1024000)
    ap.add_argument("--masters", nargs="+", required=True)
    ap.add_argument("--mem", default="24g")
    args = ap.parse_args()

    zpath = os.path.join(REPO, "engine.zip")
    if not os.path.exists(zpath):
        raise SystemExit("engine.zip missing — campaign zip must pre-exist")
    base = os.path.join(REPO, "_data", f"scale_{args.n_docs}.parquet")
    if not os.path.exists(base):
        raise SystemExit(f"corpus missing: {base}")
    shuffle = max(16, args.n_docs // 16000)
    runs_jsonl = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")

    for master in args.masters:
        try:
            rec = submit(zpath, master, base, shuffle=shuffle, mem=args.mem)
        except Exception as exc:
            line = {"n_docs": args.n_docs, "master": master, "rep": "resume",
                    "error": repr(exc)[:500]}
            with open(runs_jsonl, "a") as f:
                f.write(json.dumps(line) + "\n")
            print(json.dumps(line), flush=True)
            continue
        line = {"n_docs": args.n_docs, "master": master, "rep": "resume",
                "shuffle": shuffle, "mem": args.mem,
                "wall_sec": rec["wall_sec"],
                "docs_per_sec": rec["docs_per_sec"],
                "stage_write_secs": rec.get("stage_write_secs")}
        with open(runs_jsonl, "a") as f:
            f.write(json.dumps(line) + "\n")
        print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
