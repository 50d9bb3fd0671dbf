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


def load_runs(tag: str | None = None) -> dict[int, dict[str, list[float]]]:
    """tag filters to runs recorded by that engine git SHA — medians
    must not mix engine versions (runs before r4 carry no tag and are
    excluded by any --tag filter)."""
    by: dict[int, dict[str, list[float]]] = defaultdict(lambda: defaultdict(list))
    codes: set[str] = set()
    with open(RUNS) as f:
        for line in f:
            rec = json.loads(line)
            if "docs_per_sec" in rec and "master" in rec:
                if tag is not None and rec.get("code") != tag:
                    continue
                codes.add(str(rec.get("code")))
                by[rec["n_docs"]][rec["master"]].append(rec["docs_per_sec"])
    if tag is None and len(codes) > 1:
        # ADVICE r4: without --tag the medians silently mix engine
        # versions, contradicting the same-code invariant — say so.
        import sys
        sys.stderr.write(
            "WARNING: mixing runs from engine versions "
            f"{sorted(codes)} in one median; pass --tag <sha> for a "
            "same-code statistic\n")
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


def write_result_md(s: dict) -> str:
    """Regenerate BENCH/SCALING_RESULT_<n>.md from the jsonl-derived
    summary. Unlike scaling_bench.py's in-process writer, this covers
    campaigns whose bench process was killed mid-flight (the completed
    runs live only in the jsonl) and always states the rep count."""
    md = os.path.join(REPO, "BENCH", f"SCALING_RESULT_{s['n_docs']}.md")
    verdict = ("MEETS" if s.get("meets_target") else "below") \
        if "scaling_efficiency" in s else "incomplete"
    lines = [
        f"# Scaling result — {s['n_docs']} docs, {N_MASTER} vs "
        f"{N4_MASTER} (derived from BENCH/scaling_runs.jsonl by "
        "scaling_median.py)",
        "",
        f"Input: {s['n_docs']} synthesized interleaved documents "
        "(seed 42, coastal-Zipf skew, FIXTURES.md generator), "
        "materialized ONCE to parquet; job = `spark-submit --py-files "
        "engine.zip jobs/convert.py --input ...` (full SOSI->OSM "
        "conversion incl. all output writes). Identical config at both "
        "levels (data-scaled shuffle partitions, 24g heap, AQE off, "
        "disk scratch). Statistic: MEDIAN docs/sec over ALL completed "
        "runs per level in the append-only jsonl.",
        "",
        "| config | reps | docs/sec (each) | median |",
        "|---|---|---|---|",
        f"| {N_MASTER} (N) | {s['reps_N']} | "
        + ", ".join(str(v) for v in s["docs_per_sec_N"])
        + f" | {s.get('median_N', '—')} |",
        f"| {N4_MASTER} (4N) | {s['reps_4N']} | "
        + ", ".join(str(v) for v in s["docs_per_sec_4N"])
        + f" | {s.get('median_4N', '—')} |",
        "",
        f"**Median scaling efficiency "
        f"{s.get('scaling_efficiency', 'n/a')} ({verdict} the >= 0.8 "
        "target; the MEDIAN over completed runs is the protocol "
        "statistic). Sorted-rep-pair efficiencies (diagnostic): "
        f"{s.get('per_pair_efficiency', [])}.**",
        "",
        f"Raw per-run JSON: BENCH/scaling_runs.jsonl "
        f"(n_docs={s['n_docs']} lines). Reproduce: "
        f"`python scripts/scaling_median.py --n-docs {s['n_docs']}`.",
        "",
    ]
    with open(md, "w") as f:
        f.write("\n".join(lines))
    return md


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1024000)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--write-md", action="store_true",
                    help="also regenerate BENCH/SCALING_RESULT_<n>.md")
    ap.add_argument("--tag", default=None,
                    help="only include runs recorded at this engine git "
                         "SHA (scaling_bench tags each record)")
    args = ap.parse_args()
    by = load_runs(args.tag)
    sizes = sorted(by) if args.all else [args.n_docs]
    for s in sizes:
        summary = summarize(s, by[s])
        print(json.dumps(summary))
        if args.write_md:
            print("wrote", write_result_md(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
