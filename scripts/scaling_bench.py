"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No real cluster exists in the sandbox, so the north rule's N vs 4N
EXECUTOR criterion is evidenced two ways, both via
`spark-submit --py-files engine.zip jobs/convert.py` on identical
pre-materialized input:

1. executors (primary): 1 executor process (local[8]) converting the
   whole corpus vs 4 CONCURRENT executor processes (local[8] each)
   converting 4 disjoint doc_id-hash shards. Separate JVMs with
   separate Python worker pools is exactly how a real cluster scales
   this job; content-addressed node ids make shard outputs globally
   consistent (verified by scripts/check_shard_consistency.py).
2. threads (secondary): the same single-JVM job at local[8] vs
   local[32]. Single-JVM thread scaling on this host is latency-bound
   (sequential stage barriers + Python-runner handshakes), reported
   for transparency with attribution.

Outputs (ADVICE r2: never clobber the hand-written BASELINE.md):
  - BENCH/scaling_runs.jsonl — one line per completed run, APPENDED
    IMMEDIATELY (a killed bench loses nothing);
  - BENCH/SCALING_RESULT_<n_docs>.md — generated result block for this
    run; BENCH/BASELINE.md is hand-maintained and references these.
The headline statistic is the MEDIAN docs/sec at each level over
--reps reps (best-rep figures are supplementary diagnostics only).

Usage: python scripts/scaling_bench.py [--n-docs 32000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time
import zipfile
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    zpath = os.path.join(REPO, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "topo2osm_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def prewarm(input_path: str) -> None:
    """Read the input parquet through the OS page cache before EVERY
    rep: r3's campaign showed a 1.56x docs/sec spread between two
    local[4] reps of the identical job, attributable to cold vs warm
    input cache + co-tenant load. Warming both legs uniformly removes
    the cache asymmetry from the N vs 4N comparison (a real cluster's
    scan bandwidth also does not depend on the executor count)."""
    paths = ([os.path.join(input_path, f) for f in os.listdir(input_path)]
             if os.path.isdir(input_path) else [input_path])
    buf = bytearray(1 << 20)
    for p in paths:
        # best-effort: skip metadata entries and nested directories
        # (hive-partitioned layouts) instead of killing the campaign
        if os.path.basename(p).startswith(("_", ".")) or not os.path.isfile(p):
            continue
        try:
            with open(p, "rb", buffering=0) as f:
                while f.readinto(buf):
                    pass
        except OSError:
            continue


def submit(zpath: str, master: str, input_path: str, shuffle: int = 16,
           mem: str = "12g") -> dict:
    # scratch location: tmpfs (/dev/shm) is fastest but its pages count
    # against the host's STRICT overcommit CommitLimit (66 GB here), and
    # large-corpus runs (256k docs: persist blocks + shuffle + outputs)
    # crashed Python workers under that pressure. Default to the real
    # disk for single-JVM runs; SPARK_GRAFT_SCRATCH=/dev/shm restores
    # tmpfs for the 4-concurrent-executor diagnostics where virtual-disk
    # saturation is the bigger distortion.
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp")
    out_dir = tempfile.mkdtemp(prefix="scale_wh_", dir=scratch)
    local_dir = tempfile.mkdtemp(prefix="spark-local-", dir=scratch)
    cmd = [
        "spark-submit", "--master", master,
        "--driver-memory", mem,
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.local.dir={local_dir}",
        "--conf", f"spark.sql.shuffle.partitions={shuffle}",
        "--conf", "spark.python.worker.faulthandler.enabled=true",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "convert.py"),
        "--input", input_path, "--out", out_dir, "--no-checkpoint",
        "--skip-counts",
        "--master", master, "--shuffle-partitions", str(shuffle),
    ]
    try:
        for attempt in (0, 1):
            # prewarm inside the retry loop (ADVICE r4): a retried rep
            # after a failed 60-70 min run would otherwise execute with
            # a cold/evicted page cache — the exact 1.56x asymmetry the
            # prewarm protocol exists to remove.
            prewarm(input_path)
            # 1M-doc local[1] reps run ~60-70 min — 3600 killed a whole
            # bench mid-rep; the per-rep ceiling must clear the slowest
            # configured (corpus, parallelism) pair with margin
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=REPO, timeout=9000)
            lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            if lines:
                return json.loads(lines[-1])
            # transient sandbox failures (python worker killed under
            # host memory pressure from co-tenants): one retry
            sys.stderr.write(f"[retry {attempt}] no JSON from {master}\n"
                             + proc.stdout[-800:] + proc.stderr[-800:])
        raise RuntimeError(f"no JSON from {master} on {input_path}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(local_dir, ignore_errors=True)


def ensure_corpus(n_docs: int, want_shards: bool = True) -> tuple[str, list[str]]:
    base = os.path.join(REPO, "_data", f"scale_{n_docs}.parquet")
    shards = [os.path.join(REPO, "_data", f"scale_{n_docs}_shard{i}.parquet")
              for i in range(4)]
    if not os.path.exists(base):
        r = subprocess.run([
            sys.executable, os.path.join(REPO, "jobs", "gen_corpus.py"),
            "--n-docs", str(n_docs), "--out", base],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-1000:] + r.stderr[-1000:])
            raise RuntimeError("corpus generation failed")
    if want_shards and not all(os.path.exists(s) for s in shards):
        r = subprocess.run([sys.executable, "-c", f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from topo2osm_spark.plans.session import build_session
spark = build_session('shard', master='local[16]', shuffle_partitions=16)
docs = spark.read.parquet({base!r}).withColumn(
    '_s', F.pmod(F.xxhash64('doc_id'), F.lit(4)))
for i in range(4):
    docs.where(F.col('_s') == i).drop('_s').repartition(8) \\
        .write.mode('overwrite').parquet({REPO!r} + f'/_data/scale_{n_docs}_shard{{i}}.parquet')
print('sharded')
"""], capture_output=True, text=True, cwd=REPO, timeout=3600)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-1000:] + r.stderr[-1000:])
            raise RuntimeError("sharding failed")
    return base, shards


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=128000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-master", default="local[2]")
    ap.add_argument("--n4-master", default="local[8]")
    ap.add_argument("--mem", default="12g",
                    help="driver/executor JVM heap for each submitted run "
                         "(identical at N and 4N; 512k-doc probes showed "
                         "12g starves 4 concurrent tasks)")
    ap.add_argument("--extras", action="store_true",
                    help="also record local[32] single-JVM and 4-process "
                         "concurrency data points (diagnostics)")
    args = ap.parse_args()
    zpath = build_zip()
    base, shards = ensure_corpus(args.n_docs, want_shards=args.extras)

    # partition count scales with DATA (bounded per-partition size:
    # ~16k docs/partition, measured sweet spot), never with the
    # parallelism level — both configs run the IDENTICAL job. Pinning
    # 16 partitions at 512k docs doubled partition size and collapsed
    # local[4] to 733 docs/s (memory pressure under 4 concurrent
    # tasks) while serial local[1] was unaffected — the classic
    # partitions-must-scale-with-data rule, measured.
    shuffle = max(16, args.n_docs // 16000)
    runs_jsonl = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    os.makedirs(os.path.dirname(runs_jsonl), exist_ok=True)

    try:
        code_tag = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO, timeout=30).stdout.strip() or "unknown"
    except Exception:
        code_tag = "unknown"

    def record(rec: dict) -> None:
        # append-immediately: a killed bench keeps every finished run;
        # the code tag separates campaigns across engine versions (the
        # jsonl is append-only across rounds, but medians must only mix
        # runs of the SAME engine code)
        rec.setdefault("code", code_tag)
        with open(runs_jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")

    results: dict[str, list[dict]] = {args.n_master: [], args.n4_master: []}
    for rep in range(args.reps):
        for master in (args.n_master, args.n4_master):
            try:
                rec = submit(zpath, master, base, shuffle=shuffle,
                             mem=args.mem)
            except Exception as exc:  # one lost rep must not kill the bench
                record({"n_docs": args.n_docs, "master": master, "rep": rep,
                        "error": repr(exc)[:500]})
                print(json.dumps({"mode": "cores", "master": master,
                                  "rep": rep, "error": repr(exc)[:200]}),
                      flush=True)
                continue
            rec["rep"] = rep
            results[master].append(rec)
            record({"n_docs": args.n_docs, "master": master, "rep": rep,
                    "shuffle": shuffle, "mem": args.mem,
                    "wall_sec": rec["wall_sec"],
                    "docs_per_sec": rec["docs_per_sec"],
                    "stage_write_secs": rec.get("stage_write_secs")})
            print(json.dumps({"mode": "cores", "master": master, "rep": rep,
                              "wall_sec": rec["wall_sec"],
                              "docs_per_sec": rec["docs_per_sec"]}), flush=True)

    if not results[args.n_master] or not results[args.n4_master]:
        print(json.dumps({"error": "insufficient completed reps",
                          "n": len(results[args.n_master]),
                          "n4": len(results[args.n4_master])}))
        return 1
    med_n = statistics.median(r["docs_per_sec"] for r in results[args.n_master])
    med_4n = statistics.median(r["docs_per_sec"] for r in results[args.n4_master])
    eff = (med_4n / med_n) / 4.0

    extras: list[dict] = []
    if args.extras:
        # diagnostics run under the SAME data-scaled shuffle + heap as
        # the primary reps (ADVICE r2: defaults silently reproduced the
        # exact config the 512k probes showed collapsing)
        rec = submit(zpath, "local[32]", base, shuffle=shuffle, mem=args.mem)
        extras.append({"mode": "threads-32", **rec})
        t0 = time.monotonic()
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(submit, zpath, "local[8]", s,
                              max(16, shuffle // 4), args.mem)
                    for s in shards]
            recs = [f.result() for f in futs]
        extras.append({"mode": "4-process-concurrent",
                       "wall_sec": round(time.monotonic() - t0, 2),
                       "shard_walls": [r["wall_sec"] for r in recs]})
        for e in extras:
            record({"n_docs": args.n_docs, "extra": e})
            print(json.dumps(e), flush=True)

    per_pair = [round((r4["docs_per_sec"] / rn["docs_per_sec"]) / 4.0, 3)
                for rn, r4 in zip(results[args.n_master],
                                  results[args.n4_master])]
    summary = {
        "n_docs": args.n_docs, "reps": args.reps,
        "shuffle_partitions": shuffle, "jvm_heap": args.mem,
        "n_master": args.n_master, "n4_master": args.n4_master,
        "docs_per_sec_N": round(med_n, 2),
        "docs_per_sec_4N": round(med_4n, 2),
        "speedup_N_to_4N": round(med_4n / med_n, 3),
        "scaling_efficiency": round(eff, 3),
        "per_rep_pair_efficiency": per_pair,
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    record({"summary": summary})
    print(json.dumps(summary))

    # generated RESULT file — BASELINE.md is hand-maintained and
    # references this; the N/4N narrative derives from the actual args
    n_cores = args.n_master.strip("local[]")
    n4_cores = args.n4_master.strip("local[]")
    md = os.path.join(REPO, "BENCH", f"SCALING_RESULT_{args.n_docs}.md")
    lines = [
        f"# Scaling result — {args.n_docs} docs, "
        f"{args.n_master} vs {args.n4_master} (generated by scaling_bench.py)",
        "",
        f"Input: {args.n_docs} synthesized interleaved documents "
        "(seed 42, coastal-Zipf skew, FIXTURES.md generator), "
        "materialized ONCE to parquet; job = `spark-submit --py-files "
        "engine.zip jobs/convert.py --input ...` (full SOSI->OSM "
        "conversion incl. all output writes). Identical config at "
        f"both levels: {shuffle} shuffle/parse partitions "
        "(data-scaled: ~16k docs/partition), "
        f"{args.mem} JVM heap, AQE off, parquet scratch on disk. "
        f"N = {n_cores} cores, 4N = {n4_cores} cores.",
        "",
        "| config | docs/sec (median) | per-rep wall sec |",
        "|---|---|---|",
        f"| {args.n_master} (N) | {summary['docs_per_sec_N']} | "
        + ", ".join(str(r['wall_sec']) for r in results[args.n_master]) + " |",
        f"| {args.n4_master} (4N) | {summary['docs_per_sec_4N']} | "
        + ", ".join(str(r['wall_sec']) for r in results[args.n4_master]) + " |",
        "",
        f"**Median-of-{args.reps}-reps speedup "
        f"{summary['speedup_N_to_4N']}x -> scaling efficiency "
        f"{summary['scaling_efficiency']} "
        f"({'MEETS' if summary['meets_target'] else 'below'} the >= 0.8 "
        "target; the MEDIAN is the protocol statistic). "
        f"Per-rep-pair efficiencies: {per_pair}.**",
        "",
        "Raw per-run JSON: BENCH/scaling_runs.jsonl "
        f"(n_docs={args.n_docs} lines).",
        "",
    ]
    with open(md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
