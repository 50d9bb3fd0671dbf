"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline = the flagship end-to-end SOSI->OSM conversion (synthesized
interleaved corpus sized to the sf's documents table) + representative
relational / dedup / ANN queries from __spark_entry__.queries().
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "agg_tpch_q1", "equi_join_agg", "broadcast_join_dims",
    "window_funcs", "collect_sorted_list", "dedup_exact",
    "dedup_minhash_lsh", "dedup_token_jaccard", "ann_topk_bruteforce",
    "token_stats",
]

# Per-query statistic: MEDIAN of QUERY_REPS back-to-back executions.
# r3's bench recorded 24-56% regressions on queries whose code had not
# changed — single-shot timings on this shared VM carry the host's
# documented 1.3-2x noise band plus first-run plan-compilation cost.
QUERY_REPS = 3
# The e2e leg now also reps (VERDICT r4 #1): the r4 single-shot leg
# recorded 84 s where a warm-controlled rerun measured 26 s — pure
# first-in-session JVM/Python-runner warm-up. Median-of-E2E_REPS with
# per-stage walls makes the headline attributable; `value` is the
# median, `e2e_reps`/`e2e_stage_secs` carry the evidence.
E2E_REPS = 3


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from topo2osm_spark.plans.pipeline import run_pipeline
    from topo2osm_spark.plans.session import build_session
    from topo2osm_spark.sources.fixtures import documents_df

    # shuffle=16 and AQE off: measured on this host — tiny reduce tasks
    # and AQE's per-stage re-planning dominate at bench scale (see
    # BENCH/BASELINE.md); production configs re-enable both.
    spark = build_session("bench", master=f"local[{cpus}]",
                          shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries: dict[str, float] = {}

    # --- headline: end-to-end conversion sized to the sf tier ---
    n_docs = max(200, spark.read.parquet(f"{sf_dir}/documents.parquet").count())
    e2e_reps: list[float] = []
    e2e_stage_secs: list[dict] = []
    for _ in range(E2E_REPS):
        out_dir = tempfile.mkdtemp(prefix="bench_wh_")
        stage_secs: dict[str, float] = {}
        t0 = time.monotonic()
        docs = documents_df(spark, n_docs, seed=42, max_sosi=3,
                            partitions=max(8, min(int(cpus), n_docs // 500)))
        out = run_pipeline(spark, docs)
        stage_secs["plan_build"] = round(time.monotonic() - t0, 2)
        for name in ("nodes", "ways", "relations", "tile_assignments",
                     "echo", "points"):
            ts = time.monotonic()
            out[name].write.mode("overwrite").parquet(
                os.path.join(out_dir, name))
            stage_secs[name] = round(time.monotonic() - ts, 2)
        e2e_reps.append(time.monotonic() - t0)
        e2e_stage_secs.append(stage_secs)
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.catalog.clearCache()
    e2e = sorted(e2e_reps)[len(e2e_reps) // 2]
    queries["pipeline_e2e"] = round(e2e, 2)

    # --- representative operator queries on the driver tables ---
    # dedup_minhash_lsh left the 50-entry driver registry in r3 (its
    # semantics are oracle-proven by the md5-mirror variant), but the
    # xxhash64 PRODUCTION path is what runs at 100 TB — keep timing it
    # directly so the r1/r2/r3 bench series stays comparable.
    def _prod_minhash(spark_, sf_):
        from topo2osm_spark.operators.dedup import minhash_lsh_dedup
        d = spark_.read.parquet(f"{sf_}/documents.parquet")
        return minhash_lsh_dedup(d, threshold=0.5)

    qmap = {**entry_mod.queries(), "dedup_minhash_lsh": _prod_minhash}
    query_reps: dict[str, list[float]] = {}
    for qn in BENCH_QUERIES:
        reps = []
        for _ in range(QUERY_REPS):
            t1 = time.monotonic()
            df = qmap[qn](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.monotonic() - t1)
        queries[qn] = round(sorted(reps)[len(reps) // 2], 2)
        query_reps[qn] = [round(r, 2) for r in reps]

    docs_per_sec = round(n_docs / e2e, 2)
    print(json.dumps({
        "metric": "e2e_conversion_wall",
        "value": round(e2e, 2),
        "unit": "sec",
        "queries": queries,
        "query_reps": query_reps,
        "query_stat": f"median_of_{QUERY_REPS}",
        "e2e_reps": [round(r, 2) for r in e2e_reps],
        "e2e_stat": f"median_of_{E2E_REPS}",
        "e2e_stage_secs": e2e_stage_secs,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "cpus": int(cpus),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
