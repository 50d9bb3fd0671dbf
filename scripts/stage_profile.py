"""Per-stage scaling profile: time each pipeline milestone separately
at one parallelism level (run twice, e.g. local[2] vs local[8], and
diff). Not part of the bench protocol — a diagnostic for finding the
non-scaling stage.

Usage: spark-submit --py-files engine.zip scripts/stage_profile.py \
           --input _data/scale_128000.parquet --master local[8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from topo2osm_spark.plans.session import build_session
    from topo2osm_spark.plans.pipeline import run_pipeline

    spark = build_session("stage-profile", master=args.master,
                          shuffle_partitions=args.shuffle_partitions)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    docs = spark.read.parquet(args.input)

    t: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(json.dumps({name: t[name]}), flush=True)
        return r

    out = clock("plan_build", lambda: run_pipeline(spark, docs))
    clock("nodes_count", lambda: out["nodes"].count())
    clock("ways_materialize", lambda: out["ways"].count())
    clock("relations_materialize", lambda: out["relations"].count())
    clock("tiles_materialize", lambda: out["tile_assignments"].count())
    clock("echo_materialize", lambda: out["echo"].count())
    outdir = args.out or "/dev/shm/stage_profile_out"
    for name in ("nodes", "ways", "relations", "tile_assignments", "echo"):
        clock(f"write_{name}", lambda n=name: out[n].write.mode("overwrite")
              .parquet(os.path.join(outdir, n)))
    print(json.dumps({"master": spark.sparkContext.master, "stages": t}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
