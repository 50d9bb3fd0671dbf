"""Diagnostic: time the components of the ways chain in isolation.
Usage: spark-submit --py-files engine.zip scripts/probe_ways_chain.py \
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
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from topo2osm_spark.plans.session import build_session
    from topo2osm_spark.plans import pipeline as P

    spark = build_session("probe-ways", master=args.master,
                          shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    docs = spark.read.parquet(args.input)
    out = P.run_pipeline(spark, docs)
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(json.dumps({name: t[name]}), flush=True)
        return r

    clock("core", lambda: out["nodes"].count())
    ints = out["_internal"]
    clock("snap_map_count", lambda: ints["snap_map"].count())
    clock("way_nodes_scan", lambda: ints["way_nodes"].count())
    clock("apply_snap_only", lambda: ints["wn_snapped"].count())
    clock("way_node_lists", lambda: ints["way_node_lists"].count())
    clock("tagged_join", lambda: ints["tagged_ways_presplit"].count())
    clock("ways_full", lambda: out["ways"].count())
    print(json.dumps({"master": spark.sparkContext.master, "stages": t}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
