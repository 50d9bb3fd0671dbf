"""Diagnostic 2: isolate broadcast-build vs collect_list vs persist
cost in the ways chain."""
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

    spark = build_session("probe-ways2", master=args.master,
                          shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    docs = spark.read.parquet(args.input)
    out = P.run_pipeline(spark, docs)
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.monotonic()
        r = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(json.dumps({name: t[name], "r": r if isinstance(r, (int, float)) else None}), flush=True)
        return r

    clock("core", lambda: out["nodes"].count())
    ints = out["_internal"]
    clock("snap_map_rows", lambda: ints["snap_map"].count())
    # force the broadcast build alone: join a 1-row df against it
    one = spark.range(1).select(F.lit(-1).cast("long").alias("node_id"))
    clock("bcast_build_only", lambda: one.join(
        F.broadcast(ints["snap_map"]), "node_id", "left").count())
    # force collect_list arrays WITHOUT persist: sum of sizes
    clock("wnl_arrays", lambda: ints["way_node_lists"]
          .agg(F.sum(F.size("node_ids"))).collect()[0][0])
    # tagged join with arrays (pre-split, no persist)
    clock("presplit_arrays", lambda: ints["tagged_ways_presplit"]
          .agg(F.sum(F.size("node_ids")), F.count(F.lit(1))).collect()[0][1])
    clock("ways_full", lambda: out["ways"].count())
    print(json.dumps({"master": spark.sparkContext.master, "stages": t}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
