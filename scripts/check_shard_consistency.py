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

    def ways_of(d, want_snap=False):
        out = run_pipeline(spark, d, run_pip=False, run_tiles=False)
        ways = {(r["way_id"], tuple(r["node_ids"]))
                for r in out["ways"].select("way_id", "node_ids").collect()}
        if not want_snap:
            return ways
        # cross-document snap pairs with each endpoint's source docs —
        # the one LEGITIMATE single-vs-sharded divergence (a tolerance
        # pair whose nodes live in different shards cannot merge there)
        wn = out["_internal"]["way_nodes"]
        sm = out["_internal"]["snap_map"].select("node_id", "canon_id")
        srcs = (wn.select("node_id", "doc_id").distinct()
                .groupBy("node_id").agg(F.collect_set("doc_id").alias("docs")))
        pairs = {}
        for r in (sm.join(srcs, "node_id")
                  .join(srcs.select(F.col("node_id").alias("canon_id"),
                                    F.col("docs").alias("canon_docs")),
                        "canon_id").collect()):
            pairs[(r["canon_id"], r["node_id"])] = (set(r["canon_docs"]),
                                                    set(r["docs"]))
        return ways, pairs

    whole, snap_pairs = ways_of(docs, want_snap=True)
    sharded: set = set()
    d = docs.withColumn("_s", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    for i in range(4):
        sharded |= ways_of(d.where(F.col("_s") == i).drop("_s"))

    def shard_of(doc_ids):
        import pyspark.sql.types as T
        rows = spark.createDataFrame([(x,) for x in doc_ids], "doc_id string")
        return {r["doc_id"]: r["s"] for r in rows.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("s")).collect()}

    # a differing way is EXPLAINED if every positional node difference
    # (canon in single, original in sharded) is a known snap pair whose
    # endpoint docs hash to different shards
    by_id_whole = {w: n for w, n in whole - sharded}
    by_id_shard = {w: n for w, n in sharded - whole}
    unexplained = set(by_id_whole) ^ set(by_id_shard)
    n_snap_explained = 0
    for wid in set(by_id_whole) & set(by_id_shard):
        a, b = by_id_whole[wid], by_id_shard[wid]
        diffs = ([(x, y) for x, y in zip(a, b) if x != y]
                 if len(a) == len(b) else None)
        ok = bool(diffs)
        for x, y in diffs or []:
            docs_pair = snap_pairs.get((x, y))
            if docs_pair is None:
                ok = False
                break
            sh = shard_of(docs_pair[0] | docs_pair[1])
            if len({sh[di] for di in docs_pair[0]}
                   | {sh[di] for di in docs_pair[1]}) < 2:
                ok = False   # same shard -> should have merged there too
                break
        if ok:
            n_snap_explained += 1
        else:
            unexplained.add(wid)
    consistent = not unexplained
    print(json.dumps({
        "n_docs": n_docs, "ways_single": len(whole), "ways_sharded": len(sharded),
        "diff_single_only": len(whole - sharded),
        "diff_sharded_only": len(sharded - whole),
        "cross_shard_snap_ways": n_snap_explained,
        "unexplained_ways": len(unexplained),
        "consistent": consistent,
    }))
    return 0 if consistent else 1


if __name__ == "__main__":
    sys.exit(main())
