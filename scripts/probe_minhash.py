"""One-off probe: minhash carry-sig restructure vs the re-join form.

Times the production xxhash64 pipeline on the sf0.1 documents table
(bench config: local[4]-ish, shuffle 16, AQE off) and cross-checks
that the carried-sig result equals the re-join result row-for-row.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from topo2osm_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_lsh_dedup, minhash_signatures,
    minhash_similarity)
from topo2osm_spark.plans.session import build_session

SF = "/root/testdata/sf0.1"

spark = build_session("probe_minhash", master="local[4]",
                      shuffle_partitions=16)
spark.conf.set("spark.sql.adaptive.enabled", "false")
docs = spark.read.parquet(f"{SF}/documents.parquet")


def rejoin_form(d):
    sigs = minhash_signatures(d)
    pairs = lsh_candidate_pairs(sigs)
    return (minhash_similarity(sigs, pairs)
            .where(F.col("est_jaccard") >= 0.5))


def timed(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn(docs).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
    print(f"{label}: {sorted(walls)[len(walls) // 2]}s median {walls}")


timed("rejoin (old)", rejoin_form)
timed("carry_sig (new)", lambda d: minhash_lsh_dedup(d, threshold=0.5))

new = minhash_lsh_dedup(docs, threshold=0.5)
old = rejoin_form(docs)
diff = new.exceptAll(old).count() + old.exceptAll(new).count()
print(f"symmetric diff rows: {diff}")
spark.stop()
