"""Round-6 optimization probes (guide §1.4 noop-sink isolation).

NOT the driver bench (bench.py is frozen); this file isolates the
expensive legs so each optimization's before/after evidence is
attributable. Usage:

    python bench_extra.py e2e        # timing-instrumented single e2e rep
    python bench_extra.py minhash    # minhash stage decomposition
    python bench_extra.py jaccard    # token-jaccard decomposition
    python bench_extra.py text       # token_stats variants
    python bench_extra.py gen        # corpus generation alone

Env: SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measurement
scale), SPARK_GRAFT_CPUS (default 32), REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "3"))


def session():
    from topo2osm_spark.plans.session import build_session
    spark = build_session("bench_extra", master=f"local[{CPUS}]",
                          shuffle_partitions=16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return spark


def timed(spark, label, mk, reps=REPS):
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        mk().write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
    walls_s = sorted(walls)
    print(f"{label}: median {walls_s[len(walls_s) // 2]}s  reps {walls}",
          flush=True)
    spark.sparkContext.setJobDescription(None)


def probe_e2e():
    import shutil
    import tempfile
    from topo2osm_spark.plans.pipeline import run_pipeline
    from topo2osm_spark.sources.fixtures import documents_df
    spark = session()
    n_docs = max(200, spark.read.parquet(f"{SF_DIR}/documents.parquet").count())
    for rep in range(REPS):
        out_dir = tempfile.mkdtemp(prefix="bx_wh_")
        t0 = time.monotonic()
        docs = documents_df(spark, n_docs, seed=42, max_sosi=3,
                            partitions=max(8, min(int(CPUS), n_docs // 500)))
        out = run_pipeline(spark, docs)
        stage = {"plan_build": round(time.monotonic() - t0, 2)}
        for name in ("nodes", "ways", "relations", "tile_assignments",
                     "echo", "points"):
            ts = time.monotonic()
            out[name].write.mode("overwrite").parquet(
                os.path.join(out_dir, name))
            stage[name] = round(time.monotonic() - ts, 2)
        stage["total"] = round(time.monotonic() - t0, 2)
        print(f"e2e rep{rep}: {stage}", flush=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.catalog.clearCache()


def probe_gen():
    from topo2osm_spark.sources.fixtures import documents_df
    spark = session()
    n_docs = max(200, spark.read.parquet(f"{SF_DIR}/documents.parquet").count())
    timed(spark, "gen_only", lambda: documents_df(
        spark, n_docs, seed=42, max_sosi=3,
        partitions=max(8, min(int(CPUS), n_docs // 500))))


def probe_minhash():
    from topo2osm_spark.operators.dedup import (lsh_candidate_pairs,
                                                minhash_lsh_dedup,
                                                minhash_signatures, shingles)
    spark = session()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(spark, "mh1_shingle_explode", lambda: shingles(docs))
    timed(spark, "mh2_signatures", lambda: minhash_signatures(docs))
    timed(spark, "mh3_pairs_carry", lambda: lsh_candidate_pairs(
        minhash_signatures(docs), carry_sig=True))
    timed(spark, "mh4_full_current", lambda: minhash_lsh_dedup(
        docs, threshold=0.5))
    sigs = minhash_signatures(docs)
    bands = lsh_candidate_pairs(sigs, carry_sig=False)
    print("candidate pairs (distinct):", bands.count(), flush=True)


def probe_jaccard():
    from topo2osm_spark.functions.text import normalized
    from topo2osm_spark.operators.dedup import token_jaccard_pairs
    spark = session()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def tok_exploded():
        return (docs.select("doc_id", "source",
                            F.explode(F.array_distinct(
                                F.split(normalized(F.col("text")), " "))).alias("ws"))
                .withColumn("w", F.xxhash64("ws")).drop("ws"))

    timed(spark, "tj1_token_explode", tok_exploded)
    timed(spark, "tj2_full_current", lambda: token_jaccard_pairs(
        docs, cohort_col="source", threshold=0.8))


def probe_text():
    from topo2osm_spark.functions import text as tx
    spark = session()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed(spark, "ts_current", lambda: docs.select(
        "doc_id",
        tx.token_count_ws(F.col("text")).alias("n_ws"),
        tx.token_count_bpeish(F.col("text")).alias("n_bpe")))
    timed(spark, "ts_ws_only", lambda: docs.select(
        "doc_id", tx.token_count_ws(F.col("text")).alias("n_ws")))
    timed(spark, "ts_bpe_only", lambda: docs.select(
        "doc_id", tx.token_count_bpeish(F.col("text")).alias("n_bpe")))
    timed(spark, "ts_bpe_regexp_count", lambda: docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(tx.BPE_SPLIT)).alias("n_bpe")))


PROBES = {"e2e": probe_e2e, "minhash": probe_minhash, "jaccard": probe_jaccard,
          "text": probe_text, "gen": probe_gen}

if __name__ == "__main__":
    PROBES[sys.argv[1]]()
