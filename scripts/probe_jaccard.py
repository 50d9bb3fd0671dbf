"""One-off probe: token_jaccard restructures vs the r4 form.

Variants on the sf0.1 documents table (bench config):
  A) r4 shape: df_counts groupBy + left_semi df-cap, string join keys
  B) window df-cap (one shuffle on (c,w), no semi-join)
  C) A but tokens pre-hashed to longs for the self-join
  D) B + C combined
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F

from topo2osm_spark.functions.text import dround, normalized
from topo2osm_spark.plans.session import build_session

SF = "/root/testdata/sf0.1"
spark = build_session("probe_jac", master="local[4]", shuffle_partitions=16)
spark.conf.set("spark.sql.adaptive.enabled", "false")
docs = spark.read.parquet(f"{SF}/documents.parquet")
threshold, max_df = 0.8, 1000
id_col, cohort_col, text_col = "doc_id", "source", "text"


def tok_base(hash_tokens: bool):
    t = (docs.select(id_col, cohort_col,
                     F.explode(F.array_distinct(
                         F.split(normalized(F.col(text_col)), " "))).alias("w")))
    if hash_tokens:
        t = t.withColumn("w", F.xxhash64("w"))
    return t


def variant(df_cap_window: bool, hash_tokens: bool):
    tok_all = tok_base(hash_tokens)
    if df_cap_window:
        w = Window.partitionBy(cohort_col, "w")
        tok = (tok_all.withColumn("df", F.count(F.lit(1)).over(w))
                      .where(F.col("df") <= max_df).drop("df"))
    else:
        df_counts = (tok_all.groupBy(cohort_col, "w")
                     .agg(F.count(F.lit(1)).alias("df")))
        tok = tok_all.join(df_counts.where(F.col("df") <= max_df)
                           .select(cohort_col, "w"),
                           [cohort_col, "w"], "left_semi")
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col(id_col).alias("a"), F.col(cohort_col).alias("c"), "w")
    b = tok.select(F.col(id_col).alias("b"), F.col(cohort_col).alias("c"), "w")
    inter = (a.join(b, ["c", "w"]).where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (inter.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", dround(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def timed(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
    print(f"{label}: {sorted(walls)[len(walls) // 2]}s median {walls}")


timed("A groupBy+semi, string", lambda: variant(False, False))
timed("B window df, string   ", lambda: variant(True, False))
timed("C groupBy+semi, hashed", lambda: variant(False, True))
timed("D window df, hashed   ", lambda: variant(True, True))

base = variant(False, False)
best = variant(True, True)
diff = base.exceptAll(best).count() + best.exceptAll(base).count()
print(f"A vs D symmetric diff rows: {diff}")
spark.stop()
