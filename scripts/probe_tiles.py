"""One-off probe: tile_vector_join input-dedup variants.

Materializes way_nodes + media for the 32k corpus once (full parse
chain), writes both to parquet scratch, then times the join variants
from clean scans:

  A) r4 shape: join raw way-node cells on doc_id, filter ancestor,
     dropDuplicates on the output
  B) pre-dedup (doc_id, way_id, cell) before the join (partial agg
     collapses same-tile node runs map-side), then join + output dedup
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from topo2osm_spark.operators import tiles
from topo2osm_spark.plans.pipeline import run_pipeline
from topo2osm_spark.plans.session import build_session

CORPUS = "/root/repo/_data/scale_32000.parquet"

spark = build_session("probe_tiles", master="local[4]", shuffle_partitions=16)
spark.conf.set("spark.sql.adaptive.enabled", "false")

scratch = tempfile.mkdtemp(prefix="probe_tiles_")
docs = spark.read.parquet(CORPUS)
out = run_pipeline(spark, docs, run_pip=False, run_tiles=False)
wn = out["_internal"]["way_nodes"] if "way_nodes" in out.get("_internal", {}) \
    else None
if wn is None:
    # way_nodes isn't exported; rebuild the two inputs the tile stage
    # uses from the pipeline's public outputs instead
    raise SystemExit("way_nodes not exposed; adjust probe")
wn.write.mode("overwrite").parquet(f"{scratch}/way_nodes")
spans = docs.select("doc_id", F.explode("spans").alias("s")).select(
    "doc_id", F.col("s.kind").alias("kind"), F.col("s.media_ref").alias("media_ref"))
media = tiles.parse_media_refs(
    spans.where(F.col("kind") == "media").select("doc_id", "media_ref"))
media.write.mode("overwrite").parquet(f"{scratch}/media")

way_nodes = spark.read.parquet(f"{scratch}/way_nodes")
media = spark.read.parquet(f"{scratch}/media")
vector_cells = (way_nodes
                .withColumn("cell", tiles.cell_at_vector_res("lat", "lon"))
                .select("doc_id", "way_id", "cell"))

print("way_nodes rows:", way_nodes.count(),
      "distinct (doc,way,cell):",
      vector_cells.dropDuplicates(["doc_id", "way_id", "cell"]).count(),
      "media rows:", media.count())


def variant_a():
    return tiles.tile_vector_join(media, vector_cells)


def variant_b():
    vc = vector_cells.dropDuplicates(["doc_id", "way_id", "cell"])
    return tiles.tile_vector_join(media, vc)


for label, fn in (("A raw", variant_a), ("B pre-dedup", variant_b),
                  ("A2 raw", variant_a), ("B2 pre-dedup", variant_b)):
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 2))
    print(f"{label}: {sorted(walls)[1]}s median {walls}")

a, b = variant_a(), variant_b()
print("diff:", a.exceptAll(b).count() + b.exceptAll(a).count())
shutil.rmtree(scratch, ignore_errors=True)
spark.stop()
