"""Raster <-> vector tile/cell join (SURVEY.md §2 op 17).

Aligns `media_ref` tiles ("tile/{z}/{x}/{y}") to vector cells
(north star, BASELINE.json:6). Because the cell grid at resolution r
IS the slippy tile grid at zoom z=r (functions/cells.py), the join is
a pure equi-join:

    media side:  (z, x, y)  ->  tile_cell = cell_from_tile(z, x, y)
    vector side: way cover cell at res R  ->  ancestor at z

Tile zooms vary per media span (z in 10..14 here), so the vector side
emits one ancestor key per DISTINCT zoom present — a broadcast
cross-join against the lazily-computed distinct-zoom set (bounded by
VECTOR_RES+1 rows, no driver-side collect). Both sides meet on (cell)
int64 keys; AQE
handles hot tiles (dense coastal cells), and dropDuplicates before
the join keeps the fan-in bounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions import cells

VECTOR_RES = 14  # finest tile zoom in the corpus; vector cells at this res


@F.pandas_udf(T.LongType())
def tile_cell_udf(z: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(cells.cell_from_tile(z.to_numpy(), x.to_numpy(),
                                          y.to_numpy()))


@F.pandas_udf(T.LongType())
def parent_cell_udf(cell: pd.Series, res: pd.Series) -> pd.Series:
    return pd.Series(cells.parent(cell.to_numpy(), res.to_numpy()))


@F.pandas_udf(T.LongType())
def cell_at_vector_res(lat: pd.Series, lon: pd.Series) -> pd.Series:
    return pd.Series(cells.encode(lat.to_numpy(), lon.to_numpy(), VECTOR_RES))


def parse_media_refs(media_spans: DataFrame) -> DataFrame:
    """(doc_id, media_ref) -> adds z/x/y ints and tile_cell. Malformed
    refs are dropped (filter on regexp match) — scan-level predicate."""
    pat = r"^tile/(\d+)/(\d+)/(\d+)$"
    m = (media_spans
         .where(F.col("media_ref").rlike(pat))
         .withColumn("z", F.regexp_extract("media_ref", pat, 1).cast("int"))
         .withColumn("x", F.regexp_extract("media_ref", pat, 2).cast("int"))
         .withColumn("y", F.regexp_extract("media_ref", pat, 3).cast("int"))
         .where((F.col("z") <= VECTOR_RES) & (F.col("z") >= 0)))
    return m.withColumn("tile_cell", tile_cell_udf("z", "x", "y"))


def tile_vector_join(media: DataFrame, vector_cells: DataFrame,
                     per_document: bool = True) -> DataFrame:
    """media: parse_media_refs output; vector_cells: (doc_id, way_id,
    cell) at VECTOR_RES. Returns (doc_id, media_ref, cell_id, way_id).

    per_document=True (default, the FIXTURES.md contract) aligns a
    media span's tile with ITS OWN document's vector cells — output is
    O(media x cells-per-doc), linear in corpus size; deliberately
    non-overlapping tiles match nothing. per_document=False performs
    the global raster<->vector alignment (any way touching the tile);
    at scale that output is quadratic in dense areas — callers must
    aggregate (e.g. counts per tile) rather than materialize pairs."""
    keys = ["doc_id", "way_id", "cell"] if per_document else ["way_id", "cell"]
    vc = vector_cells.dropDuplicates(keys)
    # one ancestor key per distinct zoom actually present — derived
    # LAZILY from the media side (broadcast cross-join on the tiny
    # distinct-zoom set; z is bounded by VECTOR_RES so |zdf| <= 15).
    # No driver-side collect: the zoom scan folds into the same DAG.
    zdf = media.select("z").distinct()
    vc = (vc.crossJoin(F.broadcast(zdf))
            .withColumn("anc", parent_cell_udf("cell", "z")))
    join_on = ["doc_id", "z", "anc"] if per_document else ["z", "anc"]
    joined = media.select("doc_id", "media_ref", "z",
                          F.col("tile_cell").alias("anc")) \
                  .join(vc, join_on)
    return (joined.select("doc_id", "media_ref",
                          F.col("cell").alias("cell_id"), "way_id")
                  .dropDuplicates(["doc_id", "media_ref", "cell_id", "way_id"]))
