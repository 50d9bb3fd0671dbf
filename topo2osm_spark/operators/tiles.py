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

from pyspark.sql import Column, DataFrame, functions as F

from topo2osm_spark.functions import cells

VECTOR_RES = 14  # finest tile zoom in the corpus; vector cells at this res

# ------------------------------------------------------------------
# JVM (codegen) mirrors of functions/cells.py — the raster<->vector
# join touches every way node times every zoom present, so its cell
# math must stay inside whole-stage codegen, not a Python worker. The
# Morton magic-number spreads use only LITERAL shift counts, so they
# compile to plain Spark SQL; variable shifts (parent's 2*(res-z))
# become exact integer division by pow(2, k) (powers of two are exact
# in double far beyond 2^58). numpy kernels remain the mapInArrow-side
# implementation; test_tiles_jvm_cells pins both to the same values.

_RES_SHIFT_MUL = 1 << 58
_MORTON_MASK = (1 << 58) - 1
_SPREAD_STEPS = ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                 (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                 (1, 0x5555555555555555))


def _spread_sql(col: str) -> str:
    """SQL expr: spread the low 29 bits of `col` to even bit positions
    (part1by1, same magic numbers as cells._spread_bits)."""
    v = f"(({col}) & 536870911)"
    for sh, mask in _SPREAD_STEPS:
        v = f"((({v}) | shiftleft(({v}), {sh})) & {mask})"
    return v


def tile_cell_expr(z: str, x: str, y: str) -> Column:
    """(z, x, y) tile -> cell id, JVM-side (cells.cell_from_tile)."""
    morton = f"({_spread_sql(x)} + 2 * {_spread_sql(y)})"
    return F.expr(f"CAST({z} AS BIGINT) * {_RES_SHIFT_MUL} + {morton}")


def cell_at_res_expr(lat: str, lon: str, res: int) -> Column:
    """(lat, lon) -> cell id at LITERAL resolution res (cells.encode)."""
    n = 1 << res
    lat_c = f"greatest(least({lat}, {cells.MAX_LAT}), {-cells.MAX_LAT})"
    xn = f"((({lon}) + 180.0) / 360.0)"
    yn = f"((1.0 - asinh(tan(radians({lat_c}))) / pi()) / 2.0)"
    ix = f"least(greatest(CAST(floor({xn} * {n}.0) AS BIGINT), 0), {n - 1})"
    iy = f"least(greatest(CAST(floor({yn} * {n}.0) AS BIGINT), 0), {n - 1})"
    return F.expr(f"{res}L * {_RES_SHIFT_MUL} + "
                  f"({_spread_sql(ix)} + 2 * {_spread_sql(iy)})")


def parent_cell_expr(cell: str, z: str) -> Column:
    """Ancestor of `cell` at coarser resolution column `z`
    (cells.parent). Variable shift via exact pow-of-two division."""
    res = f"shiftrightunsigned({cell}, 58)"
    morton = f"(({cell}) & {_MORTON_MASK})"
    return F.expr(
        f"CAST({z} AS BIGINT) * {_RES_SHIFT_MUL} + "
        f"({morton} DIV CAST(pow(2.0, 2 * ({res} - {z})) AS BIGINT))")


def cell_at_vector_res(lat: str, lon: str) -> Column:
    return cell_at_res_expr(lat, lon, VECTOR_RES)


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
    return m.withColumn("tile_cell", tile_cell_expr("z", "x", "y"))


def tile_vector_join(media: DataFrame, vector_cells: DataFrame,
                     per_document: bool = True,
                     broadcast_media: bool = False) -> DataFrame:
    """media: parse_media_refs output; vector_cells: (doc_id, way_id,
    cell) at VECTOR_RES. Returns (doc_id, media_ref, cell_id, way_id).

    per_document=True (default, the FIXTURES.md contract) aligns a
    media span's tile with ITS OWN document's vector cells — output is
    O(media x cells-per-doc), linear in corpus size; deliberately
    non-overlapping tiles match nothing. Strategy: plain equi-join on
    doc_id with the zoom/ancestor alignment as a codegen FILTER on the
    joined row. Both sides shuffle once on doc_id (the vector side
    WITHOUT any zoom fan-out), the per-doc pair fan-in is bounded by
    media-spans-per-doc x cells-per-doc, and nothing corpus-sized is
    ever broadcast — the shape that survives a 10^12-doc table.

    broadcast_media=True restores the map-side variant (vector side
    pre-fanned out to one ancestor key per distinct zoom, media side
    broadcast): fastest when the media table is a genuinely SMALL dim
    (fits the broadcast budget), wrong at corpus scale — the broadcast
    build serializes the whole media table through the driver.

    per_document=False performs the global raster<->vector alignment
    (any way touching the tile): shuffle equi-join on (z, ancestor)
    with the zoom fan-out on the vector side; AQE's skew-join handles
    hot coastal tiles. At scale that output is quadratic in dense
    areas — callers must aggregate (e.g. counts per tile) rather than
    materialize pairs."""
    out_cols = ["doc_id", "media_ref", "cell_id", "way_id"]
    if per_document and not broadcast_media:
        joined = (vector_cells.join(
                      media.select("doc_id", "media_ref", "z", "tile_cell"),
                      "doc_id")
                  .where(parent_cell_expr("cell", "z") == F.col("tile_cell")))
        return (joined.select("doc_id", "media_ref",
                              F.col("cell").alias("cell_id"), "way_id")
                      .dropDuplicates(out_cols))
    # fan-out path: one ancestor key per DISTINCT zoom present —
    # derived lazily from the media side (broadcast cross-join on the
    # tiny distinct-zoom set; z is bounded by VECTOR_RES so |zdf| <=
    # 15). No driver-side collect: the zoom scan folds into the DAG.
    # NO pre-dedup of vector_cells: deduplicating (doc, way, cell)
    # before the fan-out costs a full shuffle of every way node; the
    # duplicates only multiply cheap map-side codegen rows, and the
    # output dropDuplicates (match-sized, small) already guarantees
    # uniqueness.
    zdf = media.select("z").distinct()
    vc = (vector_cells.crossJoin(F.broadcast(zdf))
          .withColumn("anc", parent_cell_expr("cell", "z")))
    join_on = ["doc_id", "z", "anc"] if per_document else ["z", "anc"]
    m = media.select("doc_id", "media_ref", "z",
                     F.col("tile_cell").alias("anc"))
    joined = vc.join(F.broadcast(m) if broadcast_media else m, join_on)
    return (joined.select("doc_id", "media_ref",
                          F.col("cell").alias("cell_id"), "way_id")
                  .dropDuplicates(out_cols))
