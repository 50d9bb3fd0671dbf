"""Point-in-polygon membership join (SURVEY.md §2 op 14).

Replaces the reference's shapely-style containment checks
[U: topo2osm.py::inside_polygon; mount empty, SURVEY.md §0] with the
partition-based spatial join: both sides encode to quadtree cells,
equi-join on the cell id (stock SMJ/SHJ — Catalyst handles it), then
a numpy ray-cast refines candidates per ring group.

Used twice by the pipeline: FLATE interior-point -> assembled-ring
membership (attribute assignment) and island-in-water containment
hierarchy (multipolygon roles).

Scale notes: ring cover cells are generated at an adaptive per-ring
resolution (bounded cell count per ring, so a fjord-length coastline
ring cannot fan out into millions of join keys); the join key is a
64-bit int; hot-cell skew is handled by AQE skew join + optional
salting (operators/skew.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions import cells, geom

PIP_RES = 13  # join resolution: ~4.9 km cells at equator
_MAX_COVER = 64  # per-ring cover cell budget at PIP_RES (coarsens if over)


def ring_cover_cells(rings: DataFrame, ring_key_cols: list[str],
                     res: int = PIP_RES) -> DataFrame:
    """rings(lats, lons, <keys>) -> (cell, <keys>) cover rows.

    mapInArrow: per ring, all cells at `res` intersecting the ring
    bbox. If the bbox exceeds the per-ring cell budget the cover
    coarsens (cells at res-1, res-2, …); the point side joins on its
    full resolution LADDER (point_cell_ladder), so coarse covers still
    match. Bounded fan-out per ring by construction."""
    from pyspark.sql.pandas.types import to_arrow_type
    key_fields = [rings.schema[k] for k in ring_key_cols]
    out_fields = [pa.field("cell", pa.int64())] + [
        pa.field(f.name, to_arrow_type(f.dataType)) for f in key_fields]

    def gen(batches):
        for b in batches:
            lats = b.column("lats").to_pylist()
            lons = b.column("lons").to_pylist()
            keys = {k: b.column(k).to_pylist() for k in ring_key_cols}
            rows = {"cell": []}
            for k in ring_key_cols:
                rows[k] = []
            for i in range(b.num_rows):
                la = np.asarray(lats[i]); lo = np.asarray(lons[i])
                if la.size == 0:
                    continue
                r = res
                while r > 0:
                    try:
                        cov = cells.covering_cells(
                            float(la.min()), float(la.max()),
                            float(lo.min()), float(lo.max()), r,
                            cap=_MAX_COVER)
                        break
                    except ValueError:
                        r -= 1
                else:
                    cov = np.array([], dtype=np.int64)
                # normalize to PIP_RES-aligned join keys: if coarsened,
                # emit the coarse cells; pip_join joins points at the
                # same ladder of resolutions.
                rows["cell"].extend(cov.tolist())
                for k in ring_key_cols:
                    rows[k].extend([keys[k][i]] * len(cov))
            yield pa.RecordBatch.from_pydict(rows, schema=pa.schema(out_fields))

    cols = ["lats", "lons", *ring_key_cols]
    return rings.select(*cols).mapInArrow(gen, T.StructType(
        [T.StructField("cell", T.LongType())] + key_fields))


@F.pandas_udf(T.ArrayType(T.LongType()))
def point_cell_ladder(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """Point side: cell ids at PIP_RES and every coarser resolution down
    to 0 — so a point matches ring covers at whatever resolution the
    ring coarsened to. 14 extra int64s per point, all map-side."""
    la = lat.to_numpy(); lo = lon.to_numpy()
    ladder = np.stack([cells.encode(la, lo, r) for r in range(PIP_RES + 1)], axis=1)
    return pd.Series(list(ladder))


REFINE_SALT = 16  # candidate chunks per ring (bounds the refine row size)


def pip_join(points: DataFrame, rings: DataFrame,
             point_key_cols: list[str], ring_key_cols: list[str],
             refine_salt: int = REFINE_SALT,
             trim_ladder: bool = True) -> DataFrame:
    """Candidate generation (cell equi-join) + exact ray-cast refine.

    points: (<point_keys>, lat, lon); rings: (<ring_keys>, lats, lons).
    Returns (<point_keys>, <ring_keys>) rows where the point is inside.

    The refine key is SALTED: a hot ring (sea polygon / fjord coastline
    matching millions of candidate points) would otherwise concentrate
    its whole candidate set into one collect_list row -> one straggler
    task / OOM. pmod(xxhash64(point keys), refine_salt) splits a ring's
    candidates into bounded chunks; the ray-cast is per-point
    independent, so chunk results union cleanly. Cost: ring coords
    replicate per non-empty chunk (<= refine_salt copies).

    trim_ladder (VERDICT r4 #5): the point ladder explodes PIP_RES+1
    rows per point, but ring covers occupy only the few resolutions
    coarsening actually produced (usually just PIP_RES) — a cell id
    embeds its resolution in bits 58..62, so a left-semi against the
    broadcast distinct-resolution set of the covers drops the
    never-matching ladder rows map-side, BEFORE the candidate shuffle.
    At membership scale the point side dominates, so cutting its
    shuffle fan-out several-fold is worth the one extra evaluation of
    the (ring-sized, far smaller) cover subtree that the res-set
    derivation costs.
    """
    cover = ring_cover_cells(rings, ring_key_cols)
    pts = (points
           .withColumn("cell", F.explode(point_cell_ladder("lat", "lon")))
           .select(*point_key_cols, "lat", "lon", "cell"))
    if trim_ladder:
        cover_res = (cover.select(
            F.shiftrightunsigned("cell", 58).alias("__res")).distinct())
        pts = pts.join(
            F.broadcast(cover_res),
            F.shiftrightunsigned(F.col("cell"), 58) == F.col("__res"),
            "left_semi")
    cand = (pts.join(cover, "cell").drop("cell")
            .dropDuplicates([*point_key_cols, *ring_key_cols])
            .withColumn("chunk", F.pmod(
                F.xxhash64(*point_key_cols), F.lit(max(1, refine_salt)))))
    # refine: one hash-agg row per (ring, chunk), join ring coords, then
    # batched mapInPandas ray-casting — no per-group Python round-trip
    # (same pattern as snap/assembly)
    ring_geo = rings.select(*ring_key_cols, "lats", "lons")
    grouped = (cand.groupBy(*ring_key_cols, "chunk")
               .agg(F.collect_list(F.struct(*point_key_cols, "lat", "lon"))
                     .alias("cand_pts"))
               .join(ring_geo, ring_key_cols))

    out_schema = T.StructType(
        [cand.schema[k] for k in point_key_cols]
        + [cand.schema[k] for k in ring_key_cols])

    def refine_batches(it):
        cols = [*point_key_cols, *ring_key_cols]
        for pdf in it:
            rows = {c: [] for c in cols}
            for i in range(len(pdf)):
                ring_lat = np.asarray(pdf["lats"].iloc[i], dtype=np.float64)
                ring_lon = np.asarray(pdf["lons"].iloc[i], dtype=np.float64)
                cand_pts = pdf["cand_pts"].iloc[i]
                plat = np.array([p["lat"] for p in cand_pts])
                plon = np.array([p["lon"] for p in cand_pts])
                inside = geom.points_in_ring(plat, plon, ring_lat, ring_lon)
                for j in np.nonzero(inside)[0]:
                    p = cand_pts[j]
                    for k in point_key_cols:
                        rows[k].append(p[k])
                    for k in ring_key_cols:
                        rows[k].append(pdf[k].iloc[i])
            yield pd.DataFrame(rows) if rows[cols[0]] else pd.DataFrame(
                {c: [] for c in cols})

    return grouped.mapInPandas(refine_batches, out_schema)
