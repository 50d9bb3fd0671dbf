"""Shared-node dedup + kNN tolerance snap (SURVEY.md §2 ops 12, 13).

The reference keeps a dict keyed on rounded (lat, lon): identical
coordinates become ONE OSM node, and near-duplicates within a merge
tolerance are snapped together [U: topo2osm.py::node dict +
duplicate-node matching; mount empty, SURVEY.md §0]. Distributed
re-expression:

op 12 (exact dedup) needs NO join at all: the node id is a pure
function of the quantized coordinate (63-bit `content_id(qlat,
qlon)`, functions/ids.py), so
every way computes its node ids locally (map-side); the `nodes`
table is a groupBy over the quantized key. The reference's implicit
hash-dict becomes a hash *function* — zero shuffle on the way side.

op 13 (tolerance snap) is the cell-neighborhood kNN join: nodes are
keyed to a snap-resolution cell, one side expands to its 3×3 k-ring
(9-way map-side explode), the equi-join on cell yields candidate
pairs, haversine refines within tolerance, and connected components
are resolved by iterative min-label propagation (fully distributed —
no driver-side union-find). Components wider than `iterations` hops
converge in later iterations; geometric chains longer than ~3 nodes
within tolerance are degenerate input (documented SURVEY.md §7.3).

Scale notes: the candidate join is an equi-join on int64 cell keys;
coastal-skew hot cells are handled upstream by adaptive cell
splitting (operators/skew.py) and AQE skew-join. The snap mapping
(non-identity labels only) is tiny relative to the node set, so the
way-side rewrite join broadcasts when small and AQE-shuffles
otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from topo2osm_spark.functions.ids import content_id

QUANT = 7  # decimals — the reference's node-coordinate rounding contract

# snap cell resolution: Web-Mercator cell ground size at res 22 is
# ~9.6 m × cos(lat) (≥3.1 m at lat 71°N) — safely above any sane merge
# tolerance (≤1 m), so a 3×3 k-ring always covers the tolerance disk.
SNAP_RES = 22


def quantize(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Add qlat/qlon (1e-7 deg int grid) and the content-addressed
    node_id = content_id(qlat, qlon). Pure map-side — no shuffle."""
    return (df
            .withColumn("qlat", F.round(F.col(lat_col) * F.lit(10.0 ** QUANT)).cast("long"))
            .withColumn("qlon", F.round(F.col(lon_col) * F.lit(10.0 ** QUANT)).cast("long"))
            .withColumn("node_id", content_id("qlat", "qlon")))


def dedup_nodes(point_df: DataFrame) -> DataFrame:
    """op 12: quantized points -> one row per distinct node with a
    reference count. Partial aggregation (map-side combine) is free."""
    q = quantize(point_df)
    return (q.groupBy("qlat", "qlon", "node_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_refs"))
             .withColumn("lat", F.col("qlat") / F.lit(10.0 ** QUANT))
             .withColumn("lon", F.col("qlon") / F.lit(10.0 ** QUANT))
             .select("node_id", "lat", "lon", "n_refs"))


_M_PER_DEG = 111320.0


def snap_mapping(nodes: DataFrame, tol_m: float = 0.5,
                 iterations: int = 2,
                 max_abs_lat: float | None = None) -> DataFrame:
    """op 13: (node_id, lat, lon) -> (node_id, canon_id) for nodes that
    snap to a lower-id node within tol_m. Identity rows are omitted.

    Shape (one shuffle + one Arrow stage — replaces an earlier
    edge-join + iterative label propagation that cost ~40 scheduler
    rounds on small inputs):

    1. shifted-grid candidate groups: bins of size g = 4*tol in both
       axes at 4 half-cell offsets — the classic guarantee that any
       pair within tol <= g/2 shares at least one bin (JVM floor math,
       4x map-side replication, no Python, no k-ring join);
    2. per-bin union-find in numpy (applyInPandas): exact pairwise
       planar distances, components -> min-id canon;
    3. global min per node across the 4 grids + `iterations` rounds of
       path compression over the (tiny) non-identity mapping — resolves
       chains that straddle bins.

    g_lon uses cos(max_abs_lat) so the bin guarantee holds at the
    highest latitude PRESENT IN THE DATA: max_abs_lat=None (default)
    derives it with one scalar max-agg over the (persisted) node table
    — a metadata-cheap job, never a data collect — so Svalbard-latitude
    input can no longer silently miss within-tolerance merges. Lower
    latitudes just get slightly over-wide bins (more candidates, same
    answer). Dense-coast hot bins stay small because g is ~2 m.
    """
    import math
    if max_abs_lat is None:
        row = nodes.agg(F.max(F.abs(F.col("lat"))).alias("m")).first()
        max_abs_lat = min(float(row["m"] or 0.0) + 0.01, 89.0)
    g_lat = 4.0 * tol_m / _M_PER_DEG
    g_lon = 4.0 * tol_m / (_M_PER_DEG * max(math.cos(math.radians(max_abs_lat)), 0.05))

    binned = nodes.select(
        "node_id", "lat", "lon",
        F.explode(F.array(*[
            F.struct(
                F.lit(oy * 2 + ox).alias("grid"),
                F.floor(F.col("lat") / g_lat + oy * 0.5).alias("by"),
                F.floor(F.col("lon") / g_lon + ox * 0.5).alias("bx"))
            for oy in (0, 1) for ox in (0, 1)])).alias("b"))

    # one hash-agg row per bin; only multi-node bins survive (the
    # overwhelming majority of bins are singletons — never pay a
    # Python-group round-trip for them)
    multi = (binned
             .groupBy("b.grid", "b.by", "b.bx")
             .agg(F.collect_list(F.struct("node_id", "lat", "lon")).alias("pts"))
             .where(F.size("pts") >= 2)
             .select("pts"))

    def uf_batches(it):
        for pdf in it:
            out_ids, out_canon = [], []
            for pts in pdf["pts"]:
                ids = np.array([p["node_id"] for p in pts], dtype=np.int64)
                lat = np.array([p["lat"] for p in pts])
                lon = np.array([p["lon"] for p in pts])
                clat = np.cos(np.radians(lat.mean()))
                dy = (lat[:, None] - lat[None, :]) * _M_PER_DEG
                dx = (lon[:, None] - lon[None, :]) * _M_PER_DEG * clat
                close = (dy * dy + dx * dx) <= tol_m * tol_m
                parent = np.arange(len(ids))

                def find(i):
                    while parent[i] != i:
                        parent[i] = parent[parent[i]]
                        i = parent[i]
                    return i

                for i, j in zip(*np.nonzero(np.triu(close, 1))):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
                roots = np.array([find(i) for i in range(len(ids))])
                canon = np.empty(len(ids), dtype=np.int64)
                for r in np.unique(roots):
                    members = roots == r
                    canon[members] = ids[members].min()
                keep = canon != ids
                out_ids.extend(ids[keep].tolist())
                out_canon.extend(canon[keep].tolist())
            yield pd.DataFrame({"node_id": out_ids, "canon_id": out_canon})

    local = multi.mapInPandas(uf_batches, "node_id long, canon_id long")
    mapping = local.groupBy("node_id").agg(F.min("canon_id").alias("canon_id"))
    # path compression: follow canon -> canon' for chains across bins
    for _ in range(iterations):
        nxt = mapping.select(F.col("node_id").alias("c2"),
                             F.col("canon_id").alias("canon2"))
        mapping = (mapping.join(nxt, mapping["canon_id"] == nxt["c2"], "left")
                   .select("node_id",
                           F.coalesce("canon2", "canon_id").alias("canon_id")))
    return mapping.where(F.col("node_id") != F.col("canon_id"))


def apply_snap(df: DataFrame, mapping: DataFrame, node_col: str = "node_id",
               broadcast_hint: bool = True) -> DataFrame:
    """Rewrite node ids through the snap mapping (left join + coalesce).
    The mapping (non-identity labels only) is usually tiny -> broadcast;
    pass broadcast_hint=False at scales where it isn't and let AQE pick."""
    m = mapping.withColumnRenamed("node_id", "__snap_src")
    if broadcast_hint:
        m = F.broadcast(m)
    return (df.join(m, df[node_col] == m["__snap_src"], "left")
              .withColumn(node_col, F.coalesce("canon_id", node_col))
              .drop("__snap_src", "canon_id"))


def snap_nodes_table(nodes: DataFrame, mapping: DataFrame) -> DataFrame:
    """Fold snapped nodes into their canonical node: the canon keeps its
    coordinate (min-id wins, matching the reference's first-seen-wins
    dict insert) and absorbs the merged nodes' reference counts."""
    rewritten = apply_snap(nodes.withColumn("orig_id", F.col("node_id")), mapping)
    # the canonical id is the component MIN id, so min_by(orig_id)
    # recovers the canonical node's own coordinate
    return (rewritten.groupBy("node_id")
            .agg(F.min_by(F.struct("lat", "lon"), "orig_id").alias("ll"),
                 F.sum("n_refs").cast("int").alias("n_refs"))
            .select("node_id", F.col("ll.lat").alias("lat"),
                    F.col("ll.lon").alias("lon"), "n_refs"))
