"""Shared-node dedup + kNN tolerance snap (SURVEY.md §2 ops 12, 13).

The reference keeps a dict keyed on rounded (lat, lon): identical
coordinates become ONE OSM node, and near-duplicates within a merge
tolerance are snapped together [U: topo2osm.py::node dict +
duplicate-node matching; mount empty, SURVEY.md §0]. Distributed
re-expression:

op 12 (exact dedup) needs NO join at all: the node id is a pure
function of the quantized coordinate (`xxhash64(qlat, qlon)`), so
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

QUANT = 7  # decimals — the reference's node-coordinate rounding contract

# snap cell resolution: Web-Mercator cell ground size at res 22 is
# ~9.6 m × cos(lat) (≥3.1 m at lat 71°N) — safely above any sane merge
# tolerance (≤1 m), so a 3×3 k-ring always covers the tolerance disk.
SNAP_RES = 22


@F.pandas_udf(T.LongType())
def cell_at_snap_res(lat: pd.Series, lon: pd.Series) -> pd.Series:
    from topo2osm_spark.functions import cells
    return pd.Series(cells.encode(lat.to_numpy(), lon.to_numpy(), SNAP_RES))


@F.pandas_udf(T.ArrayType(T.LongType()))
def kring_at_snap_res(lat: pd.Series, lon: pd.Series) -> pd.Series:
    from topo2osm_spark.functions import cells
    c = cells.encode(lat.to_numpy(), lon.to_numpy(), SNAP_RES)
    return pd.Series(list(cells.neighbors(c)))


def quantize(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Add qlat/qlon (1e-7 deg int grid) and the content-addressed
    node_id = xxhash64(qlat, qlon). Pure map-side — no shuffle."""
    return (df
            .withColumn("qlat", F.round(F.col(lat_col) * F.lit(10.0 ** QUANT)).cast("long"))
            .withColumn("qlon", F.round(F.col(lon_col) * F.lit(10.0 ** QUANT)).cast("long"))
            .withColumn("node_id", F.xxhash64("qlat", "qlon")))


def dedup_nodes(point_df: DataFrame) -> DataFrame:
    """op 12: quantized points -> one row per distinct node with a
    reference count. Partial aggregation (map-side combine) is free."""
    q = quantize(point_df)
    return (q.groupBy("qlat", "qlon", "node_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_refs"))
             .withColumn("lat", F.col("qlat") / F.lit(10.0 ** QUANT))
             .withColumn("lon", F.col("qlon") / F.lit(10.0 ** QUANT))
             .select("node_id", "lat", "lon", "n_refs"))


def snap_mapping(nodes: DataFrame, tol_m: float = 0.5,
                 iterations: int = 2) -> DataFrame:
    """op 13: (node_id, lat, lon) -> (node_id, canon_id) for nodes that
    snap to a lower-id node within tol_m. Identity rows are omitted."""
    left = nodes.select(
        F.col("node_id").alias("a"), F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
        cell_at_snap_res("lat", "lon").alias("cell"))
    right = nodes.select(
        F.col("node_id").alias("b"), F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        F.explode(kring_at_snap_res("lat", "lon")).alias("cell"))
    cand = left.join(right, "cell").where(F.col("a") < F.col("b"))
    # haversine refine, JVM-side trig (no Python in the pair filter)
    r = 6371008.8
    dlat = F.radians(F.col("blat") - F.col("alat"))
    dlon = F.radians(F.col("blon") - F.col("alon"))
    h = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(F.radians("alat")) * F.cos(F.radians("blat"))
         * F.pow(F.sin(dlon / 2), 2))
    dist = 2 * F.lit(r) * F.asin(F.sqrt(h))
    edges = (cand.where(dist <= F.lit(tol_m))
                 .select("a", "b").distinct()
                 .persist())
    if edges.isEmpty():
        # common case on clean inputs: nothing within tolerance
        return edges.sparkSession.createDataFrame([], "node_id long, canon_id long")
    # min-label propagation over undirected edges; persist each round
    # to truncate lineage (stage count stays O(iterations))
    adj = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    labels = (adj.select(F.col("a").alias("node_id"))
                 .distinct()
                 .withColumn("label", F.col("node_id")))
    for _ in range(iterations):
        neigh = (adj.join(labels, adj["b"] == labels["node_id"])
                    .groupBy("a").agg(F.min("label").alias("nlabel")))
        labels = (labels.join(neigh, labels["node_id"] == neigh["a"], "left")
                        .select("node_id",
                                F.least("label", F.coalesce("nlabel", "label")).alias("label"))
                        .persist())
    return (labels.where(F.col("label") != F.col("node_id"))
                  .select("node_id", F.col("label").alias("canon_id")))


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
