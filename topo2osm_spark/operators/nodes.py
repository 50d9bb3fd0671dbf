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

from pyspark.sql import DataFrame, functions as F

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
    reference count. Partial aggregation (map-side combine) is free.

    node_id is a pure function of (qlat, qlon), so it is NOT an
    aggregation key (r6): grouping on the two coordinate ints narrows
    the partial-agg exchange rows by a third (mostly-singleton groups
    barely combine map-side, so the exchange carries ~every group) and
    the 2.3M hashes move to the reduce side — identical output."""
    q = quantize(point_df)
    return (q.groupBy("qlat", "qlon")
             .agg(F.count(F.lit(1)).cast("int").alias("n_refs"))
             .withColumn("node_id", content_id("qlat", "qlon"))
             .withColumn("lat", F.col("qlat") / F.lit(10.0 ** QUANT))
             .withColumn("lon", F.col("qlon") / F.lit(10.0 ** QUANT))
             .select("node_id", "lat", "lon", "n_refs"))


_M_PER_DEG = 111320.0


def snap_mapping(nodes: DataFrame, tol_m: float = 0.5,
                 iterations: int = 2,
                 max_abs_lat: float | None = None) -> DataFrame:
    """op 13: (node_id, lat, lon) -> (node_id, canon_id) for nodes that
    snap to a lower-id node within tol_m. Identity rows are omitted.

    Shape (ONE data-sized shuffle, pure JVM end-to-end):

    1. shifted-grid candidate groups: bins of size g = 4*tol in both
       axes at 4 half-cell offsets — the classic guarantee that any
       pair within tol <= g/2 shares at least one bin (JVM floor math,
       4x map-side replication, no Python, no k-ring join);
    2. i<j pair generation + exact planar distance filter as JVM
       higher-order functions over the (tiny minority of) multi-node
       bins -> an edge per merge candidate, distinct across grids;
    3. connected components by `iterations` rounds of min-label
       propagation over the edge set — edge-count-sized joins, fully
       distributed, no driver union-find.

    g_lon uses cos(max_abs_lat) so the bin guarantee holds at the
    highest latitude in the data. Two ways to establish that bound,
    both loud — within-tolerance merges can never be missed silently:

    - max_abs_lat=None (default): derive it with one scalar max-agg
      over the (persisted) node table — a metadata-cheap job, never a
      data collect. Semantically safest, but the .first() is a DRIVER
      BARRIER: the whole upstream chain must materialize before any
      downstream plan can even be built, serializing plan-building
      with execution (a fixed cost that caps scaling efficiency).
    - max_abs_lat=<cap>: barrier-free. The caller asserts a bound
      (e.g. 72° covers mainland Norway) and the bins are computed for
      that worst case; an executor-side guard raises on the first row
      whose |lat| exceeds the cap, so polar data fails loudly with a
      "pass a higher max_abs_lat" message instead of under-merging.

    Lower latitudes than the bound just get slightly over-wide bins
    (more candidates, same answer). Dense-coast hot bins stay small
    because g is ~2 m.
    """
    import math
    guard = max_abs_lat is not None
    if max_abs_lat is None:
        row = nodes.agg(F.max(F.abs(F.col("lat"))).alias("m")).first()
        max_abs_lat = min(float(row["m"] or 0.0) + 0.01, 89.0)
    g_lat = 4.0 * tol_m / _M_PER_DEG
    g_lon = 4.0 * tol_m / (_M_PER_DEG * max(math.cos(math.radians(max_abs_lat)), 0.05))

    # the guard is folded into the bin key itself (the `by` floor), so
    # it is evaluated for EVERY row — including singleton-bin rows that
    # column pruning would otherwise drop — and cannot be optimized out.
    lat_bin = F.col("lat")
    if guard:
        lat_bin = F.when(F.abs(F.col("lat")) <= F.lit(max_abs_lat), F.col("lat")) \
                   .otherwise(F.raise_error(F.concat(
                       F.lit("snap_mapping: |lat| "),
                       F.abs(F.col("lat")).cast("string"),
                       F.lit(f" exceeds max_abs_lat={max_abs_lat}; pass a "
                             "higher max_abs_lat (or None to derive it)"))))
    binned = nodes.select(
        "node_id", "lat", "lon",
        F.explode(F.array(*[
            F.struct(
                F.lit(oy * 2 + ox).alias("grid"),
                F.floor(lat_bin / g_lat + oy * 0.5).alias("by"),
                F.floor(F.col("lon") / g_lon + ox * 0.5).alias("bx"))
            for oy in (0, 1) for ox in (0, 1)])).alias("b"))

    # Multi-node bins are a tiny minority (singleton bins can never
    # produce a pair), so find them with a PRIMITIVE codegen count-agg
    # first and only then pay collect_list: an ObjectHashAggregate
    # building one array per bin over all 4xN rows sort-spills on the
    # ~N mostly-singleton groups and was the single largest core stage
    # at 128k docs (~40% of core). The hot-bin set is merge-candidate
    # sized -> broadcast probe; on a real cluster AQE swaps in a
    # shuffle join if it ever outgrows the broadcast threshold.
    binned = binned.select("node_id", "lat", "lon", "b.grid", "b.by", "b.bx")
    hot = (binned.groupBy("grid", "by", "bx")
           .agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") >= 2)
           .select("grid", "by", "bx"))
    multi = (binned.join(F.broadcast(hot), ["grid", "by", "bx"])
             .groupBy("grid", "by", "bx")
             .agg(F.collect_list(F.struct("node_id", "lat", "lon")).alias("pts"))
             .select("pts"))

    # all i<j pairs within a bin: nested transform + flatten, then the
    # planar tolerance test in codegen. lo/hi-ordered so each edge
    # appears once per containing bin; distinct() collapses the 4-grid
    # replication.
    pts = F.col("pts")
    pairs = F.flatten(F.transform(
        pts, lambda x, i: F.transform(
            F.slice(pts, i + 2, F.size(pts)),
            lambda y: F.struct(
                F.least(x["node_id"], y["node_id"]).alias("lo"),
                F.greatest(x["node_id"], y["node_id"]).alias("hi"),
                ((x["lat"] - y["lat"]) * F.lit(_M_PER_DEG)).alias("dy"),
                ((x["lon"] - y["lon"]) * F.lit(_M_PER_DEG)
                 * F.cos(F.radians((x["lat"] + y["lat"]) / F.lit(2.0)))).alias("dx")))))
    edges = (multi
             .select(F.explode(F.filter(
                 pairs, lambda p: p["dy"] * p["dy"] + p["dx"] * p["dx"]
                 <= F.lit(tol_m * tol_m))).alias("e"))
             .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
             .distinct())

    # connected components by min-label propagation over the edge set
    # (tiny: one row per actual merge candidate). Labels start as own
    # id; each round takes the min over neighbors. Components within
    # tolerance are geometrically tiny (2-4 nodes — SURVEY.md §7.3),
    # so `iterations`+1 rounds converge; still fully distributed.
    edges_bi = edges.unionByName(
        edges.select(F.col("hi").alias("lo"), F.col("lo").alias("hi")))
    labels = (edges_bi.groupBy(F.col("lo").alias("node_id"))
              .agg(F.min("hi").alias("nbr_min"))
              .select("node_id",
                      F.least("node_id", "nbr_min").alias("canon_id")))
    for _ in range(iterations):
        nbr = (edges_bi.join(
                   labels.select(F.col("node_id").alias("n2"), "canon_id"),
                   F.col("hi") == F.col("n2"))
               .groupBy(F.col("lo").alias("node_id"))
               .agg(F.min("canon_id").alias("nbr_canon")))
        labels = (labels.join(nbr, "node_id", "left")
                  .select("node_id",
                          F.least(F.coalesce("nbr_canon", "canon_id"),
                                  F.col("canon_id")).alias("canon_id")))
    # Convergence hardening (two label-set-sized joins, no barrier):
    # 1. one pointer-jumping round: canon := canon(canon) — doubles the
    #    reachable chain depth, so tolerance chains up to ~6 nodes
    #    resolve with the default iterations=2;
    # 2. verification fold: if after compression canon(canon) still
    #    differs from canon (a within-tolerance chain wider than the
    #    configured rounds — degenerate input), the inconsistency would
    #    previously be SILENT (two nodes of one component keeping
    #    different canons). raise_error folded into the output column
    #    makes it loud at materialization, like the max_abs_lat guard.
    l2 = labels.select(F.col("node_id").alias("__n2"),
                       F.col("canon_id").alias("__c2"))
    labels = (labels.join(l2, labels["canon_id"] == l2["__n2"], "left")
              .select("node_id",
                      F.coalesce("__c2", "canon_id").alias("canon_id")))
    l3 = labels.select(F.col("node_id").alias("__n3"),
                       F.col("canon_id").alias("__c3"))
    labels = (labels.join(l3, labels["canon_id"] == l3["__n3"], "left")
              .select("node_id",
                      F.when(F.col("__c3").isNull()
                             | (F.col("__c3") == F.col("canon_id")),
                             F.col("canon_id"))
                       .otherwise(F.raise_error(F.concat(
                           F.lit("snap_mapping: label propagation did not "
                                 "converge (within-tolerance node chain "
                                 "deeper than iterations="),
                           F.lit(str(iterations)),
                           F.lit(" rounds + compression); re-run with a "
                                 "higher `iterations`"))))
                       .alias("canon_id")))
    return labels.where(F.col("node_id") != F.col("canon_id"))


def with_canon_coords(mapping: DataFrame, nodes: DataFrame,
                      broadcast_hint: bool = True) -> DataFrame:
    """Enrich a snap mapping with the CANONICAL node's published
    coordinate: (node_id, canon_id) -> + (c_lat, c_lon).

    The canon keeps its own quantized coordinate (min-id-wins,
    snap_nodes_table), so joining the mapping's canon_id against the
    PRE-snap node table recovers exactly the coordinate the output
    node table publishes. Run this INSIDE the checkpointed snap_map
    stage: the node-table scan then happens once, while the stage is
    materializing anyway — not again on every consumer that needs
    canon coords (r4 ran it on the points write path, where it forced
    a full extra scan of the output node table; VERDICT r4 #3).

    broadcast_hint follows the same gate as the other snap-map joins:
    hint when AQE is off (stats-free leaves would force a sort-merge
    that shuffles the whole node table); with AQE on pass False and
    let the runtime pick broadcast from real stage stats."""
    m = F.broadcast(mapping) if broadcast_hint else mapping
    return (m.join(nodes.select(F.col("node_id").alias("canon_id"),
                                F.col("lat").alias("c_lat"),
                                F.col("lon").alias("c_lon")),
                   "canon_id")
            .select("node_id", "canon_id", "c_lat", "c_lon"))


def apply_snap(df: DataFrame, mapping: DataFrame, node_col: str = "node_id",
               broadcast_hint: bool = True) -> DataFrame:
    """Rewrite node ids through the snap mapping (left join + coalesce).
    The mapping (non-identity labels only) is usually tiny -> broadcast;
    pass broadcast_hint=False at scales where it isn't and let AQE pick."""
    # select first: the enriched mapping (with_canon_coords) carries
    # c_lat/c_lon, which must not leak into the rewritten frame
    m = (mapping.select("node_id", "canon_id")
         .withColumnRenamed("node_id", "__snap_src"))
    if broadcast_hint:
        m = F.broadcast(m)
    return (df.join(m, df[node_col] == m["__snap_src"], "left")
              .withColumn(node_col, F.coalesce("canon_id", node_col))
              .drop("__snap_src", "canon_id"))


def snap_nodes_table(nodes: DataFrame, mapping: DataFrame,
                     broadcast_hint: bool = True) -> DataFrame:
    """Fold snapped nodes into their canonical node: the canon keeps its
    coordinate (min-id wins, matching the reference's first-seen-wins
    dict insert) and absorbs the merged nodes' reference counts."""
    rewritten = apply_snap(nodes.withColumn("orig_id", F.col("node_id")),
                           mapping, broadcast_hint=broadcast_hint)
    # the canonical id is the component MIN id, so min_by(orig_id)
    # recovers the canonical node's own coordinate
    return (rewritten.groupBy("node_id")
            .agg(F.min_by(F.struct("lat", "lon"), "orig_id").alias("ll"),
                 F.sum("n_refs").cast("int").alias("n_refs"))
            .select("node_id", F.col("ll.lat").alias("lat"),
                    F.col("ll.lon").alias("lon"), "n_refs"))
