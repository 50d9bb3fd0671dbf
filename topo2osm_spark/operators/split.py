""">2000-node way splitting (OSM hard limit; SURVEY.md §7.3.2).

OSM rejects ways with more than 2000 nodes, so a fjord-length
coastline ring or a large sea polygon must be emitted as CHAINED ways
that share their endpoint nodes, with a multipolygon relation
referencing every piece [U: topo2osm.py::way-length split;
mount empty, SURVEY.md §0].

All splitting is JVM-side array math (sequence + explode + slice) —
no Python, no shuffle beyond the explode's narrow fan-out:

    part i of a way covers node indices [i*(max-1), i*(max-1)+max)
    (1-based slice), so consecutive parts overlap in exactly one node
    — the shared junction that keeps the chain topologically connected.

Split part ids are content-addressed (content_id(parent, part)), so
they are stable across partitionings and cluster sizes like every
other engine id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from topo2osm_spark.functions.ids import content_id

MAX_WAY_NODES = 2000


def split_long_ways(ways: DataFrame,
                    max_nodes: int = MAX_WAY_NODES) -> DataFrame:
    """ways(way_id, node_ids, …) -> same columns + (parent_way_id,
    part, n_parts) with every output way holding <= max_nodes nodes.

    Ways already within the limit pass through unchanged (part 0,
    n_parts 1, way_id preserved). Split parts get
    content_id(parent_way_id, part) ids; `n_nodes` is recomputed."""
    step = max_nodes - 1  # consecutive parts share one endpoint node
    n = F.size("node_ids")
    with_np = ways.withColumn(
        "n_parts",
        F.greatest(F.lit(1), F.ceil((n - F.lit(1)) / F.lit(step)).cast("int")))
    parts = with_np.withColumn(
        "part", F.explode(F.sequence(F.lit(0), F.col("n_parts") - 1)))
    return (parts
            .withColumn("parent_way_id", F.col("way_id"))
            .withColumn("node_ids", F.slice(
                "node_ids", F.col("part") * step + 1, max_nodes))
            .withColumn("way_id", F.when(
                F.col("n_parts") > 1,
                content_id("parent_way_id", "part")).otherwise(F.col("way_id")))
            .withColumn("n_nodes", F.size("node_ids")))


def split_mapping(ways_split: DataFrame) -> DataFrame:
    """(parent_way_id, part, way_id) rows for SPLIT ways only — the
    broadcast side for relation-member expansion."""
    return (ways_split.where(F.col("n_parts") > 1)
            .select("parent_way_id", "part", "way_id"))


def expand_relation_members(relations: DataFrame,
                            mapping: DataFrame) -> DataFrame:
    """Replace every relation member whose way was split by that way's
    parts (role preserved; parts in chain order, member order kept).

    Splits are RARE (only >2000-node rings), so the explode+regroup
    machinery runs only on relations that actually contain a split
    member: a narrow explode of (rel_id, member way_id) semi-joined
    against the (broadcast, tiny) split-parent set picks the affected
    relations; everything else passes through untouched — the heavy
    tags/members payload of the 99.9% unaffected relations never
    enters a shuffle."""
    # renamed copies avoid ambiguous-self-join resolution (the mapping
    # participates in both the probe and the expansion join)
    split_parents = (mapping.select(F.col("parent_way_id").alias("_sp"))
                     .distinct())
    map2 = mapping.select(F.col("parent_way_id").alias("_pw"),
                          F.col("part").alias("_part"),
                          F.col("way_id").alias("_sw"))
    affected_ids = (relations
                    .select("rel_id", F.explode("members").alias("m"))
                    .join(F.broadcast(split_parents),
                          F.col("m.way_id") == F.col("_sp"), "left_semi")
                    .select("rel_id").distinct())
    untouched = relations.join(F.broadcast(affected_ids), "rel_id",
                               "left_anti")
    affected = relations.join(F.broadcast(affected_ids), "rel_id",
                              "left_semi")
    m = (affected
         .select("rel_id", "doc_id", "span_idx", "flate_id", "tags",
                 "rel_type", F.posexplode("members").alias("mpos", "member")))
    exp = (m.join(F.broadcast(map2),
                  F.col("member.way_id") == F.col("_pw"), "left")
           .select("rel_id", "doc_id", "span_idx", "flate_id", "tags",
                   "rel_type", "mpos",
                   F.coalesce("_part", F.lit(0)).alias("part"),
                   F.struct(
                       F.col("member.role").alias("role"),
                       F.coalesce(F.col("_sw"), F.col("member.way_id"))
                        .alias("way_id")).alias("member")))
    # group on rel_id alone (maps are not groupable); the other columns
    # are functionally dependent on it
    expanded = (exp.groupBy("rel_id")
                .agg(F.first("doc_id").alias("doc_id"),
                     F.first("span_idx").alias("span_idx"),
                     F.first("flate_id").alias("flate_id"),
                     F.first("tags").alias("tags"),
                     F.first("rel_type").alias("rel_type"),
                     F.array_sort(F.collect_list(
                         F.struct("mpos", "part", "member"))).alias("ms"))
                .select("rel_id", "doc_id", "span_idx", "flate_id",
                        F.transform("ms", lambda x: x["member"]).alias("members"),
                        "tags", "rel_type"))
    return untouched.unionByName(expanded)


def synthesize_relations_for_split_rings(ways_split: DataFrame,
                                         relations: DataFrame) -> DataFrame:
    """A CLOSED ring that had to split can no longer carry its area
    semantics as a single way: emit a multipolygon relation whose
    outer members are the chain parts (OSM multipolygon convention).
    Rings already referenced by an existing relation (holed FLATEs)
    are excluded — their members were expanded in place."""
    # bound the broadcast by the SPLIT-parent set (tiny), not the full
    # relation-member set: only members that are split parents can veto
    # a candidate, so the semi-join keeps `already` split-count-sized
    # at any corpus scale.
    split_parents = (ways_split.where(F.col("n_parts") > 1)
                     .select("parent_way_id").distinct())
    already = (relations.select(F.explode("members").alias("m"))
               .select(F.col("m.way_id").alias("parent_way_id"))
               .join(F.broadcast(split_parents), "parent_way_id",
                     "left_semi")
               .distinct())
    cand = (ways_split
            .where((F.col("n_parts") > 1) & F.col("closed") & F.col("emit"))
            .join(F.broadcast(already), "parent_way_id", "left_anti"))
    return (cand.groupBy("parent_way_id")
            .agg(F.first("doc_id").alias("doc_id"),
                 F.first("span_idx").alias("span_idx"),
                 F.first("flate_id").alias("flate_id"),
                 F.first("tags").alias("tags"),
                 F.array_sort(F.collect_list(
                     F.struct("part", F.struct(
                         F.lit("outer").alias("role"),
                         F.col("way_id").alias("way_id")).alias("member"))))
                 .alias("pm"))
            .select(content_id("parent_way_id", F.lit("SR")).alias("rel_id"),
                    "doc_id", "span_idx", "flate_id",
                    F.transform("pm", lambda x: x["member"]).alias("members"),
                    "tags", F.lit("multipolygon").alias("rel_type")))
