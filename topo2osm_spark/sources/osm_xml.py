"""OSM XML sink (SURVEY.md §2 op 3).

The reference emits OSM XML with negative ids, upload='false', and
<tag k v/> children [U: topo2osm.py::save_osm writer; mount empty,
SURVEY.md §0]. The engine's primary sink is columnar tables; this
optional sink serializes nodes/ways/relations to XML fragments via
mapInArrow partition serializers — one XML document per partition
file, which is how a distributed engine shards a 10^12-entity export
(single-file XML is inherently serial; the reference wrote one file
per municipality, the analogue here is one shard per partition).

Ids are negated on write (OSM convention for not-yet-uploaded
entities). Engine ids are 63-bit NON-NEGATIVE content hashes
(functions/ids.py clears the sign bit at the source), so
`export_id = -engine_id` is injective by construction — no +k/-k
folding is possible. `_neg` still masks to the low 63 bits as a
defensive invariant for ids produced outside the engine.
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F, types as T

_OUT = T.StructType([T.StructField("xml", T.StringType())])
_HEADER = "<?xml version='1.0' encoding='UTF-8'?>\n<osm version='0.6' upload='false' generator='topo2osm_spark'>"

_LOW63 = (1 << 63) - 1


def _neg(v: int) -> int:
    """Engine id (non-negative 63-bit, functions/ids.py) -> negative
    export id. Injective on the engine id domain [0, 2^63); the mask
    is a defensive no-op there (id 0 maps to the -2^63 sentinel, which
    content_id can emit only for the all-zero hash)."""
    u = int(v) & _LOW63
    return -(u if u != 0 else _LOW63 + 1)


def _tags_xml(tags) -> str:
    """tags arrives as a dict (pandas path) or list of (k, v) pairs
    (Arrow MapType.to_pylist)."""
    if not tags:
        return ""
    items = tags.items() if isinstance(tags, dict) else tags
    return "".join(f"\n    <tag k={quoteattr(k)} v={quoteattr(str(v))} />"
                   for k, v in sorted(items))


def nodes_to_xml(nodes: DataFrame) -> DataFrame:
    """nodes(node_id, lat, lon) -> one XML shard string per partition."""

    def ser(batches):
        parts = [_HEADER]
        for b in batches:
            ids = b.column("node_id").to_pylist()
            lats = b.column("lat").to_pylist()
            lons = b.column("lon").to_pylist()
            for i, la, lo in zip(ids, lats, lons):
                parts.append(
                    f"\n  <node id='{_neg(i)}' lat='{la:.7f}' lon='{lo:.7f}' "
                    f"version='1' />")
        parts.append("\n</osm>\n")
        yield pa.RecordBatch.from_pylist([{"xml": "".join(parts)}],
                                         schema=pa.schema([pa.field("xml", pa.string())]))

    return nodes.select("node_id", "lat", "lon").mapInArrow(ser, _OUT)


def points_to_xml(points: DataFrame) -> DataFrame:
    """points(node_id, lat, lon, tags) -> XML shards of TAGGED nodes
    (POI output: Høydepunkt peaks, Høydetall elevation labels — the
    reference emits these as nodes with <tag/> children). Emit this
    AFTER plain nodes and dedupe by id downstream if a tagged point
    shares a way vertex (same node id by construction — quantize+snap)."""

    def ser(batches):
        parts = [_HEADER]
        for b in batches:
            for row in b.to_pylist():
                parts.append(
                    f"\n  <node id='{_neg(row['node_id'])}' "
                    f"lat='{row['lat']:.7f}' lon='{row['lon']:.7f}' "
                    f"version='1'>{_tags_xml(row['tags'])}\n  </node>")
        parts.append("\n</osm>\n")
        yield pa.RecordBatch.from_pylist([{"xml": "".join(parts)}],
                                         schema=pa.schema([pa.field("xml", pa.string())]))

    return points.select("node_id", "lat", "lon", "tags").mapInArrow(ser, _OUT)


def split_tagged_nodes(nodes: DataFrame, points: DataFrame
                       ) -> tuple[DataFrame, DataFrame]:
    """Partition the node space for a valid single-definition XML export.

    Tagged point ids ALSO live in the shared node table (points feed
    the node space through quantize+snap), so emitting both sinks
    verbatim would define the same node id twice — invalid OSM XML.
    Returns (plain_nodes, tagged_nodes):

    - tagged_nodes: ONE row per point node id; tag maps of points
      sharing a node id are merged (duplicate keys resolved to the
      MIN value — deterministic under any partitioning); coordinates
      are the canonical node coordinates (points already publish them,
      plans/pipeline.py points_out contract).
    - plain_nodes: the node table MINUS the tagged ids (left_anti).

    Both sides stay JVM-side; the anti-join's right side is the small
    emitted-points id set (AQE broadcasts it from real stats)."""
    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>"))
    tag_entries = (points
                   .select("node_id", F.explode(F.map_entries("tags")).alias("e"))
                   .groupBy("node_id", F.col("e.key").alias("k"))
                   .agg(F.min(F.col("e.value")).alias("v")))
    merged_tags = (tag_entries.groupBy("node_id")
                   .agg(F.map_from_entries(
                       F.array_sort(F.collect_list(F.struct("k", "v"))))
                       .alias("tags")))
    tagged = (points.groupBy("node_id")
              .agg(F.min("lat").alias("lat"), F.min("lon").alias("lon"))
              .join(merged_tags, "node_id", "left")
              .withColumn("tags", F.coalesce("tags", empty_map)))
    plain = nodes.join(tagged.select("node_id"), "node_id", "left_anti")
    return plain, tagged


def ways_to_xml(ways: DataFrame) -> DataFrame:
    """ways(way_id, node_ids, tags, emit) -> XML shards (emit only)."""

    def ser(batches):
        parts = [_HEADER]
        for b in batches:
            d = b.to_pylist()
            for row in d:
                nds = "".join(f"\n    <nd ref='{_neg(n)}' />"
                              for n in row["node_ids"])
                parts.append(
                    f"\n  <way id='{_neg(row['way_id'])}' version='1'>"
                    f"{nds}{_tags_xml(row['tags'])}\n  </way>")
        parts.append("\n</osm>\n")
        yield pa.RecordBatch.from_pylist([{"xml": "".join(parts)}],
                                         schema=pa.schema([pa.field("xml", pa.string())]))

    return (ways.where(F.col("emit"))
                .select("way_id", "node_ids", "tags")
                .mapInArrow(ser, _OUT))


def relations_to_xml(relations: DataFrame) -> DataFrame:
    """relations(rel_id, members, tags, rel_type) -> XML shards."""

    def ser(batches):
        parts = [_HEADER]
        for b in batches:
            for row in b.to_pylist():
                mems = "".join(
                    f"\n    <member type='way' ref='{_neg(m['way_id'])}' "
                    f"role={quoteattr(m['role'])} />"
                    for m in row["members"])
                tags = dict(row["tags"] or {})
                tags["type"] = row["rel_type"]
                parts.append(
                    f"\n  <relation id='{_neg(row['rel_id'])}' version='1'>"
                    f"{mems}{_tags_xml(tags)}\n  </relation>")
        parts.append("\n</osm>\n")
        yield pa.RecordBatch.from_pylist([{"xml": "".join(parts)}],
                                         schema=pa.schema([pa.field("xml", pa.string())]))

    return (relations.select("rel_id", "members", "tags", "rel_type")
                     .mapInArrow(ser, _OUT))


def write_xml_shards(df_xml: DataFrame, path: str) -> None:
    """Write one .osm file per partition shard (text sink)."""
    df_xml.write.mode("overwrite").text(path)
