"""topo2osm_spark — a PySpark-native spatial-join + tiling engine.

Reimplements the query/data-processing capabilities of the reference
converter (osmno/topo2osm, surveyed in SURVEY.md; reference mount was
empty — citations are behavior-level `[U:]` per SURVEY.md §0) as
DataFrame operators over an interleaved text+media documents table:

- SOSI tokenization of geometry spans (vectorized, mapInArrow)
- UTM->WGS84 reprojection (numpy Krueger series, no pyproj)
- quadtree cell index aligned 1:1 with slippy z/x/y tiles (no h3 lib)
- shared-node dedup + kNN tolerance snap
- curve-to-way ring assembly + polygon closure/orientation
- point-in-polygon FLATE membership (numpy ray cast, no shapely)
- OBJTYPE->OSM tag broadcast join
- raster<->vector tile/cell equi-joins
- salting, adaptive cell splitting, checkpoint/lineage warehouse

All geometry math is plain numpy inside Arrow-batched UDFs; no
per-row Python UDFs anywhere (enforced by tests/test_no_row_udf.py).
"""

__version__ = "0.1.0"
