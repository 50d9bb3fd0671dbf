"""Streaming prefix + OSM XML sink tests."""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F


def test_streaming_prefix_matches_batch(spark, docs_df, tmp_path):
    """The stateless pipeline prefix produces identical parsed objects
    under Structured Streaming and batch execution."""
    from topo2osm_spark.streaming.stream import run_stream_to_memory
    inp = str(tmp_path / "docs_stream")
    docs_df.write.mode("overwrite").parquet(inp)

    streamed = run_stream_to_memory(spark, inp, name="t_stream_objs")
    got = {(r["doc_id"], r["span_idx"], r["obj_kind"], r["obj_id"])
           for r in streamed.collect()}

    from topo2osm_spark.plans.pipeline import explode_spans
    from topo2osm_spark.sources import sosi
    spans = explode_spans(spark.read.parquet(inp))
    batch = sosi.tokenize_spans(spans.where(F.col("kind") == "sosi"))
    want = {(r["doc_id"], r["span_idx"], r["obj_kind"], r["obj_id"])
            for r in batch.collect()}
    assert got == want and len(got) > 0


def test_windowed_event_counts(spark):
    from topo2osm_spark.streaming.stream import windowed_event_counts
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev, window="1 hour").collect()
    assert len(out) > 0
    total = sum(r["n"] for r in out)
    assert total == ev.count()  # batch mode: no late-data drops


def test_osm_xml_sink(spark, pipeline_out, tmp_path):
    from topo2osm_spark.sources import osm_xml
    nodes_xml = osm_xml.nodes_to_xml(pipeline_out["nodes"].limit(50).coalesce(1))
    shard = nodes_xml.collect()[0]["xml"]
    root = ET.fromstring(shard)
    assert root.tag == "osm" and root.get("upload") == "false"
    nds = root.findall("node")
    assert len(nds) == 50
    assert all(int(n.get("id")) < 0 for n in nds)

    ways_xml = osm_xml.ways_to_xml(
        pipeline_out["ways"].where(F.col("emit")).limit(10).coalesce(1))
    wroot = ET.fromstring(ways_xml.collect()[0]["xml"])
    ws = wroot.findall("way")
    assert 0 < len(ws) <= 10
    w0 = ws[0]
    assert len(w0.findall("nd")) > 0
    assert all(int(nd.get("ref")) < 0 for nd in w0.findall("nd"))

    rels_xml = osm_xml.relations_to_xml(
        pipeline_out["relations"].limit(5).coalesce(1))
    rroot = ET.fromstring(rels_xml.collect()[0]["xml"])
    rels = rroot.findall("relation")
    assert 0 < len(rels) <= 5
    r0 = rels[0]
    types = {t.get("k"): t.get("v") for t in r0.findall("tag")}
    assert types.get("type") == "multipolygon"
    roles = {m.get("role") for m in r0.findall("member")}
    assert "outer" in roles
