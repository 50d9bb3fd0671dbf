"""Checkpoint / lineage / resume contract (SURVEY.md §2 op 43, §5.2.4)."""

import pytest
from pyspark.sql import functions as F

from topo2osm_spark.sources.warehouse import Warehouse, fingerprint


def test_fingerprint_stable():
    assert fingerprint("a", 1) == fingerprint("a", 1)
    assert fingerprint("a", 1) != fingerprint("a", 2)


def test_write_read_resume(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    fp = fingerprint("stage1", "params")

    out1, resumed1 = wh.stage(df, "stage1", fp)
    assert not resumed1
    assert out1.count() == 100

    # second run with the same fingerprint resumes (no recompute)
    out2, resumed2 = wh.stage(df, "stage1", fp)
    assert resumed2
    assert out2.count() == 100
    assert sorted(r["v"] for r in out2.collect()) == list(range(0, 200, 2))

    # changed fingerprint -> recompute
    out3, resumed3 = wh.stage(df.limit(10), "stage1", fingerprint("stage1", "v2"))
    assert not resumed3
    assert out3.count() == 10


def test_lineage_recorded(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    wh.stage(spark.range(50), "s1", fingerprint("s1"))
    wh.stage(spark.range(20), "s2", fingerprint("s2"))
    lin = wh.lineage()
    rows = lin.collect()
    stages = {r["stage"] for r in rows}
    assert stages == {"s1", "s2"}
    # per-partition rows sum to stage totals
    s1 = sum(r["rows"] for r in rows if r["stage"] == "s1")
    assert s1 == 50
    assert all(r["wall_ms"] >= 0 for r in rows)
    man = wh.manifest("s1")
    assert man["rows"] == 50
    assert len(man["partitions"]) >= 1


def test_pipeline_resume_skips_recompute(spark, tmp_path):
    """Kill-and-resume: a second run with the same inputs must load
    every checkpointed stage from the warehouse (SURVEY.md §5.2.4)."""
    from topo2osm_spark.plans.pipeline import run_pipeline
    from topo2osm_spark.schema import DOCUMENTS
    from topo2osm_spark.sources import fixtures

    tbl = fixtures.generate_documents(6, n_municipalities=3, seed=11)
    docs = spark.createDataFrame(tbl.to_pylist(), DOCUMENTS)
    wh = Warehouse(spark, str(tmp_path / "whp"))

    out1 = run_pipeline(spark, docs, warehouse=wh, run_pip=False, run_tiles=False)
    ways1 = sorted((w["way_id"], tuple(w["node_ids"])) for w in out1["ways"].collect())
    lineage_rows_1 = wh.lineage().count()

    out2 = run_pipeline(spark, docs, warehouse=wh, run_pip=False, run_tiles=False)
    ways2 = sorted((w["way_id"], tuple(w["node_ids"])) for w in out2["ways"].collect())
    lineage_rows_2 = wh.lineage().count()

    assert ways1 == ways2  # byte-identical output
    assert lineage_rows_2 == lineage_rows_1  # nothing re-materialized
