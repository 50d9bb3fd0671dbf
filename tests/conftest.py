import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from topo2osm_spark.plans.session import build_session
    s = build_session("topo2osm_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_df(spark):
    """Small deterministic corpus as a Spark DataFrame."""
    from topo2osm_spark.schema import DOCUMENTS
    from topo2osm_spark.sources import fixtures
    tbl = fixtures.generate_documents(30, n_municipalities=6, seed=42)
    return spark.createDataFrame(tbl.to_pylist(), DOCUMENTS).cache()


@pytest.fixture(scope="session")
def pipeline_out(spark, docs_df):
    from topo2osm_spark.plans.pipeline import run_pipeline
    return run_pipeline(spark, docs_df)
