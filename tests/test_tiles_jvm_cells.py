"""Pin the JVM (codegen) cell expressions in operators/tiles.py to the
numpy reference kernels in functions/cells.py.

The raster<->vector join computes cell math once per (way node x zoom),
so tiles.py mirrors cells.py's Morton encode / tile encode / parent as
pure Spark SQL expressions. These tests feed the same random inputs to
both implementations and require bit-exact agreement, so either side
can change only in lockstep.
"""
import numpy as np
from pyspark.sql import functions as F

from topo2osm_spark.functions import cells
from topo2osm_spark.operators.tiles import (VECTOR_RES, cell_at_res_expr,
                                            parent_cell_expr, tile_cell_expr)


def _col(spark, df_rows, schema, expr, alias="v"):
    df = spark.createDataFrame(df_rows, schema)
    return [r[alias] for r in df.select(expr.alias(alias)).collect()]


def test_tile_cell_expr_matches_numpy(spark):
    rng = np.random.default_rng(11)
    z = rng.integers(0, 15, 200)
    x = np.array([rng.integers(0, 2**int(zz)) for zz in z])
    y = np.array([rng.integers(0, 2**int(zz)) for zz in z])
    want = cells.cell_from_tile(z, x, y).tolist()
    got = _col(spark,
               [(int(a), int(b), int(c)) for a, b, c in zip(z, x, y)],
               "z int, x int, y int", tile_cell_expr("z", "x", "y"))
    assert got == want


def test_cell_at_res_expr_matches_numpy(spark):
    rng = np.random.default_rng(12)
    lat = rng.uniform(-84.9, 84.9, 300)
    lon = rng.uniform(-180, 180, 300)
    rows = [(float(a), float(b)) for a, b in zip(lat, lon)]
    for res in (0, 7, VECTOR_RES):
        want = cells.encode(lat, lon, res).tolist()
        got = _col(spark, rows, "lat double, lon double",
                   cell_at_res_expr("lat", "lon", res))
        assert got == want


def test_cell_at_res_expr_clamps_poles(spark):
    lat = np.array([89.9, -89.9, cells.MAX_LAT, -cells.MAX_LAT])
    lon = np.array([10.0, 10.0, 179.999999, -180.0])
    want = cells.encode(lat, lon, VECTOR_RES).tolist()
    got = _col(spark, [(float(a), float(b)) for a, b in zip(lat, lon)],
               "lat double, lon double",
               cell_at_res_expr("lat", "lon", VECTOR_RES))
    assert got == want


def test_parent_cell_expr_matches_numpy(spark):
    rng = np.random.default_rng(13)
    lat = rng.uniform(-84.9, 84.9, 200)
    lon = rng.uniform(-180, 180, 200)
    fine = cells.encode(lat, lon, VECTOR_RES)
    z = rng.integers(0, VECTOR_RES + 1, 200)
    want = cells.parent(fine, z).tolist()
    got = _col(spark,
               [(int(c), int(t)) for c, t in zip(fine, z)],
               "cell long, z int", parent_cell_expr("cell", "z"))
    assert got == want


def test_parent_expr_codegen_no_python(spark):
    # the whole expression must stay JVM-side: no Python eval nodes
    df = spark.range(10).select(
        F.col("id").alias("z"),
        cell_at_res_expr("59.9", "10.7", VECTOR_RES).alias("cell"))
    df = df.select(parent_cell_expr("cell", "pmod(z, 15)").alias("p"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
