"""The r4 geometry-kernel md5-oracle analogs (node_snap_sig,
ring_shoelace_sig, pip_raycast_sig in __spark_entry__.py) are only
honest oracle evidence if their integer-exact math agrees with the
PRODUCTION kernels the pipeline actually runs (functions/geom.py,
operators/nodes.py). These tests pin that equivalence directly —
pure-python re-derivations of the sig formulas vs the numpy/DataFrame
kernels, on the same md5-derived inputs the sig queries use.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from topo2osm_spark.functions import geom


def _md5h(s: str, seed: int | None = None) -> int:
    """Pure-python mirror of operators/dedup.md5h (60-bit md5 int)."""
    if seed is not None:
        s = f"{s}:{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_PIP_POLY = [(0, 0), (100, 0), (100, 100), (75, 100), (75, 30),
             (50, 30), (50, 100), (25, 100), (25, 30), (0, 30)]


def _sig_raycast(px: int, py: int) -> tuple[int, bool]:
    """The pip_raycast_sig crossing rule, integer cross-multiplied."""
    n = 0
    for (x1, y1), (x2, y2) in zip(_PIP_POLY, _PIP_POLY[1:] + _PIP_POLY[:1]):
        if (y1 > py) != (y2 > py):
            cross = (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)
            if cross * (1 if y2 > y1 else -1) < 0:
                n += 1
    return n, n % 2 == 1


def _on_edge(px: int, py: int) -> bool:
    for (x1, y1), (x2, y2) in zip(_PIP_POLY, _PIP_POLY[1:] + _PIP_POLY[:1]):
        cross = (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)
        if (cross == 0
                and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            return True
    return False


def test_pip_sig_matches_points_in_ring_kernel():
    """The sig query's integer crossing rule == the production
    float ray-cast (geom.points_in_ring) for every md5-derived point
    strictly off the polygon boundary (the boundary tie rule is
    implementation-defined on both sides and excluded by design)."""
    pts = [( _md5h(f"{d}:{i}", 11) % 121 - 10,
             _md5h(f"{d}:{i}", 12) % 121 - 10)
           for d in range(200) for i in range(4)]
    ring_lon = np.array([v[0] for v in _PIP_POLY], dtype=np.float64)
    ring_lat = np.array([v[1] for v in _PIP_POLY], dtype=np.float64)
    px = np.array([p[0] for p in pts], dtype=np.float64)
    py = np.array([p[1] for p in pts], dtype=np.float64)
    kernel_inside = geom.points_in_ring(py, px, ring_lat, ring_lon)
    checked = 0
    for j, (x, y) in enumerate(pts):
        if _on_edge(x, y):
            continue
        _, sig_inside = _sig_raycast(x, y)
        assert sig_inside == bool(kernel_inside[j]), (x, y)
        checked += 1
    # the point cloud straddles the polygon: both classes must occur
    assert checked > 700
    assert 0 < int(kernel_inside.sum()) < len(pts)


def test_shoelace_sig_matches_geom_kernel():
    """area2 (integer shoelace, doubled) == 2 * geom.shoelace_area on
    the same md5-derived 6-vertex integer rings — exact equality (all
    products < 2^20, exact in float64), and the ccw flag is its sign."""
    for d in range(200):
        xs = [_md5h(f"{d}:{k}:x") % 1000 for k in range(6)]
        ys = [_md5h(f"{d}:{k}:y") % 1000 for k in range(6)]
        area2 = sum(xs[k] * ys[(k + 1) % 6] - xs[(k + 1) % 6] * ys[k]
                    for k in range(6))
        kern = geom.shoelace_area(np.array(ys, dtype=np.float64),
                                  np.array(xs, dtype=np.float64))
        assert 2.0 * kern == float(area2), d
        if area2 != 0:
            assert (kern > 0) == (area2 > 0)


def test_node_snap_sig_matches_dedup_nodes(spark):
    """node_snap_sig's quantize->group->canonical-min contract == the
    production dedup_nodes (nodes.py) bins: same (qlat, qlon) grid
    cells, same per-cell reference counts, one canonical id per cell."""
    from topo2osm_spark.operators.nodes import QUANT, dedup_nodes

    rows = []
    for d in range(60):
        for i in range(4):
            s = f"{d}:{i}"
            rows.append((_md5h(s), _md5h(s, 1) % 200, _md5h(s, 2) % 200))
    pts = spark.createDataFrame(rows, "pt_id long, qlat long, qlon long")
    sig = (pts.groupBy("qlat", "qlon")
              .agg(F.min("pt_id").alias("node_id"),
                   F.count(F.lit(1)).alias("n_refs")))
    sig_bins = {(r.qlat, r.qlon): r.n_refs for r in sig.collect()}
    # feed the same grid cells to the production operator as lat/lon
    prod = dedup_nodes(pts.select(
        (F.col("qlat") / F.lit(10.0 ** QUANT)).alias("lat"),
        (F.col("qlon") / F.lit(10.0 ** QUANT)).alias("lon")))
    prod_bins = {(round(r.lat * 10 ** QUANT), round(r.lon * 10 ** QUANT)):
                 r.n_refs for r in prod.collect()}
    assert sig_bins == prod_bins
    assert max(sig_bins.values()) > 1  # collisions exist -> dedup real
    # canonical id is deterministic: min over the cell's member ids
    one = sig.orderBy(F.desc("n_refs")).first()
    members = [r.pt_id for r in pts.where(
        (F.col("qlat") == one.qlat) & (F.col("qlon") == one.qlon)).collect()]
    assert one.node_id == min(members)


def test_tile_parent_sig_matches_cells_codec():
    """tile_parent_sig's SQL Morton spread + ancestor shift == the
    production numpy codec (cells.from_xy / cells.parent) on the same
    md5-derived (ix, iy) at the sig's literal (res, parent_res) pairs."""
    from topo2osm_spark.functions import cells

    pairs = [(0, 9, 7), (1, 10, 5), (2, 11, 8), (3, 12, 3)]
    for d in range(100):
        for k, res, pres in pairs:
            s = f"d{d}:{k}"
            ix = _md5h(s, 21) % (1 << res)
            iy = _md5h(s, 22) % (1 << res)
            # the sig's spread (same magic masks, python ints)
            def spread(v):
                for sh, mask in ((16, 0x0000FFFF0000FFFF),
                                 (8, 0x00FF00FF00FF00FF),
                                 (4, 0x0F0F0F0F0F0F0F0F),
                                 (2, 0x3333333333333333),
                                 (1, 0x5555555555555555)):
                    v = (v | (v << sh)) & mask
                return v
            morton = spread(ix) | (spread(iy) << 1)
            sig_cell = (res << 58) | morton
            sig_parent = (pres << 58) | (morton >> (2 * (res - pres)))
            kern_cell = int(cells.from_xy(
                np.array([ix], dtype=np.uint64),
                np.array([iy], dtype=np.uint64), res)[0])
            kern_parent = int(cells.parent(np.array([kern_cell]), pres)[0])
            assert sig_cell == kern_cell, (d, k)
            assert sig_parent == kern_parent, (d, k)


def test_integrity_sig_matches_integrity_report(spark):
    """integrity_sig's orphan/unused classification == the production
    anti-join kernel (assembly.integrity_report) fed equivalent
    per-document curve/ref id sets (the sig's md5 derivation)."""
    from topo2osm_spark.operators.assembly import integrity_report

    docs = [f"doc{d}" for d in range(40)]
    curve_sets = {d: sorted({_md5h(f"{d}:{i}:c") % 40 for i in range(6)})
                  for d in docs}
    ref_sets = {d: sorted({_md5h(f"{d}:{j}:r") % 50 for j in range(8)})
                for d in docs}
    flates = spark.createDataFrame(
        [(d, 0, 1, [int(r) for r in ref_sets[d]]) for d in docs],
        "doc_id string, span_idx int, obj_id long, refs array<long>")
    curves = spark.createDataFrame(
        [(d, 0, int(c)) for d in docs for c in curve_sets[d]],
        "doc_id string, span_idx int, obj_id long")
    got = {(r.issue, r.doc_id, r.obj_id)
           for r in integrity_report(flates, curves).collect()}
    expect = set()
    for d in docs:
        cs, rs = set(curve_sets[d]), set(ref_sets[d])
        expect |= {("orphan_ref", d, r) for r in rs - cs}
        expect |= {("unused_curve", d, c) for c in cs - rs}
    assert got == expect
    assert any(i == "orphan_ref" for i, _, _ in expect)
    assert any(i == "unused_curve" for i, _, _ in expect)
