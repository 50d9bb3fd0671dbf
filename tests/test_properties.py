"""Property-based tests for the numpy geometry/index kernels
(SURVEY.md §5.2 item 3). Pure numpy — no SparkSession; these pin the
invariants the distributed operators rely on:

- cell encode/decode roundtrip within one cell width; parent
  containment; tile alignment at every zoom
- PIP agreement with an independent slow ray-cast oracle
- UTM forward/inverse roundtrip across zones 32/33/35
- shoelace orientation antisymmetry + translation invariance
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from topo2osm_spark.functions import cells, geom, proj

# Norway-ish bounds (the engine's latitude-cap contract is |lat|<=72
# for the default pipeline; the kernels themselves work Web-Mercator-
# wide, so test a wider band)
lat_s = st.floats(min_value=-80.0, max_value=80.0,
                  allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9,
                  allow_nan=False, allow_infinity=False)
res_s = st.integers(min_value=4, max_value=cells.MAX_RES)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, res_s)
def test_cell_encode_contains_point(lat, lon, res):
    """The encoded cell's bounds contain the point (up to the grid's
    half-open edge convention)."""
    c = cells.encode(np.array([lat]), np.array([lon]), res)
    lat_min, lat_max, lon_min, lon_max = cells.cell_bounds(c)
    assert lon_min[0] - 1e-9 <= lon <= lon_max[0] + 1e-9
    assert lat_min[0] - 1e-7 <= lat <= lat_max[0] + 1e-7
    assert cells.resolution(c)[0] == res


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, res_s, st.integers(min_value=0, max_value=10))
def test_cell_parent_is_prefix(lat, lon, res, up):
    """parent(cell, r') equals encoding the same point at r' — the
    Morton prefix property that makes ancestor joins equi-joins."""
    pres = max(0, res - up)
    c = cells.encode(np.array([lat]), np.array([lon]), res)
    p = cells.parent(c, pres)
    direct = cells.encode(np.array([lat]), np.array([lon]), pres)
    assert p[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=18),
       st.floats(min_value=0.0, max_value=1.0, exclude_max=True),
       st.floats(min_value=0.0, max_value=1.0, exclude_max=True))
def test_tile_cell_roundtrip(z, fx, fy):
    """tile z/x/y -> cell -> tile is the identity (raster join key)."""
    x = int(fx * (1 << z))
    y = int(fy * (1 << z))
    c = cells.cell_from_tile(np.array([z]), np.array([x]), np.array([y]))
    zz, xx, yy = cells.cell_to_tile(c)
    assert (zz[0], xx[0], yy[0]) == (z, x, y)


def _pip_oracle(py, px, ring_y, ring_x):
    """Independent scalar ray-cast (crossing number), written to be
    boringly different from geom.points_in_ring's vectorized form."""
    n = len(ring_y)
    inside = False
    j = n - 1
    for i in range(n):
        yi, xi = ring_y[i], ring_x[i]
        yj, xj = ring_y[j], ring_x[j]
        if (yi > py) != (yj > py):
            x_cross = xi + (py - yi) / (yj - yi) * (xj - xi)
            if px < x_cross:
                inside = not inside
        j = i
    return inside


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_pip_matches_slow_oracle(seed):
    """Vectorized PIP == scalar crossing-number oracle on random
    star-shaped rings and random probe points (away from edges)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 40))
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.5, 1.5, n)
    ring_lat = 60.0 + 0.01 * r * np.sin(t)
    ring_lon = 10.0 + 0.01 * r * np.cos(t)
    pts_lat = 60.0 + 0.01 * rng.uniform(-2, 2, 50)
    pts_lon = 10.0 + 0.01 * rng.uniform(-2, 2, 50)
    got = geom.points_in_ring(pts_lat, pts_lon, ring_lat, ring_lon)
    for k in range(50):
        # skip probes within a hair of an edge (tie-break freedom)
        d = np.hypot(ring_lat - pts_lat[k], ring_lon - pts_lon[k]).min()
        if d < 1e-5:
            continue
        assert got[k] == _pip_oracle(pts_lat[k], pts_lon[k],
                                     ring_lat, ring_lon)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=57.0, max_value=71.5, allow_nan=False),
       st.floats(min_value=4.5, max_value=31.0, allow_nan=False),
       st.sampled_from([32, 33, 35]))
def test_utm_roundtrip_property(lat, lon, zone):
    """forward∘inverse == identity to <1e-8 deg across all N50 zones
    (Krüger series self-consistency over the whole Norway envelope)."""
    e, n = proj.utm_forward(np.array([lat]), np.array([lon]), zone)
    lat2, lon2 = proj.utm_inverse(e, n, np.array([zone]))
    assert abs(lat2[0] - lat) < 1e-8
    assert abs(lon2[0] - lon) < 1e-8


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1),
       st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
       st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
def test_shoelace_antisymmetry_and_translation(seed, dlat, dlon):
    """area(reversed ring) == -area(ring); area is translation-
    invariant (the orientation-repair operators depend on both)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 30))
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.5, 1.5, n)
    lat = 60.0 + 0.01 * r * np.sin(t)
    lon = 10.0 + 0.01 * r * np.cos(t)
    a = geom.shoelace_area(lat, lon)
    assert geom.shoelace_area(lat[::-1], lon[::-1]) == -a
    a_shift = geom.shoelace_area(lat + dlat, lon + dlon)
    assert abs(a_shift - a) <= 1e-9 * max(1.0, abs(a) / 1e-6)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_chain_curves_reassembles_any_split(seed):
    """Ring-assembly invariant the fused kernel and the doc-wide
    fallback both rely on: ANY split of a closed ring into shared-
    endpoint pieces — any cut count, any per-piece reversal, any piece
    order — chains back into ONE closed ring over the same vertex set
    (operators/assembly._chain_curves follows ref order first, then
    repairs by endpoint matching with flips)."""
    from topo2osm_spark.operators.assembly import _chain_curves, _is_closed

    rng = np.random.default_rng(seed)
    n_pts = int(rng.integers(6, 24))
    t = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    lat = 60.0 + 0.01 * np.cos(t)
    lon = 10.0 + 0.01 * np.sin(t)
    ring = np.column_stack([lat, lon])
    ring = np.vstack([ring, ring[:1]])          # closed
    k = int(rng.integers(1, min(5, n_pts)))
    cuts = np.sort(rng.choice(np.arange(1, n_pts), size=k - 1,
                              replace=False)) if k > 1 else np.array([], int)
    bounds = [0, *cuts.tolist(), n_pts]
    pieces = []
    for j in range(k):
        lo, hi = bounds[j], bounds[j + 1]
        seg = ring[lo:hi + 1]                    # shared endpoints
        if rng.random() < 0.5:
            seg = seg[::-1]                      # stored reversed
        pieces.append(seg)
    if rng.random() < 0.5:
        rng.shuffle(pieces)                      # out-of-order refs
    rings = _chain_curves(pieces)
    assert len(rings) == 1
    out, closed = rings[0]
    assert closed and _is_closed(out)
    got = {(round(a, 12), round(b, 12)) for a, b in out.tolist()}
    want = {(round(a, 12), round(b, 12)) for a, b in ring.tolist()}
    assert got == want
    assert len(out) == n_pts + 1                 # no duplicated junctions
