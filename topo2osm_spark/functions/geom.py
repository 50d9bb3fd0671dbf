"""Planar geometry kernels (numpy) — shoelace area, ray-cast PIP.

Replaces the reference's inside_polygon ray-cast and ring
orientation/area checks [U: topo2osm.py::inside_polygon, ring
closing; SURVEY.md §2 ops 14, 22]. No shapely in this environment.
All kernels are vectorized: one polygon vs a batch of points, so the
cell-equi-join refine step stays Arrow-batch-friendly.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(lat: np.ndarray, lon: np.ndarray) -> float:
    """Signed area of a closed ring (first==last point optional).

    Positive = counter-clockwise in (lon, lat) plane (the OSM outer-
    ring convention). Units: square degrees — only the SIGN and
    relative magnitude are used by the engine.
    """
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    if len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    if len(x) < 3:
        return 0.0
    # cyclic +1 shift via concatenate — value-identical to np.roll(_, -1)
    # but without roll's general index arithmetic (hot in the assembly
    # kernel and the fixture generator); the elementwise product array
    # and np.sum order are unchanged, so the result is bit-identical.
    xs = np.concatenate([x[1:], x[:1]])
    ys = np.concatenate([y[1:], y[:1]])
    return 0.5 * float(np.sum(x * ys - xs * y))


def points_in_ring(pt_lat: np.ndarray, pt_lon: np.ndarray,
                   ring_lat: np.ndarray, ring_lon: np.ndarray) -> np.ndarray:
    """Ray-cast point-in-polygon: batch of points vs one ring.

    Even-odd rule, ray cast toward +lon. Boundary points are treated
    as inside-ish (half-open edges; matches the reference's tolerance
    for interior points sitting on FLATE boundaries closely enough —
    fixture interior points are strictly interior).
    """
    px = np.asarray(pt_lon, dtype=np.float64)[:, None]
    py = np.asarray(pt_lat, dtype=np.float64)[:, None]
    rx = np.asarray(ring_lon, dtype=np.float64)
    ry = np.asarray(ring_lat, dtype=np.float64)
    if len(rx) > 1 and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    x1, y1 = rx[None, :], ry[None, :]
    x2 = np.concatenate([rx[1:], rx[:1]])[None, :]
    y2 = np.concatenate([ry[1:], ry[:1]])[None, :]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = cond & (px < xint)
    return (np.sum(crossings, axis=1) % 2).astype(bool)


def ring_is_closed(lat: np.ndarray, lon: np.ndarray, tol: float = 0.0) -> bool:
    if len(lat) < 4:
        return False
    return (abs(float(lat[0]) - float(lat[-1])) <= tol
            and abs(float(lon[0]) - float(lon[-1])) <= tol)


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    r = 6371008.8
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * r * np.arcsin(np.sqrt(a))
