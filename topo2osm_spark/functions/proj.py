"""UTM <-> WGS84/EUREF89 reprojection (SURVEY.md §2 op 11) — pure numpy.

The reference reprojects scaled UTM 32/33/35 integer coordinates to
lat/lon before emitting OSM nodes [U: topo2osm.py + utm helper;
reference mount empty, see SURVEY.md §0]. No pyproj in this
environment (SURVEY.md §7.3), so this implements the transverse
Mercator forward/inverse with the Krüger n-series (public textbook
formulas: Karney 2011 / standard geodesy references) on the GRS80
ellipsoid used by EUREF89. Accuracy of the 4th-order series is
sub-millimeter within UTM zone widths — far tighter than the engine's
1e-7 deg node quantization contract.

All functions are vectorized over numpy arrays and deterministic:
same input bits -> same output bits, which is what makes the
distributed node-dedup exact (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (EUREF89)
A_AXIS = 6378137.0
FLATTENING = 1.0 / 298.257222101
K0 = 0.9996
FALSE_EASTING = 500000.0

_n = FLATTENING / (2.0 - FLATTENING)
_A = A_AXIS / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0)

# Krüger series coefficients (4th order in n)
_ALPHA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 5.0 * _n**3 / 16.0 + 41.0 * _n**4 / 180.0,
    13.0 * _n**2 / 48.0 - 3.0 * _n**3 / 5.0 + 557.0 * _n**4 / 1440.0,
    61.0 * _n**3 / 240.0 - 103.0 * _n**4 / 140.0,
    49561.0 * _n**4 / 161280.0,
)
_BETA = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 37.0 * _n**3 / 96.0 - _n**4 / 360.0,
    _n**2 / 48.0 + _n**3 / 15.0 - 437.0 * _n**4 / 1440.0,
    17.0 * _n**3 / 480.0 - 37.0 * _n**4 / 840.0,
    4397.0 * _n**4 / 161280.0,
)
_DELTA = (
    2.0 * _n - 2.0 * _n**2 / 3.0 - 2.0 * _n**3 + 116.0 * _n**4 / 45.0,
    7.0 * _n**2 / 3.0 - 8.0 * _n**3 / 5.0 - 227.0 * _n**4 / 45.0,
    56.0 * _n**3 / 15.0 - 136.0 * _n**4 / 35.0,
    4279.0 * _n**4 / 630.0,
)

# SOSI KOORDSYS code -> UTM zone (EUREF89): 21=UTM31 .. 25=UTM35
SOSI_KOORDSYS_TO_ZONE = {21: 31, 22: 32, 23: 33, 24: 34, 25: 35}


def zone_central_meridian(zone) -> np.ndarray:
    return np.asarray(zone, dtype=np.float64) * 6.0 - 183.0


def utm_forward(lat_deg: np.ndarray, lon_deg: np.ndarray, zone) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) deg -> (easting, northing) meters in the given UTM zone.

    Used by the fixture generator and roundtrip tests; the pipeline
    itself only needs the inverse.
    """
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64)
                     - zone_central_meridian(zone))
    s2n = 2.0 * np.sqrt(_n) / (1.0 + _n)
    t = np.sinh(np.arctanh(np.sin(phi)) - s2n * np.arctanh(s2n * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2.0 * j * xi_p) * np.cosh(2.0 * j * eta_p)
        eta += a * np.cos(2.0 * j * xi_p) * np.sinh(2.0 * j * eta_p)
    easting = FALSE_EASTING + K0 * _A * eta
    northing = K0 * _A * xi  # northern hemisphere (Norway): no false northing
    return easting, northing


def utm_inverse(easting: np.ndarray, northing: np.ndarray, zone) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) meters -> (lat, lon) degrees. Vectorized; zone
    may be scalar or per-element array (mixed UTM 32/33/35 batches)."""
    xi = np.asarray(northing, dtype=np.float64) / (K0 * _A)
    eta = (np.asarray(easting, dtype=np.float64) - FALSE_EASTING) / (K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lat = np.degrees(phi)
    lon = np.degrees(lam) + zone_central_meridian(zone)
    return lat, lon
