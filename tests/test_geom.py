import numpy as np

from topo2osm_spark.functions import geom


def _circle(cx, cy, r, n=32, ccw=True):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    if not ccw:
        t = t[::-1]
    return cy + r * np.sin(t), cx + r * np.cos(t)  # (lat, lon)


def test_shoelace_sign():
    lat, lon = _circle(10.0, 60.0, 0.01, ccw=True)
    assert geom.shoelace_area(lat, lon) > 0
    lat, lon = _circle(10.0, 60.0, 0.01, ccw=False)
    assert geom.shoelace_area(lat, lon) < 0


def test_pip_circle():
    lat, lon = _circle(10.0, 60.0, 0.01)
    pts_lat = np.array([60.0, 60.0, 60.02, 60.0051])
    pts_lon = np.array([10.0, 10.02, 10.0, 10.0])
    inside = geom.points_in_ring(pts_lat, pts_lon, lat, lon)
    assert inside.tolist() == [True, False, False, True]


def test_pip_with_duplicate_closing_point():
    lat, lon = _circle(10.0, 60.0, 0.01)
    lat = np.append(lat, lat[0])
    lon = np.append(lon, lon[0])
    assert geom.points_in_ring(np.array([60.0]), np.array([10.0]), lat, lon)[0]


def test_pip_nonconvex():
    # C-shape: point in the notch is outside
    lon = np.array([0.0, 4.0, 4.0, 1.0, 1.0, 4.0, 4.0, 0.0])
    lat = np.array([0.0, 0.0, 1.0, 1.0, 3.0, 3.0, 4.0, 4.0])
    assert geom.points_in_ring(np.array([2.0]), np.array([0.5]), lat, lon)[0]
    assert not geom.points_in_ring(np.array([2.0]), np.array([2.0]), lat, lon)[0]


def test_ring_closed():
    lat, lon = _circle(10.0, 60.0, 0.01)
    assert not geom.ring_is_closed(lat, lon)
    assert geom.ring_is_closed(np.append(lat, lat[0]), np.append(lon, lon[0]))


def test_haversine():
    # Oslo -> Trondheim ~ 392 km
    d = geom.haversine_m(59.9139, 10.7522, 63.4305, 10.3951)
    assert 380000 < d < 405000
    assert geom.haversine_m(60.0, 10.0, 60.0, 10.0) == 0.0
