import numpy as np

from topo2osm_spark.functions import proj


def test_roundtrip_norway():
    rng = np.random.default_rng(42)
    lat = rng.uniform(58.0, 71.0, 2000)
    for zone in (32, 33, 35):
        cm = zone * 6 - 183
        lon = rng.uniform(cm - 3.5, cm + 3.5, 2000)
        e, n = proj.utm_forward(lat, lon, zone)
        lat2, lon2 = proj.utm_inverse(e, n, zone)
        assert np.max(np.abs(lat2 - lat)) < 1e-9
        assert np.max(np.abs(lon2 - lon)) < 1e-9


def test_central_meridian_easting():
    # on the central meridian, easting is exactly the false easting
    e, n = proj.utm_forward(np.array([60.0]), np.array([9.0]), 32)
    assert abs(e[0] - 500000.0) < 1e-6
    assert n[0] > 6.6e6 and n[0] < 6.7e6  # ~meridian arc * k0 at 60N


def test_known_point_trondheim():
    # Trondheim ~ (63.4305, 10.3951); UTM32 easting/northing sanity band
    e, n = proj.utm_forward(np.array([63.4305]), np.array([10.3951]), 32)
    assert 560000 < e[0] < 580000
    assert 7020000 < n[0] < 7045000


def test_scale_factor_at_cm():
    # k0 scale: 1 deg of northing near the CM ≈ 110.6-111.7 km * 0.9996
    e1, n1 = proj.utm_forward(np.array([60.0]), np.array([9.0]), 32)
    e2, n2 = proj.utm_forward(np.array([61.0]), np.array([9.0]), 32)
    d = n2[0] - n1[0]
    assert 110000 < d < 112500


def test_vectorized_zone_array():
    lat = np.array([60.0, 65.0])
    lon = np.array([8.0, 16.0])
    zones = np.array([32, 33])
    e, n = proj.utm_forward(lat, lon, zones)
    lat2, lon2 = proj.utm_inverse(e, n, zones)
    assert np.allclose(lat2, lat, atol=1e-9)
    assert np.allclose(lon2, lon, atol=1e-9)


def test_sosi_koordsys_map():
    assert proj.SOSI_KOORDSYS_TO_ZONE[23] == 33
    assert proj.SOSI_KOORDSYS_TO_ZONE[22] == 32
    assert proj.SOSI_KOORDSYS_TO_ZONE[25] == 35
