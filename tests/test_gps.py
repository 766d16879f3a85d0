"""NMEA parsing + UTM conversion tests."""

import numpy as np
import pytest

from gorio_tpu.io.gps import GPSConverter, GPSFix, latlon_to_utm, parse_nmea


def _with_checksum(body):
    cs = 0
    for ch in body:
        cs ^= ord(ch)
    return f"${body}*{cs:02X}"


def test_utm_against_numeric_meridional_arc():
    """Northing on the central meridian must equal k0 * meridional arc, which
    we validate by numerical integration of the ellipsoid metric."""
    import math

    A, F = 6378137.0, 1 / 298.257223563
    E2 = F * (2 - F)
    lat_deg = 40.5
    lat = math.radians(lat_deg)
    phi = np.linspace(0.0, lat, 200001)
    M_num = np.trapezoid(A * (1 - E2) * (1 - E2 * np.sin(phi) ** 2) ** -1.5, phi)
    e, n, zone, hemi = latlon_to_utm(lat_deg, -75.0)  # central meridian zone 18
    assert zone == 18 and hemi == "N"
    assert abs(e - 500000.0) < 1e-6
    np.testing.assert_allclose(n, 0.9996 * M_num, rtol=1e-9)
    # southern hemisphere false northing
    e_s, n_s, _, hemi_s = latlon_to_utm(-lat_deg, -75.0)
    assert hemi_s == "S"
    np.testing.assert_allclose(n_s, 10000000.0 - 0.9996 * M_num, rtol=1e-9)


def test_utm_local_scale():
    """Near the central meridian the local scale must be ~k0 = 0.9996."""
    e0, n0, _, _ = latlon_to_utm(48.0, 9.0)  # zone 32 central meridian
    e1, n1, _, _ = latlon_to_utm(48.0009, 9.0)
    # 0.0009 deg of latitude ~ 100.125 m of arc at 48 deg (WGS84)
    d = n1 - n0
    assert abs(d / 0.9996 - 100.12) < 0.2, d


def test_utm_equator_meridian():
    e, n, zone, hemi = latlon_to_utm(0.0, 3.0)  # central meridian of zone 31
    assert zone == 31 and hemi == "N"
    assert abs(e - 500000.0) < 1e-6
    assert abs(n) < 1e-6


def test_parse_gga():
    s = _with_checksum("GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,")
    fix = parse_nmea(s)
    assert fix is not None
    np.testing.assert_allclose(fix.lat, 48 + 7.038 / 60, rtol=1e-9)
    np.testing.assert_allclose(fix.lon, 11 + 31.0 / 60, rtol=1e-9)
    assert fix.alt == 545.4
    assert fix.quality == 1


def test_parse_rmc_and_void():
    ok = _with_checksum("GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W")
    void = _with_checksum("GPRMC,123519,V,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W")
    assert parse_nmea(ok) is not None
    assert parse_nmea(void) is None


def test_bad_checksum_rejected():
    assert parse_nmea("$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*00") is None
    assert parse_nmea("garbage") is None


def test_converter_zero_utm_and_world():
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])  # 90 deg yaw
    conv = GPSConverter(utm_to_world=T)
    p0 = conv.convert(GPSFix(lat=48.0, lon=11.0, alt=500.0, quality=1))
    np.testing.assert_allclose(p0, 0.0, atol=1e-9)
    # move ~111m north -> +y in UTM -> -x... after 90deg yaw: (0,n,0)->(-n,0,0)
    p1 = conv.convert(GPSFix(lat=48.001, lon=11.0, alt=500.0, quality=1))
    assert abs(p1[0] - (-abs(p1[1] if abs(p1[1]) > 1 else 0) - 0)) < 200  # rotated
    assert np.linalg.norm(p1[:2]) > 100
    # invalid fix dropped
    assert conv.convert(GPSFix(lat=48, lon=11, alt=None, quality=0)) is None


def test_dataset_presets():
    """Preset calibration chains are valid rigid transforms."""
    import numpy as np

    from gorio_tpu.io.presets import get_preset

    for name in ("ntu_cp", "ntu_loop2", "ntu_loop3", "msc"):
        p = get_preset(name)
        T = p.T_body_radar
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert abs(np.linalg.det(R) - 1.0) < 1e-4
        assert p.imu_gravity > 9.7
    assert get_preset("ntu_loop2").utm_to_world is not None
    assert get_preset("ntu_cp").utm_to_world is None
    # utm_to_world rotation blocks are orthonormal too
    U = get_preset("ntu_loop3").utm_to_world
    np.testing.assert_allclose(U[:3, :3] @ U[:3, :3].T, np.eye(3), atol=1e-3)
