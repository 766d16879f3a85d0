"""Statistical / radius outlier removal (pcl::*OutlierRemoval parity) and the
loose IMU roll/pitch fusion of the odometry front-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.estimators.outliers import (
    radius_outlier_removal,
    remove_outliers,
    statistical_outlier_removal,
)


def _cluster_plus_stragglers(seed=0):
    """Dense unit-cube cluster + 5 far isolated stragglers + padding."""
    rng = np.random.default_rng(seed)
    dense = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    stragglers = (rng.uniform(30, 60, size=(5, 3))).astype(np.float32)
    xyz = np.concatenate([dense, stragglers])
    return make_cloud(jnp.asarray(xyz), capacity=256), len(dense)


def test_statistical_removes_isolated_points():
    cloud, n_dense = _cluster_plus_stragglers()
    out = statistical_outlier_removal(cloud, mean_k=10, stddev_mul=1.0)
    mask = np.asarray(out.mask)
    assert not mask[n_dense : n_dense + 5].any()  # stragglers gone
    assert mask[:n_dense].mean() > 0.9  # cluster survives
    assert not mask[n_dense + 5 :].any()  # padding stays invalid


def test_radius_removes_isolated_points():
    cloud, n_dense = _cluster_plus_stragglers()
    out = radius_outlier_removal(cloud, radius=2.0, min_neighbors=2)
    mask = np.asarray(out.mask)
    assert not mask[n_dense : n_dense + 5].any()
    assert mask[:n_dense].all()


def test_radius_counts_exact():
    # 3 points on a line, spacing 1: mids have 2 neighbors within 1.5
    xyz = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [50, 0, 0]], np.float32)
    cloud = make_cloud(jnp.asarray(xyz), capacity=8)
    out = radius_outlier_removal(cloud, radius=1.5, min_neighbors=2)
    mask = np.asarray(out.mask)
    assert list(mask[:4]) == [False, True, False, False]  # only middle has 2


def test_remove_outliers_factory():
    cloud, _ = _cluster_plus_stragglers()
    assert remove_outliers(cloud, "none") is cloud
    n_stat = int(np.asarray(remove_outliers(cloud, "statistical").mask).sum())
    n_rad = int(np.asarray(remove_outliers(cloud, "radius").mask).sum())
    assert 0 < n_stat <= 200 and 0 < n_rad <= 200
    with pytest.raises(ValueError):
        remove_outliers(cloud, "bogus")


def test_preprocess_frame_with_outlier_removal():
    from gorio_tpu.pipeline.preprocessing import PreprocessConfig, preprocess_frame

    cloud, _ = _cluster_plus_stragglers()
    cfg = PreprocessConfig(
        power_threshold=-1.0,  # make_cloud default intensity is 0
        outlier_method="radius",
        radius_radius=2.0,
        radius_min_neighbors=2,
        enable_dynamic_object_removal=False,
        enable_deskew=False,
        enable_ground_seg=False,
        enable_clustering=False,
        min_distance=0.0,
        max_distance=1000.0,
    )
    frame, _ = preprocess_frame(cloud, jnp.zeros(3), cfg)
    assert int(np.asarray(frame.cloud.mask).sum()) == 200


# ---- IMU roll/pitch loose fusion ------------------------------------------


def _quat_from_rpy(roll, pitch, yaw):
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ]
    )  # [w, x, y, z]


def test_r2ypr_roundtrip():
    from gorio_tpu.pipeline.odometry import _r2ypr, _rpy_to_mat

    for r, p, y in [(0.1, -0.2, 0.7), (0.0, 0.0, 0.0), (-0.3, 0.25, -2.0)]:
        R = _rpy_to_mat(r, p, y)
        y2, p2, r2 = _r2ypr(R)
        assert np.allclose([y2, p2, r2], [y, p, r], atol=1e-9)


def test_transform_update_pulls_roll_pitch_toward_imu():
    from gorio_tpu.pipeline.odometry import (
        OdometryConfig,
        ScanMatchingOdometry,
        _r2ypr,
        _rpy_to_mat,
    )

    odo = ScanMatchingOdometry(
        cfg=OdometryConfig(enable_imu_fusion=True, imu_fusion_ratio=0.5, scan_period=0.0)
    )
    # first IMU sample is level -> global_orient = I
    odo.push_imu(0.0, _quat_from_rpy(0.0, 0.0, 0.0))
    # later IMU says roll=0.2, pitch=-0.1 (constant)
    for t in (0.5, 1.0, 1.5):
        odo.push_imu(t, _quat_from_rpy(0.2, -0.1, 0.3))
    # odometry pose says level with yaw 0.7
    T = np.eye(4)
    T[:3, :3] = _rpy_to_mat(0.0, 0.0, 0.7)
    out = odo._transform_update(T, 1.0)
    yaw, pitch, roll = _r2ypr(out[:3, :3])
    assert np.isclose(yaw, 0.7, atol=1e-6)  # yaw untouched
    assert np.isclose(roll, 0.1, atol=1e-6)  # halfway 0 -> 0.2
    assert np.isclose(pitch, -0.05, atol=1e-6)  # halfway 0 -> -0.1
    # translation untouched
    assert np.allclose(out[:3, 3], T[:3, 3])


def test_transform_update_interpolates_in_time():
    from gorio_tpu.pipeline.odometry import (
        OdometryConfig,
        ScanMatchingOdometry,
        _r2ypr,
    )

    odo = ScanMatchingOdometry(
        cfg=OdometryConfig(enable_imu_fusion=True, imu_fusion_ratio=1.0, scan_period=0.0)
    )
    odo.push_imu(0.0, _quat_from_rpy(0.0, 0.0, 0.0))
    odo.push_imu(1.0, _quat_from_rpy(0.4, 0.0, 0.0))
    out = odo._transform_update(np.eye(4), 0.5)  # halfway between samples
    _, _, roll = _r2ypr(out[:3, :3])
    assert np.isclose(roll, 0.2, atol=1e-6)


def test_transform_update_noop_without_imu():
    from gorio_tpu.pipeline.odometry import OdometryConfig, ScanMatchingOdometry

    odo = ScanMatchingOdometry(cfg=OdometryConfig(enable_imu_fusion=True))
    T = np.eye(4)
    T[0, 3] = 5.0
    assert np.allclose(odo._transform_update(T, 1.0), T)
