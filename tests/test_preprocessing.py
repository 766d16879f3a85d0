"""Tests for ground segmentation, DBSCAN clustering, deskew, voxel filter."""

import jax
import jax.numpy as jnp
import numpy as np

from gorio_tpu.core import lie
from gorio_tpu.core.pointcloud import distance_filter, make_cloud, voxel_downsample
from gorio_tpu.estimators.clustering import DBSCANConfig, dbscan_cluster
from gorio_tpu.estimators.deskew import deskew
from gorio_tpu.estimators.groundseg import (
    AGLEState,
    GroundSegConfig,
    estimate_ground,
    update_agle,
)


def _scene(seed=0, n_ground=600, n_obj=300, sensor_h=0.7):
    """Ground plane at z = -sensor_h plus two box clusters above it."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-20, 20, size=(n_ground, 2))
    ground = np.concatenate(
        [gx, -sensor_h + 0.03 * rng.normal(size=(n_ground, 1))], axis=1
    )
    c1 = np.array([8.0, 3.0, 0.3]) + rng.normal(size=(n_obj // 2, 3)) * [0.8, 0.4, 0.5]
    c2 = np.array([15.0, -6.0, 0.5]) + rng.normal(size=(n_obj // 2, 3)) * [0.5, 0.5, 0.8]
    pts = np.concatenate([ground, c1, c2], axis=0)
    labels = np.concatenate(
        [np.zeros(n_ground), np.ones(n_obj // 2), 2 * np.ones(n_obj // 2)]
    )
    return make_cloud(pts, intensity=10 + np.zeros(len(pts))), labels


def test_ground_segmentation_separates_plane():
    cloud, labels = _scene()
    res = estimate_ground(cloud, GroundSegConfig(sensor_height=0.7))
    g = np.asarray(res.ground_mask)
    ng = np.asarray(res.nonground_mask)
    is_ground_true = labels == 0
    # recall & precision of ground detection
    recall = g[is_ground_true].mean()
    precision = is_ground_true[g].mean() if g.any() else 0.0
    assert recall > 0.85, recall
    assert precision > 0.9, precision
    # object points classified nonground
    assert ng[~is_ground_true].mean() > 0.8
    # refined plane close to z = -0.7: n ~ (0,0,1), d ~ 0.7
    plane = np.asarray(res.plane)
    assert plane[2] > 0.99
    np.testing.assert_allclose(plane[3], 0.7, atol=0.05)


def test_underground_artifacts_removed():
    cloud, labels = _scene(seed=1)
    pts = np.asarray(cloud.xyz).copy()
    pts[:20] = np.array([5.0, 5.0, -3.5]) + 0.1 * np.random.default_rng(2).normal(
        size=(20, 3)
    )
    cloud2 = cloud._replace(xyz=jnp.asarray(pts))
    res = estimate_ground(cloud2, GroundSegConfig())
    assert np.asarray(res.removed_mask)[:20].mean() > 0.9


def test_agle_update():
    cloud, _ = _scene(seed=2, n_ground=2000)
    cfg = GroundSegConfig()
    st = AGLEState.init(cfg=cfg)
    res = estimate_ground(cloud, cfg, st)
    st2 = update_agle(st, res, cfg)
    counts = np.asarray(st2.count)
    assert counts.sum() >= 1  # at least one ring of interest saw ground
    for r in np.nonzero(counts)[0]:
        thr = float(st2.elevation_thr[r])
        assert np.isfinite(thr)
        # threshold should hover near the ground height
        assert -1.2 < thr < 0.5, (r, thr)
    # rings with no stored patches keep the cold threshold
    cold = 1.0 - cfg.sensor_height
    for r in np.nonzero(counts == 0)[0]:
        np.testing.assert_allclose(float(st2.elevation_thr[r]), cold)


def test_agle_per_ring_independence():
    """Per-ring A-GLE (`patchworkpp.hpp:894-950`): feeding ring 1 a higher
    ground surface than ring 0 must raise ring 1's threshold independently."""
    from gorio_tpu.core.pointcloud import make_cloud
    from gorio_tpu.estimators.groundseg import ring_of_patch

    cfg = GroundSegConfig(sensor_height=0.7)
    # zone 0 spans r in [min_range, (7*min+max)/8); its 4 rings split evenly
    lo, hi = cfg.min_range, (7 * cfg.min_range + cfg.max_range) / 8.0
    edges = np.linspace(lo, hi, 5)
    rng = np.random.default_rng(0)
    pts = []
    for r_idx, z0 in [(0, -0.7), (1, -0.45)]:  # ring 1 sits 25 cm higher
        for _ in range(600):
            rr = rng.uniform(edges[r_idx] + 0.05, edges[r_idx + 1] - 0.05)
            th = rng.uniform(0, 2 * np.pi)
            pts.append([rr * np.cos(th), rr * np.sin(th), z0 + 0.02 * rng.normal()])
    cloud = make_cloud(np.asarray(pts), intensity=10 + np.zeros(len(pts)))
    st = AGLEState.init(cfg=cfg)
    res = estimate_ground(cloud, cfg, st)
    st2 = update_agle(st, res, cfg)
    assert float(st2.count[0]) == 1 and float(st2.count[1]) == 1
    # ring thresholds track their own ring's elevation
    assert float(st2.elev_mean[1]) > float(st2.elev_mean[0]) + 0.15
    assert float(st2.elevation_thr[1]) > float(st2.elevation_thr[0])
    # sensor height re-estimated from ring 0 (`:903-905`)
    np.testing.assert_allclose(float(st2.sensor_height), 0.7, atol=0.1)
    # ring indices are a static property of the config
    rop = ring_of_patch(cfg)
    assert rop.shape == (cfg.num_patches,)
    assert rop.min() == 0 and rop.max() == cfg.num_rings - 1


def test_dbscan_two_clusters():
    rng = np.random.default_rng(3)
    c1 = np.array([5.0, 0.0, 0.0]) + 0.2 * rng.normal(size=(60, 3))
    c2 = np.array([12.0, 4.0, 0.0]) + 0.2 * rng.normal(size=(80, 3))
    sparse = rng.uniform(-30, 30, size=(40, 3))  # isolated noise
    cloud = make_cloud(np.concatenate([c1, c2, sparse]), capacity=256)
    res = dbscan_cluster(cloud, DBSCANConfig(eps=0.9, core_min_pts=10, min_cluster_size=20))
    cl = np.asarray(res.cluster)
    # c1 is nearer -> rank 1; c2 -> rank 2; noise -> 0
    assert np.all(cl[:60] == 1.0), np.unique(cl[:60])
    assert np.all(cl[60:140] == 2.0), np.unique(cl[60:140])
    assert np.all(cl[140:180] == 0.0)


def test_deskew_inverts_rotation():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(100, 3)) * 10
    omega = np.array([0.0, 0.0, 0.5])
    cloud = make_cloud(pts)
    out = deskew(cloud, jnp.asarray(omega), scan_period=0.1)
    # point i was rotated by R(-dt_i * (-omega)) = R(dt_i * omega)
    i = 50
    dt = 0.1 * i / 100
    R = np.asarray(lie.so3_exp(jnp.asarray(omega * dt)))
    np.testing.assert_allclose(np.asarray(out.xyz[i]), R @ pts[i], atol=1e-9)


def test_voxel_and_distance_filters():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-10, 10, size=(1000, 3))
    cloud = make_cloud(pts)
    down = voxel_downsample(cloud, 2.0, capacity=1000)
    n_down = int(down.count())
    assert 0 < n_down < 1000
    # all voxel centroids at least 0.5 voxel apart is not guaranteed, but
    # count should approximate the number of occupied voxels
    origin = pts.min(axis=0) - 1.0
    keys = set(map(tuple, np.floor((pts - origin) / 2.0).astype(int).tolist()))
    assert abs(n_down - len(keys)) <= len(keys) * 0.05

    filt = distance_filter(cloud, 2.0, 8.0)
    d = np.linalg.norm(pts, axis=1)
    expect = ((d > 2.0) & (d < 8.0)).sum()
    assert int(filt.count()) == expect
