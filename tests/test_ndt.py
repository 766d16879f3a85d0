"""NDT registration tests (same two-scan fixture as GICP)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gorio_tpu.core import lie
from gorio_tpu.io.synthetic import make_world, render_radar_scan
from gorio_tpu.registration.ndt import (
    NDTConfig,
    build_voxel_map,
    ndt_align,
    ndt_score,
)


@pytest.fixture(scope="module")
def scan_pair():
    from scipy.spatial.transform import Rotation

    world = make_world(seed=21, n_landmarks=6000)
    R1 = Rotation.from_euler("ZYX", [0.04, 0.0, 0.0]).as_matrix()
    p1 = np.array([0.5, 0.2, 0.0])
    v = np.zeros(3)
    target = render_radar_scan(world, np.eye(3), np.zeros(3), v, capacity=2048, seed=1)
    source = render_radar_scan(world, R1, p1, v, capacity=2048, seed=2)
    T_true = np.eye(4)
    T_true[:3, :3] = R1
    T_true[:3, 3] = p1
    return source, target, jnp.asarray(T_true)


def test_voxel_map_stats(scan_pair):
    _, target, _ = scan_pair
    vm = build_voxel_map(target, NDTConfig(resolution=2.0, min_points_per_voxel=3))
    v = np.asarray(vm.valid)
    assert v.sum() > 20
    # means of valid voxels are finite and inside the scene
    m = np.asarray(vm.means)[v]
    assert np.all(np.isfinite(m))
    assert np.all(np.abs(m) < 100)


def test_score_better_at_truth(scan_pair):
    source, target, T_true = scan_pair
    cfg = NDTConfig(resolution=2.0, min_points_per_voxel=3)
    vm = build_voxel_map(target, cfg)
    s_true = float(ndt_score(source, vm, T_true, cfg))
    s_id = float(ndt_score(source, vm, jnp.eye(4, dtype=T_true.dtype), cfg))
    assert s_true < s_id  # lower (more negative) is better


@pytest.mark.parametrize("neighborhood", ["direct1", "direct7"])
def test_ndt_align_with_prior(scan_pair, neighborhood):
    """NDT is used with the ego-velocity motion prior in the pipeline (like
    the reference's scan matching); start within ~0.2 m of the truth."""
    source, target, T_true = scan_pair
    cfg = NDTConfig(resolution=2.0, min_points_per_voxel=3, neighborhood=neighborhood)
    T0 = np.asarray(T_true).copy()
    T0[:3, 3] += [0.15, -0.1, 0.05]
    res = ndt_align(source, target, init_T=jnp.asarray(T0), cfg=cfg)
    dT = np.asarray(lie.se3_inverse(res.T) @ T_true)
    trans_err = np.linalg.norm(dT[:3, 3])
    rot_err = float(lie.rotation_geodesic_angle(jnp.asarray(dT[:3, :3]), jnp.eye(3)))
    # NDT is coarser than GICP; 0.15 m / 2 deg on a 2 m grid is healthy
    assert trans_err < 0.15, trans_err
    assert rot_err < np.deg2rad(2.0), rot_err
    # and the prior error must actually shrink
    assert trans_err < 0.19


def test_ndt_d2d_align(scan_pair):
    """D2D NDT (NDTCuda distance-mode parity) recovers the known pose."""
    from gorio_tpu.registration.ndt import ndt_d2d_align

    source, target, T_true = scan_pair
    cfg = NDTConfig(resolution=2.0, min_points_per_voxel=3, neighborhood="direct7")
    res = ndt_d2d_align(source, target, cfg=cfg)
    T = np.asarray(res.T)
    err_t = np.linalg.norm(T[:3, 3] - np.asarray(T_true)[:3, 3])
    err_r = float(lie.rotation_geodesic_angle(jnp.asarray(T[:3, :3]), T_true[:3, :3]))
    assert err_t < 0.2 and err_r < np.deg2rad(2.0)
    # strictly better score than identity
    vm_t = build_voxel_map(target, cfg)
    s_fit = float(res.error)
    assert np.isfinite(s_fit)


def test_ndt_d2d_factory():
    from gorio_tpu.registration import select_registration

    align = select_registration("NDT_CUDA_D2D", resolution=2.0, min_points_per_voxel=3)
    assert callable(align)
