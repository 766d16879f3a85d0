"""Registration tests: the reference's "two scans + known relative pose"
fixture (`fast_apdgicp/src/test/gicp_test.cpp:149-196`) rebuilt on synthetic
radar scans: forward, backward and swapped alignments must recover the truth
within 0.05 m / 1 deg."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from gorio_tpu.core import lie
from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.io.synthetic import make_world, render_radar_scan
from gorio_tpu.registration.gicp import (
    GICPConfig,
    fitness_score,
    gicp_align,
    knn_covariances,
)
from gorio_tpu.registration.knn import knn, nn1

TRANS_TOL = 0.05  # m, `gicp_test.cpp:150`
ROT_TOL = np.deg2rad(1.0)  # `gicp_test.cpp:151`


@pytest.fixture(scope="module")
def scan_pair():
    world = make_world(seed=11, n_landmarks=6000)
    R0, p0 = np.eye(3), np.zeros(3)
    from scipy.spatial.transform import Rotation

    R1 = Rotation.from_euler("ZYX", [0.06, 0.01, -0.005]).as_matrix()
    p1 = np.array([0.6, 0.25, 0.02])
    v = np.array([2.0, 0.3, 0.0])
    target = render_radar_scan(world, R0, p0, v, capacity=2048, seed=1, dropout=0.15)
    source = render_radar_scan(world, R1, p1, v, capacity=2048, seed=2, dropout=0.15)
    # ground truth T maps source points (frame 1) into target frame (frame 0)
    T_true = np.eye(4)
    T_true[:3, :3] = R0.T @ R1
    T_true[:3, 3] = R0.T @ (p1 - p0)
    return source, target, jnp.asarray(T_true)


def _errors(T_est, T_true):
    dT = np.asarray(lie.se3_inverse(T_est) @ T_true)
    trans_err = np.linalg.norm(dT[:3, 3])
    rot_err = float(lie.rotation_geodesic_angle(jnp.asarray(dT[:3, :3]), jnp.eye(3)))
    return trans_err, rot_err


def test_nn_vs_scipy():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(500, 3))
    q = rng.normal(size=(300, 3))
    idx, d2 = nn1(jnp.asarray(q), jnp.asarray(ref))
    tree = cKDTree(ref)
    d_ref, i_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), d_ref, atol=1e-10)

    idx_k, d2_k = knn(jnp.asarray(q), jnp.asarray(ref), 8)
    d_ref8, i_ref8 = tree.query(q, k=8)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2_k)), d_ref8, atol=1e-10)


def test_nn_respects_mask():
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(100, 3))
    mask = jnp.arange(100) < 50
    q = jnp.asarray(ref[60:70])  # nearest would be themselves, but masked out
    idx, _ = nn1(q, jnp.asarray(ref), ref_mask=mask)
    assert np.all(np.asarray(idx) < 50)


def test_knn_covariances_plane():
    # points on a plane -> smallest eigenvalue ~ plane_eps after regularization
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(256, 3))
    pts[:, 2] = 0.01 * pts[:, 2]
    cloud = make_cloud(pts)
    cov, geo = knn_covariances(cloud.xyz, cloud.mask, k=10)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    np.testing.assert_allclose(evals[:, 0], 1e-3, rtol=1e-5)
    np.testing.assert_allclose(evals[:, 2], 1.0, rtol=1e-5)
    assert np.all(np.asarray(geo) >= 0)


@pytest.mark.parametrize("mode", ["gicp", "apdgicp"])
def test_align_forward(scan_pair, mode):
    source, target, T_true = scan_pair
    cfg = GICPConfig(mode=mode)
    res = gicp_align(source, target, cfg=cfg)
    trans_err, rot_err = _errors(res.T, T_true)
    assert bool(res.converged), f"not converged after {int(res.iterations)} iters"
    assert trans_err < TRANS_TOL, trans_err
    assert rot_err < ROT_TOL, rot_err


def test_align_backward(scan_pair):
    source, target, T_true = scan_pair
    res = gicp_align(target, source, cfg=GICPConfig())
    trans_err, rot_err = _errors(res.T, lie.se3_inverse(T_true))
    assert trans_err < TRANS_TOL
    assert rot_err < ROT_TOL


def test_align_with_motion_prior(scan_pair):
    """With the ego-velocity guess (the odometry path) alignment should
    converge in far fewer iterations."""
    source, target, T_true = scan_pair
    res_cold = gicp_align(source, target, cfg=GICPConfig())
    res_warm = gicp_align(source, target, init_T=T_true, cfg=GICPConfig())
    assert int(res_warm.iterations) <= int(res_cold.iterations)
    trans_err, rot_err = _errors(res_warm.T, T_true)
    assert trans_err < TRANS_TOL and rot_err < ROT_TOL


def test_fitness_score(scan_pair):
    source, target, T_true = scan_pair
    good, _ = fitness_score(source, target, T_true)
    bad, _ = fitness_score(source, target, jnp.eye(4, dtype=T_true.dtype))
    assert float(good) < float(bad)
    assert float(good) < 0.05


def test_component_linearize_matches_reference():
    """The component-form linearize (closed-form APD cov + symmetric inverse
    + (C,N) matvec reduction) must equal the straightforward (N,3,3) einsum
    formulation bit-for-bit in f64 — both modes, at a non-trivial pose."""
    import jax

    from gorio_tpu.core.pointcloud import random_cloud
    from gorio_tpu.registration.gicp import (
        GICPConfig,
        make_gicp_callbacks,
        make_gicp_callbacks_reference,
        prepare_gicp,
    )

    tgt = random_cloud(jax.random.PRNGKey(3), 500, capacity=512)
    src = tgt._replace(xyz=tgt.xyz + jnp.asarray([0.3, -0.1, 0.05]))
    T = jnp.asarray(
        np.block([
            [np.asarray(
                __import__("scipy.spatial.transform", fromlist=["Rotation"])
                .Rotation.from_euler("zyx", [0.05, -0.02, 0.01]).as_matrix()),
             np.array([[0.2], [-0.1], [0.3]])],
            [np.zeros((1, 3)), np.ones((1, 1))],
        ])
    )
    for mode in ("apdgicp", "gicp"):
        cfg = GICPConfig(mode=mode)
        prob = prepare_gicp(src, tgt, cfg)
        lin_fast, err_fast = make_gicp_callbacks(prob, cfg)
        lin_ref, err_ref = make_gicp_callbacks_reference(prob, cfg)
        c_f, H_f, b_f, aux_f = jax.jit(lin_fast)(T)
        c_r, H_r, b_r, aux_r = jax.jit(lin_ref)(T)
        np.testing.assert_allclose(float(c_f), float(c_r), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_r), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_r), rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(aux_f[0]), np.asarray(aux_r[0]))
        np.testing.assert_allclose(np.asarray(aux_f[2]), np.asarray(aux_r[2]), rtol=1e-9, atol=1e-12)
        # compute_error sees the same cost through the aux path
        np.testing.assert_allclose(
            float(jax.jit(err_fast)(T, aux_f)), float(jax.jit(err_ref)(T, aux_r)), rtol=1e-10
        )
