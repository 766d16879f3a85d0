"""Pose-graph solver tests: odometry chain with loop closure, GPS priors,
robust kernels, save/load round-trip, Laplace covariance sanity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gorio_tpu.core import lie
from gorio_tpu.graph.graph import PoseGraph
from gorio_tpu.graph.solver import SolveConfig, laplace_covariance, optimize_graph


def _random_se3(rng, rot_scale=0.2, trans_scale=1.0):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rng.normal(scale=rot_scale, size=3)).as_matrix()
    T[:3, 3] = rng.normal(scale=trans_scale, size=3)
    return T


def _chain_truth(n, rng):
    """Ground-truth poses along a noisy circular path."""
    poses = [np.eye(4)]
    for k in range(1, n):
        step = np.eye(4)
        step[:3, :3] = Rotation.from_euler("z", 2 * np.pi / n).as_matrix()
        step[:3, 3] = [1.0, 0.05 * rng.normal(), 0.0]
        poses.append(poses[-1] @ step)
    return poses


def _rel(Ta, Tb):
    return np.linalg.inv(Ta) @ Tb


def test_chain_with_loop_closure():
    rng = np.random.default_rng(0)
    n = 20
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    # noisy initial guesses from corrupted odometry
    noisy = [truth[0]]
    for k in range(1, n):
        odo = _rel(truth[k - 1], truth[k])
        noise = np.eye(4)
        noise[:3, :3] = Rotation.from_rotvec(rng.normal(scale=0.01, size=3)).as_matrix()
        noise[:3, 3] = rng.normal(scale=0.03, size=3)
        noisy.append(noisy[-1] @ odo @ noise)
        g.add_between(k - 1, k, odo @ noise, info=np.eye(6) * 100.0)
    for T in noisy:
        g.add_pose(T)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    # loop closure: exact relative pose between 0 and n-1 with high info
    g.add_between(0, n - 1, _rel(truth[0], truth[n - 1]), info=np.eye(6) * 1e4)

    poses0, graph = g.freeze()
    res = optimize_graph(poses0, graph, SolveConfig())
    opt = np.asarray(res.poses)
    # end pose must snap to truth thanks to the loop closure
    end_err = np.linalg.norm(opt[n - 1][:3, 3] - truth[n - 1][:3, 3])
    init_err = np.linalg.norm(noisy[n - 1][:3, 3] - truth[n - 1][:3, 3])
    assert end_err < 0.02
    assert end_err < init_err * 0.5
    assert float(res.chi2) < 100.0


def test_gps_point_priors_pin_trajectory():
    rng = np.random.default_rng(1)
    n = 12
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for k, T in enumerate(truth):
        # corrupt initializations
        g.add_pose(T @ _random_se3(rng, 0.05, 0.3))
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 10.0)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    # GPS XY priors every 3 frames (parity: EdgeSE3PriorXY flush_gps_queue)
    for k in range(0, n, 3):
        g.add_point_prior(k, truth[k][:3, 3], info=np.eye(3) * 100.0, axes=(1, 1, 0))
    poses0, graph = g.freeze()
    res = optimize_graph(poses0, graph)
    opt = np.asarray(res.poses)
    err = np.linalg.norm(opt[:, :2, 3] - np.stack(truth)[:, :2, 3], axis=-1)
    assert np.max(err) < 0.05


def test_robust_kernel_rejects_bad_loop():
    rng = np.random.default_rng(2)
    n = 15
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        g.add_pose(T)
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 100.0)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    # wildly wrong loop closure with Huber (loop info comparable to a single
    # odometry edge, as InformationMatrixCalculator would assign from fitness)
    bad = np.eye(4)
    bad[:3, 3] = [5.0, -3.0, 1.0]
    g.add_between(2, 12, bad, info=np.eye(6) * 1.0, robust_delta=0.1)
    poses0, graph = g.freeze()
    res = optimize_graph(poses0, graph)
    opt = np.asarray(res.poses)
    err = np.linalg.norm(opt[:, :3, 3] - np.stack(truth)[:, :3, 3], axis=-1)
    # huber bounds the bad edge's influence: trajectory stays near truth
    assert np.max(err) < 0.2
    # without robustification it would be dragged much further
    g2 = PoseGraph()
    for T in truth:
        g2.add_pose(T)
    for k in range(1, n):
        g2.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 100.0)
    g2.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    g2.add_between(2, 12, bad, info=np.eye(6) * 1.0)
    p0, gd = g2.freeze()
    res2 = optimize_graph(p0, gd)
    err2 = np.linalg.norm(np.asarray(res2.poses)[:, :3, 3] - np.stack(truth)[:, :3, 3], axis=-1)
    assert np.max(err2) > np.max(err)


def test_laplace_covariance_grows_along_chain():
    rng = np.random.default_rng(3)
    n = 10
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        g.add_pose(T)
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 100.0)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    poses0, graph = g.freeze()
    res = optimize_graph(poses0, graph)
    cov = np.asarray(laplace_covariance(res))
    tr = [np.trace(cov[6 * k : 6 * k + 6, 6 * k : 6 * k + 6]) for k in range(n)]
    assert tr[1] < tr[5] < tr[9]  # uncertainty accumulates away from the anchor


def test_cg_matches_dense():
    rng = np.random.default_rng(4)
    n = 12
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        g.add_pose(T @ _random_se3(rng, 0.03, 0.1))
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 50.0)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    poses0, graph = g.freeze()
    dense = optimize_graph(poses0, graph, SolveConfig(solver="dense"))
    cg = optimize_graph(poses0, graph, SolveConfig(solver="cg", cg_iters=200))
    np.testing.assert_allclose(
        np.asarray(dense.poses[:, :3, 3]), np.asarray(cg.poses[:, :3, 3]), atol=1e-3
    )


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n = 6
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        g.add_pose(T)
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.diag([1.0, 2, 3, 4, 5, 6]))
    path = tmp_path / "graph.g2o"
    g.save(path)
    g2 = PoseGraph.load(path)
    assert len(g2.poses) == n
    assert len(g2._between) == n - 1
    for (a, b) in zip(g.poses, g2.poses):
        np.testing.assert_allclose(a, b, atol=1e-9)
    for (ea, eb) in zip(g._between, g2._between):
        np.testing.assert_allclose(ea[2], eb[2], atol=1e-9)  # T_meas
        np.testing.assert_allclose(ea[3].T @ ea[3], eb[3].T @ eb[3], atol=1e-9)  # info


def test_save_load_robust_kernels_and_priors(tmp_path):
    """Robust-kernel sidecar + GORIO_PRIOR_SE3 round trip (parity:
    `robust_kernel_io.cpp` save/load)."""
    import math

    rng = np.random.default_rng(6)
    n = 5
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        g.add_pose(T)
    for k in range(1, n):
        delta = 0.5 if k == 2 else math.inf  # one robustified loop-like edge
        g.add_between(
            k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 3.0, robust_delta=delta
        )
    g.add_prior(0, truth[0], info=np.diag([9.0, 9, 9, 4, 4, 4]), robust_delta=1.5)
    path = tmp_path / "graph.g2o"
    g.save(path)
    assert (tmp_path / "graph.g2o.kernels").exists()
    g2 = PoseGraph.load(path)
    assert [e[4] for e in g2._between] == [e[4] for e in g._between]
    assert len(g2._priors) == 1
    i, T, sq, rd = g2._priors[0]
    assert i == 0 and rd == 1.5
    np.testing.assert_allclose(T, truth[0], atol=1e-9)
    np.testing.assert_allclose(sq.T @ sq, np.diag([9.0, 9, 9, 4, 4, 4]), atol=1e-9)
    # optimizing the reloaded graph reproduces the original solve
    p0, gd = g.freeze()
    p1, gd2 = g2.freeze()
    r0 = optimize_graph(p0, gd)
    r1 = optimize_graph(p1, gd2)
    np.testing.assert_allclose(np.asarray(r0.poses), np.asarray(r1.poses), atol=1e-8)


def test_vec_and_plane_factors():
    """Gravity direction + ground-plane factors constrain roll/pitch/z."""
    rng = np.random.default_rng(7)
    n = 8
    truth = _chain_truth(n, rng)
    g = PoseGraph()
    for T in truth:
        # corrupt roll/pitch/z badly
        noise = np.eye(4)
        noise[:3, :3] = Rotation.from_euler("XY", rng.normal(scale=0.1, size=2)).as_matrix()
        noise[2, 3] = rng.normal(scale=0.3)
        g.add_pose(T @ noise)
    for k in range(1, n):
        g.add_between(k - 1, k, _rel(truth[k - 1], truth[k]), info=np.eye(6) * 1.0)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    for k in range(n):
        R = truth[k][:3, :3]
        t = truth[k][:3, 3]
        # gravity (world z) observed in body frame
        g.add_vec_prior(k, [0, 0, 1.0], R.T @ np.array([0, 0, 1.0]), info=np.eye(3) * 100.0)
        # ground plane z = -0.7 observed in body frame
        n_w = np.array([0, 0, 1.0]); d_w = 0.7
        plane_meas = np.concatenate([R.T @ n_w, [n_w @ t + d_w]])
        g.add_plane_factor(k, [0, 0, 1.0, 0.7], plane_meas, info=np.eye(4) * 100.0)
    p0, gd = g.freeze()
    res = optimize_graph(p0, gd)
    opt = np.asarray(res.poses)
    # z error and tilt must be corrected
    z_err = np.abs(opt[:, 2, 3] - np.stack(truth)[:, 2, 3])
    assert np.max(z_err) < 0.05, z_err
    for k in range(n):
        tilt = np.arccos(np.clip((opt[k][:3, :3].T @ truth[k][:3, :3]).trace() / 2 - 0.5, -1, 1))
        assert tilt < 0.05
