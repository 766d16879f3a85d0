"""Plane-vertex factor graph: parity with the reference's g2o VertexPlane
edges (`include/g2o/edge_plane_*.hpp`, `edge_se3_plane.hpp`, `edge_se3_z.hpp`,
`edge_se3_gt_utm.hpp`; registered in `graph_slam.cpp:37-51`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gorio_tpu.core import lie
from gorio_tpu.graph.factors import (
    PlanePlaneFactors,
    SE3PlaneFactors,
    plane_tangent_basis,
    retract_plane,
    transform_plane,
)
from gorio_tpu.graph.graph import PoseGraph
from gorio_tpu.graph.solver import (
    SolveConfig,
    optimize_graph_with_planes,
    plane_graph_chi2,
)

RNG = np.random.default_rng(7)


def _rand_plane():
    n = RNG.normal(size=3)
    n /= np.linalg.norm(n)
    return np.concatenate([n, RNG.normal(size=1)])


def _rand_pose(scale=1.0):
    xi = RNG.normal(size=6) * scale
    return np.asarray(lie.se3_exp_split(jnp.asarray(xi)))


def test_retract_plane_chart():
    """retract keeps |n| = 1, is identity at 0, and the tangent basis is
    orthonormal and orthogonal to n."""
    p = jnp.asarray(_rand_plane())
    B = plane_tangent_basis(p[:3])
    np.testing.assert_allclose(np.asarray(B.T @ B), np.eye(2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.T @ p[:3]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(retract_plane(p, jnp.zeros(3))), np.asarray(p), atol=1e-12)
    q = retract_plane(p, jnp.asarray([0.3, -0.2, 0.5]))
    assert abs(float(jnp.linalg.norm(q[:3])) - 1.0) < 1e-12
    assert abs(float(q[3] - p[3]) - 0.5) < 1e-12


def test_transform_plane_consistency():
    """A point on the world plane stays on the body-frame plane."""
    T = jnp.asarray(_rand_pose())
    pw = jnp.asarray(_rand_plane())
    # world point on the plane
    x_w = -pw[3] * pw[:3] + plane_tangent_basis(pw[:3]) @ jnp.asarray([0.7, -1.3])
    assert abs(float(pw[:3] @ x_w + pw[3])) < 1e-12
    x_b = lie.se3_inverse(T) @ jnp.concatenate([x_w, jnp.ones(1)])
    pb = transform_plane(T, pw)
    assert abs(float(pb[:3] @ x_b[:3] + pb[3])) < 1e-10


def test_plane_prior_pulls_to_measurement():
    """EdgePlanePriorNormal + Distance: a lone plane vertex converges to the
    measured normal and offset."""
    g = PoseGraph()
    g.add_pose(np.eye(4))
    g.add_prior(0, np.eye(4), 1e6)
    j = g.add_plane([1.0, 0.2, 0.1, 0.0])
    n_meas = np.array([0.0, 0.0, 1.0])
    g.add_plane_prior_normal(j, n_meas, 100.0)
    g.add_plane_prior_distance(j, -1.5, 100.0)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(poses0, planes0, graph, pg)
    p = np.asarray(res.planes[0])
    np.testing.assert_allclose(np.abs(p[:3]), n_meas, atol=1e-6)
    assert abs(p[3] - (-1.5)) < 1e-6


def test_plane_plane_parallel_and_perpendicular():
    """EdgePlaneParallel aligns the normals; EdgePlanePerpendicular drives
    n_i . n_j to zero (`edge_plane_parallel.hpp:44-57,106-115`)."""
    g = PoseGraph()
    g.add_pose(np.eye(4))
    g.add_prior(0, np.eye(4), 1e6)
    a = g.add_plane([0.0, 0.1, 1.0, 0.0])
    b = g.add_plane([0.15, -0.1, 1.0, 2.0])
    c = g.add_plane([1.0, 0.0, 0.3, 1.0])
    # pin a, pull b parallel to a and c perpendicular to a
    g.add_plane_prior_normal(a, [0.0, 0.0, 1.0], 1e4)
    g.add_plane_prior_distance(a, 0.0, 1e4)
    g.add_plane_parallel(a, b, np.zeros(3), 100.0)
    g.add_plane_perpendicular(a, c, 100.0)
    # keep the free planes' offsets observable
    g.add_plane_prior_distance(b, 2.0, 1.0)
    g.add_plane_prior_distance(c, 1.0, 1.0)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(poses0, planes0, graph, pg)
    pa, pb, pc = np.asarray(res.planes)
    assert abs(abs(pa[:3] @ pb[:3]) - 1.0) < 1e-4, (pa, pb)
    assert abs(pa[:3] @ pc[:3]) < 1e-4, (pa, pc)


def test_plane_identity_edge():
    """EdgePlaneIdentity with zero measurement merges two plane estimates."""
    g = PoseGraph()
    g.add_pose(np.eye(4))
    g.add_prior(0, np.eye(4), 1e6)
    a = g.add_plane([0.0, 0.05, 1.0, 0.3])
    b = g.add_plane([0.1, 0.0, 1.0, -0.4])
    g.add_plane_identity(a, b, np.zeros(4), 100.0)
    g.add_plane_prior_normal(a, [0.0, 0.0, 1.0], 1.0)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(poses0, planes0, graph, pg)
    pa, pb = np.asarray(res.planes)
    np.testing.assert_allclose(pa, pb, atol=1e-5)


def test_se3_plane_joint_estimation():
    """EdgeSE3Plane: poses observing one world ground plane recover both the
    plane and their drifted heights (the floor-constraint use case)."""
    true_plane = np.array([0.0, 0.0, 1.0, 0.7])  # z = -0.7
    K = 6
    g = PoseGraph()
    true_poses = []
    for k in range(K):
        T = np.eye(4)
        T[:3, 3] = [k * 1.0, 0.1 * k, 0.0]
        true_poses.append(T)
        T0 = T.copy()
        T0[2, 3] += RNG.normal() * 0.3  # corrupt heights
        g.add_pose(T0)
    g.add_prior(0, true_poses[0], 1e6)
    for k in range(K - 1):
        T_rel = np.linalg.inv(true_poses[k]) @ true_poses[k + 1]
        info = np.diag([1e4, 1e4, 1e4, 1e4, 1e4, 1e-6])  # weak on z (rot-first order)
        g.add_between(k, k + 1, T_rel, info)
    j = g.add_plane(true_plane + np.array([0.02, -0.01, 0.0, 0.1]))
    for k in range(K):
        pm = np.asarray(transform_plane(jnp.asarray(true_poses[k]), jnp.asarray(true_plane)))
        g.add_se3_plane(k, j, pm, 100.0)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(
        poses0, planes0, graph, pg, SolveConfig(max_iterations=100)
    )
    plane = np.asarray(res.planes[0])
    np.testing.assert_allclose(plane, true_plane, atol=1e-4)
    z_err = np.abs(np.asarray(res.poses)[:, 2, 3] - 0.0)
    assert np.max(z_err) < 1e-3, z_err


def test_se3_z_edge():
    """EdgeSE3Z constrains only relative altitude (`edge_se3_z.hpp:44-50`)."""
    g = PoseGraph()
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [1.0, 0.0, 0.9]  # wrong z (true is 0.4)
    g.add_pose(T0)
    g.add_pose(T1)
    g.add_prior(0, T0, 1e6)
    g.add_point_prior(1, [1.0, 0.0, 0.0], 100.0, axes=(1, 1, 0))
    g.add_se3_z(0, 1, 0.4, 1e4)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(poses0, planes0, graph, pg)
    assert abs(float(res.poses[1, 2, 3]) - 0.4) < 1e-5


def test_utm_align_recovers_transform():
    """EdgeSE3GtUTM: estimating the utm->world transform from point pairs —
    the `gps_traj_align` workflow (`src/gps_traj_align.cpp`)."""
    T_true = np.asarray(
        lie.se3_exp_split(jnp.asarray([0.0, 0.0, 0.8, 10.0, -4.0, 0.5]))
    )
    pts_utm = RNG.normal(size=(12, 3)) * 20.0
    pts_world = pts_utm @ T_true[:3, :3].T + T_true[:3, 3]
    g = PoseGraph()
    g.add_pose(np.eye(4))
    for pu, pw in zip(pts_utm, pts_world):
        g.add_utm_align(0, pu, pw, 1.0)
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(
        poses0, planes0, graph, pg, SolveConfig(max_iterations=100)
    )
    np.testing.assert_allclose(np.asarray(res.poses[0]), T_true, atol=1e-6)


def test_plane_graph_save_load_roundtrip(tmp_path):
    """g2o-format persistence of plane vertices + extension edges."""
    g = PoseGraph()
    g.add_pose(np.eye(4))
    g.add_pose(_rand_pose(0.1))
    g.add_between(0, 1, _rand_pose(0.1), np.eye(6))
    j = g.add_plane([0.0, 0.0, 1.0, 0.5])
    g.add_plane_prior_normal(j, [0.0, 0.0, 1.0], 10.0)
    g.add_plane_prior_distance(j, 0.5, 5.0)
    k = g.add_plane([1.0, 0.0, 0.0, 0.0])
    g.add_plane_parallel(j, k, np.zeros(3), 2.0)
    g.add_plane_perpendicular(j, k, 3.0)
    g.add_plane_identity(j, k, np.zeros(4), 1.0)
    g.add_se3_plane(0, j, [0.0, 0.0, 1.0, 0.5], np.diag([1.0, 2.0, 3.0]))
    g.add_se3_z(0, 1, 0.25, 4.0)
    g.add_utm_align(0, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0], 2.0)
    path = tmp_path / "graph.g2o"
    g.save(path)
    g2 = PoseGraph.load(path)
    assert len(g2.planes) == 2
    np.testing.assert_allclose(g2.planes[0], g.planes[0], atol=1e-12)
    assert len(g2._plane_priors) == 2
    assert len(g2._plane_plane) == 3
    assert [f[2] for f in g2._plane_plane] == [1, 2, 0]
    assert len(g2._se3_plane) == 1 and g2._se3_plane[0][:2] == (0, 0)
    assert len(g2._z_between) == 1 and abs(g2._z_between[0][2] - 0.25) < 1e-12
    assert len(g2._utm_align) == 1
    # chi2 of the loaded graph matches the original
    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    poses1, graph1 = g2.freeze()
    planes1, pg1 = g2.freeze_planes()
    c0 = float(plane_graph_chi2(poses0, planes0, pg))
    c1 = float(plane_graph_chi2(poses1, planes1, pg1))
    assert math.isclose(c0, c1, rel_tol=1e-9), (c0, c1)


def test_plane_plane_switch_residuals_directly():
    """Residual semantics vs the reference formulas, including sign fixes."""
    pi = jnp.asarray([0.0, 0.0, 1.0, 0.2])
    pj = jnp.asarray([0.0, 0.0, -1.0, -0.3])  # flipped representation
    # identity: pj sign-fixed to +z, so error = (0.3-0.2) on d with zero meas
    r = PlanePlaneFactors.residual(pi, pj, jnp.asarray(0), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(r), [0, 0, 0, 0.1], atol=1e-12)
    # parallel: normals identical after sign fix
    r = PlanePlaneFactors.residual(pi, pj, jnp.asarray(1), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    # perpendicular: cos angle = 0 for orthogonal normals
    pk = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    r = PlanePlaneFactors.residual(pi, pk, jnp.asarray(2), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
    # se3-plane: zero residual when the measurement matches exactly
    T = jnp.asarray(_rand_pose())
    pw = jnp.asarray(_rand_plane())
    pm = transform_plane(T, pw)
    r = SE3PlaneFactors.residual(T, pw, pm)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def test_plane_edge_robust_kernel_roundtrip(tmp_path):
    """Huber deltas on plane-extension edges survive save/load via the
    .kernels sidecar (regression: they were silently dropped)."""
    g = PoseGraph()
    g.add_pose(np.eye(4))
    j = g.add_plane([0.0, 0.0, 1.0, 0.5])
    g.add_se3_plane(0, j, [0.0, 0.0, 1.0, 0.5], 10.0, robust_delta=1.0)
    g.add_plane_prior_normal(j, [0.0, 0.0, 1.0], 5.0, robust_delta=2.0)
    g.add_se3_z(0, 0, 0.0, 1.0, robust_delta=0.5)
    g.add_utm_align(0, [1, 2, 3], [1, 2, 3], 1.0, robust_delta=3.0)
    path = tmp_path / "graph.g2o"
    g.save(path)
    g2 = PoseGraph.load(path)
    assert g2._se3_plane[0][-1] == 1.0
    assert g2._plane_priors[0][-1] == 2.0
    assert g2._z_between[0][-1] == 0.5
    assert g2._utm_align[0][-1] == 3.0
