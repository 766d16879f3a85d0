"""Backend vs independent oracle (VERDICT r3 item 4).

`tests/oracle_graph.py` re-implements every edge residual, the robustified
objective, and a dumb dense FD-Jacobian LM from scratch (numpy/scipy only).
These tests assert that the framework's chi2 and optimizers agree with it on
random graphs exercising all 13 reference edge types, and that a saved
`graph.g2o` read back by the oracle's OWN parser optimizes to the same
solution — the same role `tests/oracle_ugpm.py` plays for preintegration.
"""

import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import oracle_graph as og
from gorio_tpu.graph.graph import PoseGraph
from gorio_tpu.graph.solver import (
    SolveConfig,
    graph_chi2,
    optimize_graph,
    optimize_graph_with_planes,
)
from gorio_tpu.graph.sparse import optimize_graph_sparse

import jax.numpy as jnp


def _rand_se3(rng, rot=0.3, trans=1.0):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rng.normal(scale=rot, size=3)).as_matrix()
    T[:3, 3] = rng.normal(scale=trans, size=3)
    return T


def _rand_info(rng, d, scale=10.0):
    A = rng.normal(size=(d, d))
    return A @ A.T + d * np.eye(d) * scale


def build_pose_graph(seed, n=8, robust=False):
    """The same random graph in both representations: (PoseGraph, oracle
    vars+factors). Exercises between, SE3 prior, point priors (XYZ/XY/Z),
    quat prior, vec prior, ground-plane, z-between, and UTM-align factors."""
    rng = np.random.default_rng(seed)
    truth = [np.eye(4)]
    for _ in range(1, n):
        truth.append(truth[-1] @ _rand_se3(rng, 0.2, 1.0))

    g = PoseGraph()
    fac = []
    vars0 = {}
    for k, T in enumerate(truth):
        T0 = T @ _rand_se3(rng, 0.05, 0.15) if k else T
        g.add_pose(T0)
        vars0[f"x{k}"] = T0

    def both(kind, ids, meas, info, delta=math.inf):
        fac.append(og.Factor(kind, ids, meas, og._sqrt_info(info), delta))

    info0 = _rand_info(rng, 6, 1e4)
    g.add_prior(0, truth[0], info=info0)
    both("prior_se3", ("x0",), (truth[0],), info0)

    for k in range(1, n):
        meas = np.linalg.inv(truth[k - 1]) @ truth[k] @ _rand_se3(rng, 0.01, 0.02)
        info = _rand_info(rng, 6)
        rd = 0.5 if (robust and k % 3 == 0) else math.inf
        g.add_between(k - 1, k, meas, info=info, robust_delta=rd)
        both("between", (f"x{k-1}", f"x{k}"), (meas,), info, rd)

    # loop closure with Huber
    meas = np.linalg.inv(truth[0]) @ truth[n - 1]
    info = _rand_info(rng, 6)
    rd = 1.0 if robust else math.inf
    g.add_between(0, n - 1, meas, info=info, robust_delta=rd)
    both("between", ("x0", f"x{n-1}"), (meas,), info, rd)

    # point priors with each axis mask flavor (XYZ / XY / Z)
    for k, axes in ((1, (1, 1, 1)), (3, (1, 1, 0)), (5, (0, 0, 1))):
        p = truth[k][:3, 3] + rng.normal(scale=0.05, size=3)
        info = _rand_info(rng, 3)
        g.add_point_prior(k, p, info=info, axes=axes)
        both("prior_point", (f"x{k}",), (p, np.array(axes, float)), info)

    # quat prior
    Rm = truth[2][:3, :3] @ Rotation.from_rotvec(rng.normal(scale=0.02, size=3)).as_matrix()
    info = _rand_info(rng, 3)
    g.add_quat_prior(2, Rm, info=info)
    both("prior_quat", ("x2",), (Rm,), info)

    # vec prior (gravity-style)
    dw = np.array([0.0, 0.0, 1.0])
    dm = truth[4][:3, :3].T @ dw + rng.normal(scale=0.01, size=3)
    info = _rand_info(rng, 3)
    g.add_vec_prior(4, dw, dm, info=info)
    both("prior_vec", ("x4",), (dw, dm), info)

    # ground-plane unary
    pw = np.array([0.0, 0.0, 1.0, 0.3])
    pm = np.concatenate(
        [truth[6][:3, :3].T @ pw[:3], [pw[:3] @ truth[6][:3, 3] + pw[3]]]
    ) + rng.normal(scale=0.01, size=4)
    info = _rand_info(rng, 4)
    g.add_plane_factor(6, pw, pm, info=info)
    both("ground_plane", ("x6",), (pw, pm), info)

    return g, vars0, fac, truth


def _chi2_of(g, vars0):
    poses0, graph = g.freeze()
    return float(graph_chi2(poses0, graph))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chi2_agreement(seed):
    """Robustified chi2 at the initial guess: framework vs oracle. Random
    dense information matrices mix residual components, so agreement pins
    every residual's value AND ordering convention."""
    g, vars0, fac, _ = build_pose_graph(seed, robust=(seed == 2))
    ours = _chi2_of(g, vars0)
    theirs = og.total_chi2(fac, vars0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


@pytest.mark.parametrize("solver", ["dense", "sparse"])
def test_optimize_matches_oracle(solver):
    """Dense and block-sparse LM land on the oracle's optimum."""
    g, vars0, fac, truth = build_pose_graph(7, n=8)
    poses0, graph = g.freeze()
    if solver == "dense":
        res = optimize_graph(poses0, graph, SolveConfig(max_iterations=100))
    else:
        res = optimize_graph_sparse(
            poses0, graph, SolveConfig(max_iterations=100, cg_iters=200)
        )
    ov, ochi2, _ = og.optimize(vars0, fac, max_iters=150)
    np.testing.assert_allclose(float(res.chi2), ochi2, rtol=1e-5)
    opt = np.asarray(res.poses)
    for k in range(len(truth)):
        np.testing.assert_allclose(
            opt[k][:3, 3], ov[f"x{k}"][:3, 3], atol=2e-4,
            err_msg=f"pose {k} translation",
        )
        dR = og.rot_log(opt[k][:3, :3].T @ ov[f"x{k}"][:3, :3])
        assert np.linalg.norm(dR) < 2e-4, f"pose {k} rotation {dR}"


def test_optimize_matches_oracle_robust():
    """With active Huber kernels (outlier loop included) both solvers still
    agree — validates the IRLS robustification, not just the quadratic path."""
    g, vars0, fac, truth = build_pose_graph(11, n=8, robust=True)
    # an outlier loop that the Huber kernel must down-weight
    bad = np.eye(4)
    bad[:3, 3] = [4.0, -2.0, 1.5]
    info = np.eye(6)
    g.add_between(1, 6, bad, info=info, robust_delta=0.3)
    fac.append(og.Factor("between", ("x1", "x6"), (bad,), og._sqrt_info(info), 0.3))
    poses0, graph = g.freeze()
    res = optimize_graph(poses0, graph, SolveConfig(max_iterations=100))
    ov, ochi2, _ = og.optimize(vars0, fac, max_iters=200)
    np.testing.assert_allclose(float(res.chi2), ochi2, rtol=1e-4)
    opt = np.asarray(res.poses)
    for k in range(len(truth)):
        np.testing.assert_allclose(opt[k][:3, 3], ov[f"x{k}"][:3, 3], atol=5e-4)


def test_plane_joint_solve_matches_oracle():
    """Joint pose+plane optimization with every plane-extension family:
    plane priors (normal + distance), plane-plane identity/parallel/
    perpendicular, SE3-plane observations, z-between, UTM-align."""
    rng = np.random.default_rng(3)
    n = 5
    truth = [np.eye(4)]
    for _ in range(1, n):
        truth.append(truth[-1] @ _rand_se3(rng, 0.15, 0.8))
    g = PoseGraph()
    fac = []
    vars0 = {}
    for k, T in enumerate(truth):
        T0 = T @ _rand_se3(rng, 0.03, 0.1) if k else T
        g.add_pose(T0)
        vars0[f"x{k}"] = T0
    info0 = np.eye(6) * 1e6
    g.add_prior(0, truth[0], info=info0)
    fac.append(og.Factor("prior_se3", ("x0",), (truth[0],), og._sqrt_info(info0)))
    for k in range(1, n):
        meas = np.linalg.inv(truth[k - 1]) @ truth[k]
        info = _rand_info(rng, 6)
        g.add_between(k - 1, k, meas, info=info)
        fac.append(og.Factor("between", (f"x{k-1}", f"x{k}"), (meas,), og._sqrt_info(info)))

    # two plane vertices: ground-ish and a wall-ish
    p_true = [np.array([0.02, -0.01, 1.0, 0.4]), np.array([1.0, 0.05, 0.0, -2.0])]
    for m, p in enumerate(p_true):
        p = p / np.linalg.norm(p[:3])
        p0 = p + rng.normal(scale=0.02, size=4)
        p0[:3] /= np.linalg.norm(p0[:3])
        g.add_plane(p0)
        vars0[f"p{m}"] = p0

    # plane priors: normal on plane 0, distance on plane 1
    info3 = _rand_info(rng, 3)
    nm = p_true[0][:3] / np.linalg.norm(p_true[0][:3])
    g.add_plane_prior_normal(0, nm, info=info3)
    sq = np.zeros((4, 4))
    sq[:3, :3] = og._sqrt_info(info3)
    fac.append(og.Factor("plane_prior", ("p0",), (nm, 0.0), sq))

    dval = -2.0 / np.linalg.norm(p_true[1][:3])
    g.add_plane_prior_distance(1, dval, info=25.0)
    sq = np.zeros((4, 4))
    sq[3, 3] = 5.0
    fac.append(og.Factor("plane_prior", ("p1",), (np.array([0.0, 0, 1.0]), dval), sq))

    # plane-plane: perpendicular(0,1) + parallel(0,0-like pair via identity)
    g.add_plane_perpendicular(0, 1, info=4.0)
    sq = np.zeros((4, 4))
    sq[0, 0] = 2.0
    fac.append(og.Factor("plane_plane", ("p0", "p1"), (2, np.zeros(4)), sq))

    # se3-plane: poses 1 and 3 observe plane 0
    for k in (1, 3):
        pw = p_true[0] / np.linalg.norm(p_true[0][:3])
        n_b = truth[k][:3, :3].T @ pw[:3]
        d_b = pw[3] + pw[:3] @ truth[k][:3, 3]
        pm = np.concatenate([n_b, [d_b]]) + rng.normal(scale=0.005, size=4)
        pm[:3] /= np.linalg.norm(pm[:3])
        info = _rand_info(rng, 3)
        g.add_se3_plane(k, 0, pm, info=info)
        fac.append(og.Factor("se3_plane", (f"x{k}", "p0"), (pm,), og._sqrt_info(info)))

    # z-between + utm
    z = truth[3][2, 3] - truth[1][2, 3] + 0.01
    g.add_se3_z(1, 3, z, info=50.0)
    fac.append(og.Factor("z_between", ("x1", "x3"), (z,), [[math.sqrt(50.0)]]))
    pu = rng.normal(size=3)
    pw_ = truth[2][:3, :3] @ pu + truth[2][:3, 3] + rng.normal(scale=0.01, size=3)
    info = _rand_info(rng, 3)
    g.add_utm_align(2, pu, pw_, info=info)
    fac.append(og.Factor("utm", ("x2",), (pu, pw_), og._sqrt_info(info)))

    poses0, graph = g.freeze()
    planes0, pg = g.freeze_planes()
    res = optimize_graph_with_planes(
        poses0, jnp.asarray(planes0), graph, pg, SolveConfig(max_iterations=120)
    )
    ov, ochi2, _ = og.optimize(vars0, fac, max_iters=200)
    np.testing.assert_allclose(float(res.chi2), ochi2, rtol=1e-4)
    opt = np.asarray(res.poses)
    for k in range(n):
        np.testing.assert_allclose(opt[k][:3, 3], ov[f"x{k}"][:3, 3], atol=5e-4)
    opl = np.asarray(res.planes)
    for m in range(2):
        # sign-invariant plane comparison
        a, b = opl[m], ov[f"p{m}"]
        if a[:3] @ b[:3] < 0:
            b = -b
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_g2o_file_roundtrip_through_oracle_parser(tmp_path):
    """Save graph.g2o with the framework, read it back with the oracle's OWN
    parser (independent format interpretation incl. the [trans,rot] info
    permutation and the Huber sidecar), optimize both, compare. This is the
    cross-check `graph/graph.py:8-9` promises against g2o itself."""
    rng = np.random.default_rng(21)
    n = 7
    truth = [np.eye(4)]
    for _ in range(1, n):
        truth.append(truth[-1] @ _rand_se3(rng, 0.25, 1.2))
    g = PoseGraph()
    for k, T in enumerate(truth):
        g.add_pose(T @ _rand_se3(rng, 0.04, 0.1) if k else T)
    g.add_prior(0, truth[0], info=np.eye(6) * 1e6)
    for k in range(1, n):
        meas = np.linalg.inv(truth[k - 1]) @ truth[k] @ _rand_se3(rng, 0.01, 0.02)
        g.add_between(k - 1, k, meas, info=_rand_info(rng, 6))
    g.add_between(0, n - 1, np.linalg.inv(truth[0]) @ truth[n - 1],
                  info=_rand_info(rng, 6), robust_delta=0.8)

    path = tmp_path / "graph.g2o"
    g.save(path)
    vars0, fac = og.parse_g2o(path)
    assert len(vars0) == n
    assert len(fac) == n + 1  # n-1 odometry + 1 loop + 1 prior
    assert sum(1 for f in fac if math.isfinite(f.delta)) == 1

    poses0, graph = g.freeze()
    np.testing.assert_allclose(
        float(graph_chi2(poses0, graph)), og.total_chi2(fac, vars0), rtol=1e-7
    )
    res = optimize_graph(poses0, graph, SolveConfig(max_iterations=100))
    ov, ochi2, _ = og.optimize(vars0, fac, max_iters=150)
    np.testing.assert_allclose(float(res.chi2), ochi2, rtol=1e-5)
    opt = np.asarray(res.poses)
    for k in range(n):
        np.testing.assert_allclose(opt[k][:3, 3], ov[f"x{k}"][:3, 3], atol=5e-4)
