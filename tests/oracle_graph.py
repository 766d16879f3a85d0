"""Independent f64 numpy oracle for the pose-graph backend.

VERDICT r3 item 4: `graph/solver.py` + `graph/sparse.py` were validated only
against each other and against goldens produced by the same code. This module
re-implements the factor-graph MODEL from scratch in plain numpy/scipy — no
code, Lie helpers, or autodiff shared with `gorio_tpu` — playing the role g2o
plays for the reference (`graph_slam.cpp:353-382` + the custom edges in
`/root/reference/4DRadarSLAM/include/g2o/*.hpp`):

  residuals : direct numpy transcriptions of each edge's error definition
              (e.g. EdgeSE3PriorXYZ error = t - m, `edge_se3_priorxyz.hpp:
              35-46`; EdgeSE3Z error = (z_j - z_i) - m, `edge_se3_z.hpp:44-50`)
  Jacobians : central finite differences over the local chart (no autodiff)
  solve     : dense IRLS Levenberg-Marquardt over stacked [pose | plane]
              local coordinates, scipy Cholesky

Rotations go through `scipy.spatial.transform.Rotation`; the SE(3) log's
V^{-1} term is the textbook closed form. Agreement of `optimize_graph` /
`optimize_graph_sparse` / `optimize_graph_with_planes` with this oracle
validates residual conventions, information weighting, robust kernels, and
the normal-equation assembly against an implementation that shares nothing
but the model definition.

The oracle also carries its own minimal g2o-text parser (`parse_g2o`) so a
saved `graph.g2o` can be read and optimized without touching
`PoseGraph.load` — breaking the backend's self-referential persistence loop.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.spatial.transform import Rotation


# ---------------------------------------------------------------------------
# SE(3) primitives (scipy-based; independent of gorio_tpu.core.lie)
# ---------------------------------------------------------------------------


def rot_exp(r):
    return Rotation.from_rotvec(np.asarray(r, float)).as_matrix()


def rot_log(R):
    return Rotation.from_matrix(np.asarray(R, float)).as_rotvec()


def se3_log(T):
    """Full SE(3) log, returned [rot, trans] to match the framework's residual
    ordering (the information matrices are expressed in that order)."""
    r = rot_log(T[:3, :3])
    th2 = float(r @ r)
    th = math.sqrt(th2)
    rx = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0.0]])
    if th < 1e-8:
        c = 1.0 / 12.0 + th2 / 720.0
    else:
        c = 1.0 / th2 - (1.0 + math.cos(th)) / (2.0 * th * math.sin(th))
    Vinv = np.eye(3) - 0.5 * rx + c * (rx @ rx)
    return np.concatenate([r, Vinv @ T[:3, 3]])


def se3_inv(T):
    out = np.eye(4)
    out[:3, :3] = T[:3, :3].T
    out[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return out


def retract_pose(T, d):
    """Right-multiplicative chart T . [exp(d_rot), d_trans] (the framework's
    state convention; chart choice does not affect the optimum)."""
    D = np.eye(4)
    D[:3, :3] = rot_exp(d[:3])
    D[:3, 3] = d[3:]
    return T @ D


def tangent_basis(n):
    """(3,2) orthonormal basis of the tangent plane of S^2 at n."""
    e = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    b1 = np.cross(n, e)
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(n, b1)
    return np.stack([b1, b2], axis=1)


def retract_plane(p, d):
    n = p[:3] + tangent_basis(p[:3]) @ d[:2]
    n /= np.linalg.norm(n)
    return np.concatenate([n, [p[3] + d[2]]])


# ---------------------------------------------------------------------------
# Edge residuals — one function per reference edge type
# ---------------------------------------------------------------------------


def r_between(Ti, Tj, meas):
    """g2o::EdgeSE3 (`graph_slam.cpp:125`)."""
    return se3_log(se3_inv(meas) @ se3_inv(Ti) @ Tj)


def r_prior_se3(Ti, meas):
    """Anchor prior (`radar_graph_slam_nodelet.cpp:566-579`)."""
    return se3_log(se3_inv(meas) @ Ti)


def r_prior_point(Ti, p, axis_mask):
    """EdgeSE3PriorXYZ/XY/Z: error = t - m (`edge_se3_priorxyz.hpp:35-46`)."""
    return (Ti[:3, 3] - p) * axis_mask


def r_prior_quat(Ti, Rm):
    """EdgeSE3PriorQuat: log(R_meas^T R_i)."""
    return rot_log(Rm.T @ Ti[:3, :3])


def r_prior_vec(Ti, dir_world, dir_meas):
    """EdgeSE3PriorVec: R_i^T d_w - d_meas."""
    return Ti[:3, :3].T @ dir_world - dir_meas


def r_ground_plane(Ti, plane_world, plane_meas):
    """World plane observed in the body frame (EdgeSE3Plane with the world
    plane fixed): [R_i^T n_w - n_m ; (n_w . t_i + d_w) - d_m]."""
    n_w, d_w = plane_world[:3], plane_world[3]
    return np.concatenate(
        [Ti[:3, :3].T @ n_w - plane_meas[:3], [n_w @ Ti[:3, 3] + d_w - plane_meas[3]]]
    )


def r_z_between(Ti, Tj, z):
    """EdgeSE3Z: (z_j - z_i) - m (`edge_se3_z.hpp:44-50`)."""
    return np.array([Tj[2, 3] - Ti[2, 3] - z])


def r_utm(Ti, p_utm, p_world):
    """EdgeSE3GtUTM: (T_i p_utm) - p_world (`edge_se3_gt_utm.hpp:39-45`)."""
    return Ti[:3, :3] @ p_utm + Ti[:3, 3] - p_world


def r_plane_prior(p, n_meas, d_meas):
    """EdgePlanePriorNormal + Distance (`edge_plane_prior.hpp:35-83`)."""
    n = p[:3] * (1.0 if p[:3] @ n_meas >= 0 else -1.0)
    return np.concatenate([n - n_meas, [p[3] - d_meas]])


def r_plane_plane(pi, pj, kind, meas):
    """EdgePlaneIdentity / Parallel / Perpendicular
    (`edge_plane_identity.hpp:47-59`, `edge_plane_parallel.hpp:44-115`)."""
    if kind == 0:
        pj = pj * (1.0 if pi @ pj >= 0 else -1.0)
        return (pj - pi) - meas
    if kind == 1:
        ni, nj = pi[:3], pj[:3]
        nj = nj * (1.0 if ni @ nj >= 0 else -1.0)
        return np.concatenate([(nj - ni) - meas[:3], [0.0]])
    ni = pi[:3] / np.linalg.norm(pi[:3])
    nj = pj[:3] / np.linalg.norm(pj[:3])
    return np.array([ni @ nj, 0.0, 0.0, 0.0])


def r_se3_plane(Ti, plane_j, plane_meas):
    """EdgeSE3Plane (`edge_se3_plane.hpp:40-47`): local = T_i^-1 * plane,
    compared with the body measurement in the measurement's tangent chart."""
    n, d = plane_j[:3], plane_j[3]
    n_b = Ti[:3, :3].T @ n
    d_b = d + n @ Ti[:3, 3]
    n_m = plane_meas[:3]
    s = 1.0 if n_b @ n_m >= 0 else -1.0
    n_b, d_b = n_b * s, d_b * s
    B = tangent_basis(n_m)
    return np.concatenate([B.T @ (n_b - n_m), [d_b - plane_meas[3]]])


# ---------------------------------------------------------------------------
# Factor container + robustified objective
# ---------------------------------------------------------------------------


class Factor:
    """One edge: `kind`, incident variable ids (poses 'x<i>' / planes 'p<i>'),
    measurement tuple, information sqrt (d,d), Huber delta (inf = none)."""

    def __init__(self, kind, ids, meas, sqrt_info, delta=math.inf):
        self.kind = kind
        self.ids = ids
        self.meas = meas
        self.sqrt_info = np.asarray(sqrt_info, float)
        self.delta = float(delta)

    _FNS = {
        "between": r_between,
        "prior_se3": r_prior_se3,
        "prior_point": r_prior_point,
        "prior_quat": r_prior_quat,
        "prior_vec": r_prior_vec,
        "ground_plane": r_ground_plane,
        "z_between": r_z_between,
        "utm": r_utm,
        "plane_prior": r_plane_prior,
        "plane_plane": r_plane_plane,
        "se3_plane": r_se3_plane,
    }

    def residual(self, vars_):
        args = [vars_[i] for i in self.ids]
        return self._FNS[self.kind](*args, *self.meas)


def huber_w(chi2, delta):
    if not math.isfinite(delta):
        return 1.0
    e = math.sqrt(max(chi2, 1e-300))
    return 1.0 if e <= delta else delta / e


def total_chi2(factors, vars_):
    c = 0.0
    for f in factors:
        rw = f.sqrt_info @ f.residual(vars_)
        chi2 = float(rw @ rw)
        c += huber_w(chi2, f.delta) * chi2
    return c


# ---------------------------------------------------------------------------
# Dense IRLS Levenberg-Marquardt with finite-difference Jacobians
# ---------------------------------------------------------------------------


def _var_dims(vars_):
    return {k: (6 if k.startswith("x") else 3) for k in vars_}


def _fd_jacobian(f, vars_, vid, h=1e-7):
    """Central-difference Jacobian of f's residual w.r.t. the local chart of
    variable `vid`."""
    dim = 6 if vid.startswith("x") else 3
    retr = retract_pose if vid.startswith("x") else retract_plane
    base = vars_[vid]
    cols = []
    for k in range(dim):
        d = np.zeros(dim)
        d[k] = h
        vp = dict(vars_)
        vp[vid] = retr(base, d)
        vm = dict(vars_)
        vm[vid] = retr(base, -d)
        cols.append((f.residual(vp) - f.residual(vm)) / (2 * h))
    return np.stack(cols, axis=1)


def optimize(vars_, factors, fixed=(), max_iters=100, lam0=1e-6, tol=1e-12):
    """Dumb dense LM: assemble H = sum w J^T J over all factors each
    iteration, damp, solve, retract; accept on chi2 decrease. Returns
    (vars, chi2, H) with H the undamped GN Hessian at the solution."""
    vars_ = {k: np.array(v, float) for k, v in vars_.items()}
    dims = _var_dims(vars_)
    order = sorted(vars_, key=lambda k: (k[0] != "x", int(k[1:])))
    off = {}
    o = 0
    for k in order:
        off[k] = o
        o += dims[k]
    D = o
    lam = lam0
    chi2 = total_chi2(factors, vars_)
    H_last = np.eye(D)
    for _ in range(max_iters):
        H = np.zeros((D, D))
        b = np.zeros(D)
        for f in factors:
            r = f.residual(vars_)
            rw = f.sqrt_info @ r
            w = huber_w(float(rw @ rw), f.delta)
            Js = {vid: f.sqrt_info @ _fd_jacobian(f, vars_, vid) for vid in f.ids}
            for vi, Ji in Js.items():
                b[off[vi] : off[vi] + dims[vi]] += w * (Ji.T @ rw)
                for vj, Jj in Js.items():
                    H[
                        off[vi] : off[vi] + dims[vi], off[vj] : off[vj] + dims[vj]
                    ] += w * (Ji.T @ Jj)
        for k in fixed:
            s = slice(off[k], off[k] + dims[k])
            H[s, :] = 0.0
            H[:, s] = 0.0
            H[s, s] = np.eye(dims[k])
            b[s] = 0.0
        H_last = H.copy()
        A = H + lam * np.diag(np.maximum(np.diag(H), 1.0))
        try:
            delta = np.linalg.solve(A, -b)
        except np.linalg.LinAlgError:
            lam *= 10.0
            continue
        trial = {}
        for k in order:
            d = delta[off[k] : off[k] + dims[k]]
            if k in fixed:
                d = np.zeros_like(d)
            trial[k] = (retract_pose if k.startswith("x") else retract_plane)(
                vars_[k], d
            )
        chi2_new = total_chi2(factors, trial)
        if chi2_new < chi2:
            rel = abs(chi2 - chi2_new) / max(chi2, 1e-300)
            vars_, chi2 = trial, chi2_new
            lam = max(lam / 10.0, 1e-12)
            if rel < tol:
                break
        else:
            lam *= 10.0
            if lam > 1e12:
                break
    return vars_, chi2, H_last


# ---------------------------------------------------------------------------
# Minimal independent g2o text parser
# ---------------------------------------------------------------------------


def _quat_xyzw_to_mat(x, y, z, w):
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def _info_from_upper(vals, d):
    M = np.zeros((d, d))
    it = iter(vals)
    for r in range(d):
        for c in range(r, d):
            M[r, c] = M[c, r] = next(it)
    return M


def _sqrt_info(info):
    """Symmetric matrix square root via eigendecomposition (any M with
    M^T M = info gives the same chi2)."""
    wv, V = np.linalg.eigh(info)
    return V @ np.diag(np.sqrt(np.maximum(wv, 0.0))) @ V.T


_G2O_PERM = np.zeros((6, 6))
_G2O_PERM[:3, 3:] = np.eye(3)
_G2O_PERM[3:, :3] = np.eye(3)


def parse_g2o(path):
    """Read VERTEX_SE3:QUAT / EDGE_SE3:QUAT / GORIO_PRIOR_SE3 lines (+ the
    `.kernels` Huber sidecar) into oracle (vars, factors). g2o orders the
    6-dof information [trans, rot]; the oracle residual is [rot, trans], so
    the information is permuted back on read."""
    vars_ = {}
    factors = []
    ordinals = {"EDGE_SE3:QUAT": [], "GORIO_PRIOR_SE3": []}
    with open(path) as fh:
        for line in fh:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE3:QUAT":
                k = int(tok[1])
                t = np.array([float(v) for v in tok[2:5]])
                T = np.eye(4)
                T[:3, :3] = _quat_xyzw_to_mat(*[float(v) for v in tok[5:9]])
                T[:3, 3] = t
                vars_[f"x{k}"] = T
            elif tok[0] == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                M = np.eye(4)
                M[:3, 3] = [float(v) for v in tok[3:6]]
                M[:3, :3] = _quat_xyzw_to_mat(*[float(v) for v in tok[6:10]])
                info_g = _info_from_upper([float(v) for v in tok[10:31]], 6)
                info = _G2O_PERM.T @ info_g @ _G2O_PERM
                f = Factor("between", (f"x{i}", f"x{j}"), (M,), _sqrt_info(info))
                factors.append(f)
                ordinals["EDGE_SE3:QUAT"].append(f)
            elif tok[0] == "GORIO_PRIOR_SE3":
                i = int(tok[1])
                M = np.eye(4)
                M[:3, 3] = [float(v) for v in tok[2:5]]
                M[:3, :3] = _quat_xyzw_to_mat(*[float(v) for v in tok[5:9]])
                info_g = _info_from_upper([float(v) for v in tok[9:30]], 6)
                info = _G2O_PERM.T @ info_g @ _G2O_PERM
                f = Factor("prior_se3", (f"x{i}",), (M,), _sqrt_info(info))
                factors.append(f)
                ordinals["GORIO_PRIOR_SE3"].append(f)
    try:
        with open(str(path) + ".kernels") as kf:
            for line in kf:
                tag, ordinal, kname, delta = line.split()
                if tag in ordinals and kname == "Huber":
                    ordinals[tag][int(ordinal)].delta = float(delta)
    except FileNotFoundError:
        pass
    return vars_, factors
