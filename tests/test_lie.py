"""Golden-value tests for core Lie math vs scipy.spatial.transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from gorio_tpu.core import lie


@pytest.fixture
def rotvecs():
    rng = np.random.default_rng(0)
    r = rng.normal(size=(64, 3))
    # include tiny, moderate, and near-pi angles
    r[0] = 0.0
    r[1] = [1e-12, 0, 0]
    r[2] = np.array([1.0, 0.0, 0.0]) * (np.pi - 1e-7)
    r[3] = np.array([0.3, -0.4, 0.5]) / np.linalg.norm([0.3, -0.4, 0.5]) * (np.pi - 1e-4)
    return r


def test_exp_matches_scipy(rotvecs):
    R = np.asarray(lie.so3_exp(jnp.asarray(rotvecs)))
    R_ref = Rsc.from_rotvec(rotvecs).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_log_roundtrip(rotvecs):
    R = lie.so3_exp(jnp.asarray(rotvecs))
    r_back = np.asarray(lie.so3_log(R))
    r_ref = Rsc.from_matrix(np.array(R)).as_rotvec()
    # log is defined up to sign near pi; compare rotations
    R_back = Rsc.from_rotvec(np.array(r_back)).as_matrix()
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-6)
    # away from pi it must match scipy exactly
    sel = np.linalg.norm(rotvecs, axis=-1) < 3.0
    np.testing.assert_allclose(r_back[sel], r_ref[sel], atol=1e-9)


def test_right_jacobian_numeric():
    """J_r: exp(r + dr) ~ exp(r) exp(J_r dr)."""
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(10, 3)))
    dr = jnp.asarray(rng.normal(size=(10, 3)) * 1e-6)
    lhs = lie.so3_exp(r + dr)
    rhs = lie.so3_exp(r) @ lie.so3_exp(jnp.einsum("nij,nj->ni", lie.so3_right_jacobian(r), dr))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_right_jacobian_inverse(rotvecs):
    J = lie.so3_right_jacobian(jnp.asarray(rotvecs))
    Jinv = lie.so3_right_jacobian_inv(jnp.asarray(rotvecs))
    eye = np.broadcast_to(np.eye(3), J.shape)
    np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-7)


def test_quat_roundtrip(rotvecs):
    R = lie.so3_exp(jnp.asarray(rotvecs))
    q = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-12)
    q_ref = Rsc.from_matrix(np.asarray(R)).as_quat()  # x,y,z,w
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-9)


def test_quat_slerp():
    q0 = lie.mat_to_quat(lie.so3_exp(jnp.array([[0.0, 0.0, 0.0]])))
    q1 = lie.mat_to_quat(lie.so3_exp(jnp.array([[0.0, 0.0, 1.0]])))
    qm = lie.quat_slerp(q0, q1, 0.5)
    r = lie.so3_log(lie.quat_to_mat(qm))
    np.testing.assert_allclose(np.asarray(r), [[0.0, 0.0, 0.5]], atol=1e-9)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(size=(16, 6)))
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)


def test_se3_inverse_apply():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(size=(4, 6)))
    T = lie.se3_exp(xi)
    Tinv = lie.se3_inverse(T)
    eye = np.broadcast_to(np.eye(4), T.shape)
    np.testing.assert_allclose(np.asarray(T @ Tinv), eye, atol=1e-10)
    p = jnp.asarray(rng.normal(size=(4, 7, 3)))
    moved = lie.se3_apply(T, p)
    back = lie.se3_apply(Tinv, moved)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-9)


def test_rpy_ypr():
    R = lie.rpy_to_mat(jnp.array(0.1), jnp.array(-0.2), jnp.array(0.7))
    R_ref = Rsc.from_euler("ZYX", [0.7, -0.2, 0.1]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-12)
    y, p, r = lie.mat_to_ypr(R)
    np.testing.assert_allclose([float(y), float(p), float(r)], [0.7, -0.2, 0.1], atol=1e-9)


def test_sym_eigh3_vs_numpy():
    from gorio_tpu.core.linalg import inv3, sym_eigh3, sym_eigvals3

    rng = np.random.default_rng(11)
    B = rng.normal(size=(200, 3, 3))
    A = B @ np.swapaxes(B, -1, -2)  # SPD
    # include a plane-like, a degenerate-isotropic and a rank-1 case
    A[0] = np.diag([1.0, 1.0, 1e-3])
    A[1] = np.eye(3) * 2.0
    A[2] = np.outer([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    lam, V = sym_eigh3(jnp.asarray(A))
    lam_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=1e-6, atol=1e-8)
    # reconstruction A = V diag(lam) V^T
    recon = np.einsum("nij,nj,nkj->nik", np.asarray(V), np.asarray(lam), np.asarray(V))
    np.testing.assert_allclose(recon, A, rtol=1e-4, atol=1e-6)
    # orthonormal columns
    VtV = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-6)
    # inv3
    Areg = A + 1e-3 * np.eye(3)
    inv = np.asarray(inv3(jnp.asarray(Areg)))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", Areg, inv),
        np.broadcast_to(np.eye(3), A.shape),
        atol=1e-6,
    )
