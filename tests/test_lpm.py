"""LPM preintegration tests vs exact simulated ground truth.

Follows SURVEY.md §4 implications (b)/(c): preintegration moments are checked
against the analytic/simulated truth and the Jacobians against finite
differences — the validation the reference never automated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gorio_tpu.core import lie
from gorio_tpu.io.synthetic import sample_imu, simulate_trajectory
from gorio_tpu.preintegration.lpm import lpm_preintegrate
from gorio_tpu.preintegration.types import PreintMeas, add_bias_cov, combine_preints


def _setup(duration=2.0, seed=0, gyr_std=0.0, vel_std=0.0):
    traj = simulate_trajectory(seed=seed, duration=duration)
    imu = sample_imu(
        traj, gyr_rate=200.0, vel_rate=20.0, gyr_std=gyr_std, vel_std=vel_std, seed=seed + 1
    )
    return traj, imu


def _truth_delta(traj, t0, t1):
    R0, p0 = traj.interp_pose(np.array([t0]))
    R1, p1 = traj.interp_pose(np.array([t1]))
    dR = R0[0].T @ R1[0]
    dp = R0[0].T @ (p1[0] - p0[0])
    return dR, dp


def test_lpm_matches_truth_noiseless():
    traj, imu = _setup()
    start_t = 0.3
    queries = np.array([0.5, 0.8, 1.2, 1.7])
    meas = lpm_preintegrate(
        jnp.asarray(imu.gyr_t),
        jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t),
        jnp.asarray(imu.vel),
        start_t,
        jnp.asarray(queries),
        imu.gyr_var + 1e-8,
        imu.vel_var + 1e-8,
        grid_n=1024,
    )
    for i, tq in enumerate(queries):
        dR_ref, dp_ref = _truth_delta(traj, start_t, tq)
        ang_err = float(
            lie.rotation_geodesic_angle(meas.delta_R[i], jnp.asarray(dR_ref))
        )
        assert ang_err < 2e-3, (tq, ang_err)
        np.testing.assert_allclose(np.asarray(meas.delta_p[i]), dp_ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(meas.dt), queries - start_t, atol=1e-9)


def test_lpm_query_before_start():
    traj, imu = _setup(seed=3)
    start_t = 1.0
    queries = np.array([0.6, 1.0, 1.4])
    meas = lpm_preintegrate(
        jnp.asarray(imu.gyr_t),
        jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t),
        jnp.asarray(imu.vel),
        start_t,
        jnp.asarray(queries),
        1e-6,
        1e-6,
        grid_n=1024,
    )
    dR_ref, dp_ref = _truth_delta(traj, start_t, 0.6)
    assert float(lie.rotation_geodesic_angle(meas.delta_R[0], jnp.asarray(dR_ref))) < 2e-3
    np.testing.assert_allclose(np.asarray(meas.delta_p[0]), dp_ref, atol=2e-2)
    # at the start time: identity
    assert float(lie.rotation_geodesic_angle(meas.delta_R[1], jnp.eye(3))) < 1e-6
    np.testing.assert_allclose(np.asarray(meas.delta_p[1]), 0.0, atol=1e-9)


def _preint_fn(imu, start_t, queries, bw=None, bv=None, tau=0.0, grid_n=512):
    gyr = jnp.asarray(imu.gyr) + (jnp.zeros(3) if bw is None else jnp.asarray(bw))
    vel = jnp.asarray(imu.vel) + (jnp.zeros(3) if bv is None else jnp.asarray(bv))
    gyr_t = jnp.asarray(imu.gyr_t) - tau  # shifting data earlier == evaluating at t+tau
    vel_t_data = jnp.asarray(imu.vel_t) - tau
    # re-evaluate on the original stamps so the query timeline is unchanged
    from gorio_tpu.core.gp import linear_interp

    gyr_i = linear_interp(jnp.asarray(imu.gyr_t), gyr_t, gyr)
    vel_i = linear_interp(jnp.asarray(imu.vel_t), vel_t_data, vel)
    return lpm_preintegrate(
        jnp.asarray(imu.gyr_t),
        gyr_i,
        jnp.asarray(imu.vel_t),
        vel_i,
        start_t,
        jnp.asarray(queries),
        1e-6,
        1e-6,
        grid_n=grid_n,
        with_jacobians=False,
    )


@pytest.mark.slow
def test_lpm_bias_jacobians_vs_fd():
    _, imu = _setup(seed=5)
    start_t, queries = 0.2, np.array([0.9, 1.6])
    meas = lpm_preintegrate(
        jnp.asarray(imu.gyr_t),
        jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t),
        jnp.asarray(imu.vel),
        start_t,
        jnp.asarray(queries),
        1e-6,
        1e-6,
        grid_n=512,
    )
    eps = 1e-5
    for axis in range(3):
        e = np.zeros(3)
        e[axis] = eps
        m_hi = _preint_fn(imu, start_t, queries, bw=e)
        d_r = jax.vmap(lambda R0, R1: lie.so3_log(R0.T @ R1))(meas.delta_R, m_hi.delta_R) / eps
        np.testing.assert_allclose(
            np.asarray(meas.d_delta_R_d_bw[:, :, axis]), np.asarray(d_r), atol=2e-3
        )
        d_p = (m_hi.delta_p - meas.delta_p) / eps
        np.testing.assert_allclose(
            np.asarray(meas.d_delta_p_d_bw[:, :, axis]), np.asarray(d_p), atol=2e-3
        )
        m_hv = _preint_fn(imu, start_t, queries, bv=e)
        d_pv = (m_hv.delta_p - meas.delta_p) / eps
        np.testing.assert_allclose(
            np.asarray(meas.d_delta_p_d_bv[:, :, axis]), np.asarray(d_pv), atol=2e-3
        )


@pytest.mark.slow
def test_lpm_time_jacobian_vs_fd():
    _, imu = _setup(seed=6)
    start_t, queries = 0.2, np.array([1.0])
    meas = lpm_preintegrate(
        jnp.asarray(imu.gyr_t),
        jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t),
        jnp.asarray(imu.vel),
        start_t,
        jnp.asarray(queries),
        1e-6,
        1e-6,
        grid_n=512,
    )
    eps = 1e-4
    m_hi = _preint_fn(imu, start_t, queries, tau=eps)
    d_r = jax.vmap(lambda R0, R1: lie.so3_log(R0.T @ R1))(meas.delta_R, m_hi.delta_R) / eps
    # the FD helper double-interpolates the shifted stream, so compare loosely
    np.testing.assert_allclose(np.asarray(meas.d_delta_R_d_t[0]), np.asarray(d_r[0]), atol=2e-2)
    d_p = (m_hi.delta_p - meas.delta_p) / eps
    np.testing.assert_allclose(np.asarray(meas.d_delta_p_d_t[0]), np.asarray(d_p[0]), atol=2e-2)


def test_lpm_covariance_scales_with_noise():
    _, imu = _setup(seed=7)
    meas_lo = lpm_preintegrate(
        jnp.asarray(imu.gyr_t), jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t), jnp.asarray(imu.vel),
        0.2, jnp.asarray([1.2]), 1e-4, 1e-4, grid_n=512,
    )
    meas_hi = lpm_preintegrate(
        jnp.asarray(imu.gyr_t), jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t), jnp.asarray(imu.vel),
        0.2, jnp.asarray([1.2]), 1e-2, 1e-2, grid_n=512,
    )
    assert float(jnp.trace(meas_hi.cov[0, :3, :3])) > 10 * float(
        jnp.trace(meas_lo.cov[0, :3, :3])
    )
    np.testing.assert_allclose(
        np.asarray(jnp.diag(meas_hi.cov[0])[3:]), 1.0 * 1e-2, rtol=1e-6
    )
    # The reference accumulates var*dt^2 per timeline step
    # (`preint.h:456-466`), so the total rotation variance over [start, t] is
    # ~ var * dt_grid * (t - start) — grid-resolution dependent by design.
    dt_grid = 1.0 / 511.0
    expected = 1e-2 * dt_grid * 1.0
    assert abs(float(meas_hi.cov[0, 0, 0]) - expected) < 0.5 * expected


def test_combine_preints_matches_single_window():
    traj, imu = _setup(seed=8)
    t0, tm, t1 = 0.2, 1.0, 1.8
    args = (
        jnp.asarray(imu.gyr_t), jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t), jnp.asarray(imu.vel),
    )
    full = lpm_preintegrate(*args, t0, jnp.asarray([t1]), 1e-5, 1e-5, grid_n=1024)
    first = lpm_preintegrate(*args, t0, jnp.asarray([tm]), 1e-5, 1e-5, grid_n=1024)
    second = lpm_preintegrate(*args, tm, jnp.asarray([t1]), 1e-5, 1e-5, grid_n=1024)
    comb = combine_preints(
        jax.tree.map(lambda x: x[0], first), jax.tree.map(lambda x: x[0], second)
    )
    # full and chunked use different grid steps (left-endpoint rule), so the
    # agreement is limited by O(dt) integration error, not by combine_preints
    assert (
        float(lie.rotation_geodesic_angle(comb.delta_R, full.delta_R[0])) < 1e-3
    )
    np.testing.assert_allclose(
        np.asarray(comb.delta_p), np.asarray(full.delta_p[0]), atol=5e-3
    )
    np.testing.assert_allclose(float(comb.dt), t1 - t0, atol=1e-9)
    # Jacobians should also compose
    np.testing.assert_allclose(
        np.asarray(comb.d_delta_p_d_bv), np.asarray(full.d_delta_p_d_bv[0]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(comb.d_delta_R_d_bw), np.asarray(full.d_delta_R_d_bw[0]), atol=5e-3
    )


def test_add_bias_cov():
    _, imu = _setup(seed=9)
    meas = lpm_preintegrate(
        jnp.asarray(imu.gyr_t), jnp.asarray(imu.gyr),
        jnp.asarray(imu.vel_t), jnp.asarray(imu.vel),
        0.2, jnp.asarray([1.0]), 1e-6, 1e-6, grid_n=256,
    )
    m = jax.tree.map(lambda x: x[0], meas)
    inflated = add_bias_cov(m, vel_bias_std=0.3, gyr_bias_std=0.03)
    d = np.asarray(inflated.cov - m.cov)
    assert np.all(np.linalg.eigvalsh(d) > -1e-12)
    assert float(inflated.cov[0, 0]) >= float(m.cov[0, 0]) + 0.03**2 - 1e-12
