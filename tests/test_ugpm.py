"""UGPM GP preintegration tests: posterior moments vs ground truth and vs LPM,
covariance sanity, Jacobian finite-difference checks (SURVEY.md §4 (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gorio_tpu.core import lie
from gorio_tpu.io.synthetic import sample_imu, simulate_trajectory
from gorio_tpu.preintegration.lpm import lpm_preintegrate
from gorio_tpu.preintegration.ugpm import UGPMConfig, ugpm_fit, ugpm_query, ugpm_preintegrate


def _setup(duration=3.0, seed=0, gyr_std=0.01, vel_std=0.03):
    traj = simulate_trajectory(seed=seed, duration=duration)
    imu = sample_imu(
        traj, gyr_rate=200.0, vel_rate=30.0, gyr_std=gyr_std, vel_std=vel_std, seed=seed + 1
    )
    return traj, imu


def _truth_delta(traj, t0, t1):
    R0, p0 = traj.interp_pose(np.array([t0]))
    R1, p1 = traj.interp_pose(np.array([t1]))
    return R0[0].T @ R1[0], R0[0].T @ (p1[0] - p0[0])


def _window(imu, t0, t1, pad=0.3):
    sel_g = (imu.gyr_t >= t0 - pad) & (imu.gyr_t <= t1 + pad)
    sel_v = (imu.vel_t >= t0 - pad) & (imu.vel_t <= t1 + pad)
    return (
        jnp.asarray(imu.gyr_t[sel_g]),
        jnp.asarray(imu.gyr[sel_g]),
        jnp.asarray(imu.vel_t[sel_v]),
        jnp.asarray(imu.vel[sel_v]),
    )


def test_ugpm_moments_vs_truth():
    traj, imu = _setup()
    t0, t1 = 1.0, 1.5
    gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
    cfg = UGPMConfig(window_duration=0.5)
    queries = jnp.asarray([1.1, 1.25, 1.5])
    meas = ugpm_preintegrate(gyr_t, gyr, vel_t, vel, t0, queries, imu.gyr_var, imu.vel_var, cfg)
    for i, tq in enumerate(np.asarray(queries)):
        dR_ref, dp_ref = _truth_delta(traj, t0, float(tq))
        ang = float(lie.rotation_geodesic_angle(meas.delta_R[i], jnp.asarray(dR_ref)))
        assert ang < 5e-3, (tq, ang)
        np.testing.assert_allclose(np.asarray(meas.delta_p[i]), dp_ref, atol=3e-2)


@pytest.mark.slow
def test_ugpm_close_to_lpm():
    """UGPM and LPM must agree within noise scale (the reference validates
    UGPM against LPM the same way)."""
    _, imu = _setup(seed=3)
    t0, t1 = 0.8, 1.6
    gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
    queries = jnp.asarray([1.2, 1.6])
    cfg = UGPMConfig(window_duration=0.8)
    u = ugpm_preintegrate(gyr_t, gyr, vel_t, vel, t0, queries, imu.gyr_var, imu.vel_var, cfg)
    l = lpm_preintegrate(gyr_t, gyr, vel_t, vel, t0, queries, imu.gyr_var, imu.vel_var, grid_n=512)
    for i in range(2):
        ang = float(lie.rotation_geodesic_angle(u.delta_R[i], l.delta_R[i]))
        assert ang < 1e-2, ang
        np.testing.assert_allclose(
            np.asarray(u.delta_p[i]), np.asarray(l.delta_p[i]), atol=5e-2
        )


@pytest.mark.slow
def test_ugpm_covariance_calibration():
    """Monte-Carlo chi-square calibration: whiten each trial's 6-dof error by
    its own reported covariance; the summed squared Mahalanobis norm over 8
    trials is ~chi2(48) if the covariance is calibrated. Measured (24-trial
    probe): mean per-trial chi2 = 7.1 vs the ideal 6. The band [20, 100] on
    the 8-trial total catches a ~sqrt(2)x-understated or ~sqrt(3)x-overstated
    sigma — far tighter than the order-of-magnitude check it replaces."""
    traj = simulate_trajectory(seed=10, duration=2.0)
    t0, t1 = 0.5, 1.0
    cfg = UGPMConfig(window_duration=0.5, lm_iters=15)
    errs = []
    covs = []
    chi2 = []
    dR_ref, dp_ref = _truth_delta(traj, t0, t1)
    for trial in range(8):
        imu = sample_imu(traj, gyr_rate=150.0, vel_rate=25.0, gyr_std=0.02, vel_std=0.05, seed=100 + trial)
        gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
        meas = ugpm_preintegrate(
            gyr_t, gyr, vel_t, vel, t0, jnp.asarray([t1]), imu.gyr_var, imu.vel_var, cfg
        )
        r_err = np.asarray(
            lie.so3_log(jnp.asarray(dR_ref).T @ meas.delta_R[0])
        )
        p_err = np.asarray(meas.delta_p[0]) - dp_ref
        e = np.concatenate([r_err, p_err])
        S = np.asarray(meas.cov[0])
        chi2.append(float(e @ np.linalg.solve(S, e)))
        errs.append(e)
        covs.append(S)
    total = float(np.sum(chi2))
    assert 20.0 < total < 100.0, (total, chi2)
    # per-dimension diagnostic band (measured ratios: 0.16..2.3)
    errs = np.stack(errs)
    rep = np.diag(np.mean(np.stack(covs), axis=0))
    ratio = np.mean(errs**2, axis=0) / np.maximum(rep, 1e-12)
    assert np.all(ratio < 8.0), ratio
    # rotation channels: the reported variance is conservative (the leftover
    # GP-integral variance between knots exceeds the actual error under dense
    # 150 Hz gyro data — inherited from the reference's variance model,
    # `preint.h:1101`); observed per-axis ratios drift down to ~0.06
    assert np.all(ratio > 1.0 / 50.0), ratio


@pytest.mark.slow
def test_ugpm_bias_jacobians_vs_fd():
    _, imu = _setup(seed=5)
    t0, t1 = 1.0, 1.4
    gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
    cfg = UGPMConfig(window_duration=0.4, lm_iters=15)
    queries = jnp.asarray([t1])
    meas = ugpm_preintegrate(gyr_t, gyr, vel_t, vel, t0, queries, imu.gyr_var, imu.vel_var, cfg)
    eps = 1e-4
    for axis in range(3):
        e = np.zeros(3)
        e[axis] = eps
        m_w = ugpm_preintegrate(
            gyr_t, gyr + jnp.asarray(e), vel_t, vel, t0, queries, imu.gyr_var, imu.vel_var, cfg
        )
        d_r = np.asarray(lie.so3_log(meas.delta_R[0].T @ m_w.delta_R[0])) / eps
        # d_delta_R_d_bw maps through J_r; compare the right-trivialized FD
        ana = np.asarray(meas.d_delta_R_d_bw[0, :, axis])
        np.testing.assert_allclose(ana, d_r, atol=0.05, rtol=0.25)
        # gyro offset also moves delta_p (through the rotated velocities):
        # d_delta_p_d_bw (preint.h:1265 initialiseStateDiff gyro-shift path)
        d_p_w = (np.asarray(m_w.delta_p[0]) - np.asarray(meas.delta_p[0])) / eps
        ana_pw = np.asarray(meas.d_delta_p_d_bw[0, :, axis])
        np.testing.assert_allclose(ana_pw, d_p_w, atol=0.06, rtol=0.2)
        m_v = ugpm_preintegrate(
            gyr_t, gyr, vel_t, vel + jnp.asarray(e), t0, queries, imu.gyr_var, imu.vel_var, cfg
        )
        d_p = (np.asarray(m_v.delta_p[0]) - np.asarray(meas.delta_p[0])) / eps
        ana_p = np.asarray(meas.d_delta_p_d_bv[0, :, axis])
        np.testing.assert_allclose(ana_p, d_p, atol=0.05, rtol=0.25)


@pytest.mark.slow
def test_ugpm_vmap_over_windows():
    """The design goal: many windows preintegrated as one batch."""
    _, imu = _setup(seed=7)
    cfg = UGPMConfig(window_duration=0.5, lm_iters=10)
    starts = np.array([0.5, 1.0, 1.5])
    G, V = 180, 25  # fixed per-window sample counts

    def window_arrays(t0):
        i_g = np.searchsorted(imu.gyr_t, t0 - 0.2)
        i_v = np.searchsorted(imu.vel_t, t0 - 0.2)
        return (
            imu.gyr_t[i_g : i_g + G],
            imu.gyr[i_g : i_g + G],
            imu.vel_t[i_v : i_v + V],
            imu.vel[i_v : i_v + V],
        )

    packs = [window_arrays(t0) for t0 in starts]
    gyr_t = jnp.asarray(np.stack([p[0] for p in packs]))
    gyr = jnp.asarray(np.stack([p[1] for p in packs]))
    vel_t = jnp.asarray(np.stack([p[2] for p in packs]))
    vel = jnp.asarray(np.stack([p[3] for p in packs]))
    t0s = jnp.asarray(starts)
    queries = jnp.asarray(starts + 0.5)[:, None]

    batched = jax.vmap(
        lambda a, b, c, d, s, q: ugpm_preintegrate(a, b, c, d, s, q, imu.gyr_var, imu.vel_var, cfg)
    )(gyr_t, gyr, vel_t, vel, t0s, queries)
    single = [
        ugpm_preintegrate(
            gyr_t[i], gyr[i], vel_t[i], vel[i], t0s[i], queries[i], imu.gyr_var, imu.vel_var, cfg
        )
        for i in range(3)
    ]
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(batched.delta_p[i]), np.asarray(single[i].delta_p), atol=1e-8
        )
