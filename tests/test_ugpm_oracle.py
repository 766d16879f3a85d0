"""UGPM vs the independent numpy oracle (VERDICT r2 item 6).

The oracle (tests/oracle_ugpm.py) shares NOTHING with gorio_tpu — scipy
rotations, hand-written SE kernel, dense quadrature — so agreement here
validates the JAX kernel-integral machinery end to end, the role the
reference's Ceres `Se3Integrator` would play as a cross-check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gorio_tpu.io.synthetic import sample_imu, simulate_trajectory
from gorio_tpu.preintegration.ugpm import UGPMConfig, ugpm_fit, ugpm_query

from oracle_ugpm import oracle_preint


def _window(imu, t0, t1, pad=0.25):
    sg = (imu.gyr_t >= t0 - pad) & (imu.gyr_t <= t1 + pad)
    sv = (imu.vel_t >= t0 - pad) & (imu.vel_t <= t1 + pad)
    return imu.gyr_t[sg], imu.gyr[sg], imu.vel_t[sv], imu.vel[sv]


@pytest.mark.parametrize("t0,t1,seed", [(0.5, 1.0, 2), (1.2, 1.7, 7)])
def test_ugpm_matches_numpy_oracle(t0, t1, seed):
    traj = simulate_trajectory(seed=seed, duration=2.5)
    # dense, low-noise streams: the oracle computes the noise-free model
    # limit, so the comparison tolerance is set by the noise level
    imu = sample_imu(
        traj, gyr_rate=200.0, vel_rate=50.0, gyr_std=0.002, vel_std=0.005,
        seed=seed + 100,
    )
    gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
    cfg = UGPMConfig(window_duration=t1 - t0, lm_iters=20)
    state = ugpm_fit(
        jnp.asarray(gyr_t), jnp.asarray(gyr), jnp.asarray(vel_t), jnp.asarray(vel),
        t0, imu.gyr_var, imu.vel_var, cfg,
    )
    meas = ugpm_query(state, t0, jnp.asarray([t1]))

    # feed the oracle the hyperparameters the implementation chose — the
    # selection heuristic is not under test, the conditioning math is
    dR_o, dp_o = oracle_preint(
        gyr_t, gyr, vel_t, vel, t0, t1,
        l2=float(state.l2),
        sf2_vel=np.asarray(state.sf2[3:]),
        sz2_vel=float(imu.vel_var),
        grid_n=4000,
    )
    dR = np.asarray(meas.delta_R[0])
    dp = np.asarray(meas.delta_p[0])
    rot_err = np.rad2deg(
        np.arccos(np.clip((np.trace(dR.T @ dR_o) - 1) / 2, -1, 1))
    )
    assert rot_err < 0.15, rot_err
    # translation: kriging mean vs the analytic kernel-integral of the same
    # posterior — small model-identical quantities, tolerance covers the
    # oracle's dense-grid quadrature error + the GP mean-function difference
    assert np.linalg.norm(dp - dp_o) < 0.02, (dp, dp_o)


def test_oracle_self_consistency():
    """The oracle's rotation matches scipy on a constant-rate stream."""
    from oracle_ugpm import oracle_rotation
    from scipy.spatial.transform import Rotation

    gyr_t = np.linspace(0.0, 1.0, 201)
    w = np.array([0.3, -0.2, 0.5])
    gyr = np.tile(w, (201, 1))
    dR, _, _ = oracle_rotation(gyr_t, gyr, 0.0, 1.0, grid_n=5000)
    np.testing.assert_allclose(dR, Rotation.from_rotvec(w).as_matrix(), atol=1e-6)


def test_ugpm_covariance_vs_mc_oracle():
    """6x6 covariance vs the brute-force MC oracle (VERDICT r3 item 9).

    `oracle_preint_mc` resamples the measurement noise `n_mc` times and pushes
    each draw through the from-scratch numpy model; the SAME noisy draws go
    through the JAX implementation. Three facts are pinned:
      1. the implementation's moment scatter under noise matches the
         oracle's (the two estimators respond to noise the same way),
      2. the reported `PreintMeas.cov` diagonal brackets the true MC spread
         within the calibration bands the chi2 test established
         (rotation conservative, velocity within a small factor),
      3. the reported cov is NOT a function of the noise draw (it reports
         the model posterior, not a per-draw fit diagnostic).
    """
    import jax

    from oracle_ugpm import oracle_preint_mc

    traj = simulate_trajectory(seed=4, duration=2.5)
    t0, t1 = 0.6, 1.1
    gyr_std, vel_std = 0.01, 0.03
    imu = sample_imu(traj, gyr_rate=200.0, vel_rate=50.0, gyr_std=1e-6,
                     vel_std=1e-6, seed=55)  # quasi-noise-free base streams
    gyr_t, gyr, vel_t, vel = _window(imu, t0, t1)
    cfg = UGPMConfig(window_duration=t1 - t0, lm_iters=15)

    # hyperparameters from one reference fit (selection not under test)
    st0 = ugpm_fit(jnp.asarray(gyr_t), jnp.asarray(gyr), jnp.asarray(vel_t),
                   jnp.asarray(vel), t0, gyr_std**2, vel_std**2, cfg)

    M = 96
    rv_o, dp_o, gyr_n, vel_n = oracle_preint_mc(
        gyr_t, gyr, vel_t, vel, t0, t1,
        l2=float(st0.l2), sf2_vel=np.asarray(st0.sf2[3:]), sz2_vel=vel_std**2,
        gyr_std=gyr_std, vel_std=vel_std, n_mc=M, seed=7,
    )

    def one(g, v):
        st = ugpm_fit(jnp.asarray(gyr_t), g, jnp.asarray(vel_t), v, t0,
                      gyr_std**2, vel_std**2, cfg)
        meas = ugpm_query(st, t0, jnp.asarray([t1]))
        return meas.delta_R[0], meas.delta_p[0], meas.cov[0]

    dRs, dps, covs = jax.jit(jax.vmap(one))(jnp.asarray(gyr_n), jnp.asarray(vel_n))
    from scipy.spatial.transform import Rotation

    rv_i = Rotation.from_matrix(np.asarray(dRs)).as_rotvec()

    mom_o = np.concatenate([rv_o - rv_o.mean(0), dp_o - dp_o.mean(0)], axis=1)
    mom_i = np.concatenate([rv_i - rv_i.mean(0), np.asarray(dps) - np.asarray(dps).mean(0)], axis=1)
    cov_mc_o = mom_o.T @ mom_o / (M - 1)
    cov_mc_i = mom_i.T @ mom_i / (M - 1)

    # 1. estimator noise response: oracle vs implementation MC spread
    ratio_oi = np.diag(cov_mc_i) / np.maximum(np.diag(cov_mc_o), 1e-18)
    assert np.all(ratio_oi > 0.3) and np.all(ratio_oi < 3.0), ratio_oi

    # 2. reported cov vs true MC spread (bands per the chi2 calibration:
    # rotation conservative, translation within a small factor)
    rep = np.diag(np.mean(np.asarray(covs), axis=0))
    ratio_rep = rep / np.maximum(np.diag(cov_mc_o), 1e-18)
    assert np.all(ratio_rep[:3] > 0.5), ratio_rep    # rot not understated >2x
    assert np.all(ratio_rep[3:] > 0.2), ratio_rep    # vel not understated >5x
    assert np.all(ratio_rep < 200.0), ratio_rep      # not absurdly inflated

    # 3. reported cov is stable across draws (posterior, not fit noise)
    spread = np.std(np.asarray(covs), axis=0) / np.maximum(np.abs(rep)[:, None], 1e-18)
    assert np.median(spread) < 1.0, np.median(spread)
