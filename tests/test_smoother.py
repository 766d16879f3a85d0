"""SMC trajectory smoother with loop-closure global relaxation (config 5).

Scenario mirrors the e2e loop test: a square path whose odometry drifts, plus
one loop-closure between the last and first pose. The annealed-SMC relaxation
must (a) pull the trajectory toward the loop-consistent solution, (b) produce
a finite evidence estimate, and (c) run sharded over the 8 fake devices with
collective resampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gorio_tpu.core import lie
from gorio_tpu.graph.graph import PoseGraph
from gorio_tpu.graph.solver import SolveConfig, optimize_graph
from gorio_tpu.inference.smoother import (
    loop_evidence_gate,
    smc_loop_relaxation,
    split_loop_chi2,
)


def _square_graph(K=12, drift=0.03, seed=0):
    """Odometry chain around a square with yaw drift + loop K-1 -> 0."""
    rng = np.random.default_rng(seed)
    side = K // 4
    poses_gt = []
    T = np.eye(4)
    step = np.eye(4)
    step[0, 3] = 1.0
    turn = np.eye(4)
    turn[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2])))
    for k in range(K):
        poses_gt.append(T.copy())
        T = T @ step
        if (k + 1) % side == 0:
            T = T @ turn

    g = PoseGraph()
    odom = np.eye(4)
    poses_odom = []
    for k in range(K):
        poses_odom.append(odom.copy())
        if k + 1 < K:
            T_rel = np.linalg.inv(poses_gt[k]) @ poses_gt[k + 1]
            # drifted odometry measurement
            noise = np.asarray(
                lie.se3_exp_split(
                    jnp.asarray(np.concatenate([rng.normal(0, drift, 3) * [0, 0, 1], [drift, 0, 0]]))
                )
            )
            T_meas = T_rel @ noise
            odom = odom @ T_meas
    for k, p in enumerate(poses_odom):
        g.add_pose(p)
    g.add_prior(0, poses_odom[0], np.eye(6) * 1e6)
    for k in range(K - 1):
        T_meas = np.linalg.inv(poses_odom[k]) @ poses_odom[k + 1]
        g.add_between(k, k + 1, T_meas, np.eye(6) * 100.0)
    # loop closure: true relative pose between last and first
    T_loop = np.linalg.inv(poses_gt[K - 1]) @ poses_gt[0]
    loop_slot = len(g._between)
    g.add_between(K - 1, 0, T_loop, np.eye(6) * 100.0)
    poses0, data = g.freeze()
    loop_mask = np.zeros(data.between.mask.shape[0], bool)
    loop_mask[loop_slot] = True
    return np.stack(poses_gt), poses0, data, jnp.asarray(loop_mask)


def _ate(poses_a, poses_b):
    return float(np.sqrt(np.mean(np.sum((poses_a[:, :3, 3] - poses_b[:, :3, 3]) ** 2, -1))))


def test_split_loop_chi2():
    poses_gt, poses0, data, loop_mask = _square_graph()
    chi2_fn = split_loop_chi2(poses0, data, loop_mask)
    c_base, c_loop = chi2_fn(jnp.zeros(poses0.shape[0] * 6, poses0.dtype))
    # odometry chain is self-consistent at its own trajectory -> tiny base chi2
    assert float(c_base) < 1e-6
    # the loop factor sees the accumulated drift -> large
    assert float(c_loop) > 1.0


@pytest.mark.slow
def test_smc_loop_relaxation_sharded():
    poses_gt, poses0, data, loop_mask = _square_graph()
    K = poses0.shape[0]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    run = smc_loop_relaxation(
        mesh,
        poses0,
        data,
        loop_mask,
        n_particles=512,
        n_stages=6,
        n_moves=2,
    )
    res = run(jax.random.PRNGKey(0))
    assert np.isfinite(float(res.log_evidence))
    assert np.all(np.isfinite(np.asarray(res.mean_delta)))
    # ESS stays positive and bounded by N
    ess = np.asarray(res.ess_per_stage)
    assert np.all(ess > 1.0) and np.all(ess <= 512 + 1e-6)
    # some MALA movement happened
    assert float(res.accept_rate) > 0.05

    # relaxation must beat raw odometry against ground truth
    ate_odom = _ate(np.asarray(poses0), poses_gt)
    ate_smc = _ate(np.asarray(res.poses_mean), poses_gt)
    assert ate_smc < ate_odom

    # and land in the neighborhood of the GN solution
    gn = optimize_graph(poses0, data, SolveConfig(max_iterations=25))
    ate_gn_gt = _ate(np.asarray(gn.poses), poses_gt)
    assert ate_smc < max(2.0 * ate_gn_gt, 0.5 * ate_odom)

    assert loop_evidence_gate(res)


@pytest.mark.slow
def test_evidence_rejects_bogus_loop():
    """A wildly wrong loop closure should produce much lower evidence than the
    true one (the probabilistic analogue of the reference's consistency
    gates)."""
    poses_gt, poses0, data, loop_mask = _square_graph()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    kwargs = dict(n_particles=256, n_stages=5, n_moves=1)

    res_true = smc_loop_relaxation(mesh, poses0, data, loop_mask, **kwargs)(
        jax.random.PRNGKey(1)
    )

    # corrupt the loop measurement: 20 m translation offset
    bw = data.between
    idx = int(np.argmax(np.asarray(loop_mask)))
    T_bad = np.asarray(bw.T_meas[idx]).copy()
    T_bad[:3, 3] += np.asarray([20.0, -15.0, 5.0])
    data_bad = data._replace(
        between=bw._replace(T_meas=bw.T_meas.at[idx].set(jnp.asarray(T_bad)))
    )
    res_bad = smc_loop_relaxation(mesh, poses0, data_bad, loop_mask, **kwargs)(
        jax.random.PRNGKey(1)
    )
    assert float(res_bad.log_evidence) < float(res_true.log_evidence) - 50.0
