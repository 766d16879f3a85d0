"""Sequential Monte Carlo smoothing over trajectory posteriors, pod-sharded.

Counterpart of BASELINE.json config 5 ("Pod-scale SMC smoother: 10k+
particles sharded over N>=2 hosts with collective resampling"): particles are
sharded over the mesh's `dp` axis with `shard_map`; weights are normalized and
resampled *globally* via `psum`/`all_gather` collectives — the pattern the
reference's single-process design has no analogue for (SURVEY.md §2.4).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SMCState(NamedTuple):
    particles: jax.Array  # (N, D)
    log_weights: jax.Array  # (N,)


def smc_init(key, n_particles, mean, cov_diag):
    d = mean.shape[0]
    noise = jax.random.normal(key, (n_particles, d), mean.dtype)
    particles = mean[None, :] + noise * jnp.sqrt(cov_diag)[None, :]
    return SMCState(particles=particles, log_weights=jnp.zeros(n_particles, mean.dtype))


def effective_sample_size(log_weights):
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return 1.0 / jnp.sum(jnp.exp(2.0 * lw))


def systematic_resample(key, log_weights, n):
    """Systematic resampling: returns parent indices (n,)."""
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    w = jnp.exp(lw)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype) / n
    us = u0 + jnp.arange(n, dtype=w.dtype) / n
    return jnp.clip(jnp.searchsorted(cum, us), 0, n - 1)


def smc_step(
    key,
    state: SMCState,
    log_target: Callable,
    proposal_std,
    ess_threshold: float = 0.5,
):
    """One reweight -> (conditional) resample -> jitter move."""
    n = state.particles.shape[0]
    k1, k2 = jax.random.split(key)
    lp = jax.vmap(log_target)(state.particles)
    lw = state.log_weights + lp
    ess = effective_sample_size(lw)
    do_resample = ess < ess_threshold * n
    parents = systematic_resample(k1, lw, n)
    particles_rs = jnp.where(do_resample, state.particles[parents], state.particles)
    lw_rs = jnp.where(do_resample, jnp.zeros_like(lw), lw)
    noise = jax.random.normal(k2, particles_rs.shape, particles_rs.dtype)
    particles_new = particles_rs + noise * proposal_std
    return SMCState(particles=particles_new, log_weights=lw_rs), ess


def smc_estimate(state: SMCState):
    lw = state.log_weights - jax.scipy.special.logsumexp(state.log_weights)
    w = jnp.exp(lw)
    return jnp.sum(state.particles * w[:, None], axis=0)


# ---------------------------------------------------------------------------
# Sharded variant: particles distributed over the mesh `dp` axis
# ---------------------------------------------------------------------------


def sharded_smc_step(mesh: Mesh, log_target: Callable, ess_threshold: float = 0.5):
    """Build a pjit-able step over particles sharded on axis 'dp'.

    Global systematic resampling: per-shard weights are combined with a
    `psum`-based logsumexp; parent indices are computed against the *global*
    cumulative weights (all_gathered — the weights vector is small even for
    1M particles) and each shard gathers its parents with one all_gather of
    particles. For huge D, swap the all_gather for a ppermute ring exchange.
    """

    from jax import shard_map

    def step(key, particles, log_weights, proposal_std):
        n_local = particles.shape[0]
        axis = "dp"
        n_dev = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        lp = jax.vmap(log_target)(particles)
        lw = log_weights + lp
        # global normalization
        m_local = jnp.max(lw)
        m = jax.lax.pmax(m_local, axis)
        z = jax.lax.psum(jnp.sum(jnp.exp(lw - m)), axis)
        lw_norm = lw - (m + jnp.log(z))
        ess = 1.0 / jax.lax.psum(jnp.sum(jnp.exp(2.0 * lw_norm)), axis)
        n_global = n_local * n_dev
        do_resample = ess < ess_threshold * n_global

        # global weights and particles on every shard
        w_all = jax.lax.all_gather(jnp.exp(lw_norm), axis).reshape(-1)
        parts_all = jax.lax.all_gather(particles, axis).reshape(n_global, -1)
        cum = jnp.cumsum(w_all)
        k_r, k_m = jax.random.split(jax.random.fold_in(key, 0))
        u0 = jax.random.uniform(k_r, (), particles.dtype) / n_global
        us = u0 + (me * n_local + jnp.arange(n_local, dtype=particles.dtype)) / n_global
        parents = jnp.clip(jnp.searchsorted(cum, us), 0, n_global - 1)
        resampled = parts_all[parents]
        particles_rs = jnp.where(do_resample, resampled, particles)
        lw_rs = jnp.where(do_resample, jnp.full_like(lw, -jnp.log(1.0 * n_global)), lw_norm)
        noise = jax.random.normal(jax.random.fold_in(k_m, me), particles_rs.shape, particles_rs.dtype)
        particles_new = particles_rs + noise * proposal_std
        return particles_new, lw_rs, ess

    return shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("dp", None), P("dp"), P()),
        out_specs=(P("dp", None), P("dp"), P()),
        check_vma=False,
    )
