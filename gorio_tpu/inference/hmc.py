"""Hamiltonian Monte Carlo / NUTS over trajectory posteriors.

New capability vs the reference (BASELINE.json north star): the factor graph
defines log p(x) = -0.5 chi2(poses ⊞ delta); HMC/NUTS sample the local
coordinates around the GN solution. Chains are `vmap`ed on one chip and
sharded across devices/hosts via `parallel.mesh` — collectives only touch
diagnostics (cross-chain R-hat), so chains ride ICI embarrassingly parallel.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HMCState(NamedTuple):
    position: jax.Array
    log_prob: jax.Array
    grad: jax.Array


class HMCInfo(NamedTuple):
    accept_prob: jax.Array
    accepted: jax.Array
    energy: jax.Array


def hmc_init(logprob_fn: Callable, position) -> HMCState:
    lp, g = jax.value_and_grad(logprob_fn)(position)
    return HMCState(position=position, log_prob=lp, grad=g)


def _leapfrog(logprob_fn, q, p, grad, step_size, n_steps, inv_mass):
    def body(carry, _):
        q, p, grad = carry
        p = p + 0.5 * step_size * grad
        q = q + step_size * (inv_mass * p)
        lp, grad = jax.value_and_grad(logprob_fn)(q)
        p = p + 0.5 * step_size * grad
        return (q, p, grad), lp

    (q, p, grad), lps = jax.lax.scan(body, (q, p, grad), None, length=n_steps)
    return q, p, grad, lps[-1]


def hmc_step(
    key,
    state: HMCState,
    logprob_fn: Callable,
    step_size: float,
    n_leapfrog: int = 16,
    inv_mass=None,
):
    """One Metropolis-adjusted leapfrog trajectory."""
    n = state.position.shape[0]
    if inv_mass is None:
        inv_mass = jnp.ones(n, state.position.dtype)
    k1, k2 = jax.random.split(key)
    p0 = jax.random.normal(k1, (n,), state.position.dtype) / jnp.sqrt(inv_mass)
    q, p, grad, lp = _leapfrog(
        logprob_fn, state.position, p0, state.grad, step_size, n_leapfrog, inv_mass
    )
    h0 = -state.log_prob + 0.5 * jnp.sum(inv_mass * p0 * p0)
    h1 = -lp + 0.5 * jnp.sum(inv_mass * p * p)
    log_accept = jnp.minimum(0.0, h0 - h1)
    accept = jnp.log(jax.random.uniform(k2, (), state.position.dtype)) < log_accept
    new_state = HMCState(
        position=jnp.where(accept, q, state.position),
        log_prob=jnp.where(accept, lp, state.log_prob),
        grad=jnp.where(accept, grad, state.grad),
    )
    return new_state, HMCInfo(
        accept_prob=jnp.exp(log_accept), accepted=accept, energy=h1
    )


class DualAveragingState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_bar: jax.Array
    t: jax.Array


def dual_averaging_init(step_size: float):
    ls = jnp.log(jnp.asarray(step_size))
    return DualAveragingState(
        log_step=ls, log_step_avg=ls, h_bar=jnp.asarray(0.0), t=jnp.asarray(0.0)
    )


def dual_averaging_update(
    da: DualAveragingState, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75
):
    """Nesterov dual averaging (Hoffman & Gelman 2014 step-size adaptation)."""
    t = da.t + 1.0
    h_bar = (1.0 - 1.0 / (t + t0)) * da.h_bar + (target - accept_prob) / (t + t0)
    mu = jnp.log(10.0) + jnp.log(jnp.exp(da.log_step_avg))  # shrink toward 10x init
    log_step = mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * da.log_step_avg
    return DualAveragingState(log_step=log_step, log_step_avg=log_step_avg, h_bar=h_bar, t=t)


@partial(jax.jit, static_argnames=("logprob_fn", "n_samples", "n_leapfrog", "adapt"))
def run_hmc(
    key,
    logprob_fn: Callable,
    position0,
    n_samples: int = 100,
    step_size: float = 0.05,
    n_leapfrog: int = 16,
    adapt: bool = True,
    inv_mass=None,
):
    """Single chain; `vmap` over (key, position0) for many chains.

    `inv_mass` (diagonal) preconditions the kinetic energy — pass the inverse
    Hessian diagonal of the GN solution for pose-graph posteriors, whose
    scales span orders of magnitude (anchor prior vs free poses)."""
    state0 = hmc_init(logprob_fn, position0)
    da0 = dual_averaging_init(step_size)

    def body(carry, k):
        state, da = carry
        eps = jnp.exp(da.log_step)
        new_state, info = hmc_step(k, state, logprob_fn, eps, n_leapfrog, inv_mass)
        da_new = dual_averaging_update(da, info.accept_prob) if adapt else da
        return (new_state, da_new), (new_state.position, info.accept_prob)

    keys = jax.random.split(key, n_samples)
    (final, _), (samples, accepts) = jax.lax.scan(body, (state0, da0), keys)
    return samples, accepts


def potential_scale_reduction(chains):
    """Split R-hat over (n_chains, n_samples, dim)."""
    m, n, d = chains.shape
    half = n // 2
    split = chains[:, : 2 * half].reshape(2 * m, half, d)
    means = jnp.mean(split, axis=1)
    vars_ = jnp.var(split, axis=1, ddof=1)
    W = jnp.mean(vars_, axis=0)
    B = half * jnp.var(means, axis=0, ddof=1)
    var_hat = (half - 1) / half * W + B / half
    return jnp.sqrt(var_hat / jnp.maximum(W, 1e-30))


# ---------------------------------------------------------------------------
# NUTS (fixed-depth doubling with multinomial sampling — the modern variant)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("logprob_fn", "max_depth"))
def nuts_step(key, state: HMCState, logprob_fn: Callable, step_size, max_depth: int = 6):
    """Iterative NUTS with a static trajectory budget of 2^max_depth leapfrog
    steps, multinomial state selection and a U-turn stop criterion.

    This is the XLA-friendly re-expression: instead of recursive tree
    doubling, run the 2^D steps as one scan, accumulate per-step weights
    log w_i = -H_i, and pick a state by online multinomial (Gumbel) sampling
    among the prefix that passes the U-turn check. Statistically this is the
    "progressive sampling along the trajectory" scheme of NUTS; the stop
    criterion uses the same start-to-current U-turn test."""
    n = state.position.shape[0]
    dtype = state.position.dtype
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = jax.random.normal(k1, (n,), dtype)
    direction = jnp.where(jax.random.bernoulli(k2), 1.0, -1.0).astype(dtype)
    eps = step_size * direction
    h0 = -state.log_prob + 0.5 * jnp.sum(p0 * p0)

    n_steps = 2**max_depth
    gumbels = -jnp.log(-jnp.log(jax.random.uniform(k3, (n_steps,), dtype) + 1e-30) + 1e-30)

    def body(carry, g):
        q, p, grad, best_q, best_lp, best_grad, best_score, stopped, q_minus = carry
        p_half = p + 0.5 * eps * grad
        q_new = q + eps * p_half
        lp, grad_new = jax.value_and_grad(logprob_fn)(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        h = -lp + 0.5 * jnp.sum(p_new * p_new)
        # U-turn: momentum pointing back toward the start
        dq = q_new - q_minus
        uturn = (jnp.dot(dq, p_new) < 0) | (h - h0 > 1000.0)
        stopped_new = stopped | uturn
        # multinomial selection weight: log w = h0 - h (+ gumbel)
        score = h0 - h + g
        take = (~stopped_new) & (score > best_score)
        return (
            q_new,
            p_new,
            grad_new,
            jnp.where(take, q_new, best_q),
            jnp.where(take, lp, best_lp),
            jnp.where(take, grad_new, best_grad),
            jnp.where(take, score, best_score),
            stopped_new,
            q_minus,
        ), None

    init = (
        state.position,
        p0,
        state.grad,
        state.position,
        state.log_prob,
        state.grad,
        jnp.asarray(-jnp.inf, dtype),
        jnp.asarray(False),
        state.position,
    )
    carry, _ = jax.lax.scan(body, init, gumbels)
    _, _, _, best_q, best_lp, best_grad, best_score, _, _ = carry
    moved = jnp.isfinite(best_score)
    return HMCState(
        position=jnp.where(moved, best_q, state.position),
        log_prob=jnp.where(moved, best_lp, state.log_prob),
        grad=jnp.where(moved, best_grad, state.grad),
    )
