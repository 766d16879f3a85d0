"""Laplace posterior over the factor graph + graph log-density helpers."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..graph.factors import GraphData, retract
from ..graph.solver import SolveResult, graph_chi2, laplace_covariance


def graph_logprob(poses0, graph: GraphData) -> Callable:
    """log p(delta) = -0.5 chi2(poses0 ⊞ delta) over stacked local coords
    (6K,). The density HMC/NUTS/SMC sample (BASELINE.json configs 3-5)."""
    K = poses0.shape[0]

    def logprob(delta):
        poses = jax.vmap(retract)(poses0, delta.reshape(K, 6))
        return -0.5 * graph_chi2(poses, graph)

    return logprob


def laplace_sample(key, result: SolveResult, n_samples: int):
    """Draw pose-perturbation samples from N(0, H^{-1})."""
    cov = laplace_covariance(result)
    L = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(cov.shape[0], dtype=cov.dtype))
    z = jax.random.normal(key, (n_samples, cov.shape[0]), cov.dtype)
    return z @ L.T
