"""Typed pose-graph factors with batched residuals and autodiff Jacobians.

TPU-native counterpart of the reference's g2o layer: `GraphSLAM`'s 16
edge-adders (`src/radar_graph_slam/graph_slam.cpp:88-340`) and the custom edge
types in `include/g2o/*.hpp` (SURVEY.md §2 #9/#16). Instead of heap-allocated
edge objects, each factor family is a struct-of-arrays; residuals are `vmap`ed
and Jacobians come from `jacfwd` w.r.t. the two incident local perturbations.

State convention: pose k is T_k = (R_k, t_k); perturbations are
right-multiplicative with the [exp(rot), trans] split used across the
framework: T(delta) = T . [exp(d_rot), d_trans].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


def retract(T, delta):
    """T . [exp(d_rot), d_trans] — right-multiplicative local update."""
    return T @ lie.se3_exp_split(delta)


# ---------------------------------------------------------------------------
# Factor families (struct-of-arrays, padded with count)
# ---------------------------------------------------------------------------


class BetweenFactors(NamedTuple):
    """SE3-SE3 relative pose factors: odometry, GP-preintegration, loops.

    Parity: `g2o::EdgeSE3` via `GraphSLAM::add_se3_edge` (`graph_slam.cpp:125`).
    residual = log(meas^-1 T_i^-1 T_j) (6,)."""

    i: jax.Array  # (F,) int32
    j: jax.Array  # (F,)
    T_meas: jax.Array  # (F, 4, 4)
    sqrt_info: jax.Array  # (F, 6, 6)
    mask: jax.Array  # (F,) bool
    robust_delta: jax.Array  # (F,) Huber delta; inf = none

    @staticmethod
    def residual(T_i, T_j, T_meas):
        return lie.se3_log(lie.se3_inverse(T_meas) @ (lie.se3_inverse(T_i) @ T_j))


class PriorFactors(NamedTuple):
    """Unary SE3 priors (anchor): residual = log(meas^-1 T_i) (6,).

    Parity: anchor node/edge (`radar_graph_slam_nodelet.cpp:566-579`)."""

    i: jax.Array
    T_meas: jax.Array
    sqrt_info: jax.Array
    mask: jax.Array
    robust_delta: jax.Array

    @staticmethod
    def residual(T_i, T_meas):
        return lie.se3_log(lie.se3_inverse(T_meas) @ T_i)


class PointPriorFactors(NamedTuple):
    """Unary position priors with an axis mask — covers EdgeSE3PriorXYZ
    (GPS 3-dof, `edge_se3_priorxyz.hpp:35-46`: error = t - m), EdgeSE3PriorXY
    (2-dof, axis_mask=[1,1,0]) and EdgeSE3PriorZ ([0,0,1])."""

    i: jax.Array
    p_meas: jax.Array  # (F, 3)
    axis_mask: jax.Array  # (F, 3) 0/1
    sqrt_info: jax.Array  # (F, 3, 3)
    mask: jax.Array
    robust_delta: jax.Array

    @staticmethod
    def residual(T_i, p_meas, axis_mask):
        return (T_i[:3, 3] - p_meas) * axis_mask


class QuatPriorFactors(NamedTuple):
    """Unary orientation priors; parity with EdgeSE3PriorQuat
    (residual = log(R_meas^T R_i))."""

    i: jax.Array
    R_meas: jax.Array  # (F, 3, 3)
    sqrt_info: jax.Array  # (F, 3, 3)
    mask: jax.Array
    robust_delta: jax.Array

    @staticmethod
    def residual(T_i, R_meas):
        return lie.so3_log(jnp.swapaxes(R_meas, -1, -2) @ T_i[:3, :3])


class VecPriorFactors(NamedTuple):
    """Unary direction priors; parity with EdgeSE3PriorVec (a known world
    direction observed in the body frame, e.g. gravity from the IMU):
    residual = R_i^T dir_world - dir_meas (3,)."""

    i: jax.Array
    dir_world: jax.Array  # (F, 3)
    dir_meas: jax.Array  # (F, 3)
    sqrt_info: jax.Array  # (F, 3, 3)
    mask: jax.Array
    robust_delta: jax.Array

    @staticmethod
    def residual(T_i, dir_world, dir_meas):
        return jnp.einsum("ji,j->i", T_i[:3, :3], dir_world) - dir_meas


class GroundPlaneFactors(NamedTuple):
    """Unary ground-plane factors; parity with EdgeSE3Plane semantics with the
    global plane held fixed: the world plane (n_w, d_w) observed in the body
    frame (from `estimators.groundseg`) gives
    residual = [R_i^T n_w - n_meas ; (n_w . t_i + d_w) - d_meas] (4,)."""

    i: jax.Array
    plane_world: jax.Array  # (F, 4) [n_w, d_w]
    plane_meas: jax.Array  # (F, 4) measured in body frame
    sqrt_info: jax.Array  # (F, 4, 4)
    mask: jax.Array
    robust_delta: jax.Array

    @staticmethod
    def residual(T_i, plane_world, plane_meas):
        n_w, d_w = plane_world[:3], plane_world[3]
        r_n = jnp.einsum("ji,j->i", T_i[:3, :3], n_w) - plane_meas[:3]
        r_d = (n_w @ T_i[:3, 3] + d_w) - plane_meas[3]
        return jnp.concatenate([r_n, r_d[None]])


class GraphData(NamedTuple):
    """All factors of a pose graph (fixed shapes; masks mark live entries)."""

    between: BetweenFactors
    priors: PriorFactors
    point_priors: PointPriorFactors
    quat_priors: QuatPriorFactors
    vec_priors: "VecPriorFactors"
    plane_factors: "GroundPlaneFactors"


def huber_weight(chi2, delta):
    """IRLS weight of the Huber kernel on the whitened residual norm
    (rho'(e) = 1 for e <= delta, delta/e beyond); factors with delta = inf are
    unweighted. Parity: `GraphSLAM::add_robust_kernel` + g2o robustification."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-30))
    # keep delta finite inside the division: inf/e in the non-selected branch
    # leaks NaN through `where` in reverse-mode autodiff
    delta_safe = jnp.where(jnp.isinf(delta), 1.0, delta)
    w = jnp.where(e <= delta, 1.0, delta_safe / e)
    return jnp.where(jnp.isinf(delta), 1.0, w)


def _empty_between(capacity, dtype, xp=jnp):
    return BetweenFactors(
        i=xp.zeros((capacity,), xp.int32),
        j=xp.zeros((capacity,), xp.int32),
        T_meas=xp.tile(xp.eye(4, dtype=dtype), (capacity, 1, 1)),
        sqrt_info=xp.tile(xp.eye(6, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def _empty_priors(capacity, dtype, xp=jnp):
    return PriorFactors(
        i=xp.zeros((capacity,), xp.int32),
        T_meas=xp.tile(xp.eye(4, dtype=dtype), (capacity, 1, 1)),
        sqrt_info=xp.tile(xp.eye(6, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def _empty_point_priors(capacity, dtype, xp=jnp):
    return PointPriorFactors(
        i=xp.zeros((capacity,), xp.int32),
        p_meas=xp.zeros((capacity, 3), dtype),
        axis_mask=xp.ones((capacity, 3), dtype),
        sqrt_info=xp.tile(xp.eye(3, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def _empty_quat_priors(capacity, dtype, xp=jnp):
    return QuatPriorFactors(
        i=xp.zeros((capacity,), xp.int32),
        R_meas=xp.tile(xp.eye(3, dtype=dtype), (capacity, 1, 1)),
        sqrt_info=xp.tile(xp.eye(3, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def _empty_vec_priors(capacity, dtype, xp=jnp):
    up = xp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    return VecPriorFactors(
        i=xp.zeros((capacity,), xp.int32),
        dir_world=xp.tile(up, (capacity, 1)),
        dir_meas=xp.tile(up, (capacity, 1)),
        sqrt_info=xp.tile(xp.eye(3, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def _empty_plane_factors(capacity, dtype, xp=jnp):
    up = xp.asarray([0.0, 0.0, 1.0, 0.0], dtype=dtype)
    return GroundPlaneFactors(
        i=xp.zeros((capacity,), xp.int32),
        # two separate buffers: with xp=np these are mutated in place
        plane_world=xp.tile(up, (capacity, 1)),
        plane_meas=xp.tile(up, (capacity, 1)),
        sqrt_info=xp.tile(xp.eye(4, dtype=dtype), (capacity, 1, 1)),
        mask=xp.zeros((capacity,), bool),
        robust_delta=xp.full((capacity,), xp.inf, dtype),
    )


def empty_graph(
    n_between: int,
    n_priors: int = 4,
    n_point_priors: int = 0,
    n_quat_priors: int = 0,
    n_vec_priors: int = 0,
    n_plane_factors: int = 0,
    dtype=jnp.float64,
    xp=jnp,
) -> GraphData:
    """`xp=np` builds host-side numpy buffers — the graph builder fills them
    by plain assignment (no per-factor device dispatches) and converts once."""
    return GraphData(
        between=_empty_between(n_between, dtype, xp),
        priors=_empty_priors(n_priors, dtype, xp),
        point_priors=_empty_point_priors(max(n_point_priors, 1), dtype, xp),
        quat_priors=_empty_quat_priors(max(n_quat_priors, 1), dtype, xp),
        vec_priors=_empty_vec_priors(max(n_vec_priors, 1), dtype, xp),
        plane_factors=_empty_plane_factors(max(n_plane_factors, 1), dtype, xp),
    )
