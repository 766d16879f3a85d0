"""Ground segmentation — batched Patchwork++ (Go-RIO variant).

TPU-native counterpart of the modified Patchwork++ in
`4DRadarSLAM/include/patchworkpp/patchworkpp.hpp` (SURVEY.md §2 #6):

  * CZM binning (`pc2czm`, `:1160`) becomes a per-point (zone, ring, sector)
    -> patch-id computation; Go-RIO's radar CZM is tiny (zones with
    rings {4,4,2,2} x sectors {3,1,1,3} = 24 patches, `Params`:165-166),
  * per-patch R-GPF plane fits (`extract_piecewiseground`, `:1024-1127`)
    become masked segment-reduce covariance + batched 3x3 eigh over ALL
    patches at once, iterated `num_iter` times,
  * seed selection (lowest-point representatives, `extract_initial_seeds`)
    uses a (P, N) masked top-k — exact, since P is tiny,
  * the Go-RIO covariance-weighted whole-ground refinement
    (`estimate_plane_cov`, `:497-585`, Ceres) becomes a few IRLS
    normal-equation solves with the same per-point polar covariances,
  * under-ground multipath removal (`:867-879`) masks points > 1 m below the
    refined plane.

A-GLE / TGR adaptive thresholds (`:894-990`) are carried as an explicit
`AGLEState` the caller threads through frames (the reference mutates member
vectors); `update_agle` reproduces the mean+std update rule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.pointcloud import PointCloud
from .covariances import polar_covariances


class GroundSegConfig(NamedTuple):
    """Defaults mirror `patchworkpp.hpp` Params (`:126-167`, Go-RIO values)."""

    sensor_height: float = 0.7
    num_iter: int = 4
    num_lpr: int = 20
    num_min_pts: int = 10
    th_seeds: float = 0.5
    th_dist: float = 1.0
    max_range: float = 50.0
    min_range: float = 1.0
    uprightness_thr: float = 0.5
    adaptive_seed_selection_margin: float = -1.2
    num_zones: int = 4
    rings_per_zone: tuple = (4, 4, 2, 2)
    sectors_per_zone: tuple = (3, 1, 1, 3)
    enable_RNR: bool = True
    rnr_ver_angle_thr: float = -15.0
    rnr_intensity_thr: float = 0.1
    # Go-RIO radar height gate for ground candidates (`:1102,1106`)
    radar_height_gate: float = 0.5
    underground_dist: float = -1.0  # `:874`
    refine_iters: int = 3

    @property
    def num_patches(self) -> int:
        return sum(r * s for r, s in zip(self.rings_per_zone, self.sectors_per_zone))


class GroundSegResult(NamedTuple):
    ground_mask: jax.Array  # (N,)
    nonground_mask: jax.Array  # (N,)
    removed_mask: jax.Array  # (N,) under-ground artifacts
    plane: jax.Array  # (4,) refined [nx, ny, nz, d], |n|=1, nz>0
    patch_normal: jax.Array  # (P, 3)
    patch_mean_z: jax.Array  # (P,)
    patch_valid: jax.Array  # (P,)
    patch_flatness: jax.Array  # (P,) smallest-eig flatness of the patch fit


class AGLEState(NamedTuple):
    """Adaptive ground-likelihood thresholds per ring-of-interest."""

    elevation_thr: jax.Array  # (4,)
    flatness_thr: jax.Array  # (4,)
    count: jax.Array  # (4,)

    @staticmethod
    def init(dtype=jnp.float64):
        return AGLEState(
            elevation_thr=jnp.zeros(4, dtype),
            flatness_thr=jnp.zeros(4, dtype),
            count=jnp.zeros(4, dtype),
        )


def _zone_boundaries(cfg: GroundSegConfig):
    """Patchwork++ standard radial zone split."""
    mn, mx = cfg.min_range, cfg.max_range
    return [mn, (7 * mn + mx) / 8.0, (3 * mn + mx) / 4.0, (mn + mx) / 2.0, mx]


def _patch_ids(xyz, cfg: GroundSegConfig):
    """(zone, ring, sector) -> flat patch id; out-of-range -> P (dropped)."""
    r = jnp.linalg.norm(xyz[:, :2], axis=-1)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0]) + jnp.pi  # [0, 2pi)
    bounds = _zone_boundaries(cfg)
    P = cfg.num_patches
    pid = jnp.full(xyz.shape[0], P, jnp.int32)
    offset = 0
    for z in range(cfg.num_zones):
        lo, hi = bounds[z], bounds[z + 1]
        in_zone = (r >= lo) & (r < hi)
        nr, ns = cfg.rings_per_zone[z], cfg.sectors_per_zone[z]
        ring = jnp.clip(((r - lo) / (hi - lo) * nr).astype(jnp.int32), 0, nr - 1)
        sector = jnp.clip((theta / (2 * jnp.pi) * ns).astype(jnp.int32), 0, ns - 1)
        pid = jnp.where(in_zone, offset + ring * ns + sector, pid)
        offset += nr * ns
    return pid


def _plane_from_masked(xyz, w, pid, P):
    """Per-patch PCA plane from weighted points: returns normal (P,3),
    d (P,), mean (P,3), count (P,), flatness (P,)."""
    cnt = jax.ops.segment_sum(w, pid, num_segments=P + 1)[:P]
    mean = jax.ops.segment_sum(xyz * w[:, None], pid, num_segments=P + 1)[:P]
    mean = mean / jnp.maximum(cnt, 1.0)[:, None]
    centered = xyz - mean[jnp.clip(pid, 0, P - 1)]
    outer = centered[:, :, None] * centered[:, None, :] * w[:, None, None]
    cov = jax.ops.segment_sum(outer, pid, num_segments=P + 1)[:P]
    cov = cov / jnp.maximum(cnt, 1.0)[:, None, None]
    evals, evecs = jnp.linalg.eigh(cov + 1e-12 * jnp.eye(3, dtype=xyz.dtype))
    normal = evecs[:, :, 0]  # smallest eigenvalue
    normal = normal * jnp.where(normal[:, 2:3] < 0, -1.0, 1.0)
    d = -jnp.einsum("pi,pi->p", normal, mean)
    flatness = evals[:, 0] / jnp.maximum(evals[:, 1] + evals[:, 2], 1e-12)
    return normal, d, mean, cnt, flatness


@partial(jax.jit, static_argnames=("cfg",))
def estimate_ground(
    cloud: PointCloud, cfg: GroundSegConfig = GroundSegConfig(), agle: AGLEState | None = None
) -> GroundSegResult:
    xyz = cloud.xyz
    n = cloud.capacity
    dtype = xyz.dtype
    P = cfg.num_patches

    valid = cloud.mask
    # RNR (`patchworkpp.hpp:657`): steep-downward low-intensity returns
    if cfg.enable_RNR:
        r2d = jnp.linalg.norm(xyz[:, :2], axis=-1)
        ver_deg = jnp.rad2deg(jnp.arctan2(xyz[:, 2], jnp.maximum(r2d, 1e-9)))
        noise = (
            (ver_deg < cfg.rnr_ver_angle_thr)
            & (cloud.intensity < cfg.rnr_intensity_thr)
            & (xyz[:, 2] < -cfg.sensor_height - 0.8)
        )
        valid = valid & ~noise

    pid = jnp.where(valid, _patch_ids(xyz, cfg), P)

    # --- seeds: mean of the num_lpr lowest z per patch + th_seeds ----------
    z = xyz[:, 2]
    # adaptive seed margin: drop points far below -sensor_height (`:1177-1183`)
    seed_ok = z > cfg.adaptive_seed_selection_margin * cfg.sensor_height
    # Go-RIO radar gate: ground candidates must sit near/below sensor height
    seed_ok = seed_ok & (z < -cfg.sensor_height + cfg.radar_height_gate)
    big = jnp.asarray(1e9, dtype)
    z_mat = jnp.where(
        (pid[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None]) & seed_ok[None, :],
        z[None, :],
        big,
    )  # (P, N)
    low_k, _ = jax.lax.top_k(-z_mat, cfg.num_lpr)  # (P, num_lpr) of -z
    low_k = -low_k
    k_valid = low_k < big / 2
    lpr = jnp.sum(jnp.where(k_valid, low_k, 0.0), axis=1) / jnp.maximum(
        jnp.sum(k_valid, axis=1), 1
    )
    ground = valid & seed_ok & (z < lpr[jnp.clip(pid, 0, P - 1)] + cfg.th_seeds) & (pid < P)

    # --- R-GPF iterations (`:1024-1127`) ----------------------------------
    normal = jnp.zeros((P, 3), dtype)
    dplane = jnp.zeros((P,), dtype)
    flat = jnp.zeros((P,), dtype)
    cnt = jnp.zeros((P,), dtype)
    mean = jnp.zeros((P, 3), dtype)
    for _ in range(cfg.num_iter):
        w = ground.astype(dtype)
        normal, dplane, mean, cnt, flat = _plane_from_masked(xyz, w, pid, P)
        dist = jnp.einsum("ni,ni->n", normal[jnp.clip(pid, 0, P - 1)], xyz) + dplane[
            jnp.clip(pid, 0, P - 1)
        ]
        ground = (
            valid
            & (pid < P)
            & (jnp.abs(dist) < cfg.th_dist)
            & (z < -cfg.sensor_height + cfg.radar_height_gate)
        )

    # --- patch classification (uprightness + elevation A-GLE) + TGR --------
    upright = jnp.abs(normal[:, 2]) > cfg.uprightness_thr
    enough = cnt >= cfg.num_min_pts
    if agle is not None:
        warm = agle.count[0] > 10
        elev_thr = jnp.where(warm, agle.elevation_thr[0], -cfg.sensor_height + 1.0)
        # TGR (`temporal_ground_revert`, `:952-1010`): patches failing the
        # elevation gate are reverted to ground when flatter than the adaptive
        # flatness threshold (mean+std of recent ground-patch flatness)
        flat_thr = jnp.where(warm, agle.flatness_thr[0], 0.0)
    else:
        elev_thr = -cfg.sensor_height + 1.0
        flat_thr = jnp.zeros((), dtype)
    elev_ok = mean[:, 2] < elev_thr
    tgr_revert = upright & enough & ~elev_ok & (flat < flat_thr)
    patch_is_ground = (upright & enough & elev_ok) | tgr_revert
    ground = ground & patch_is_ground[jnp.clip(pid, 0, P - 1)]

    # --- Go-RIO whole-ground covariance-weighted refinement ----------------
    cov_polar = polar_covariances(xyz)  # (N, 3, 3), same model as APDGICP
    wg = ground.astype(dtype)
    n_g = jnp.maximum(jnp.sum(wg), 1.0)
    gmean = jnp.sum(xyz * wg[:, None], axis=0) / n_g
    gc = (xyz - gmean) * wg[:, None]
    gcov = gc.T @ gc / n_g
    evals, evecs = jnp.linalg.eigh(gcov + 1e-12 * jnp.eye(3, dtype=dtype))
    nvec = evecs[:, 0]
    nvec = nvec * jnp.where(nvec[2] < 0, -1.0, 1.0)
    dref = -nvec @ gmean
    plane = jnp.concatenate([nvec, dref[None]])
    for _ in range(cfg.refine_iters):
        nv = plane[:3]
        sig2 = jnp.einsum("i,nij,j->n", nv, cov_polar, nv) + 1e-6
        wts = wg / sig2
        # linear LSQ on (n, d): minimize sum w (n.p + d)^2 s.t. scale fixed by
        # renormalizing after the solve (Gauss-Newton on the normalized cost)
        A = jnp.concatenate([xyz, jnp.ones((n, 1), dtype)], axis=1)
        H = A.T @ (A * wts[:, None])
        # smallest eigenvector of H = homogeneous LSQ solution
        ev, evec = jnp.linalg.eigh(H + 1e-9 * jnp.eye(4, dtype=dtype))
        sol = evec[:, 0]
        nrm = jnp.linalg.norm(sol[:3])
        sol = sol / jnp.maximum(nrm, 1e-12)
        sol = sol * jnp.where(sol[2] < 0, -1.0, 1.0)
        plane = sol

    # --- under-ground multipath removal (`:867-879`) -----------------------
    signed = xyz @ plane[:3] + plane[3]
    removed = valid & (signed < cfg.underground_dist)
    ground_final = ground & ~removed
    nonground = valid & ~ground_final & ~removed

    return GroundSegResult(
        ground_mask=ground_final,
        nonground_mask=nonground,
        removed_mask=removed | (cloud.mask & ~valid),
        plane=plane,
        patch_normal=normal,
        patch_mean_z=mean[:, 2],
        patch_valid=patch_is_ground,
        patch_flatness=flat,
    )


def update_agle(state: AGLEState, result: GroundSegResult, decay: float = 0.95) -> AGLEState:
    """EMA counterpart of the reference's elevation/flatness storage
    (`update_elevation_thr`: thr = mean + 3*std, `:894-922`;
    `update_flatness_thr`: thr = mean + std, `:925-950` — the reference keeps
    bounded per-ring sample vectors; an EMA over per-frame statistics is the
    fixed-memory equivalent)."""
    valid = result.patch_valid
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    mz = jnp.where(valid, result.patch_mean_z, 0.0)
    mean_z = jnp.sum(mz) / n_valid
    var_z = jnp.sum(jnp.where(valid, (result.patch_mean_z - mean_z) ** 2, 0.0)) / n_valid
    new_elev = mean_z + 3.0 * jnp.sqrt(var_z)
    mf = jnp.where(valid, result.patch_flatness, 0.0)
    mean_f = jnp.sum(mf) / n_valid
    var_f = jnp.sum(jnp.where(valid, (result.patch_flatness - mean_f) ** 2, 0.0)) / n_valid
    new_flat = mean_f + jnp.sqrt(var_f)
    warm = state.count[0] > 0
    elev = jnp.where(warm, decay * state.elevation_thr[0] + (1 - decay) * new_elev, new_elev)
    flat = jnp.where(warm, decay * state.flatness_thr[0] + (1 - decay) * new_flat, new_flat)
    return AGLEState(
        elevation_thr=jnp.full_like(state.elevation_thr, elev),
        flatness_thr=jnp.full_like(state.flatness_thr, flat),
        count=state.count + 1,
    )
