"""Decompose the GICP linearize in-program cost on the ambient backend:
NN kernel / cov gather / APD+inv3+Mahalanobis / H-b einsum reduction.
Each piece is timed inside a fori_loop-chained jit (compute, not dispatch).
Guides the fused-Pallas-kernel scope (VERDICT r3 item 2)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def chain_time(fn, x0, n=50, reps=5):
    import jax

    f = jax.jit(fn)
    out = f(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * n) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gorio_tpu.core import lie
    from gorio_tpu.core.pointcloud import random_cloud
    from gorio_tpu.ops.nn_pallas import nn1_best
    from gorio_tpu.registration.gicp import (
        GICPConfig, _inv3, apd_polar_cov, make_gicp_callbacks, prepare_gicp,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    dtype = jnp.float32
    N = 4096
    tgt = random_cloud(jax.random.PRNGKey(0), N, capacity=N, dtype=dtype)
    shift = jnp.asarray([0.4, 0.15, 0.02], dtype)
    src = tgt._replace(xyz=jnp.where(tgt.mask[:, None], tgt.xyz + shift, tgt.xyz))
    cfg = GICPConfig()
    prob = prepare_gicp(src, tgt, cfg)
    linearize, _ = make_gicp_callbacks(prob, cfg)
    eyeT = jnp.eye(4, dtype=dtype)
    CH = 50

    def loop(body, x0):
        def f(x):
            return jax.lax.fori_loop(0, CH, body, x)
        return f

    # full linearize
    def full_body(i, T):
        cost, H, b, _ = linearize(T)
        return T * (1.0 + 0.0 * cost)

    t_full = chain_time(loop(full_body, eyeT), eyeT, CH)

    # NN only
    def nn_body(i, x):
        _, d2 = nn1_best(x, prob.tgt_xyz, ref_mask=prob.tgt_mask)
        return x * (1.0 + 0.0 * jnp.sum(d2))

    t_nn = chain_time(loop(nn_body, src.xyz), src.xyz, CH)

    # NN + gathers (tgt xyz/cov/cluster by idx)
    def gather_body(i, x):
        idx, d2 = nn1_best(x, prob.tgt_xyz, ref_mask=prob.tgt_mask)
        g = (jnp.sum(prob.tgt_cov[idx]) + jnp.sum(prob.tgt_xyz[idx])
             + jnp.sum(prob.tgt_cluster[idx]) + jnp.sum(d2))
        return x * (1.0 + 0.0 * g)

    t_gather = chain_time(loop(gather_body, src.xyz), src.xyz, CH)

    # mahalanobis pipeline on pre-gathered covs (no NN, no gather):
    covB0 = prob.tgt_cov  # stand-in for gathered
    def mah_body(i, x):
        cov_d = apd_polar_cov(x, cfg.dist_var, cfg.azimuth_var_deg, cfg.elevation_var_deg)
        RCR = (covB0 + cov_d) + (prob.src_cov + cov_d)
        mah = _inv3(RCR)
        return x * (1.0 + 0.0 * jnp.sum(mah))

    t_mah = chain_time(loop(mah_body, src.xyz), src.xyz, CH)

    # H/b einsum reduction on fixed mah/err
    mah0 = _inv3(covB0 + prob.src_cov)
    err0 = prob.tgt_xyz - prob.src_xyz
    okf0 = prob.src_mask.astype(dtype)

    def hb_body(i, x):
        sk = lie.hat(x)
        MS = mah0 @ sk
        H_rr = jnp.einsum("nji,njk,n->ik", sk, MS, okf0)
        H_rt = -jnp.einsum("nji,njk,n->ik", sk, mah0, okf0)
        H_tt = jnp.einsum("nij,n->ij", mah0, okf0)
        m_err = jnp.einsum("nij,nj->ni", mah0, err0)
        b_r = jnp.einsum("nji,nj,n->i", sk, m_err, okf0)
        s = jnp.sum(H_rr) + jnp.sum(H_rt) + jnp.sum(H_tt) + jnp.sum(b_r)
        return x * (1.0 + 0.0 * s)

    t_hb = chain_time(loop(hb_body, src.xyz), src.xyz, CH)

    print(f"full linearize: {t_full:.4f} ms")
    print(f"nn only:        {t_nn:.4f} ms")
    print(f"nn+gather:      {t_gather:.4f} ms  (gather ~{t_gather-t_nn:.4f})")
    print(f"apd+inv3:       {t_mah:.4f} ms")
    print(f"H/b einsums:    {t_hb:.4f} ms")
    print(f"unaccounted:    {t_full - t_gather - t_mah - t_hb + t_nn:.4f} ms")


if __name__ == "__main__":
    main()
