"""GP kernel integral tests: analytic forms vs numerical quadrature.

Mirrors the role of the reference's (absent) kernel tests: we verify each
closed form in `gorio_tpu.core.gp` against brute-force integration of the SE
kernel, which is the ground truth both we and `math_utils.h:102-186` encode.
"""

import jax.numpy as jnp
import numpy as np

from gorio_tpu.core import gp

L2 = 0.0036  # (3/50Hz)^2 as in `preint.h:1467`
SF2 = 0.8


def _k(x1, x2):
    return SF2 * np.exp(-((x1 - x2) ** 2) / (2 * L2))


def test_se_kernel():
    x1 = jnp.linspace(0.0, 1.0, 7)
    x2 = jnp.linspace(-0.3, 0.9, 5)
    K = np.asarray(gp.se_kernel(x1, x2, L2, SF2))
    ref = _k(np.asarray(x1)[:, None], np.asarray(x2)[None, :])
    np.testing.assert_allclose(K, ref, rtol=1e-12, atol=1e-300)


def test_se_kernel_integral_vs_quadrature():
    a = 0.05
    b = jnp.array([0.1, 0.4, 0.9])
    x2 = jnp.linspace(0.0, 1.0, 6)
    K = np.asarray(gp.se_kernel_integral(a, b, x2, L2, SF2))
    s = np.linspace(0, 1, 200001)
    for i, bi in enumerate(np.asarray(b)):
        grid = np.linspace(a, bi, 20001)
        for j, xj in enumerate(np.asarray(x2)):
            ref = np.trapezoid(_k(grid, xj), grid)
            np.testing.assert_allclose(K[i, j], ref, rtol=1e-6, atol=1e-9)


def test_se_kernel_integral_dt_is_derivative():
    a = 0.0
    x2 = jnp.linspace(0.0, 1.0, 4)
    b = jnp.array([0.3, 0.7])
    eps = 1e-6
    K_hi = np.asarray(gp.se_kernel_integral(a, b + eps, x2, L2, SF2))
    K_lo = np.asarray(gp.se_kernel_integral(a, b - eps, x2, L2, SF2))
    num = (K_hi - K_lo) / (2 * eps)
    # d/db int_a^b k(s,x2) ds = k(b, x2); the reference's "Dt" form subtracts
    # k(a, x2) (it is the dt-shift derivative of both bounds moving together)
    ana = np.asarray(gp.se_kernel_integral_dt(a, b, x2, L2, SF2))
    ref_k_b = _k(np.asarray(b)[:, None], np.asarray(x2)[None, :])
    ref_k_a = _k(a, np.asarray(x2))[None, :]
    np.testing.assert_allclose(num, ref_k_b, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(ana, ref_k_b - ref_k_a, rtol=1e-10, atol=1e-15)


def test_se_kernel_integral2_vs_quadrature():
    a = 0.0
    b = jnp.array([0.5])
    x2 = jnp.array([0.2, 0.8])
    K2 = np.asarray(gp.se_kernel_integral2(a, b, x2, L2, SF2))
    for j, xj in enumerate(np.asarray(x2)):
        outer = np.linspace(a, 0.5, 2001)
        vals = []
        for s in outer:
            grid = np.linspace(a, s, 501)
            vals.append(np.trapezoid(_k(grid, xj), grid))
        ref = np.trapezoid(vals, outer)
        np.testing.assert_allclose(K2[0, j], ref, rtol=1e-5, atol=1e-8)


def test_kss_int_vs_quadrature():
    a, b = 0.0, 0.6
    val = float(gp.kss_int(a, b, L2, SF2))
    g = np.linspace(a, b, 2001)
    kk = _k(g[:, None], g[None, :])
    ref = np.trapezoid(np.trapezoid(kk, g, axis=1), g)
    np.testing.assert_allclose(val, ref, rtol=1e-6)


def test_gp_inv():
    x = jnp.linspace(0, 1, 20)
    K = gp.se_kernel(x, x, L2, SF2)
    Kinv = gp.gp_inv(K, 1e-4)
    prod = np.asarray((K + 1e-4 * jnp.eye(20)) @ Kinv)
    np.testing.assert_allclose(prod, np.eye(20), atol=1e-8)


def test_linear_interp():
    t = jnp.array([0.0, 1.0, 2.0, 4.0])
    d = jnp.array([0.0, 2.0, 2.0, -2.0])
    q = jnp.array([0.5, 1.5, 3.0, 5.0, -1.0])
    out = np.asarray(gp.linear_interp(q, t, d))
    np.testing.assert_allclose(out, [1.0, 2.0, 0.0, -4.0, -2.0], atol=1e-12)
