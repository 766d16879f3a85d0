"""Repro for tunneled-TPU dispatch-latency poisoning (see README
"Measurement discipline" and bench.py): interleaves a hot batched-GICP
timing probe with graph freeze / logprob / HMC stages to show which host
sync poisons subsequent dispatch latency on the axon tunnel.

Run: python scripts/diagnose_dispatch_poison.py   (ambient env = TPU)
"""
import time, numpy as np, jax, jax.numpy as jnp
dtype = jnp.float32

def t_gicp(tag):
    from gorio_tpu.core.pointcloud import random_cloud
    from gorio_tpu.registration.gicp import GICPConfig, _gicp_align_jit
    B2 = 8
    tgts = jax.vmap(lambda k: random_cloud(k, 1024, capacity=1024, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(8), B2))
    srcs = tgts._replace(xyz=tgts.xyz + jnp.asarray([0.3, 0.1, 0.0], dtype))
    cfgb = GICPConfig()
    fb = jax.jit(jax.vmap(lambda s, t: _gicp_align_jit(s, t, jnp.eye(4, dtype=dtype), cfgb).T))
    Ts = fb(srcs, tgts); Ts.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20): Ts = fb(srcs, tgts)
    Ts.block_until_ready()
    print(f"[{tag}] gicp verify: {B2*20/(time.perf_counter()-t0):.1f} aligns/s", flush=True)

t_gicp("fresh")
from gorio_tpu.graph.graph import PoseGraph
from gorio_tpu.inference.laplace import graph_logprob
K = 50
g = PoseGraph(dtype=np.float32)
rng2 = np.random.default_rng(11)
Ts = [np.eye(4)]
for _ in range(K - 1):
    d = np.eye(4); d[:3, 3] = [1.0, 0.02, 0.0] + rng2.normal(scale=0.01, size=3)
    Ts.append(Ts[-1] @ d)
for T in Ts: g.add_pose(T)
for k in range(1, K):
    g.add_between(k - 1, k, np.linalg.inv(Ts[k - 1]) @ Ts[k], info=np.eye(6) * 25.0)
g.add_prior(0, Ts[0], info=np.eye(6) * 1e4)
poses0, gdata = g.freeze()
t_gicp("after freeze")
lp = graph_logprob(poses0, gdata)
v = jax.jit(lp)(jnp.zeros(300, dtype)); v.block_until_ready()
t_gicp("after logprob compile+run")
from gorio_tpu.inference.hmc import run_hmc
f = jax.jit(jax.vmap(lambda k: run_hmc(k, lp, jnp.zeros(300, dtype), n_samples=64, step_size=0.02, n_leapfrog=16)[0]))
out = f(jax.random.split(jax.random.PRNGKey(7), 16)); out.block_until_ready()
t_gicp("after hmc")
