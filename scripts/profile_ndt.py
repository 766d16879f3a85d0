"""Profile NDT align components on TPU (run alone; see memory note on the
axon serialization). Prints run-only times per component."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from gorio_tpu.core.pointcloud import make_cloud
from gorio_tpu.io.pcd import read_pcd
from gorio_tpu.registration.ndt import (
    NDTConfig,
    _gather_correspondences,
    build_voxel_map,
    ndt_align_with_map,
    ndt_score,
)


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:<28}{dt:10.3f} ms")
    return out


def main():
    xyz, _ = read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    rng = np.random.default_rng(0)
    sel = rng.permutation(len(xyz))[:16384]
    cloud = make_cloud(jnp.asarray(xyz[sel], jnp.float32), capacity=16384)
    cfg = NDTConfig(resolution=1.0, neighborhood="direct7", voxel_capacity=32768)
    vm = build_voxel_map(cloud, cfg)
    vm.keys.block_until_ready()
    T = jnp.eye(4, dtype=jnp.float32)

    gather_jit = jax.jit(lambda T: _gather_correspondences(cloud, vm, T, cfg))
    found, mu, C = timed("gather_correspondences", gather_jit, T)

    score_jit = jax.jit(lambda T: ndt_score(cloud, vm, T, cfg))
    timed("ndt_score (incl gather)", score_jit, T)

    def cached_score(T):
        moved = cloud.xyz @ T[:3, :3].T + T[:3, 3]
        x = moved[:, None, :] - mu
        md2 = jnp.einsum("noi,noij,noj->no", x, C, x)
        return jnp.sum(jnp.where(found, jnp.exp(-0.245 * md2), 0.0))

    timed("cached score (math only)", jax.jit(cached_score), T)

    searchsorted_jit = jax.jit(
        lambda q: jnp.searchsorted(vm.keys, q)
    )
    q = jnp.arange(16384 * 7, dtype=jnp.int32) % (2**20)
    timed("searchsorted 114k/32k", searchsorted_jit, q)

    gidx = jnp.arange(16384 * 7, dtype=jnp.int32) % 32768
    timed("gather inv_covs 114k", jax.jit(lambda i: vm.inv_covs[i]), gidx)

    timed("full align", lambda: ndt_align_with_map(cloud, vm, T, cfg), reps=5)


if __name__ == "__main__":
    main()
