"""Fused-kernel phase knockout on TPU: dda / extract / full (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position
from chad_tsdf_tpu.ops import fused_integrate

n_points = 1 << 20
config = MapConfig(max_points=n_points)
rng = np.random.default_rng(420)
d = rng.uniform(-1.0, 1.0, (n_points, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
points = jnp.asarray((d * 5.0).astype(np.float32))
position = jnp.zeros(3, jnp.float32)
n = jnp.int32(n_points)
origin = origin_blocks_for_position(np.zeros(3, np.float32), config)
state = create_state(config, origin)
px, py, pz = points[:, 0], points[:, 1], points[:, 2]
bkey, okey, _ = integrate.point_keys_soa(px, py, pz, n,
                                         state.origin_blocks, config)
sb, so, px, py, pz = integrate.sort_points_soa(px, py, pz, bkey, okey)
nx, ny, nz = integrate.estimate_normals_dispatch(
    px, py, pz, sb, so, position, state.origin_blocks, config)
args = [jnp.asarray(np.asarray(a)) for a in (px, py, pz, nx, ny, nz, sb)]
pos_j = jnp.zeros(3, jnp.float32)
org_j = jnp.asarray(origin) * 8


def run(phase):
    f = jax.jit(lambda *a: fused_integrate.fused_tile_partials(
        *a, pos_j, org_j, nb=config.tile_nb, k=config.dda_steps,
        res=config.sdf_res, trunc=config.sdf_trunc,
        extent=config.blocks_per_axis * 8, interpret=False, _phase=phase))
    out = f(*args)
    np.asarray(out[1][0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    np.asarray(out[1][0, 0])
    return (time.perf_counter() - t0) / 10 * 1e3


phases = sys.argv[1:] or ["dda", "extract", "full"]
for ph in phases:
    print(f"phase {ph:8s}: {run(ph):7.2f} ms", flush=True)
