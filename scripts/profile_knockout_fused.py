"""Knockout timing of the FUSED insert path: run growing prefixes of the
exact production graph; consecutive differences = in-graph stage cost."""
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
pos_np = np.zeros(3, np.float32)
state0 = create_state(config, origin_blocks_for_position(pos_np, config))
origin = state0.origin_blocks


def prefix(stop):
    @jax.jit
    def fn(state, points, n, position):
        px, py, pz = points[:, 0], points[:, 1], points[:, 2]
        bkey, okey, pt_ovf = integrate.point_keys_soa(px, py, pz, n, origin,
                                                      config)
        if stop == "keys":
            return bkey, okey
        sb, so, px, py, pz = integrate.sort_points_soa(px, py, pz, bkey,
                                                       okey)
        if stop == "sort":
            return sb, px
        nx, ny, nz = integrate.estimate_normals_dispatch(
            px, py, pz, sb, so, position, origin, config)
        if stop == "normals":
            return nx, ny
        pkeys, psd, pw, counts = fused_integrate.fused_tile_partials(
            px, py, pz, nx, ny, nz, sb, position, origin * 8,
            nb=config.tile_nb, k=config.dda_steps, res=config.sdf_res,
            trunc=config.sdf_trunc, extent=config.blocks_per_axis * 8,
            interpret=False)
        if stop == "stageA":
            return pkeys, psd
        n_valid = jnp.sum(counts[:, 0])
        tile_ovf = jnp.sum(counts[:, 1])
        samp_ovf = jnp.sum(counts[:, 2])
        st, m = integrate.update_pool_tiled(
            state, pkeys, psd, pw, tile_ovf, n_valid, samp_ovf, pt_ovf,
            config, interpret=False)
        return st.pool_sd, st.n_blocks
    return fn


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:20s} {dt:8.2f} ms", flush=True)
    return dt


prev = 0.0
for stop in ("keys", "sort", "normals", "stageA", "stageB"):
    dt = timeit(f"prefix:{stop}", prefix(stop), state0, points, n, position)
    print(f"   -> marginal {dt - prev:8.2f} ms", flush=True)
    prev = dt

state = create_state(config, origin_blocks_for_position(pos_np, config))
state, _ = integrate.insert_step(state, points, n, position, config)
sync((state.pool_sd,))
t0 = time.perf_counter()
for _ in range(10):
    state, metrics = integrate.insert_step(state, points, n, position, config)
sync((state.pool_sd,))
print(f"{'insert_step(bench)':20s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
print("tile_overflow:", int(state.tile_overflow))
