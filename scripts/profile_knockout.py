"""Knockout timing: run prefixes of the full tiled insert graph on TPU."""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position
from chad_tsdf_tpu.ops import tile_accum

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
        bkey, okey, pt_ovf = integrate.point_keys(points, n, origin, config)
        if stop == "keys":
            return bkey, okey
        pts, sb, so = integrate.sort_points(points, bkey, okey)
        if stop == "sort":
            return pts, sb, so
        s_bkey, s_okey, sd, n_valid, samp_ovf = \
            integrate.compute_sample_grids(pts, sb, so, position, origin,
                                           config)
        if stop == "grids":
            return s_bkey, sd
        pkeys, psd, pw, ovfmask = tile_accum.tile_partials(
            s_bkey, s_okey, sd, nb=config.tile_nb, interpret=False)
        if stop == "tileA":
            return pkeys, psd, pw
        z = jnp.zeros((), jnp.int32)
        st, m = integrate.update_pool_tiled(
            state, pkeys, psd, pw, z, n_valid, samp_ovf, pt_ovf, config)
        return st.pool_sd, st.n_blocks
    return fn


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])   # one-element device readback


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:20s} {dt:8.2f} ms")


for stop in ("keys", "sort", "grids", "tileA", "full"):
    timeit(f"prefix:{stop}", prefix(stop), state0, points, n, position)

# the real insert_step with donation, state evolving like bench.py
state = create_state(config, origin_blocks_for_position(pos_np, config))
state, _ = integrate.insert_step(state, points, n, position, config)
sync((state.pool_sd,))
t0 = time.perf_counter()
for _ in range(10):
    state, metrics = integrate.insert_step(state, points, n, position, config)
sync((state.pool_sd,))
print(f"{'insert_step(bench)':20s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
print("tile_overflow:", int(state.tile_overflow))
