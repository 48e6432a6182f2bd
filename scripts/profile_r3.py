"""Round-3 stage breakdown of the fused insert on TPU (dev tool).

Times each pipeline span with one-element readback syncs (block_until_ready
does not wait through the axon relay).  Spans:
  keys        point_keys_soa
  sort        5-operand (bkey, okey, px, py, pz) 2-key sort
  normals     pallas segmented-moment normals
  stageA      fused DDA+accumulate kernel
  stageB      update_pool_tiled (plan + merge kernel + directory)
  full        insert_step (donated, as bench.py measures)
"""
import functools
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
origin = origin_blocks_for_position(pos_np, config)
origin_j = jnp.asarray(origin)


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    out = fn(*args)   # absorb readback-degradation quirk
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:30s} {dt:8.2f} ms", flush=True)
    return dt


px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]


@jax.jit
def keys_fn(px, py, pz):
    return integrate.point_keys_soa(px, py, pz, n, origin_j, config)

bkey, okey, _ = keys_fn(px0, py0, pz0)
t_keys = bench("keys", keys_fn, px0, py0, pz0)


@jax.jit
def sort_fn(px, py, pz, bkey, okey):
    return integrate.sort_points_soa(px, py, pz, bkey, okey)

sb, so, px, py, pz = sort_fn(px0, py0, pz0, bkey, okey)
t_sort = bench("sort (2key+3payload)", sort_fn, px0, py0, pz0, bkey, okey)


@jax.jit
def sort_keys_only(bkey, okey):
    return jax.lax.sort((bkey, okey), num_keys=2)

bench("sort (2key, no payload)", sort_keys_only, bkey, okey)


@jax.jit
def normals_fn(px, py, pz, sb, so, position):
    return integrate.estimate_normals_dispatch(px, py, pz, sb, so, position,
                                               origin_j, config)

nx, ny, nz = normals_fn(px, py, pz, sb, so, position)
t_norm = bench("normals", normals_fn, px, py, pz, sb, so, position)


@jax.jit
def stage_a(px, py, pz, nx, ny, nz, sb, position):
    return fused_integrate.fused_tile_partials(
        px, py, pz, nx, ny, nz, sb, position, origin_j * 8,
        nb=config.tile_nb, k=config.dda_steps, res=config.sdf_res,
        trunc=config.sdf_trunc, extent=config.blocks_per_axis * 8)

pkeys, psd, pw, counts = stage_a(px, py, pz, nx, ny, nz, sb, position)
t_a = bench("stageA fused kernel", stage_a, px, py, pz, nx, ny, nz, sb,
            position)


@functools.partial(jax.jit, donate_argnums=(0,))
def stage_b(state, pkeys, psd, pw):
    z = jnp.zeros((), jnp.int32)
    st, m = integrate.update_pool_tiled(state, pkeys, psd, pw, z, z, z, z,
                                        config, interpret=False)
    return st

state0 = create_state(config, origin)
t_b = bench("stageB plan+merge+dir",
            lambda pk, ps, pw_: stage_b(create_state(config, origin), pk, ps,
                                        pw_),
            pkeys, psd, pw, reps=4)


def full(state):
    return integrate.insert_step(state, points, n, position, config)

st = create_state(config, origin)
st, m = full(st)
sync((st.pool_sd,))
for _ in range(2):
    st, m = full(st)
sync((st.pool_sd,))
t0 = time.perf_counter()
for _ in range(10):
    st, m = full(st)
sync((st.pool_sd,))
t_full = (time.perf_counter() - t0) / 10 * 1e3
print(f"{'FULL insert_step':30s} {t_full:8.2f} ms", flush=True)
print(f"sum of spans: {t_keys + t_sort + t_norm + t_a + t_b:.2f} ms")
print(f"points/s: {n_points / t_full * 1e3 / 1e6:.1f} M")
