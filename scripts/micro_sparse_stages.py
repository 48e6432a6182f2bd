"""Stage breakdown of the sample_tile sparse insert on TPU (dev tool)."""
import dataclasses
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
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan
from chad_tsdf_tpu.ops import tile_accum

config = dataclasses.replace(
    MapConfig(block_capacity=1 << 17, touched_capacity=1 << 15),
    accumulate_impl="sample_tile")
bucket = 131072

pts = synthetic_lidar_scan([0.0, 0.0, 0.0], seed=0)
n = len(pts)
pad = np.zeros((bucket, 3), np.float32)
pad[:n] = pts
points = jnp.asarray(pad)
pos = np.float32([0.0, 0.0, 1.7])
origin = origin_blocks_for_position(pos, config)
position = jnp.asarray(pos)
origin_j = jnp.asarray(origin)


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return out, dt


@jax.jit
def samples_fn(points, position):
    b = integrate.compute_samples(points, jnp.int32(n), position, origin_j,
                                  config)
    return b

batch, _ = bench("compute_samples (norm+dda+grid)", samples_fn, points,
                 position)


@jax.jit
def sorts_fn(bkey, payload):
    return jax.lax.sort((bkey, payload), num_keys=1)

(sb, sp), _ = bench("sample sort (1.31M x 2)", sorts_fn, batch.bkey,
                    batch.payload)
sbatch = integrate.SampleBatch(sb, sp, batch.pt_overflow,
                               batch.samp_overflow)


@jax.jit
def stagea_fn(bkey, payload):
    s = bkey.shape[0]
    okey, sd = integrate.unpack_payload(payload, config.sdf_trunc)
    return tile_accum.tile_partials(
        bkey.reshape(1, s), okey.reshape(1, s), sd.reshape(1, s),
        nb=config.sparse_tile_nb, interpret=False)

(pkeys, psd, pw, ovf), _ = bench("stage A tile_partials nb=128", stagea_fn,
                                 sb, sp)


@functools.partial(jax.jit, donate_argnums=(0,))
def stageb_fn(state, pkeys, psd, pw):
    z = jnp.zeros((), jnp.int32)
    st, m = integrate.update_pool_tiled(state, pkeys, psd, pw, z, z, z, z,
                                        config, interpret=False)
    return st

_, _ = bench("stage B update_pool_tiled",
             lambda pk, ps, pw_: stageb_fn(create_state(config, origin), pk,
                                           ps, pw_),
             pkeys, psd, pw, reps=4)

# sub-pieces of stage B
p = pkeys.shape[0]


@jax.jit
def bsort_fn(pk):
    iota = jnp.arange(p, dtype=jnp.int32)
    return jax.lax.sort((pk.reshape(-1), iota), num_keys=1)

(sk, order), _ = bench("  B: partial-key sort (164k x 2)", bsort_fn, pkeys)


@jax.jit
def bgather_fn(psd, pw, order):
    src_c = jnp.clip(order, 0, p - 1)
    return psd[src_c], pw[src_c]

_, _ = bench("  B: row gather (164k x 512) x2", bgather_fn, psd, pw, order)


# ---- chained graph without the fallback cond, and the full insert ----
@functools.partial(jax.jit, donate_argnums=(0,))
def chained_fn(state, points, position):
    batch = integrate.compute_samples(points, jnp.int32(n), position,
                                      origin_j, config)
    batch = integrate.sort_samples(batch)
    s = batch.bkey.shape[0]
    okey, sd = integrate.unpack_payload(batch.payload, config.sdf_trunc)
    nv = jnp.sum(batch.bkey != integrate.INT32_MAX).astype(jnp.int32)
    pkeys, psd, pw, ovfmask = tile_accum.tile_partials(
        batch.bkey.reshape(1, s), okey.reshape(1, s), sd.reshape(1, s),
        nb=config.sparse_tile_nb, interpret=False)
    tile_ovf = jnp.sum(ovfmask).astype(jnp.int32)
    st, m = integrate.update_pool_tiled(state, pkeys, psd, pw, tile_ovf,
                                        nv, batch.samp_overflow,
                                        batch.pt_overflow, config,
                                        interpret=False)
    return st

st = create_state(config, origin)
st = chained_fn(st, points, position)
sync((st.pool_sd,))
st = chained_fn(st, points, position)
sync((st.pool_sd,))
t0 = time.perf_counter()
for _ in range(10):
    st = chained_fn(st, points, position)
sync((st.pool_sd,))
print(f"{'chained (no fallback cond)':34s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
      flush=True)

st2 = create_state(config, origin)
st2, m2 = integrate.insert_step(st2, points, jnp.int32(n), position, config)
sync((st2.pool_sd,))
for _ in range(2):
    st2, m2 = integrate.insert_step(st2, points, jnp.int32(n), position,
                                    config)
sync((st2.pool_sd,))
t0 = time.perf_counter()
for _ in range(10):
    st2, m2 = integrate.insert_step(st2, points, jnp.int32(n), position,
                                    config)
sync((st2.pool_sd,))
print(f"{'FULL insert (with fallback)':34s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
      flush=True)
