"""Pin the sparse-fallback cost: update_pool on a masked 1.31M stream at
touched_capacity 65536 (dev tool)."""
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
from chad_tsdf_tpu.ops import segops

config = dataclasses.replace(
    MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16),
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


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


@jax.jit
def make_fb(points, position):
    batch = integrate.compute_samples(points, jnp.int32(n), position,
                                      origin_j, config)
    batch = integrate.sort_samples(batch)
    # mask ~all but 611-ish samples as the real fallback does (keep a few
    # hundred scattered live samples)
    i = jnp.arange(batch.bkey.shape[0], dtype=jnp.int32)
    keep = (i % 2048) == 0
    fb = integrate.SampleBatch(
        jnp.where(keep, batch.bkey, integrate.INT32_MAX),
        jnp.where(keep, batch.payload, 0),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    return integrate.sort_samples(fb)

fb = make_fb(points, position)
sync((fb.bkey,))


@functools.partial(jax.jit, donate_argnums=(0,))
def up_fn(state, bkey, payload):
    b = integrate.SampleBatch(bkey, payload, jnp.zeros((), jnp.int32),
                              jnp.zeros((), jnp.int32))
    st, m = integrate.update_pool(state, b, config)
    return st

bench("update_pool (1.31M, t_cap 65536)",
      lambda bk, p: up_fn(create_state(config, origin), bk, p),
      fb.bkey, fb.payload, reps=3)


@jax.jit
def cfp_fn(bkey):
    flags = segops.boundary_flags(bkey) & (bkey != integrate.INT32_MAX)
    return segops.compact_flag_positions(flags, config.touched_capacity + 1)

bench("  compact_flag_positions (65537 q)", cfp_fn, fb.bkey)


@jax.jit
def cumsum_fn(bkey):
    flags = segops.boundary_flags(bkey) & (bkey != integrate.INT32_MAX)
    return jnp.cumsum(flags.astype(jnp.int32))

rank = bench("  cumsum 1.31M", cumsum_fn, fb.bkey)


@jax.jit
def ss_fn(rank):
    j = jnp.arange(1, config.touched_capacity + 2, dtype=jnp.int32)
    return jnp.searchsorted(rank, j, side="left").astype(jnp.int32)

bench("  searchsorted 65537 into 1.31M", ss_fn, rank)


@jax.jit
def tidx_fn(bkey):
    flags = segops.boundary_flags(bkey) & (bkey != integrate.INT32_MAX)
    t_idx = jnp.cumsum(flags.astype(jnp.int32)) - 1
    t_idx_c = jnp.clip(t_idx, 0, config.touched_capacity - 1)
    tb = jnp.zeros((config.touched_capacity,), jnp.int32)
    return tb[t_idx_c]     # the 1.31M gather in run_xla

bench("  1.31M gather from 64k table", tidx_fn, fb.bkey)
