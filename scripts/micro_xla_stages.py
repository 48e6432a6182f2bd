"""Stage breakdown of the xla (sort+scatter) sparse path on TPU (dev)."""
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
from chad_tsdf_tpu.core.state import (INT32_MAX, create_state,
                                      origin_blocks_for_position)
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan
from chad_tsdf_tpu.ops import accumulate, segops

config = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16)
bucket = 131072
t_cap = config.touched_capacity
cb = config.block_capacity

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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


@jax.jit
def samples_sorted(points, position):
    b = integrate.compute_samples(points, jnp.int32(n), position, origin_j,
                                  config)
    return integrate.sort_samples(b)


batch = bench("samples + 1-key sort", samples_sorted, points, position)
sb, sp = batch.bkey, batch.payload


@jax.jit
def seg_fn(sb):
    flags = segops.boundary_flags(sb) & (sb != INT32_MAX)
    starts_full, _, t_total = segops.compact_flag_positions(flags, t_cap + 1)
    return starts_full, t_total, flags


starts_full, t_total, flags = bench("touched compaction (searchsorted)",
                                    seg_fn, sb)

state = create_state(config, origin)


@jax.jit
def dir_fn(state, sb, starts_full):
    flags = segops.boundary_flags(sb) & (sb != INT32_MAX)
    n_valid = jnp.sum(sb != INT32_MAX).astype(jnp.int32)
    starts = starts_full[:t_cap]
    t_count = jnp.minimum(t_total, t_cap)
    tvalid = jnp.arange(t_cap, dtype=jnp.int32) < t_count
    starts_c = jnp.minimum(starts, sb.shape[0] - 1)
    tb_keys = jnp.where(tvalid, sb[starts_c], INT32_MAX)
    return integrate._directory_update(state, tb_keys, tvalid, config)


dirout = bench("directory update", dir_fn, state, sb, starts_full)
tb_slots = dirout[3]


@jax.jit
def slot_fn(sb, flags, tb_slots):
    t_idx = jnp.cumsum(flags.astype(jnp.int32)) - 1
    t_idx_c = jnp.clip(t_idx, 0, t_cap - 1)
    return tb_slots[t_idx_c]


slot_per_sample = bench("t_idx cumsum + slot gather", slot_fn, sb, flags,
                        tb_slots)


@jax.jit
def scatter_fn(pool_sd, pool_w, sb, sp, slot_per_sample):
    s_okey, s_sd = integrate.unpack_payload(sp, config.sdf_trunc)
    ok = (sb != INT32_MAX) & (slot_per_sample != cb - 1)
    return accumulate.accumulate_xla(pool_sd, pool_w, slot_per_sample,
                                     s_okey, s_sd, ok)


st0 = create_state(config, origin)
bench("scatter-add all 1.31M samples", scatter_fn, st0.pool_sd, st0.pool_w,
      sb, sp, slot_per_sample)


# ---- unique-voxel variant: 2-key sort + segment sums + end-only scatter ----
@jax.jit
def samples_sorted2(points, position):
    b = integrate.compute_samples(points, jnp.int32(n), position, origin_j,
                                  config)
    k, p = jax.lax.sort((b.bkey, b.payload), num_keys=2)
    return k, p


sb2, sp2 = bench("samples + 2-key sort", samples_sorted2, points, position)


@jax.jit
def segsum_fn(sb, sp):
    okey = (sp >> 16) & 0x1FF
    valid = sb != INT32_MAX
    vflags = segops.boundary_flags((sb, okey)) & valid
    q = (sp << 16) >> 16
    vals = jnp.stack([q.astype(jnp.float32), valid.astype(jnp.float32)])
    sums = segops.segmented_sum_scan(vflags, vals)
    is_end = jnp.concatenate([vflags[1:], jnp.ones((1,), jnp.bool_)])
    return sums, is_end, vflags


sums, is_end, vflags = bench("voxel segment sums (2ch scan)", segsum_fn,
                             sb2, sp2)


@jax.jit
def end_scatter_fn(pool_sd, pool_w, sb, sp, slot_per_sample, sums, is_end):
    okey = (sp >> 16) & 0x1FF
    ok = is_end & (sb != INT32_MAX) & (slot_per_sample != cb - 1)
    idx = slot_per_sample * 512 + okey
    idx = jnp.where(ok, idx, cb * 512)
    sd_scale = config.sdf_trunc / integrate.SD_QUANT
    new_sd = pool_sd.reshape(-1).at[idx].add(
        jnp.where(ok, sums[0] * sd_scale, 0.0),
        mode="drop").reshape(pool_sd.shape)
    new_w = pool_w.reshape(-1).at[idx].add(
        jnp.where(ok, sums[1], 0.0), mode="drop").reshape(pool_w.shape)
    return new_sd, new_w


bench("end-only scatter (unique voxels)", end_scatter_fn, st0.pool_sd,
      st0.pool_w, sb2, sp2, slot_per_sample, sums, is_end)

# how many unique voxels actually?
print("uniques:", int(jnp.sum(vflags)), "of", sb2.shape[0], flush=True)
