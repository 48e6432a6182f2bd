"""A/B timings of the fused insert: donation, stage prefixes."""
import functools
import time

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


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])   # one-element device readback


def bench_loop(name, fn, state, reps=10):
    state2, m = fn(state, points, n, position)
    sync((state2.pool_sd,))
    t0 = time.perf_counter()
    s = state2
    for _ in range(reps):
        s, m = fn(s, points, n, position)
    sync((s.pool_sd,))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {dt:8.2f} ms")


# 1) as in bench.py: insert_step w/ donation
bench_loop("insert_step (donated)",
           lambda s, p, n_, po: integrate.insert_step(s, p, n_, po, config),
           create_state(config, origin))

# 2) same body, no donation
nodonate = jax.jit(functools.partial(integrate.insert_step_fused,
                                     config=config, interpret=False))
bench_loop("insert_fused (no donate)",
           lambda s, p, n_, po: nodonate(s, p, n_, po),
           create_state(config, origin))

# 3) prefix: everything up to (incl.) fused kernel, no stage B
@jax.jit
def front(points, n, position):
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    bkey, okey, pt_ovf = integrate.point_keys_soa(
        px, py, pz, n, jnp.asarray(origin), config)
    sb, so, px, py, pz = integrate.sort_points_soa(px, py, pz, bkey, okey)
    nx, ny, nz = integrate.estimate_normals_dispatch(
        px, py, pz, sb, so, position, jnp.asarray(origin), config)
    return fused_integrate.fused_tile_partials(
        px, py, pz, nx, ny, nz, sb, position, jnp.asarray(origin) * 8,
        nb=config.tile_nb, k=config.dda_steps, res=config.sdf_res,
        trunc=config.sdf_trunc, extent=config.blocks_per_axis * 8)


out = front(points, n, position)
sync(out)
t0 = time.perf_counter()
for _ in range(10):
    out = front(points, n, position)
sync(out)
print(f"{'front (sort+norm+fused)':28s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")


# 4) prefix: sort only
@jax.jit
def sort_only(points, n):
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    bkey, okey, pt_ovf = integrate.point_keys_soa(
        px, py, pz, n, jnp.asarray(origin), config)
    return integrate.sort_points_soa(px, py, pz, bkey, okey)


out = sort_only(points, n)
sync(out)
t0 = time.perf_counter()
for _ in range(10):
    out = sort_only(points, n)
sync(out)
print(f"{'sort only':28s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")


# 5) prefix: sort + normals
@jax.jit
def sort_norm(points, n, position):
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    bkey, okey, pt_ovf = integrate.point_keys_soa(
        px, py, pz, n, jnp.asarray(origin), config)
    sb, so, px, py, pz = integrate.sort_points_soa(px, py, pz, bkey, okey)
    return integrate.estimate_normals_dispatch(
        px, py, pz, sb, so, position, jnp.asarray(origin), config)


out = sort_norm(points, n, position)
sync(out)
t0 = time.perf_counter()
for _ in range(10):
    out = sort_norm(points, n, position)
sync(out)
print(f"{'sort+normals':28s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")


# 6) stage-B phase split (mirrors update_pool_tiled's body)
from chad_tsdf_tpu.ops import segops, tile_accum

state0 = create_state(config, origin)
pkeys, psd, pw, counts = front(points, n, position)


def b_prefix(stop):
    @jax.jit
    def fn(state, pkeys, psd, pw):
        cb = config.block_capacity
        t_cap = config.touched_capacity
        reserved_row = cb - 1
        p = pkeys.shape[0]
        pk = pkeys.reshape(-1)
        iota = jnp.arange(p, dtype=jnp.int32)
        sk, order = jax.lax.sort((pk, iota), num_keys=1)
        flags = segops.boundary_flags(sk) & (sk != integrate.INT32_MAX)
        starts_full, _, t_total = segops.compact_flag_positions(flags, t_cap)
        t_count = jnp.minimum(t_total, t_cap)
        tvalid = jnp.arange(t_cap, dtype=jnp.int32) < t_count
        starts_c = jnp.minimum(starts_full, p - 1)
        tb_keys = jnp.where(tvalid, sk[starts_c], integrate.INT32_MAX)
        if stop == "segs":
            return tb_keys
        (dir_keys, dir_slots, n_blocks, tb_slots, n_new, block_overflow) = \
            integrate._directory_update(state, tb_keys, tvalid, config)
        if stop == "dir":
            return dir_keys, tb_slots
        t_idx = jnp.cumsum(flags.astype(jnp.int32)) - 1
        t_ok = (sk != integrate.INT32_MAX) & (t_idx < t_cap)
        slot_per_partial = jnp.where(
            t_ok, tb_slots[jnp.clip(t_idx, 0, t_cap - 1)], reserved_row)
        slot_s, src = jax.lax.sort((slot_per_partial, order), num_keys=1)
        p_pad = -(-max(p, tile_accum.MERGE_CHUNK) //
                  tile_accum.MERGE_CHUNK) * tile_accum.MERGE_CHUNK
        pad = p_pad - p
        src_c = jnp.clip(src, 0, p - 1)
        gsd = jnp.pad(psd[src_c], ((0, pad), (0, 0)))
        gw = jnp.pad(pw[src_c], ((0, pad), (0, 0)))
        slot_sp = jnp.pad(slot_s, (0, pad), constant_values=reserved_row)
        if stop == "gather":
            return gsd, gw
        n_live = jnp.sum(slot_sp != reserved_row).astype(jnp.int32)
        ng, gstart, glen, grow, prow = tile_accum.plan_merge(
            slot_sp, n_live, cb, t_cap)
        if stop == "plan":
            return ng, prow
        pool_sd, pool_w = tile_accum.merge_partials(
            state.pool_sd, state.pool_w, ng, gstart, glen, grow, prow,
            gsd, gw)
        return pool_sd[0, 0]
    return fn


for stop in ("segs", "dir", "gather", "plan", "merge"):
    fn = b_prefix(stop)
    o = fn(state0, pkeys, psd, pw)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fn(state0, pkeys, psd, pw)
    sync(o)
    print(f"B:{stop:24s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
