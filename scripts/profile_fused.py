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
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


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
