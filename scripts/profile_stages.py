"""Per-stage TPU timing of the insert pipeline (dev tool, not a test)."""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position

n_points = 1 << 20
config = MapConfig(max_points=n_points)

rng = np.random.default_rng(420)
d = rng.uniform(-1.0, 1.0, (n_points, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
points = jnp.asarray((d * 5.0).astype(np.float32))
position = jnp.zeros(3, jnp.float32)
n = jnp.int32(n_points)
pos_np = np.zeros(3, np.float32)
state = create_state(config, origin_blocks_for_position(pos_np, config))

origin = state.origin_blocks


@jax.jit
def stage_keys(points, n):
    return integrate.point_keys(points, n, origin, config)


@jax.jit
def stage_sort_points(points, bkey, okey):
    return integrate.sort_points(points, bkey, okey)


@jax.jit
def stage_normals(pts, sb, so, position):
    from chad_tsdf_tpu.ops import normals
    valid = sb != integrate.INT32_MAX
    return normals.estimate_normals_soa(
        pts[:, 0], pts[:, 1], pts[:, 2], sb, so, valid, position,
        config.normal_min_points, config.normal_max_depth)


@jax.jit
def stage_dda(pts, position):
    from chad_tsdf_tpu.ops import dda
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    vx, vy, vz, vvalid = dda.traverse(px, py, pz, position, config.sdf_res,
                                      config.sdf_trunc, config.dda_steps)
    return vx, vy, vz, vvalid


@jax.jit
def stage_samples(pts, sb, so, position):
    return integrate.samples_from_sorted_points(pts, sb, so, position,
                                                origin, config)


@jax.jit
def stage_sort_samples(batch):
    return integrate.sort_samples(batch)


@jax.jit
def stage_update(state, batch):
    return integrate.update_pool(state, batch, config)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:20s} {dt:8.2f} ms")
    return out


bkey, okey, ovf = timeit("point_keys", stage_keys, points, n)
pts, sb, so = timeit("sort_points", stage_sort_points, points, bkey, okey)
timeit("normals", stage_normals, pts, sb, so, position)
timeit("dda", stage_dda, pts, position)
batch = timeit("samples(all)", stage_samples, pts, sb, so, position)
batch = timeit("sort_samples", stage_sort_samples, batch)
timeit("update_pool", stage_update, state, batch)
