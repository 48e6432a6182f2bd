"""Per-stage TPU timing of the TILED insert pipeline with readback sync."""
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
state = create_state(config, origin_blocks_for_position(pos_np, config))
origin = state.origin_blocks


@jax.jit
def stage_keys(points, n):
    return integrate.point_keys(points, n, origin, config)


@jax.jit
def stage_sort_points(points, bkey, okey):
    return integrate.sort_points(points, bkey, okey)


@jax.jit
def stage_grids(pts, sb, so, position):
    return integrate.compute_sample_grids(pts, sb, so, position, origin,
                                          config)


@jax.jit
def stage_normals(pts, sb, so, position):
    from chad_tsdf_tpu.ops import normals_pallas
    return normals_pallas.estimate_normals_pallas(
        pts[:, 0], pts[:, 1], pts[:, 2], sb, so, position,
        config.normal_min_points, config.normal_max_depth, config.sdf_res,
        origin_voxel=origin * 8, interpret=False)


@jax.jit
def stage_dda(pts, position):
    from chad_tsdf_tpu.ops import dda
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    return dda.traverse(px, py, pz, position, config.sdf_res,
                        config.sdf_trunc, config.dda_steps)


@jax.jit
def stage_tileA(s_bkey, s_okey, sd):
    return tile_accum.tile_partials(s_bkey, s_okey, sd, nb=config.tile_nb,
                                    interpret=False)


@jax.jit
def stage_B(state, pkeys, psd, pw, n_valid):
    z = jnp.zeros((), jnp.int32)
    return integrate.update_pool_tiled(
        state, pkeys, psd, pw, z, n_valid, z, z, config)


@jax.jit
def full(state, points, n, position):
    return integrate.insert_step_tiled(state, points, n, position, config)


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
    return out


bkey, okey, ovf = timeit("point_keys", stage_keys, points, n)
pts, sb, so = timeit("sort_points", stage_sort_points, points, bkey, okey)
timeit("normals", stage_normals, pts, sb, so, position)
timeit("dda", stage_dda, pts, position)
grids = timeit("sample_grids(all)", stage_grids, pts, sb, so, position)
s_bkey, s_okey, sd, n_valid, _ = grids
pk, psd, pw, ovfm = timeit("tileA", stage_tileA, s_bkey, s_okey, sd)
timeit("stageB_merge", stage_B, state, pk, psd, pw, n_valid)
timeit("FULL insert", full, state, points, n, position)
