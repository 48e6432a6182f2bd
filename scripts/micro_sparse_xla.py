"""Measure accumulate_impl='xla' (sort + flat scatter) on the KITTI shape,
plus a variant with unique-voxel pre-compaction (dev tool)."""
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

base = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16)
bucket = 131072

pts = synthetic_lidar_scan([0.0, 0.0, 0.0], seed=0)
n = len(pts)
pad = np.zeros((bucket, 3), np.float32)
pad[:n] = pts
points = jnp.asarray(pad)
pos = np.float32([0.0, 0.0, 1.7])
origin = origin_blocks_for_position(pos, base)
position = jnp.asarray(pos)


def sync(st):
    np.asarray(st.pool_sd[0, 0])


def bench(name, cfg, reps=10):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, points, position):
        return integrate.insert_step_impl(state, points, jnp.int32(n),
                                          position, cfg)

    st = create_state(cfg, origin)
    st, m = step(st, points, position)
    sync(st)
    for _ in range(2):
        st, m = step(st, points, position)
    sync(st)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, m = step(st, points, position)
    sync(st)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:8.2f} ms  blocks={int(st.n_blocks)} "
          f"tile_ovf={int(st.tile_overflow)}", flush=True)


bench("xla (sort + flat scatter-add)",
      dataclasses.replace(base, accumulate_impl="xla"))
bench("pallas (sort + segment kernel)",
      dataclasses.replace(base, accumulate_impl="pallas"))
bench("sample_tile (current sparse default)",
      dataclasses.replace(base, accumulate_impl="sample_tile"))
