"""Isolate the sparse ('pallas' impl) insert's device cost on TPU (dev
tool): no TSDFMap, no per-insert metric readbacks — queue 10 steps, sync
once, like bench.py's amortized methodology."""
import dataclasses
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

impl = sys.argv[1] if len(sys.argv) > 1 else "sample_tile"
config = dataclasses.replace(
    MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16),
    accumulate_impl=impl)
bucket = 131072

pts = synthetic_lidar_scan([0.0, 0.0, 0.0], seed=0)
n = len(pts)
pad = np.zeros((bucket, 3), np.float32)
pad[:n] = pts
points = jnp.asarray(pad)
pos = np.float32([0.0, 0.0, 1.7])
origin = origin_blocks_for_position(pos, config)
position = jnp.asarray(pos)

state = create_state(config, origin)
t0 = time.perf_counter()
state, m = integrate.insert_step(state, points, jnp.int32(n), position,
                                 config)
np.asarray(state.pool_sd[0, 0])
print(f"compile+first: {time.perf_counter()-t0:.1f}s "
      f"metrics={ {k: int(v) for k, v in m.items()} }", flush=True)

for _ in range(2):
    state, m = integrate.insert_step(state, points, jnp.int32(n), position,
                                     config)
np.asarray(state.pool_sd[0, 0])

t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    state, m = integrate.insert_step(state, points, jnp.int32(n), position,
                                     config)
np.asarray(state.pool_sd[0, 0])
dt = (time.perf_counter() - t0) / reps * 1e3
print(f"[{impl}] amortized sparse insert: {dt:.1f} ms -> "
      f"{n / dt * 1e3 / 1e6:.2f} M pts/s", flush=True)
