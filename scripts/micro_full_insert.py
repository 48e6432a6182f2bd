"""Amortized full dense insert timing only (dev tool) — bench.py's primary
metric without the kitti section."""
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

n_points = 1 << 20
config = MapConfig(max_points=n_points)
rng = np.random.default_rng(420)
d = rng.uniform(-1.0, 1.0, (n_points, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
points = jnp.asarray((d * 5.0).astype(np.float32))
position = jnp.zeros(3, jnp.float32)
n = jnp.int32(n_points)
state = create_state(config, origin_blocks_for_position(
    np.zeros(3, np.float32), config))

state, m = integrate.insert_step(state, points, n, position, config)
np.asarray(state.pool_sd[0, 0])
for _ in range(3):
    state, m = integrate.insert_step(state, points, n, position, config)
np.asarray(state.pool_sd[0, 0])

best = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = integrate.insert_step(state, points, n, position, config)
    np.asarray(state.pool_sd[0, 0])
    best.append((time.perf_counter() - t0) / 10 * 1e3)
dt = min(best)
print(f"full insert: {dt:.2f} ms  ({n_points/dt*1e3/1e6:.1f} M pts/s) "
      f"rounds={[f'{b:.1f}' for b in best]}", flush=True)
