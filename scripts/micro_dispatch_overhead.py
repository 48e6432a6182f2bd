"""Quantify per-dispatch relay overhead: 10 inserts as 10 dispatches vs one
compiled lax.scan of 10. The difference / 10 = fixed per-call cost."""
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
origin = origin_blocks_for_position(np.zeros(3, np.float32), config)


def sync(st):
    np.asarray(st.pool_sd[0, 0])


@jax.jit
def scan10(state):
    def body(st, _):
        st, m = integrate.insert_step_impl(st, points, n, position, config)
        return st, None
    st, _ = jax.lax.scan(body, state, None, length=10)
    return st


state = create_state(config, origin)
state = scan10(state)
sync(state)
state = scan10(state)
sync(state)
t0 = time.perf_counter()
for _ in range(3):
    state = scan10(state)
sync(state)
dt = (time.perf_counter() - t0) / 30 * 1e3
print(f"scan10 per-insert: {dt:8.2f} ms -> {n_points/dt*1e3/1e6:.2f} M pts/s")

state = create_state(config, origin)
state, _ = integrate.insert_step(state, points, n, position, config)
sync(state)
for _ in range(2):
    state, _ = integrate.insert_step(state, points, n, position, config)
sync(state)
t0 = time.perf_counter()
for _ in range(30):
    state, _ = integrate.insert_step(state, points, n, position, config)
sync(state)
dt2 = (time.perf_counter() - t0) / 30 * 1e3
print(f"loop  per-insert: {dt2:8.2f} ms -> {n_points/dt2*1e3/1e6:.2f} M pts/s")
print(f"per-dispatch overhead: {dt2 - dt:.2f} ms")
