"""Round-3b probes: tile_nb sweep on the full insert + stage-B sub-phases
(dev tool)."""
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
rng = np.random.default_rng(420)
d = rng.uniform(-1.0, 1.0, (n_points, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
points = jnp.asarray((d * 5.0).astype(np.float32))
position = jnp.zeros(3, jnp.float32)
n = jnp.int32(n_points)
pos_np = np.zeros(3, np.float32)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench_insert(config, reps=10):
    origin = origin_blocks_for_position(pos_np, config)
    state = create_state(config, origin)
    state, met = integrate.insert_step(state, points, n, position, config)
    sync(met["n_blocks"])
    tovf = int(state.tile_overflow)
    # fresh state each timing rep is wrong (donation); reuse accumulating
    state2 = create_state(config, origin)
    state2, _ = integrate.insert_step(state2, points, n, position, config)
    sync(state2.n_blocks)
    t0 = time.perf_counter()
    for _ in range(reps):
        state2, met = integrate.insert_step(state2, points, n, position,
                                            config)
    sync(met["n_blocks"])
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt, tovf


for nb in (48, 32):
    cfg = MapConfig(max_points=n_points, tile_nb=nb)
    dt, tovf = bench_insert(cfg)
    print(f"tile_nb={nb:3d}  insert {dt:7.2f} ms  "
          f"{n_points / dt / 1e3:6.1f} M pts/s  tile_ovf={tovf}", flush=True)
