"""Finalize (submap rotation) phase breakdown on a KITTI-shaped map
(dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate, submap as submap_mod
from chad_tsdf_tpu.core.dag import NodeLevels
from chad_tsdf_tpu.core.map import TSDFMap
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan

config = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16)
m = TSDFMap(config=config)
for i in range(4):
    pts = synthetic_lidar_scan([1.5 * i, 0.0, 0.0], seed=i)
    m.insert(pts, np.float32([1.5 * i, 0.0, 1.7]))
np.asarray(m.state.pool_sd[0, 0])
print("blocks:", int(m.state.n_blocks))

state = m.state

t0 = time.perf_counter()
codes, words_t, words_w, n_vox = submap_mod.extract_clusters(state, config)
t1 = time.perf_counter()
print(f"extract_clusters: {(t1 - t0) * 1e3:9.1f} ms  "
      f"({codes.shape[0]} clusters, {n_vox} voxels)")

levels = NodeLevels()
t2 = time.perf_counter()
sm = submap_mod.build_submap(levels, codes, words_t, words_w, [], n_vox)
t3 = time.perf_counter()
print(f"build_submap:     {(t3 - t2) * 1e3:9.1f} ms")

# second finalize (jit cached) into the map's own levels
t4 = time.perf_counter()
sm2 = submap_mod.finalize(state, m.levels, config, m._positions)
t5 = time.perf_counter()
print(f"finalize (warm):  {(t5 - t4) * 1e3:9.1f} ms")

# sub-phase of extract: device vs host
n_blocks = int(state.n_blocks)
n_pad = max(1, 1 << (n_blocks - 1).bit_length())
t6 = time.perf_counter()
out = submap_mod._extract_blocks(state, n_pad, config.sdf_trunc)
host = jax.tree.map(np.asarray, out)
t7 = time.perf_counter()
print(f"  _extract_blocks + transfer: {(t7 - t6) * 1e3:9.1f} ms "
      f"(n_pad={n_pad})")
