"""Per-scan diagnosis of the KITTI-shaped streaming bench (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core.map import TSDFMap
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan

config = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 15)
m = TSDFMap(config=config)
scans = [(synthetic_lidar_scan([1.5 * i, 0.0, 0.0], seed=i),
          np.float32([1.5 * i, 0.0, 1.7])) for i in range(12)]

for i, (pts, pos) in enumerate(scans):
    t0 = time.perf_counter()
    cfg = m._dispatch_config(pts)
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    met = m.insert(pts, pos)
    np.asarray(m.state.pool_sd[0, 0])
    dt = time.perf_counter() - t0
    print(f"scan {i:2d}: {len(pts):6d} pts impl={cfg.accumulate_impl:6s} "
          f"disp={t_disp*1e3:6.1f}ms insert={dt*1e3:8.1f}ms "
          f"tile_ovf={int(m.state.tile_overflow):8d} "
          f"blocks={met['n_blocks']} submaps={len(m.submaps)}", flush=True)
