"""Split the rotation/finalize cost: device compact vs readback vs transfer
vs host DAG build, on a KITTI-sized active map (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import submap as submap_mod
from chad_tsdf_tpu.core.dag import NodeLevels
from chad_tsdf_tpu.core.map import TSDFMap
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan

config = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 16)
m = TSDFMap(config=config)
for i in range(3):
    pts = synthetic_lidar_scan([1.5 * i, 0.0, 0.0], seed=i)
    m.insert(pts, np.float32([1.5 * i, 0.0, 1.7]))
np.asarray(m.state.pool_sd[0, 0])

state = m.state
t0 = time.perf_counter()
n_blocks = int(state.n_blocks)
t1 = time.perf_counter()
print(f"n_blocks readback: {(t1-t0)*1e3:8.1f} ms  (n={n_blocks})")

n_pad = max(1, 1 << (n_blocks - 1).bit_length())
t0 = time.perf_counter()
count = int(submap_mod._count_nonempty_clusters(state, n_pad))
t1 = time.perf_counter()
print(f"count (compile+run+readback): {(t1-t0)*1e3:8.1f} ms  (count={count})")

cap = max(64, 1 << (count - 1).bit_length())
t0 = time.perf_counter()
buf_dev = submap_mod._extract_clusters_compact(state, n_pad, cap,
                                               config.sdf_trunc)
buf_dev.block_until_ready()
t1 = time.perf_counter()
print(f"device compact (compile+run): {(t1-t0)*1e3:8.1f} ms "
      f"(buf {buf_dev.size*4/1e6:.1f} MB)")

t0 = time.perf_counter()
buf = np.asarray(buf_dev)
t1 = time.perf_counter()
mb = buf.nbytes / 1e6
print(f"transfer: {(t1-t0)*1e3:8.1f} ms  ({mb:.1f} MB -> "
      f"{mb/(t1-t0):.1f} MB/s)")

# async-copy timing: dispatch a fresh compact, start async copy, then see
# how long np.asarray takes after a simulated overlap window
buf_dev2 = submap_mod._extract_clusters_compact(state, n_pad, cap,
                                                config.sdf_trunc)
t0 = time.perf_counter()
try:
    buf_dev2.copy_to_host_async()
    t1 = time.perf_counter()
    print(f"copy_to_host_async issue: {(t1-t0)*1e3:8.1f} ms")
except Exception as e:
    print("copy_to_host_async failed:", repr(e))
time.sleep(max(0.0, (t1 - t0) * 0 + 2.0))
t0 = time.perf_counter()
buf2 = np.asarray(buf_dev2)
t1 = time.perf_counter()
print(f"np.asarray after 2s overlap: {(t1-t0)*1e3:8.1f} ms")

# host unpack + DAG build
t0 = time.perf_counter()
codes, words_t, words_w, n_vox = submap_mod.extract_clusters(state, config)
t1 = time.perf_counter()
print(f"extract_clusters total: {(t1-t0)*1e3:8.1f} ms "
      f"({codes.shape[0]} clusters)")

levels = NodeLevels()
t0 = time.perf_counter()
sm = submap_mod.build_submap(levels, codes, words_t, words_w, [])
t1 = time.perf_counter()
print(f"host DAG build (native={levels.native}): {(t1-t0)*1e3:8.1f} ms")
