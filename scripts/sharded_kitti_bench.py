"""Sharded KITTI-shaped streaming bench: ShardedTSDFMap scans/s.

The sharded analog of bench.py's kitti line (VERDICT r4 item 6's recorded
number).  On real hardware run with ``--tpu`` and as many chips as the
slice has (one in this environment — that run measures the sharded path's
overhead at N=1, the honest number a single chip can produce); the default
CPU run uses the 8-virtual-device mesh and validates stream structure only.

Usage: python scripts/sharded_kitti_bench.py [--tpu] [--devices N]
       [--scans 12] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                    # noqa: E402

if "--tpu" not in sys.argv:
    from jax._src import xla_bridge as _xb
    jax.config.update("jax_platforms", "cpu")
    _xb._backend_factories.pop("axon", None)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np                                            # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chad_tsdf_tpu.config import MapConfig                    # noqa: E402
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan       # noqa: E402
from chad_tsdf_tpu.parallel import ShardedTSDFMap, make_mesh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    n_dev = args.devices or len(jax.devices())
    # block_capacity right-sized to the submap-rotation policy: a 5 m
    # KITTI-shaped submap touches <= ~25k blocks, 65536 is 2.6x
    # headroom (overflow is counted + warned); the seg path's pool
    # update costs ~2.4 ms/step per capacity doubling (measured v5e)
    config = MapConfig(block_capacity=1 << 16, touched_capacity=1 << 15,
                       max_points=1 << 17, packed_ingest=True)
    scans = [(synthetic_lidar_scan([1.5 * i, 0.0, 0.0], seed=i),
              np.float32([1.5 * i, 0.0, 1.7]))
             for i in range(args.scans)]

    def run_stream():
        m = ShardedTSDFMap(config=config, mesh=make_mesh(n_dev))
        for pts, pos in scans:
            m.insert(pts, pos)
        return m

    # warm pass compiles insert buckets + rotation path
    m = run_stream()
    m.stats()

    m = ShardedTSDFMap(config=config, mesh=make_mesh(n_dev))
    m.insert(scans[0][0], scans[0][1])
    np.asarray(m.state_stack.pool_sd[0, 0, 0])
    t0 = time.perf_counter()
    total = 0
    for pts, pos in scans[1:]:
        m.insert(pts, pos)
        total += len(pts)
    np.asarray(m.state_stack.pool_sd[0, 0, 0])
    dt = time.perf_counter() - t0
    out = {
        "backend": jax.default_backend(),
        "n_devices": n_dev,
        "scans_per_sec": round((len(scans) - 1) / dt, 3),
        "points_per_sec": round(total / dt),
        "route_overflow": int(m.last_metrics.get("route_overflow", 0)),
        "n_submaps": m.n_submaps,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
