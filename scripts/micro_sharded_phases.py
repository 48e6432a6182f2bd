"""Decompose the generic sharded step's fixed overhead F on the real chip.

Three jitted variants on the KITTI-shaped workload, each timed like
sharded_overhead_bench:

  a. direct         — persistent-pool single-device pipeline (baseline)
  b. scratch_only   — scratch-pool integrate, merge SKIPPED (scratch
                      consumed by a cheap checksum so XLA can't DCE it)
  c. generic        — scratch integrate + extract + route + merge

b - a isolates the scratch-pipeline cost delta (smaller pool, same work);
c - b isolates extract + route + merge.  Drives what to optimize to raise
the modeled eff(N) (SCALING.md).

Usage: python scripts/micro_sharded_phases.py [--tpu]
"""

import argparse
import dataclasses
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax                                                    # noqa: E402

if "--tpu" not in sys.argv:
    from jax._src import xla_bridge as _xb
    jax.config.update("jax_platforms", "cpu")
    _xb._backend_factories.pop("axon", None)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chad_tsdf_tpu.config import MapConfig                    # noqa: E402
from chad_tsdf_tpu.core import integrate                      # noqa: E402
from chad_tsdf_tpu.core.state import create_state, \
    origin_blocks_for_position                                # noqa: E402
from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan       # noqa: E402
from chad_tsdf_tpu.parallel import sharded                    # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--scans", type=int, default=12)
    args = ap.parse_args()

    cap = 1 << 17
    cfg = MapConfig(block_capacity=1 << 17, touched_capacity=1 << 15,
                    max_points=cap, packed_ingest=True,
                    accumulate_impl="seg", point_buckets=())
    pos0 = np.float32([0.0, 0.0, 1.7])
    origin = origin_blocks_for_position(pos0, cfg)
    scfg = sharded.scratch_config(cfg)

    scans = []
    for i in range(args.scans):
        pts = synthetic_lidar_scan([0.15 * i, 0.0, 0.0], seed=i)
        padded = np.zeros((cap, 3), np.float32)
        padded[:len(pts)] = pts
        scans.append((jnp.asarray(integrate.pack_points(padded, pos0,
                                                        cfg.sdf_res)),
                      jnp.int32(len(pts))))

    step_q = jnp.float32(cfg.sdf_res / 8.0)
    pos_j = jnp.asarray(pos0)

    @jax.jit
    def direct(state, q, n):
        pts = q.astype(jnp.float32) * step_q + pos_j[None, :]
        state, _ = integrate.insert_step_impl(state, pts, n, pos_j, cfg)
        return state

    @jax.jit
    def scratch_only(state, q, n):
        pts = q.astype(jnp.float32) * step_q + pos_j[None, :]
        scratch = create_state(scfg, state.origin_blocks)
        scratch, _ = integrate.insert_step_impl(scratch, pts, n, pos_j,
                                                scfg)
        # consume the scratch so nothing is DCE'd; keep the persistent
        # state flowing so the timed loop shape matches the others
        chk = (jnp.sum(scratch.pool_w[0]) + scratch.dir_keys[0] +
               scratch.n_blocks).astype(jnp.float32)
        return dataclasses.replace(
            state, pool_sd=state.pool_sd.at[0, 0].add(0.0 * chk))

    def sync(st):
        np.asarray(st.pool_sd[0, 0])

    def run(fn, label):
        state = create_state(cfg, origin)
        for q, n in scans:
            state = fn(state, q, n)
        sync(state)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            for q, n in scans:
                state = fn(state, q, n)
            sync(state)
            best.append((time.perf_counter() - t0) * 1e3 / len(scans))
        print(f"{label}: {np.median(best):.2f} ms/step  (rounds "
              f"{['%.1f' % b for b in best]})")
        return float(np.median(best))

    a = run(direct, "a. direct        ")
    b = run(scratch_only, "b. scratch_only  ")
    print(f"   scratch-pipeline delta (b - a): {b - a:+.2f} ms")
    print("   (run scripts/sharded_overhead_bench.py for c = generic; "
          "c - b = extract+route+merge)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
