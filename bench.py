"""Driver benchmark: TSDF integrate throughput on the canonical workload.

Measures points/s for the reference's sphere demo (1M points on a 5 m
sphere, res 0.05 m, trunc 0.1 m — reference src/chad/main.cpp:8-38) on the
available accelerator.

Timing methodology (hardened, round 2):
* amortized: median over several rounds of 10 queued inserts with ONE
  one-element readback per round (the remote-TPU tunnel costs ~28 ms per
  host<->device round trip, so per-call syncs measure the tunnel).
* per-insert-synced: median latency of a single insert + readback, printed
  for cross-checking (includes one tunnel round trip by construction).
* Quirk, observed and reproduced: ANY scalar readback (e.g. reading the
  warmup metrics) degrades the NEXT batch of dispatches through the relay
  by >10x for several calls.  The re-warm round below absorbs that.

Prints exactly one JSON line:
  {"metric": "tsdf_integrate_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": N / 50e6}
vs_baseline is against the driver's north-star target of 50M points/s/chip
(BASELINE.md — the reference itself publishes no numbers).
"""

import json
import statistics
import sys
import time


def main():
    import jax

    # persistent compile cache: the axon remote-compile path costs ~10 min
    # for the full insert graph; cached re-runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from chad_tsdf_tpu.config import MapConfig
    from chad_tsdf_tpu.core import integrate
    from chad_tsdf_tpu.core.state import (create_state,
                                          origin_blocks_for_position)

    n_points = 1 << 20
    config = MapConfig(max_points=n_points)

    rng = np.random.default_rng(420)
    d = rng.uniform(-1.0, 1.0, (n_points, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    points = jnp.asarray((d * 5.0).astype(np.float32))
    position = jnp.zeros(3, jnp.float32)
    n = jnp.int32(n_points)

    pos_np = np.zeros(3, np.float32)
    state = create_state(config, origin_blocks_for_position(pos_np, config))

    def sync():
        # NOTE: jax.block_until_ready does not actually wait for device
        # completion through the axon relay; a one-element readback does.
        np.asarray(state.pool_sd[0, 0])

    # compile + warm up
    state, metrics = integrate.insert_step(state, points, n, position,
                                           config)
    print("warmup:", {k: int(v) for k, v in metrics.items()},
          file=sys.stderr)

    # re-warm: the metrics readback above degrades the next dispatches
    # through the relay (measured >10x for ~one round); absorb it untimed
    for _ in range(3):
        state, metrics = integrate.insert_step(state, points, n, position,
                                               config)
    sync()

    # one dispatch of `reps` chained steps (lax.scan): per-dispatch enqueue
    # through the relay costs 3-15 ms and varies with link health, so a
    # Python loop intermittently starves the ~21 ms device step and the
    # measurement wobbles +-10%; the scan form measures the device alone
    # (differentially tested equal to the looped form, test_integrate)
    # reps amortizes the one mandatory readback RT (~28 ms) per round
    reps, rounds = 25, 3
    state = integrate.insert_steps_scan(state, points, n, position, config,
                                        reps)     # compile + warm
    sync()
    per_round = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        state = integrate.insert_steps_scan(state, points, n, position,
                                            config, reps)
        sync()
        per_round.append((time.perf_counter() - t0) / reps)
    amortized = statistics.median(per_round)
    pts_per_sec = n_points / amortized

    singles = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = integrate.insert_step(state, points, n, position,
                                               config)
        sync()
        singles.append(time.perf_counter() - t0)
    single = statistics.median(singles)

    print(f"amortized: {amortized*1e3:.1f} ms/insert over {rounds}x{reps} "
          f"-> {pts_per_sec/1e6:.2f} M points/s "
          f"(rounds: {[f'{r*1e3:.1f}' for r in per_round]})", file=sys.stderr)
    print(f"per-insert-synced: {single*1e3:.1f} ms "
          f"(includes ~28 ms tunnel round trip)", file=sys.stderr)

    # ---- secondary metric: KITTI-shaped streaming scans/s (sparse ~120k-pt
    # scans through the bucketed TSDFMap path, incl. tile-overflow fallback
    # and submap rotations) — BASELINE.json config 2 without the dataset ----
    extra = {}
    try:
        extra = _kitti_shaped_stream()
    except Exception as e:  # never jeopardize the primary metric
        print(f"kitti-shaped bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "tsdf_integrate_points_per_sec",
        "value": round(pts_per_sec),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / 50e6, 4),
        **extra,
    }))


def _kitti_shaped_stream(n_scans: int = 12):
    import time

    import numpy as np

    from chad_tsdf_tpu.core.map import TSDFMap
    from chad_tsdf_tpu.config import MapConfig
    from chad_tsdf_tpu.io.kitti import synthetic_lidar_scan

    # right-sized for sparse outdoor scans: ~120k points spread over tens of
    # thousands of blocks (vs the dense sphere's ~4k): a bigger block pool,
    # a touched capacity sized to one scan's block set, and the density
    # dispatch picks the sparse 'seg' backend (segment reduction + compacted
    # scatter — no tiles, tile_overflow stays 0 by construction)
    # packed_ingest halves the per-scan host->device bytes — the bench
    # link moves ~16-23 MB/s, so a 1.5 MB f32 upload alone costs 65-100 ms
    # per scan against ~31 ms of insert compute (MapConfig docstring;
    # 3.1 mm quantization, an order below LiDAR range noise)
    # block_capacity right-sized to the submap-rotation policy: a 5 m
    # KITTI-shaped submap touches <= ~25k blocks, 65536 is 2.6x
    # headroom (overflow is counted + warned); the seg path's pool
    # update costs ~2.4 ms/step per capacity doubling (measured v5e)
    config = MapConfig(block_capacity=1 << 16, touched_capacity=1 << 15,
                       packed_ingest=True)
    scans = [(synthetic_lidar_scan([1.5 * i, 0.0, 0.0], seed=i),
              np.float32([1.5 * i, 0.0, 1.7])) for i in range(n_scans)]

    # warm pass over the whole stream: compiles the insert buckets AND the
    # rotation path (deferred finalize shapes), whose first-run compiles
    # would otherwise land inside the timed region
    m = TSDFMap(config=config)
    for pts, pos in scans:
        m.insert(pts, pos)
    m.stats()                       # drain pending finalizes + sync

    m = TSDFMap(config=config)
    m.insert(scans[0][0], scans[0][1])
    np.asarray(m.state.pool_sd[0, 0])
    t0 = time.perf_counter()
    total_pts = 0
    for pts, pos in scans[1:]:
        m.insert(pts, pos)
        total_pts += len(pts)
    np.asarray(m.state.pool_sd[0, 0])
    dt = time.perf_counter() - t0
    scans_per_s = (len(scans) - 1) / dt
    tile_ovf = int(m.state.tile_overflow)
    print(f"kitti-shaped: {scans_per_s:.1f} scans/s, "
          f"{total_pts / dt / 1e6:.2f} M pts/s, "
          f"tile_overflow={tile_ovf}, submaps={m.n_submaps}",
          file=sys.stderr)
    return {"kitti_scans_per_sec": round(scans_per_s, 2),
            "kitti_points_per_sec": round(total_pts / dt),
            "kitti_tile_overflow": tile_ovf}


if __name__ == "__main__":
    main()
