"""Multi-host execution test: 2 real OS processes x 4 virtual CPU devices
with gloo collectives run the sharded insert over one global 8-device mesh
(SURVEY §5.8 / §4 "multi-host without a cluster").  The reference has no
distribution whatsoever (virtual_array.cpp:15-24 — mmap is its only OS
interface)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_insert():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "DIST_OK" in out, f"process {pid} output:\n{out[-4000:]}"
        assert "LIFECYCLE_OK" in out, f"process {pid} output:\n{out[-4000:]}"

    # every process must have built the IDENTICAL map (same voxel samples,
    # same merged checkpoint state)
    import json

    recs = [json.loads(out.split("LIFECYCLE_OK ", 1)[1].splitlines()[0])
            for out in outs]
    assert recs[0]["digest"] == recs[1]["digest"], recs
    assert recs[0]["ck_digest"] == recs[1]["ck_digest"], recs
    assert recs[0]["n_submaps"] == 1 and recs[0]["route_overflow"] == 0

    # ... and match a single-process run of the same stream bit-for-bit
    import hashlib

    import jax
    import numpy as np

    if len(jax.devices()) >= 8:
        from chad_tsdf_tpu.config import MapConfig
        from chad_tsdf_tpu.parallel import ShardedTSDFMap, make_mesh

        def sphere(n, r, seed, centre):
            g = np.random.default_rng(seed)
            dd = g.normal(size=(n, 3))
            dd /= np.linalg.norm(dd, axis=1, keepdims=True)
            return (np.float32(centre) + dd * r).astype(np.float32)

        cfg = MapConfig(max_points=512, block_capacity=4096,
                        touched_capacity=2048, accumulate_impl="xla")
        m = ShardedTSDFMap(config=cfg, mesh=make_mesh(8))
        m.insert(sphere(2048, 1.5, 100, (0, 0, 0)),
                 np.zeros(3, np.float32))
        m.insert(sphere(2048, 1.5, 101, (8, 0, 0)),
                 np.float32([8, 0, 1.7]))
        m._drain_pending()
        codes, sd = m.voxel_samples()
        digest = hashlib.sha256(codes.tobytes() + sd.tobytes()).hexdigest()
        assert digest == recs[0]["digest"], \
            "2-process map differs from the single-process oracle"
