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
