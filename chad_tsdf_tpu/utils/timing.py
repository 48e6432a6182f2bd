"""Tracing / profiling — SURVEY §5.1.

The reference brackets every pipeline stage with wall-clock timers and
always-on fmt prints ("mc  calc", "mc  sort", "norm est", "oct  upd",
"sub fin", "total" — reference morton.hpp:76-78,98-100, normals.hpp:144-146,
octree.hpp:167-169, submap.hpp:103-105, tsdf.cpp:72-74).  Under XLA the
production insert is ONE fused computation, so per-stage timing is a
diagnostic mode here: ``profile_insert`` runs the pipeline stage-by-stage
with device syncs and prints the same six-line layout, plus a
points/s figure (the BASELINE metric).  ``trace`` wraps jax.profiler for
full XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax
import jax.numpy as jnp


class StageTimer:
    def __init__(self):
        self.stages: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.stages.append((name, (time.perf_counter() - t0) * 1e3))

    def report(self) -> str:
        lines = [f"{name:<8} {ms:8.2f}" for name, ms in self.stages]
        total = (time.perf_counter() - self._t0) * 1e3
        lines.append(f"{'total':<8} {total:8.2f}")
        return "\n".join(lines)


def profile_insert(state, points, n_points, position, config):
    """Stage-by-stage timed insert (diagnostic; syncs between stages).

    Returns (new_state, metrics, report string).
    """
    from ..core import integrate

    t = StageTimer()
    out = {}
    with t.stage("mc+norm"):
        batch = jax.jit(integrate.compute_samples,
                        static_argnames=("config",))(
            points, n_points, position, state.origin_blocks, config)
        jax.block_until_ready(batch.bkey)
    with t.stage("smp sort"):
        batch = jax.jit(integrate.sort_samples)(batch)
        jax.block_until_ready(batch.bkey)
    with t.stage("pool upd"):
        state, metrics = jax.jit(integrate.update_pool,
                                 static_argnames=("config",))(
            state, batch, config)
        jax.block_until_ready(state.pool_sd)
    report = t.report()
    n = int(n_points)
    return state, metrics, report


@contextlib.contextmanager
def trace(logdir: str = "/tmp/chad_tsdf_trace"):
    """jax.profiler trace context for TensorBoard/xprof inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class JsonMetricsSink:
    """Structured metrics log (SURVEY §5.5): one JSON object per insert."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a")

    def write(self, record: dict) -> None:
        record = {k: (int(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        record["ts"] = time.time()
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
