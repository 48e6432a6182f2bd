"""Morton-range sharding over a device mesh — the scale-out axis.

The reference is strictly single-threaded and single-process (SURVEY §2.3);
this module is the capability the TPU build adds: the map's block-key space
is partitioned into contiguous Morton ranges, one per device, so each shard
owns a compact spatial region (Morton order preserves locality).  This is
the mapping analog of sequence/context parallelism (SURVEY §5.7):

* points are data-parallel over devices; each device computes its points'
  ray samples locally (sort -> normals -> DDA),
* samples are routed to their *owner* shard with one ``all_to_all`` over the
  mesh axis — rays whose truncation band crosses a shard boundary simply
  contribute samples to both owners, which IS the halo exchange (SURVEY
  §5.7-5.8): deterministic, associative, no atomics,
* each shard then runs the standard touched-block/accumulate update on its
  own block pool.

The same SPMD code runs on a real TPU mesh (ICI collectives) and on a
virtual CPU mesh (``--xla_force_host_platform_device_count``), which is how
tests and the driver's multi-chip dry run validate it without N chips.

Routing capacity: samples sent from one shard to one destination are capped
at ``route_capacity`` with an overflow counter (never silent truncation).
Because samples are key-sorted before routing, per-destination segments are
contiguous and the send buffers are built with pure gathers.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MapConfig
from ..core import integrate
from ..core.state import INT32_MAX, ActiveMapState, create_state
from ..ops import segops


def key_bounds(n_shards: int, config: MapConfig) -> np.ndarray:
    """Static equal partition of the block-key space into owner ranges.

    bounds[d] .. bounds[d+1] is shard d's key range; bounds has n+1 entries.
    """
    space = 1 << (3 * config.block_bits)
    b = np.linspace(0, space, n_shards + 1).astype(np.int64)
    return b.astype(np.int32)


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def create_sharded_state(config: MapConfig, mesh: Mesh, origin_blocks,
                         axis: str = "shard"):
    """Per-shard ActiveMapState stacked on a leading device axis."""
    n = mesh.devices.size
    base = create_state(config, origin_blocks)

    def stack(x):
        return jnp.broadcast_to(x[None], (n,) + x.shape)

    stacked = jax.tree.map(stack, base)
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(stacked, sharding)


def _route_samples(batch: integrate.SampleBatch, bounds: jnp.ndarray,
                   route_capacity: int, axis: str):
    """Exchange key-sorted samples so each shard holds only keys it owns.

    Returns a SampleBatch of size n_shards * route_capacity (sorted again)
    plus an overflow count.
    """
    d = bounds.shape[0] - 1
    c = route_capacity
    s = batch.bkey.shape[0]

    # per-destination contiguous segments of the sorted sample array
    seg = jnp.searchsorted(batch.bkey, bounds).astype(jnp.int32)  # (d+1,)
    starts, ends = seg[:-1], seg[1:]
    lens = ends - starts
    overflow = jnp.sum(jnp.maximum(lens - c, 0)).astype(jnp.int32)

    # gather send buffers (d, c) per field
    j = jnp.arange(c, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:, None] + j, s - 1)
    valid = j < lens[:, None]
    send_b = jnp.where(valid, batch.bkey[idx], INT32_MAX)
    send_o = jnp.where(valid, batch.okey[idx], 0)
    send_s = jnp.where(valid, batch.sd[idx], 0.0)

    # all_to_all: row i of the send buffer goes to shard i
    recv_b = jax.lax.all_to_all(send_b, axis, 0, 0, tiled=False)
    recv_o = jax.lax.all_to_all(send_o, axis, 0, 0, tiled=False)
    recv_s = jax.lax.all_to_all(send_s, axis, 0, 0, tiled=False)

    out = integrate.SampleBatch(
        recv_b.reshape(-1), recv_o.reshape(-1), recv_s.reshape(-1),
        batch.pt_overflow, batch.samp_overflow)
    return integrate.sort_samples(out), overflow


def make_sharded_insert(config: MapConfig, mesh: Mesh,
                        route_capacity: int | None = None,
                        axis: str = "shard"):
    """Build the jitted SPMD insert step.

    Returns ``step(state_stack, points, n_points, position) ->
    (state_stack, metrics)`` where ``state_stack`` leaves carry a leading
    device axis and ``points`` is (n_shards * max_points, 3) data-parallel.
    """
    n_shards = mesh.devices.size
    if route_capacity is None:
        # uniform routing load + 2x safety slack
        route_capacity = 2 * config.sample_capacity // max(n_shards, 1)
    bounds_np = key_bounds(n_shards, config)

    def shard_fn(state, points, n_points, position):
        state = jax.tree.map(lambda x: x[0], state)     # drop device axis
        points = points.reshape(-1, 3)
        bounds = jnp.asarray(bounds_np)

        batch = integrate.compute_samples(points, n_points[0], position,
                                          state.origin_blocks, config)
        batch = integrate.sort_samples(batch)
        batch, route_overflow = _route_samples(batch, bounds,
                                               route_capacity, axis)
        state, metrics = integrate.update_pool(state, batch, config)
        # drop counters of samples this shard does not own from its metrics
        metrics["route_overflow"] = route_overflow
        metrics = {k: jax.lax.psum(v, axis) for k, v in metrics.items()}
        state = jax.tree.map(lambda x: x[None], state)  # re-add device axis
        return state, metrics

    pspec = jax.tree.map(lambda _: P(axis),
                         jax.eval_shape(lambda: create_state(config)))
    step = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(pspec, P(axis), P(axis), P()),
            out_specs=(pspec, P()),
        ),
        donate_argnums=(0,))
    return step, route_capacity


def gather_states(state_stack) -> list[ActiveMapState]:
    """Split a stacked sharded state into per-shard host-side states."""
    n = state_stack.dir_keys.shape[0]
    out = []
    for i in range(n):
        out.append(jax.tree.map(lambda x: np.asarray(x[i]), state_stack))
    return out
