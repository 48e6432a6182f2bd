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


def _route_by_key(keys: jnp.ndarray, int_fields: list, f32_fields: list,
                  bounds: jnp.ndarray, capacity: int, axis: str):
    """Exchange key-sorted rows so each shard holds only keys it owns.

    ``keys`` must be ascending with INT32_MAX sentinels at the end.  Each
    (src, dst) pair carries up to ``capacity`` rows; the overflow count is
    returned (never silently dropped rows without accounting).  Returns
    (recv_keys, recv_int_fields, recv_f32_fields, overflow) with
    n_shards * capacity rows, unsorted.
    """
    c = capacity
    s = keys.shape[0]

    # per-destination contiguous segments of the sorted key array
    seg = jnp.searchsorted(keys, bounds).astype(jnp.int32)  # (d+1,)
    starts, ends = seg[:-1], seg[1:]
    lens = ends - starts
    overflow = jnp.sum(jnp.maximum(lens - c, 0)).astype(jnp.int32)

    j = jnp.arange(c, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:, None] + j, s - 1)
    valid = j < lens[:, None]

    send_k = jnp.where(valid, keys[idx], INT32_MAX)
    send_i = jnp.stack([jnp.where(valid, f[idx], 0) for f in int_fields],
                       axis=-1) if int_fields else None
    send_f = jnp.stack([jnp.where(valid, f[idx], 0.0) for f in f32_fields],
                       axis=-1) if f32_fields else None

    recv_k = jax.lax.all_to_all(send_k, axis, 0, 0, tiled=False).reshape(-1)
    recv_i = []
    if send_i is not None:
        r = jax.lax.all_to_all(send_i, axis, 0, 0, tiled=False)
        recv_i = [r.reshape(-1, len(int_fields))[:, i]
                  for i in range(len(int_fields))]
    recv_f = []
    if send_f is not None:
        r = jax.lax.all_to_all(send_f, axis, 0, 0, tiled=False)
        recv_f = [r.reshape(-1, len(f32_fields))[:, i]
                  for i in range(len(f32_fields))]
    return recv_k, recv_i, recv_f, overflow


def make_sharded_insert(config: MapConfig, mesh: Mesh,
                        route_capacity: int | None = None,
                        point_route_slack: float = 2.0,
                        axis: str = "shard"):
    """Build the jitted SPMD insert step.

    Returns ``step(state_stack, points, n_points, position) ->
    (state_stack, metrics)`` where ``state_stack`` leaves carry a leading
    device axis and ``points`` is (n_shards * max_points, 3) data-parallel.

    Two routing rounds per step: (1) points are routed to their voxel's
    owner shard BEFORE normal estimation, so Morton neighbourhoods see the
    full point set of their region (segments only clip at the rare shard
    range boundary); (2) ray samples are routed to owner shards — the halo
    exchange for truncation bands crossing shard borders.
    """
    n_shards = mesh.devices.size
    if route_capacity is None:
        # uniform routing load + 2x safety slack
        route_capacity = 2 * config.sample_capacity // max(n_shards, 1)
    pt_capacity = int(point_route_slack * config.max_points
                      / max(n_shards, 1))
    bounds_np = key_bounds(n_shards, config)

    def shard_fn(state, points, n_points, position):
        state = jax.tree.map(lambda x: x[0], state)     # drop device axis
        points = points.reshape(-1, 3)
        bounds = jnp.asarray(bounds_np)

        # ---- round 1: route points to owners before normal estimation ----
        px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]
        bkey, okey, pt_ovf = integrate.point_keys_soa(
            px0, py0, pz0, n_points[0], state.origin_blocks, config)
        sb, so, px0, py0, pz0 = integrate.sort_points_soa(
            px0, py0, pz0, bkey, okey)
        rk, (ro,), (px, py, pz), pt_route_ovf = _route_by_key(
            sb, [so], [px0, py0, pz0], bounds, pt_capacity, axis)
        rb2, ro2, px, py, pz = integrate.sort_points_soa(px, py, pz, rk, ro)

        s_bkey, s_okey, sd, _, samp_ovf = integrate.compute_sample_grids_soa(
            px, py, pz, rb2, ro2, position, state.origin_blocks, config)
        payload = integrate.pack_payload(s_okey, sd, config.sdf_trunc)
        payload = jnp.where(s_bkey != integrate.INT32_MAX, payload, 0)
        batch = integrate.SampleBatch(s_bkey.reshape(-1),
                                      payload.reshape(-1), pt_ovf, samp_ovf)
        batch = integrate.sort_samples(batch)

        # ---- round 2: halo exchange of ray samples ----
        sk, (spay,), _, s_route_ovf = _route_by_key(
            batch.bkey, [batch.payload], [], bounds, route_capacity, axis)
        batch = integrate.sort_samples(integrate.SampleBatch(
            sk, spay, batch.pt_overflow, batch.samp_overflow))

        state, metrics = integrate.update_pool(state, batch, config)
        metrics["point_route_overflow"] = pt_route_ovf
        metrics["route_overflow"] = s_route_ovf
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
