"""The insert pipeline — one fused jit per scan.

Mirrors the reference hot path ``TSDFMap::insert`` (reference:
src/chad/tsdf.cpp:39-75):

  reference (scalar, hashmap-based)          TPU-native (this module)
  -----------------------------------       --------------------------------
  calc_morton_vector  morton.hpp:59-80  ->  local (block, offset) int32 keys
  sort_morton_vector  morton.hpp:81-102 ->  lax.sort, 2 keys (ascending*)
  estimate_normals    normals.hpp:81-148->  segmented-scan plane fits
  Octree::insert DDA  octree.hpp:92-152 ->  lax.scan fixed-K traversal
  per-voxel hashmap upsert + weighted    ->  sample sort by block + touched-
  mean                octree.hpp:153-163    block segments + Pallas/MXU
                                            accumulation into the block pool

(*) the reference sorts descending (morton.hpp:85-89); ascending is
equivalent for every consumer here (segments and sums are order-free) and is
what jax.lax.sort provides natively.  Documented deviation per SURVEY §7.

The pipeline is split into composable stages so the Morton-sharded SPMD path
(chad_tsdf_tpu.parallel) can interleave its sample routing between them:

  compute_samples  : points -> (block key, offset, sd) sample triples
  sort_samples     : single-int32-key sample sort
  update_pool      : touched-block segments + directory merge + accumulate

Everything runs under ``jax.jit`` with static shapes; validity masks and
overflow counters absorb the dynamic sizes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..ops import accumulate, dda, morton, normals, segops
from .state import INT32_MAX, ActiveMapState


class SampleBatch(NamedTuple):
    """Flat ray samples.

    ``payload`` packs the 9-bit intra-block offset and the signed distance
    quantized to 16 bits into one int32 (halves the sort payload and the
    routing traffic; 16-bit sd granularity is trunc/32767, far below the
    8-bit output codec's trunc/127):  payload = offset << 16 | sd_q16.
    """
    bkey: jnp.ndarray    # i32[S] block Morton key, INT32_MAX = invalid
    payload: jnp.ndarray  # i32[S] offset<<16 | 16-bit quantized sd
    pt_overflow: jnp.ndarray     # i32[] points outside the local extent
    samp_overflow: jnp.ndarray   # i32[] samples outside the local extent


SD_QUANT = 32767.0


def pack_payload(okey, sd, sdf_trunc: float):
    q = jnp.round(sd * (SD_QUANT / sdf_trunc)).astype(jnp.int32)
    q = jnp.clip(q, -32767, 32767)
    return (okey << 16) | (q & 0xFFFF)


def unpack_payload(payload, sdf_trunc: float):
    okey = (payload >> 16) & 0x1FF
    q = (payload << 16) >> 16          # arithmetic shift sign-extends
    sd = q.astype(jnp.float32) * (sdf_trunc / SD_QUANT)
    return okey, sd


def point_keys(points, n_points, origin_blocks, config: MapConfig):
    """Local Morton keys per point; invalid/padded points get sentinel keys.

    Returns (bkey, okey, pt_overflow)."""
    n = points.shape[0]
    extent = config.blocks_per_axis * 8
    idx = jnp.arange(n, dtype=jnp.int32)
    in_cloud = idx < n_points
    origin_voxel = origin_blocks * 8
    local, in_range = morton.points_to_local_voxels(
        points, origin_voxel, extent, config.sdf_res)
    valid_pt = in_cloud & in_range
    pt_overflow = jnp.sum(in_cloud & ~in_range).astype(jnp.int32)
    bkey = morton.encode_block(local[:, 0] >> 3, local[:, 1] >> 3,
                               local[:, 2] >> 3)
    okey = morton.encode_offset(local[:, 0] & 7, local[:, 1] & 7,
                                local[:, 2] & 7)
    bkey = jnp.where(valid_pt, bkey, INT32_MAX)
    okey = jnp.where(valid_pt, okey, INT32_MAX)
    return bkey, okey, pt_overflow


def sort_points(points, bkey, okey):
    """Sort points by (block, offset) Morton key (tsdf.cpp:64-65)."""
    n = points.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sb, so, perm = jax.lax.sort((bkey, okey, idx), num_keys=2)
    return points[perm], sb, so


def samples_from_sorted_points(pts, sb, so, position, origin_blocks,
                               config: MapConfig,
                               pt_overflow=None) -> SampleBatch:
    """Normals + DDA over Morton-sorted points -> flat sample triples.

    Internally structure-of-arrays: per-axis (N,) and (K, N) arrays keep the
    big axis on TPU lanes (an (N, 3)/(N, K) layout pads the minor dim to 128
    lanes — ~7x slower measured).
    """
    k = config.dda_steps
    res, trunc = config.sdf_res, config.sdf_trunc
    extent = config.blocks_per_axis * 8
    origin_voxel = origin_blocks * 8
    valid_sorted = sb != INT32_MAX
    if pt_overflow is None:
        pt_overflow = jnp.zeros((), jnp.int32)
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]

    # ---- normals (tsdf.cpp:67) ----
    nx, ny, nz = normals.estimate_normals_soa(
        px, py, pz, sb, so, valid_sorted, position,
        config.normal_min_points, config.normal_max_depth)

    # ---- DDA traversal + signed distances (octree.hpp:92-163) ----
    vx, vy, vz, vvalid = dda.traverse(px, py, pz, position, res, trunc, k)
    sd = dda.signed_distances(vx, vy, vz, px, py, pz, nx, ny, nz, res, trunc)
    vvalid = vvalid & valid_sorted[None, :]

    lx = vx - origin_voxel[0]
    ly = vy - origin_voxel[1]
    lz = vz - origin_voxel[2]
    s_in_range = ((lx >= 0) & (lx < extent) & (ly >= 0) & (ly < extent) &
                  (lz >= 0) & (lz < extent))
    samp_overflow = jnp.sum(vvalid & ~s_in_range).astype(jnp.int32)
    vvalid = vvalid & s_in_range
    lx = jnp.clip(lx, 0, extent - 1)
    ly = jnp.clip(ly, 0, extent - 1)
    lz = jnp.clip(lz, 0, extent - 1)

    s_bkey = morton.encode_block(lx >> 3, ly >> 3, lz >> 3)
    s_okey = morton.encode_offset(lx & 7, ly & 7, lz & 7)
    payload = pack_payload(s_okey, sd, trunc)
    s_bkey = jnp.where(vvalid, s_bkey, INT32_MAX).reshape(-1)
    payload = jnp.where(vvalid, payload, 0).reshape(-1)
    return SampleBatch(s_bkey, payload, pt_overflow, samp_overflow)


def compute_samples(points, n_points, position, origin_blocks,
                    config: MapConfig) -> SampleBatch:
    """Morton sort + normals + DDA: points -> flat sample triples."""
    bkey, okey, pt_overflow = point_keys(points, n_points, origin_blocks,
                                         config)
    pts, sb, so = sort_points(points, bkey, okey)
    return samples_from_sorted_points(pts, sb, so, position, origin_blocks,
                                      config, pt_overflow)


def sort_samples(batch: SampleBatch) -> SampleBatch:
    b, p = jax.lax.sort((batch.bkey, batch.payload), num_keys=1)
    return SampleBatch(b, p, batch.pt_overflow, batch.samp_overflow)


def update_pool(state: ActiveMapState, batch: SampleBatch,
                config: MapConfig):
    """Touched-block segmentation, directory merge, pool accumulation.

    ``batch`` must be sorted by block key (sort_samples).  Returns
    (new_state, metrics).
    """
    cb = config.block_capacity
    t_cap = config.touched_capacity
    reserved_row = cb - 1          # dummy row for the Pallas kernel
    # the last 8-row group is reserved so dummy grid steps never touch a
    # live row (see ops/accumulate.py GROUP)
    usable_blocks = cb - accumulate.GROUP
    s_bkey, s_payload = batch.bkey, batch.payload
    total = s_bkey.shape[0]
    n_valid_samples = jnp.sum(s_bkey != INT32_MAX).astype(jnp.int32)

    # ---- touched-block segments (compaction via rank search, no scatter) ----
    flags = segops.boundary_flags(s_bkey) & (s_bkey != INT32_MAX)
    # t_cap + 1 positions so the segment after the last kept block is known
    starts_full, _, t_total = segops.compact_flag_positions(flags, t_cap + 1)
    starts = starts_full[:t_cap]
    t_count = jnp.minimum(t_total, t_cap)
    touched_overflow = jnp.maximum(t_total - t_cap, 0).astype(jnp.int32)
    tvalid = jnp.arange(t_cap, dtype=jnp.int32) < t_count
    ends = jnp.minimum(starts_full[1:], n_valid_samples)
    starts_c = jnp.minimum(starts, total - 1)
    lens = jnp.where(tvalid, jnp.maximum(ends - starts, 0), 0)
    tb_keys = jnp.where(tvalid, s_bkey[starts_c], INT32_MAX)

    # ---- directory lookup + allocation of new blocks ----
    pos = jnp.searchsorted(state.dir_keys, tb_keys).astype(jnp.int32)
    pos_c = jnp.minimum(pos, cb - 1)
    found = (state.dir_keys[pos_c] == tb_keys) & tvalid
    is_new = tvalid & ~found
    new_rank = jnp.cumsum(is_new.astype(jnp.int32))
    n_new = new_rank[-1]
    slot_if_new = state.n_blocks + new_rank - 1
    fits = slot_if_new < usable_blocks
    block_overflow = jnp.sum(is_new & ~fits).astype(jnp.int32)
    tb_slots = jnp.where(found, state.dir_slots[pos_c],
                         jnp.where(fits, slot_if_new, reserved_row))
    tb_slots = jnp.where(tvalid, tb_slots, reserved_row)
    # drop samples of overflowed blocks
    lens = jnp.where(tb_slots == reserved_row, 0, lens)

    # rebuild the sorted directory by merging the new keys
    append_keys = jnp.where(is_new & fits, tb_keys, INT32_MAX)
    append_slots = jnp.where(is_new & fits, slot_if_new, 0)
    mk = jnp.concatenate([state.dir_keys, append_keys])
    ms = jnp.concatenate([state.dir_slots, append_slots])
    mk, ms = jax.lax.sort((mk, ms), num_keys=1)
    dir_keys = mk[:cb]
    dir_slots = ms[:cb]
    n_blocks = jnp.minimum(state.n_blocks + n_new, usable_blocks)

    # ---- accumulate into the pool ----
    if _use_pallas(config):
        pad_i = jnp.zeros((accumulate.CHUNK,), jnp.int32)
        groups = accumulate.group_touched_blocks(starts_c, lens, tb_slots,
                                                 t_cap, cb)
        pool_sd, pool_w = accumulate.accumulate_pallas(
            state.pool_sd, state.pool_w, *groups,
            jnp.concatenate([s_payload, pad_i]),
            touched_capacity=t_cap, sd_scale=config.sdf_trunc / SD_QUANT)
    else:
        # per-sample slot via dense segment fill (no big searchsorted)
        s_okey, s_sd = unpack_payload(s_payload, config.sdf_trunc)
        t_idx = jnp.cumsum(flags.astype(jnp.int32)) - 1
        t_idx_c = jnp.clip(t_idx, 0, t_cap - 1)
        slot_per_sample = tb_slots[t_idx_c]
        sample_ok = (s_bkey != INT32_MAX) & (t_idx < t_cap) & \
            (slot_per_sample != reserved_row)
        pool_sd, pool_w = accumulate.accumulate_xla(
            state.pool_sd, state.pool_w, slot_per_sample, s_okey, s_sd,
            sample_ok)

    new_state = ActiveMapState(
        dir_keys=dir_keys, dir_slots=dir_slots, n_blocks=n_blocks,
        pool_sd=pool_sd, pool_w=pool_w, origin_blocks=state.origin_blocks,
        point_overflow=state.point_overflow + batch.pt_overflow,
        sample_overflow=state.sample_overflow + batch.samp_overflow,
        block_overflow=state.block_overflow + block_overflow,
        touched_overflow=state.touched_overflow + touched_overflow,
    )
    metrics = {
        "n_valid_samples": n_valid_samples,
        "n_touched_blocks": t_count,
        "n_new_blocks": n_new,
        "n_blocks": n_blocks,
    }
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def insert_step(state: ActiveMapState, points: jnp.ndarray,
                n_points: jnp.ndarray, position: jnp.ndarray,
                config: MapConfig):
    """Integrate one (padded) point cloud into the active map.

    Args:
      state: ActiveMapState (donated — the pool is updated in place).
      points: f32[N, 3] world points, padded to config.max_points.
      n_points: i32[] number of valid rows in ``points``.
      position: f32[3] scanner position.
    Returns:
      (new_state, metrics dict).
    """
    batch = compute_samples(points, n_points, position, state.origin_blocks,
                            config)
    batch = sort_samples(batch)
    return update_pool(state, batch, config)


def _use_pallas(config: MapConfig) -> bool:
    if config.accumulate_impl == "pallas":
        return True
    if config.accumulate_impl == "xla":
        return False
    return jax.default_backend() == "tpu"
