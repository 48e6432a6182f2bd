"""Tile-parallel sample accumulation — sort-free replacement for the global
sample sort + segment pipeline.

The reference's hottest loop upserts every ray sample into a hashmap-backed
octree leaf (reference: include/chad/detail/octree.hpp:153-163).  The first
TPU design replaced it with a *global* sort of all N*K samples by block key
plus segment reduction; measured on TPU v5e the 8M-element `lax.sort` alone
costs ~40 ms — half the insert budget.  This module removes the global sort
entirely by exploiting the spatial coherence the point-level Morton sort
already provides:

* Points are Morton-sorted, so each tile of `TILE` consecutive points (and
  all their DDA samples) touches only a handful of distinct blocks.
* **Stage A** (`tile_partials`): one Pallas grid step per tile
  - extracts the tile's <= NB distinct block keys with iterative
    min-extraction (ascending, so the list is sorted),
  - ranks every sample against the list with NB vectorized compares,
  - accumulates all samples with ONE stacked one-hot matmul per sublane
    row: `onehot(offset) (512,C) @ vals (C, 2*NB)` where column `r` holds
    the sample's sd masked to local block r and column `NB+r` its weight.
    Stacking the per-block channels into the MXU's N dimension is what
    makes this fast: a per-block (512,C)@(C,2) matmul would use 2/128
    lanes of the systolic array; the stacked form uses 64/128.
  - emits per-tile *partial block rows*: keys (NB,), sd (NB,512), w (NB,512).
  Samples beyond NB distinct blocks are dropped and counted (never silent).
* **Stage B** (`merge_partials`): partial rows are keyed to pool slots on
  the host graph (sort of T*NB keys — thousands, not millions), gathered
  into slot order, and a second Pallas kernel adds them into the pool,
  8-row pool group at a time, with a (8,C)@(C,512) one-hot matmul per
  64-row chunk of partials.

Everything is deterministic: matmul accumulation order is fixed per tile,
tiles are processed in order, and the merge adds partials in sorted-slot
order.  Weights are exact (0/1 products accumulated in f32); sd sums round
each sample to bf16 on the MXU path (~0.4% of trunc, below the 8-bit output
codec's trunc/127 step) and are exact-f32 on the interpret/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segops import boundary_flags, compact_flag_positions

INT32_MAX = np.int32(2**31 - 1)

TILE = 1024          # points per stage-A tile (grid step)
MERGE_CHUNK = 128    # partial rows per stage-B matmul window (lane-aligned)


# --------------------------------------------------------------------------
# Stage A: per-tile partial block rows
# --------------------------------------------------------------------------

def _tile_kernel(nb: int, acc_dtype, bkey_ref, okey_ref, sd_ref,
                 keys_out, psd_out, pw_out, ovfmask_out):
    k = bkey_ref.shape[0]
    c = bkey_ref.shape[1]
    bkey = bkey_ref[...]                       # (K, C) i32
    okey = okey_ref[...]
    sd = sd_ref[...]

    # ---- distinct block list, ascending (NB rounds of min-extraction) ----
    work = bkey
    lst = []
    for _ in range(nb):
        m = jnp.min(work)
        lst.append(m)
        work = jnp.where(work == m, INT32_MAX, work)

    keys_out[...] = jnp.stack(lst).reshape(nb, 1)

    # a sample is covered iff its key was extracted; invalid samples carry
    # key INT32_MAX which never matches a live list entry.  Samples beyond
    # the NB smallest distinct keys are flagged for the caller's fallback
    # path (insert_step_tiled routes them through the sort pipeline).
    covered = (work == INT32_MAX)
    valid = (bkey != INT32_MAX)
    not_covered = valid & ~covered
    ovfmask_out[...] = not_covered.astype(jnp.int32)
    use = (valid & covered).astype(jnp.float32)

    # ---- local row: rank = (# list keys <= bkey) - 1 ----
    lrow = jnp.zeros((k, c), jnp.int32)
    for r in range(1, nb):
        lrow = lrow + (bkey >= lst[r]).astype(jnp.int32)

    # ---- stacked one-hot accumulate, one matmul per sublane row ----
    acc = jnp.zeros((512, 2 * nb), jnp.float32)
    rids = jax.lax.broadcasted_iota(jnp.int32, (512, c), 0)
    cids = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, c), 0)
    is_w = (cids >= nb).astype(jnp.float32)
    blk_col = jnp.where(cids >= nb, cids - nb, cids)
    for r in range(k):
        offr = okey[r:r + 1]                             # (1, C)
        lrr = lrow[r:r + 1]
        sdr = sd[r:r + 1]
        user = use[r:r + 1]
        oh = ((offr == rids).astype(jnp.float32)).astype(acc_dtype)
        is_blk = (blk_col == lrr).astype(jnp.float32) * user
        vals_t = (is_blk * (is_w + (1.0 - is_w) * sdr)).astype(acc_dtype)
        acc += jax.lax.dot_general(
            oh, vals_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    psd_out[...] = acc[:, :nb].T
    pw_out[...] = acc[:, nb:].T


def tile_partials(bkey, okey, sd, nb: int, interpret: bool = False,
                  acc_dtype=None):
    """Stage A.  bkey/okey: i32[K, N]; sd: f32[K, N]; N % TILE == 0.

    Invalid samples carry ``bkey == INT32_MAX``.  Returns
    (pkeys i32[T*nb], psd f32[T*nb, 512], pw f32[T*nb, 512],
    ovfmask i32[K, N]) where T = N // TILE; unused list slots have key
    INT32_MAX and zero rows; ovfmask is 1 where a valid sample exceeded the
    tile's block-list capacity (those samples are NOT accumulated here).
    """
    k, n = bkey.shape
    assert n % TILE == 0, (n, TILE)
    t = n // TILE
    if acc_dtype is None:
        acc_dtype = jnp.float32 if interpret else jnp.bfloat16
    grid = (t,)
    sample_spec = pl.BlockSpec((k, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tile_kernel, nb, acc_dtype),
        grid=grid,
        in_specs=[sample_spec] * 3,
        out_specs=[
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t * nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.int32),
        ],
        interpret=interpret,
    )(bkey, okey, sd)


# --------------------------------------------------------------------------
# Stage B: merge slot-sorted partial rows into the pool
# --------------------------------------------------------------------------

def _merge_kernel(ng_ref, gstart_ref, glen_ref, grow_ref,   # scalar prefetch
                  prow_ref, gsd_hbm, gw_hbm,                # VMEM / ANY
                  sd_rows_in, w_rows_in,                    # VMEM blocks
                  sd_rows_out, w_rows_out,
                  csd, cw, sem):
    g = pl.program_id(0)
    gstart = gstart_ref[g]
    gend = gstart + glen_ref[g]          # glen = 0 for dead steps
    ch = MERGE_CHUNK

    first = gstart // ch
    nchunks = jnp.where(gend > gstart, (gend - 1) // ch - first + 1, 0)

    def chunk_body(j, acc2):
        acc_sd, acc_w = acc2
        base = pl.multiple_of((first + j) * ch, ch)
        d1 = pltpu.make_async_copy(
            gsd_hbm.at[pl.ds(base, ch), :], csd, sem.at[0])
        d2 = pltpu.make_async_copy(
            gw_hbm.at[pl.ds(base, ch), :], cw, sem.at[1])
        d1.start()
        d2.start()
        prow = prow_ref[0:1, pl.ds(pl.multiple_of(base, ch), ch)]
        gidx = base + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        inseg = ((gidx >= gstart) & (gidx < gend)).astype(jnp.float32)
        rids = jax.lax.broadcasted_iota(jnp.int32, (8, ch), 0)
        oh = (prow == rids).astype(jnp.float32) * inseg  # (8, CH)
        d1.wait()
        d2.wait()
        acc_sd = acc_sd + jnp.dot(oh, csd[...],
                                  preferred_element_type=jnp.float32)
        acc_w = acc_w + jnp.dot(oh, cw[...],
                                preferred_element_type=jnp.float32)
        return acc_sd, acc_w

    acc0 = (jnp.zeros((8, 512), jnp.float32),
            jnp.zeros((8, 512), jnp.float32))
    acc_sd, acc_w = jax.lax.fori_loop(0, nchunks, chunk_body, acc0)
    sd_rows_out[...] = sd_rows_in[...] + acc_sd
    w_rows_out[...] = w_rows_in[...] + acc_w


def merge_partials(pool_sd, pool_w, n_groups, gstart, glen, grow, prow,
                   gsd, gw, interpret: bool = False):
    """Stage B.  Adds slot-sorted partial rows into the pool.

    One grid step per (potential) touched 8-row pool group; the group's pool
    rows are pipelined in/out of VMEM by BlockSpecs whose index map reads
    the scalar-prefetched ``grow`` table — so Pallas overlaps each group's
    pool-row DMA with the previous group's accumulation.  Steps past
    ``n_groups`` map to the reserved tail group; consecutive identical
    indices are revisit-skipped (no DMA, identity write-back), so the static
    grid's dead tail is nearly free.

    pool_sd/pool_w: f32[Cb, 512] (aliased into the outputs).
    gstart/glen/grow: i32[G] group table over the sorted partial stream
    (grow indexes 8-row pool groups; dead entries: glen=0, grow=reserved).
    prow: i32[1, P] row-in-group per sorted partial.  gsd/gw: f32[P, 512]
    partial rows in sorted-slot order, padded to a MERGE_CHUNK multiple.
    """
    g_cap = gstart.shape[0]
    pool_spec = pl.BlockSpec((8, 512), lambda i, ng, gs, gl, gr: (gr[i], 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(g_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # prow
            pl.BlockSpec(memory_space=pl.ANY),    # gsd
            pl.BlockSpec(memory_space=pl.ANY),    # gw
            pool_spec,                            # pool_sd rows
            pool_spec,                            # pool_w rows
        ],
        out_specs=[pool_spec, pool_spec],
        scratch_shapes=[
            pltpu.VMEM((MERGE_CHUNK, 512), jnp.float32),
            pltpu.VMEM((MERGE_CHUNK, 512), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_sd.shape, pool_sd.dtype),
            jax.ShapeDtypeStruct(pool_w.shape, pool_w.dtype),
        ],
        input_output_aliases={7: 0, 8: 1},   # pools (after 4 scalars + 3)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(n_groups, gstart, glen, grow, prow, gsd, gw, pool_sd, pool_w)


def plan_merge(slot_sorted, n_valid, cb: int, g_cap: int):
    """Group table for merge_partials over a slot-sorted partial stream.

    slot_sorted: i32[P] pool slot per partial, ascending; entries beyond
    ``n_valid`` (and any equal to the reserved slot cb-1) are excluded.
    Returns (n_groups i32[1], gstart, glen, grow: i32[g_cap], prow i32[1,P]).

    INVARIANT (merge_partials aliases pool rows in/out via BlockSpecs
    indexed by grow[i]): a non-reserved group index must never appear at
    two non-consecutive grid steps.  This table guarantees it — live groups
    are distinct and ascending (boundary flags over an ascending gkey
    stream), and every dead entry maps to the one reserved tail group.  If
    a future change emitted a repeated non-adjacent grow value, Pallas
    would prefetch stale input rows for the second visit and silently lose
    the first visit's accumulation.
    """
    p = slot_sorted.shape[0]
    reserved_group = cb // 8 - 1
    gkey = slot_sorted // 8
    live = (jnp.arange(p, dtype=jnp.int32) < n_valid) & \
        (gkey != reserved_group)
    flags = boundary_flags(gkey) & live
    pos, g_count, _ = compact_flag_positions(flags, g_cap)
    gvalid = jnp.arange(g_cap, dtype=jnp.int32) < g_count
    pos_c = jnp.minimum(pos, p - 1)
    nxt = jnp.concatenate([pos[1:], jnp.full((1,), p, jnp.int32)])
    # a group's entries end at the next group start or the end of live data
    gstart = jnp.where(gvalid, pos_c, 0)
    gend = jnp.minimum(jnp.minimum(nxt, p), n_valid)
    glen = jnp.where(gvalid, jnp.maximum(gend - pos_c, 0), 0)
    grow = jnp.where(gvalid, jnp.minimum(gkey[pos_c], reserved_group),
                     reserved_group)
    prow = (slot_sorted - gkey * 8).astype(jnp.int32).reshape(1, p)
    return g_count.reshape(1), gstart, glen, grow, prow
