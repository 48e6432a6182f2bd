"""Sample accumulation into the block pool.

Replaces the reference's hottest loop — per-voxel hashmap lookup + weighted
mean update (reference: include/chad/detail/octree.hpp:153-163) — with a
deterministic, scatter-free device pipeline:

* samples arrive **sorted by block key** (single int32 sort);
* touched-block segments are described by (start, length, pool-slot) triples;
* a Pallas kernel walks the touched blocks (grid), streams each block's
  samples from HBM in aligned 1024-wide windows, expands intra-block offsets
  through an on-the-fly one-hot and reduces them on the MXU
  (``onehot(offset).T @ [sd, 1]``), then adds the 8x8x8 delta into the
  aliased pool rows selected by scalar-prefetched slot indices.

The pool is two (Cb, 512) planes (sd-sum and weight) — see
core/state.ActiveMapState for why not (Cb, 512, 2).

Measured on TPU v5e: XLA's scatter-add runs at ~78 M samples/s, which is why
the per-element scatter formulation is kept only as the portable fallback
(`accumulate_xla`, also used on CPU in tests and as the differential-testing
oracle for the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA window: Mosaic requires 1-D VMEM slices aligned to 1024 elements for
# 32-bit dtypes, so blocks are streamed in aligned 1024-sample windows and
# masked down to the block's [start, start+len) segment.
CHUNK = 1024


def accumulate_xla(pool_sd, pool_w, slots_per_sample, offsets, sd, valid):
    """Portable scatter-add path.

    pool_sd/pool_w: f32[Cb, 512]; slots_per_sample/offsets: i32[S];
    sd: f32[S]; valid: bool[S].
    """
    cb = pool_sd.shape[0]
    idx = slots_per_sample * 512 + offsets
    idx = jnp.where(valid, idx, cb * 512)  # out-of-range -> dropped
    new_sd = pool_sd.reshape(-1).at[idx].add(
        jnp.where(valid, sd, 0.0), mode="drop").reshape(pool_sd.shape)
    new_w = pool_w.reshape(-1).at[idx].add(
        valid.astype(jnp.float32), mode="drop").reshape(pool_w.shape)
    return new_sd, new_w


def _accum_kernel(starts_ref, lens_ref, slots_ref,  # scalar prefetch (SMEM)
                  off_hbm, sd_hbm,                  # ANY (HBM) sample arrays
                  sd_in_ref, w_in_ref,              # VMEM (1, 512) aliased
                  sd_out_ref, w_out_ref,            # VMEM (1, 512)
                  off_vmem, sd_vmem, acc_ref, sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    length = lens_ref[t]
    end = start + length

    acc_ref[...] = jnp.zeros_like(acc_ref)

    first = start // CHUNK
    nchunks = jnp.where(length > 0, (end - 1) // CHUNK - first + 1, 0)

    def chunk_body(c, _):
        base = pl.multiple_of((first + c) * CHUNK, CHUNK)
        cp1 = pltpu.make_async_copy(off_hbm.at[pl.ds(base, CHUNK)],
                                    off_vmem, sem.at[0])
        cp2 = pltpu.make_async_copy(sd_hbm.at[pl.ds(base, CHUNK)],
                                    sd_vmem, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        # global sample index of each lane in this aligned window
        g = base + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        mask = ((g >= start) & (g < end)).astype(jnp.float32)  # (CHUNK, 1)
        off = off_vmem[...].reshape(CHUNK, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 512), 1)
        onehot = jnp.where(off == cols, 1.0, 0.0) * mask   # (CHUNK, 512)
        sd = sd_vmem[...].reshape(CHUNK, 1) * mask
        vals = jnp.concatenate([sd, mask], axis=-1)        # (CHUNK, 2)
        acc_ref[...] += jnp.dot(onehot.T, vals,
                                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)
    sd_out_ref[...] = sd_in_ref[...] + acc_ref[:, 0][None, :]
    w_out_ref[...] = w_in_ref[...] + acc_ref[:, 1][None, :]


@functools.partial(jax.jit,
                   static_argnames=("touched_capacity", "interpret"))
def accumulate_pallas(pool_sd, pool_w, starts, lens, slots, offsets, sd,
                      touched_capacity: int, interpret: bool = False):
    """TPU path: per-touched-block MXU accumulation.

    pool_sd/pool_w: f32[Cb, 512]; starts/lens/slots: i32[T];
    offsets: i32[S+pad]; sd: f32[S+pad] — sample arrays must be padded by at
    least CHUNK so the final aligned window stays in bounds.
    """
    t_cap = touched_capacity
    row = lambda t, st, ln, sl: (sl[t], 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # offsets
            pl.BlockSpec(memory_space=pl.ANY),  # sd
            pl.BlockSpec((1, 512), row),
            pl.BlockSpec((1, 512), row),
        ],
        out_specs=[
            pl.BlockSpec((1, 512), row),
            pl.BlockSpec((1, 512), row),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK,), jnp.float32),
            pltpu.VMEM((512, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _accum_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_sd.shape, pool_sd.dtype),
            jax.ShapeDtypeStruct(pool_w.shape, pool_w.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},  # pools (after 3 scalars + 2 hbm)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, lens, slots, offsets, sd, pool_sd, pool_w)
