"""Microbenchmark: per-tile block-list + stacked one-hot matmul accumulate.

Validates the fused-integrate kernel design: for each tile of S samples,
 - extract <=NB distinct block keys (iterative min-extract),
 - local row per sample via NB vectorized compares (rank = #keys <= bkey),
 - per 1024-sample lane row: one-hot (512, C) and transposed vals (2*NB, C),
   contracted on the MXU -> (512, 2*NB),
 - emit (NB, 512, 2) partial rows.
Fake data, measures us/tile on TPU.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8192          # samples per tile
ROWS = 8          # sublane rows per tile
C = S // ROWS     # lane width per row
NB = 32           # block-list capacity per tile
NTILES = 1024     # ~1M points at K=8 -> 8M samples


def kernel(bkey_ref, off_ref, sd_ref, keys_out, psd_out, pw_out):
    bkey = bkey_ref[0]                     # (ROWS, C) i32
    off = off_ref[0]
    sd = sd_ref[0]

    # ---- local block list: NB rounds of min-extraction ----
    INF = jnp.int32(0x7FFFFFFF)
    work = bkey
    lst = []
    for r in range(NB):
        m = jnp.min(work)
        lst.append(m)
        work = jnp.where(work == m, INF, work)

    keys_out[...] = jnp.stack(lst).reshape(NB, 1)

    # ---- local row: rank = (# list keys <= bkey) - 1, via NB compares ----
    lrow = jnp.zeros((ROWS, C), jnp.int32)
    for r in range(1, NB):
        lrow = lrow + (bkey >= lst[r]).astype(jnp.int32)

    # ---- stacked accumulate: per sublane row, contract on lanes ----
    acc = jnp.zeros((512, 2 * NB), jnp.float32)
    rids = jax.lax.broadcasted_iota(jnp.int32, (512, C), 0)
    cids = jax.lax.broadcasted_iota(jnp.int32, (2 * NB, C), 0)
    is_w = (cids >= NB).astype(jnp.float32)
    blk_col = jnp.where(cids >= NB, cids - NB, cids)
    for r in range(ROWS):
        offr = off[r:r + 1]                              # (1, C)
        lrr = lrow[r:r + 1]
        sdr = sd[r:r + 1]
        oh = (offr == rids).astype(jnp.float32).astype(jnp.bfloat16)
        is_blk = (blk_col == lrr).astype(jnp.float32)
        vals_t = (is_blk * (is_w + (1.0 - is_w) * sdr)).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            oh, vals_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- split/transpose to (NB, 512) x2 ----
    psd_out[...] = acc[:, :NB].T
    pw_out[...] = acc[:, NB:].T


@jax.jit
def run(bkeys, offs, sds):
    return pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[
            pl.BlockSpec((1, ROWS, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 512), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NTILES * NB, 1), jnp.int32),
            jax.ShapeDtypeStruct((NTILES * NB, 512), jnp.float32),
            jax.ShapeDtypeStruct((NTILES * NB, 512), jnp.float32),
        ],
    )(bkeys, offs, sds)


def main():
    rng = np.random.default_rng(0)
    # ~16 distinct blocks per tile, offsets uniform
    base = rng.integers(0, 1 << 20, (NTILES, 1, 1))
    bkeys = (base + rng.integers(0, 16, (NTILES, ROWS, C))).astype(np.int32)
    offs = rng.integers(0, 512, (NTILES, ROWS, C)).astype(np.int32)
    sds = rng.normal(size=(NTILES, ROWS, C)).astype(np.float32)
    bkeys, offs, sds = map(jnp.asarray, (bkeys, offs, sds))

    out = run(bkeys, offs, sds)
    jax.block_until_ready(out)
    # correctness spot check vs numpy on tile 0
    k0 = np.asarray(out[0][:NB]); p0 = np.asarray(out[1][:NB])
    w0 = np.asarray(out[2][:NB])
    bk0 = np.asarray(bkeys[0]).ravel(); of0 = np.asarray(offs[0]).ravel()
    sd0 = np.asarray(sds[0]).ravel()
    uniq = np.unique(bk0)
    ref_w = np.zeros((NB, 512)); ref_sd = np.zeros((NB, 512))
    for b, o, s in zip(bk0, of0, sd0):
        r = np.searchsorted(uniq, b)
        ref_w[r, o] += 1.0
        ref_sd[r, o] += s
    assert (k0.ravel()[:len(uniq)] == uniq).all()
    werr = np.abs(w0[:len(uniq)] - ref_w[:len(uniq)]).max()
    sderr = np.abs(p0[:len(uniq)] - ref_sd[:len(uniq)]).max()
    print(f"weight err {werr}, sd err {sderr:.4f} (bf16 sum tolerance)")

    t0 = time.perf_counter()
    for _ in range(10):
        out = run(bkeys, offs, sds)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    total_samples = NTILES * S
    print(f"{dt*1e3:.2f} ms for {NTILES} tiles "
          f"({dt/NTILES*1e6:.2f} us/tile, "
          f"{total_samples/dt/1e6:.1f} M samples/s)")


if __name__ == "__main__":
    main()
