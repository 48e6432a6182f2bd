"""Microbenchmark: int8 vs bf16 one-hot scatter-matmul for stage A
(dev tool).

Variants over the factorized layout of ops/fused_integrate.py (oh (128,C) @
vals (C, 4*2nb), k rows per tile):
  bf16   — production: bf16 inputs, f32 acc
  int8   — int8 inputs (sd pre-quantized to the codec grid), i32 acc
  int8b  — int8, all k rows concatenated into one dot (C = k*TILE)
  bf16b  — bf16, batched contraction
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 10
N = 1 << 20
TILE = 1024
NB = 40
INF = np.int32(0x7FFFFFFF)


def make_kernel(nb, mode):
    cols = 4 * 2 * nb

    def kern(okey_ref, sd_ref, lrow_ref, use_ref, psd_out, pw_out):
        okey = okey_ref[...]
        sdq = sd_ref[...]                      # pre-quantized int [-127,127]
        lrow = lrow_ref[...]
        use = use_ref[...]
        rids = jax.lax.broadcasted_iota(jnp.int32, (128, TILE), 0)
        cids4 = jax.lax.broadcasted_iota(jnp.int32, (cols, TILE), 0)
        hi_col = cids4 // (2 * nb)
        j_col = cids4 % (2 * nb)
        is_w = j_col >= nb
        blk_col = jnp.where(is_w, j_col - nb, j_col)

        if mode in ("formD", "formD8", "formDb"):
            # transposed: oh512 (512,C) @ [bsel*sd; bsel] (2nb,C) -> (512,2nb)
            in_dt = jnp.int8 if mode == "formD8" else jnp.bfloat16
            out_dt = jnp.int32 if mode == "formD8" else jnp.float32
            rids512 = jax.lax.broadcasted_iota(jnp.int32, (512, TILE), 0)
            cids2 = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, TILE), 0)
            is_w2 = cids2 >= nb
            blk2 = jnp.where(is_w2, cids2 - nb, cids2)
            if mode == "formDb":
                ohs, rights = [], []
                for r in range(K):
                    ohs.append((okey[r:r + 1] == rids512).astype(in_dt))
                    bsel = (blk2 == lrow[r:r + 1]) & (use[r:r + 1] != 0)
                    rights.append((jnp.where(is_w2, 1, sdq[r:r + 1])
                                   * bsel.astype(jnp.int32)).astype(in_dt))
                acc = jax.lax.dot_general(
                    jnp.concatenate(ohs, axis=1),
                    jnp.concatenate(rights, axis=1),
                    (((1,), (1,)), ((), ())), preferred_element_type=out_dt)
            else:
                acc = jnp.zeros((512, 2 * nb), out_dt)
                for r in range(K):
                    oh = (okey[r:r + 1] == rids512).astype(in_dt)
                    bsel = (blk2 == lrow[r:r + 1]) & (use[r:r + 1] != 0)
                    right = (jnp.where(is_w2, 1, sdq[r:r + 1])
                             * bsel.astype(jnp.int32)).astype(in_dt)
                    acc += jax.lax.dot_general(
                        oh, right, (((1,), (1,)), ((), ())),
                        preferred_element_type=out_dt)
            accf = acc.astype(jnp.float32)          # (512, 2nb)
            psd_out[...] = accf[:, :nb].T
            pw_out[...] = accf[:, nb:].T
            return
        if mode in ("int8", "bf16"):
            in_dt = jnp.int8 if mode == "int8" else jnp.bfloat16
            out_dt = jnp.int32 if mode == "int8" else jnp.float32
            acc = jnp.zeros((128, cols), out_dt)
            for r in range(K):
                offr = okey[r:r + 1]
                lrr = lrow[r:r + 1]
                sdr = sdq[r:r + 1]
                user = use[r:r + 1]
                lo = offr & 127
                hi = offr >> 7
                oh = (lo == rids).astype(in_dt)
                sel = ((blk_col == lrr) & (hi_col == hi) & (user != 0))
                vals = jnp.where(is_w, 1, sdr) * sel.astype(jnp.int32)
                acc += jax.lax.dot_general(
                    oh, vals.astype(in_dt), (((1,), (1,)), ((), ())),
                    preferred_element_type=out_dt)
            accf = acc.astype(jnp.float32)
        else:
            in_dt = jnp.int8 if mode == "int8b" else jnp.bfloat16
            out_dt = jnp.int32 if mode == "int8b" else jnp.float32
            lo = okey & 127
            hi = okey >> 7
            ohs, valss = [], []
            for r in range(K):
                ohs.append((lo[r:r + 1] == rids).astype(in_dt))
                sel = ((blk_col == lrow[r:r + 1]) & (hi_col == hi[r:r + 1])
                       & (use[r:r + 1] != 0))
                valss.append((jnp.where(is_w, 1, sdq[r:r + 1])
                              * sel.astype(jnp.int32)).astype(in_dt))
            oh = jnp.concatenate(ohs, axis=1)            # (128, K*TILE)
            vals = jnp.concatenate(valss, axis=1)        # (cols, K*TILE)
            accf = jax.lax.dot_general(
                oh, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=out_dt).astype(jnp.float32)
        psd_parts, pw_parts = [], []
        at = accf.T
        psd_parts = [at[h * 2 * nb: h * 2 * nb + nb, :] for h in range(4)]
        pw_parts = [at[h * 2 * nb + nb: (h + 1) * 2 * nb, :]
                    for h in range(4)]
        psd_out[...] = jnp.concatenate(psd_parts, axis=1)
        pw_out[...] = jnp.concatenate(pw_parts, axis=1)
    return kern


def build(nb, mode):
    t = N // TILE
    spec = pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((K, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def run(okey, sdq, lrow, use):
        return pl.pallas_call(
            make_kernel(nb, mode),
            grid=(t,),
            in_specs=[spec, spec, spec, spec1],
            out_specs=[
                pl.BlockSpec((nb, 512), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 512), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
                jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            ],
        )(okey, sdq, lrow, use)
    return run


def main():
    rng = np.random.default_rng(0)
    okey = jnp.asarray(rng.integers(0, 512, (K, N)).astype(np.int32))
    sdq = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int32))
    lrow = jnp.asarray(rng.integers(0, NB, (K, N)).astype(np.int32))
    use = jnp.asarray((rng.random((K, N)) < 0.72).astype(np.int32))

    outs = {}
    for mode in ("bf16", "int8b", "formD", "formD8", "formDb"):
        try:
            run = build(NB, mode)
            out = run(okey, sdq, lrow, use)
            np.asarray(out[0][0, 0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = run(okey, sdq, lrow, use)
            np.asarray(out[0][0, 0])
            dt = (time.perf_counter() - t0) / 10
            outs[mode] = (np.asarray(out[0]), np.asarray(out[1]))
            print(f"{mode:6s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{mode:6s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if "bf16" in outs and "int8" in outs:
        # int8 weights must match exactly; int8 sd sums are exact integers
        w_ok = (outs["bf16"][1] == outs["int8"][1]).all()
        print("w int8 == w bf16:", w_ok)
        print("sd int8 max |diff| vs bf16:",
              np.abs(outs["bf16"][0] - outs["int8"][0]).max())
    if "int8" in outs and "int8b" in outs:
        print("int8b == int8:",
              (outs["int8"][0] == outs["int8b"][0]).all(),
              (outs["int8"][1] == outs["int8b"][1]).all())


if __name__ == "__main__":
    main()
