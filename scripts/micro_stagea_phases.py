"""Microbenchmark: which phase of the stage-A tile kernel dominates.

Variants (same (K=11, N=1M) sample layout as the real pipeline):
  list    — NB min-extraction rounds only
  rank    — list + NB-compare ranks
  full    — the real tile kernel (list + rank + k one-hot matmuls)
  mxu     — one-hot matmuls only (fixed fake list/ranks)
Run on TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/micro_stagea_phases.py
"""
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 11
N = 1 << 20
INF = np.int32(0x7FFFFFFF)


def list_phase(nb, bkey):
    work = bkey
    lst = []
    for _ in range(nb):
        m = jnp.min(work)
        lst.append(m)
        work = jnp.where(work == m, INF, work)
    return lst, work


def batcher_pairs(n):
    """Batcher odd-even mergesort comparator pairs for arbitrary n
    (generated for the next power of two; comparators reaching beyond n
    are dropped, which is valid because max always moves to the higher
    index)."""
    m = 1
    while m < n:
        m *= 2
    pairs = []
    p = 1
    while p < m:
        k = p
        while k >= 1:
            for j in range(k % p, m - k, 2 * k):
                for i in range(0, k):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        a, b = i + j, i + j + k
                        if b < n:
                            pairs.append((a, b))
            k //= 2
        p *= 2
    return pairs


def _column_sort(rows, pairs):
    for (i, j) in pairs:
        a, b = rows[i], rows[j]
        rows[i] = jnp.minimum(a, b)
        rows[j] = jnp.maximum(a, b)
    return rows


def list_phase_presort(nb, bkey, roll=True):
    """Sort each lane column's K values, dedup, then pop nb global minima
    with one cross-lane reduce + one sublane roll per round."""
    k = bkey.shape[0]
    pairs = batcher_pairs(k)
    rows = _column_sort([bkey[i:i + 1] for i in range(k)], pairs)
    # dedup: duplicates are adjacent after the sort
    rows = [rows[0]] + [jnp.where(rows[i] == rows[i - 1], INF, rows[i])
                        for i in range(1, k)]
    # re-sort to float the INF holes to the bottom (values now distinct)
    rows = _column_sort(rows, pairs)
    work = jnp.concatenate(rows, axis=0)          # (k, C) column-sorted
    sub = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
    lst = []
    for _ in range(nb):
        m = jnp.min(work[0:1])
        lst.append(m)
        pop = work[0:1] == m                      # (1, C) -> broadcast
        if roll:
            up = pltpu.roll(work, shift=k - 1, axis=0)
        else:
            up = jnp.concatenate([work[1:], work[:1]], axis=0)
        up = jnp.where(sub == k - 1, INF, up)
        work = jnp.where(pop, up, work)
    return lst, work


def rank_phase(nb, bkey, lst):
    lrow = jnp.zeros(bkey.shape, jnp.int32)
    for r in range(1, nb):
        lrow = lrow + (bkey >= lst[r]).astype(jnp.int32)
    return lrow


def mxu_phase(nb, okey, sd, lrow, use):
    k, c = okey.shape
    acc = jnp.zeros((512, 2 * nb), jnp.float32)
    rids = jax.lax.broadcasted_iota(jnp.int32, (512, c), 0)
    cids = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, c), 0)
    is_w = (cids >= nb).astype(jnp.float32)
    blk_col = jnp.where(cids >= nb, cids - nb, cids)
    for r in range(k):
        offr = okey[r:r + 1]
        lrr = lrow[r:r + 1]
        sdr = sd[r:r + 1]
        user = use[r:r + 1]
        oh = (offr == rids).astype(jnp.bfloat16)
        is_blk = (blk_col == lrr).astype(jnp.float32) * user
        vals_t = (is_blk * (is_w + (1.0 - is_w) * sdr)).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            oh, vals_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def make_kernel(nb, mode):
    def kern(bkey_ref, okey_ref, sd_ref, keys_out, psd_out, pw_out):
        bkey = bkey_ref[...]
        okey = okey_ref[...]
        sd = sd_ref[...]
        if mode in ("list", "rank", "full"):
            lst, work = list_phase(nb, bkey)
            keys_out[...] = jnp.stack(lst).reshape(nb, 1)
        elif mode in ("plist", "pfull"):
            lst, work = list_phase_presort(nb, bkey)
            keys_out[...] = jnp.stack(lst).reshape(nb, 1)
        else:
            keys_out[...] = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
            work = bkey
        if mode in ("rank", "full", "pfull", "mxu"):
            if mode == "mxu":
                lrow = jnp.clip(bkey, 0, nb - 1)
            else:
                lrow = rank_phase(nb, bkey, lst)
        if mode in ("full", "pfull", "mxu"):
            if mode == "full":
                covered = work == INF
            elif mode == "pfull":
                covered = bkey <= lst[-1]
            else:
                covered = jnp.ones_like(bkey, jnp.bool_)
            use = ((bkey != INF) & covered).astype(jnp.float32)
            acc = mxu_phase(nb, okey, sd, lrow, use)
            psd_out[...] = acc[:, :nb].T
            pw_out[...] = acc[:, nb:].T
        else:
            psd_out[...] = jnp.zeros_like(psd_out)
            pw_out[...] = jnp.zeros_like(pw_out)
            if mode == "rank":
                psd_out[0:1, 0:1] = lrow[0:1, 0:1].astype(jnp.float32)
            if mode == "plist":
                psd_out[0:1, 0:1] = work[0:1, 0:1].astype(jnp.float32)
    return kern


def build(nb, tile, mode):
    t = N // tile
    spec = pl.BlockSpec((K, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def run(bkey, okey, sd):
        return pl.pallas_call(
            make_kernel(nb, mode),
            grid=(t,),
            in_specs=[spec] * 3,
            out_specs=[
                pl.BlockSpec((nb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 512), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 512), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t * nb, 1), jnp.int32),
                jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
                jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            ],
        )(bkey, okey, sd)
    return run


def main():
    rng = np.random.default_rng(0)
    base = np.repeat(rng.integers(0, 1 << 20, (1024,)), N // 1024)
    bkey = jnp.asarray((base[None, :] +
                        rng.integers(0, 12, (K, N))).astype(np.int32))
    okey = jnp.asarray(rng.integers(0, 512, (K, N)).astype(np.int32))
    sd = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))

    # verify batcher_pairs + presort extraction against numpy first
    rngv = np.random.default_rng(7)
    for n in (3, 8, 11, 16):
        arr = rngv.integers(0, 50, n)
        rows = list(arr)
        for (i, j) in batcher_pairs(n):
            if rows[i] > rows[j]:
                rows[i], rows[j] = rows[j], rows[i]
        assert rows == sorted(arr), (n, rows, sorted(arr))
    print("batcher network ok")

    # presort extraction must produce identical block lists to min-extract
    ra = build(48, 1024, "list")(bkey, okey, sd)
    rb = build(48, 1024, "plist")(bkey, okey, sd)
    ka, kb = np.asarray(ra[0]), np.asarray(rb[0])
    assert (ka == kb).all(), (ka[:96].ravel(), kb[:96].ravel())
    print("presort lists match min-extraction")

    for tile in (1024,):
        for nb, mode in ((48, "list"), (48, "full"), (48, "plist"),
                         (48, "pfull"), (40, "pfull"), (32, "pfull"),
                         (48, "mxu")):
            run = build(nb, tile, mode)
            out = run(bkey, okey, sd)
            np.asarray(out[1][0, 0])          # true sync (axon relay)
            t0 = time.perf_counter()
            for _ in range(10):
                out = run(bkey, okey, sd)
            np.asarray(out[1][0, 0])
            dt = (time.perf_counter() - t0) / 10
            print(f"tile={tile:5d} nb={nb:3d} {mode:5s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
