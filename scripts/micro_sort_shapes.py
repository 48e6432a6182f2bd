"""Measure lax.sort cost vs batching shape on TPU (dev tool).

The 1M-point 2-key+3-payload sort is the insert pipeline's largest
remaining stage.  XLA's TPU sort is a bitonic network whose pass count
scales with log^2(n) and whose passes stream all five operands through
HBM; sorting R independent rows of n/R elements cuts the pass count and
(if a row fits in VMEM) the HBM round trips.  This probe times the same
total workload at several batching shapes to size a chunk-sort + Pallas
merge pipeline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

N = 1 << 20
rng = np.random.default_rng(0)
bkey = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
okey = jnp.asarray(rng.integers(0, 512, N, dtype=np.int32))
px = jnp.asarray(rng.uniform(-5, 5, N).astype(np.float32))
py = jnp.asarray(rng.uniform(-5, 5, N).astype(np.float32))
pz = jnp.asarray(rng.uniform(-5, 5, N).astype(np.float32))


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


for rows in (1, 8, 32, 64, 128, 256):
    n_per = N // rows

    def sort_rows(bk, ok, x, y, z, rows=rows, n_per=n_per):
        rs = lambda a: a.reshape(rows, n_per)
        out = jax.lax.sort(tuple(rs(a) for a in (bk, ok, x, y, z)),
                           num_keys=2, dimension=1)
        return out

    f = jax.jit(sort_rows)
    bench(f"sort ({rows} x {n_per}) 2key+3pay", f, bkey, okey, px, py, pz)

# keys-only variants
for rows in (1, 64):
    n_per = N // rows

    def sort_keys(bk, ok, rows=rows, n_per=n_per):
        rs = lambda a: a.reshape(rows, n_per)
        return jax.lax.sort((rs(bkey), rs(okey)), num_keys=2, dimension=1)

    f = jax.jit(sort_keys)
    bench(f"sort ({rows} x {n_per}) 2key only", f, bkey, okey)

# single fused 64-bit-ish: one i32 key (drop okey) for comparison
f = jax.jit(lambda bk, x, y, z: jax.lax.sort((bk, x, y, z), num_keys=1))
bench("sort (1 x 1M) 1key+3pay", f, bkey, px, py, pz)

for rows in (2, 4):
    n_per = N // rows

    def sort_rows2(bk, ok, x, y, z, rows=rows, n_per=n_per):
        rs = lambda a: a.reshape(rows, n_per)
        return jax.lax.sort(tuple(rs(a) for a in (bk, ok, x, y, z)),
                            num_keys=2, dimension=1)

    bench(f"sort ({rows} x {n_per}) 2key+3pay", jax.jit(sort_rows2),
          bkey, okey, px, py, pz)

f = jax.jit(lambda bk, ok, x, y, z: jax.lax.sort((bk, ok, x, y, z),
                                                 num_keys=1))
bench("sort (1 x 1M) 1key+4pay", f, bkey, okey, px, py, pz)


def two_pass(bk, ok, x, y, z):
    sb, so, sx, sy, sz = jax.lax.sort((bk, ok, x, y, z), num_keys=1)
    flags = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             sb[1:] != sb[:-1]])
    rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
    imax = jnp.int32(2**31 - 1)
    key2 = jnp.where(sb == imax, imax, rank * 512 + so)
    k2, sb, sx, sy, sz = jax.lax.sort((key2, sb, sx, sy, sz), num_keys=1)
    so = jnp.where(sb == imax, imax, k2 & 511)
    return sb, so, sx, sy, sz

bench("two-pass 1key sorts (exact order)", jax.jit(two_pass),
      bkey, okey, px, py, pz)

# correctness vs the reference 2-key sort
ref = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2))(bkey, okey, px, py, pz)
got = jax.jit(two_pass)(bkey, okey, px, py, pz)
np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
print("two-pass order matches 2-key sort (keys)", flush=True)
