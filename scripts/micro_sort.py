"""Microbenchmark: lax.sort variants for the 1M-point Morton sort."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

N = 1 << 20
rng = np.random.default_rng(0)
bkey = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
okey = jnp.asarray(rng.integers(0, 512, N).astype(np.int32))
idx = jnp.arange(N, dtype=jnp.int32)
pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))


@jax.jit
def s3(bkey, okey, idx):
    return jax.lax.sort((bkey, okey, idx), num_keys=2)


@jax.jit
def s2_packed64(bkey, okey, idx):
    key = (bkey.astype(jnp.int64) << 29) | (okey.astype(jnp.int64) << 20) \
        | idx.astype(jnp.int64)
    k = jax.lax.sort((key,), num_keys=1)[0]
    return (k >> 29).astype(jnp.int32), ((k >> 20) & 0x1FF).astype(jnp.int32), \
        (k & 0xFFFFF).astype(jnp.int32)


@jax.jit
def s2_i32pair(bkey, okey, idx):
    lo = (okey << 20) | idx
    hi, lo = jax.lax.sort((bkey, lo), num_keys=2)
    return hi, lo >> 20, lo & 0xFFFFF


@jax.jit
def s1_key_only(bkey, okey, idx):
    return jax.lax.sort((bkey,), num_keys=1)


@jax.jit
def s2_key_idx(bkey, okey, idx):
    return jax.lax.sort((bkey, idx), num_keys=1)


@jax.jit
def sort_u32(bkey, okey, idx):
    k = bkey.astype(jnp.uint32)
    return jax.lax.sort((k, idx), num_keys=1)


@jax.jit
def gather3(pts, perm):
    return pts[perm]


def sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{name:20s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")
    return out


timeit("sort3 (cur)", s3, bkey, okey, idx)
timeit("sort1 i64 packed", s2_packed64, bkey, okey, idx)
timeit("sort2 i32 pair", s2_i32pair, bkey, okey, idx)
timeit("sort1 key only", s1_key_only, bkey, okey, idx)
timeit("sort2 key+idx", s2_key_idx, bkey, okey, idx)
timeit("sort2 u32 key+idx", sort_u32, bkey, okey, idx)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
timeit("gather pts[perm]", gather3, pts, perm)
