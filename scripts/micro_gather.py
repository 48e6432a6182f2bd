"""Microbenchmark: reorder 1M points by a permutation — variants."""
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
px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
perm = jnp.asarray(rng.permutation(N).astype(np.int32))


@jax.jit
def g_rows(pts, perm):
    return pts[perm]


@jax.jit
def g_1d3(px, py, pz, perm):
    return px[perm], py[perm], pz[perm]


@jax.jit
def g_bits_sort(px, py, pz, bkey, okey):
    """Carry coords through the sort network as extra operands."""
    return jax.lax.sort((bkey, okey, px, py, pz), num_keys=2)


@jax.jit
def g_bits_sort_packed(px, py, pz, bkey, okey):
    """2 key ops + 3 payloads, coords reordered by the network."""
    lo = okey << 20
    return jax.lax.sort((bkey, lo, px, py, pz), num_keys=2)


@jax.jit
def g_bitcast_sort(px, py, pz, bkey, okey):
    """Pack okey + f32 coord bits into payload i32s: sort once with 2 key
    operands + 3 bitcast payloads."""
    xb = jax.lax.bitcast_convert_type(px, jnp.int32)
    yb = jax.lax.bitcast_convert_type(py, jnp.int32)
    zb = jax.lax.bitcast_convert_type(pz, jnp.int32)
    b, o, x, y, z = jax.lax.sort((bkey, okey, xb, yb, zb), num_keys=2)
    return (b, o, jax.lax.bitcast_convert_type(x, jnp.float32),
            jax.lax.bitcast_convert_type(y, jnp.float32),
            jax.lax.bitcast_convert_type(z, jnp.float32))


def sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    print(f"{name:22s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")
    return out


timeit("rows pts[perm]", g_rows, pts, perm)
timeit("3x 1d gather", g_1d3, px, py, pz, perm)
timeit("sort5 (2key+3pay)", g_bits_sort, px, py, pz, bkey, okey)
timeit("sort5 packed lo", g_bits_sort_packed, px, py, pz, bkey, okey)
timeit("sort5 bitcast", g_bitcast_sort, px, py, pz, bkey, okey)
