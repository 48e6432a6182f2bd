"""Measure per-dispatch overhead through the axon relay."""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np


@jax.jit
def tiny(x):
    return x + 1.0


@jax.jit
def tiny2(x):
    return x * 2.0


x = jnp.zeros((8, 128), jnp.float32)


def sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


# single tiny op, chained (data dependency), one sync at end
for reps in (10, 100):
    out = tiny(x)
    sync(out)
    t0 = time.perf_counter()
    o = x
    for _ in range(reps):
        o = tiny(o)
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"chained tiny x{reps:4d}: {dt:8.3f} ms/call")

# independent dispatches (no chain)
out = tiny2(x)
sync(out)
t0 = time.perf_counter()
outs = [tiny2(x) for _ in range(100)]
sync(outs[-1])
dt = (time.perf_counter() - t0) / 100 * 1e3
print(f"indep tiny  x 100: {dt:8.3f} ms/call")

# per-call sync (round trip cost)
t0 = time.perf_counter()
for _ in range(10):
    sync(tiny(x))
dt = (time.perf_counter() - t0) / 10 * 1e3
print(f"tiny w/ sync each: {dt:8.3f} ms/call")
