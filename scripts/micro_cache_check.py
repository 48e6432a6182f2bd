"""Check whether repeated identical executions are cached by the axon relay:
time a big matmul called 10x with the same args vs chained args."""
import time

import jax
import jax.numpy as jnp
import numpy as np

n = 4096
x = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)), jnp.float32)
w = jnp.asarray(np.random.default_rng(1).normal(size=(n, n)), jnp.float32)

f = jax.jit(lambda a, b: a @ b)
# warmup
y = f(x, w); jax.block_until_ready(y)

t0 = time.perf_counter()
for _ in range(10):
    y = f(x, w)
jax.block_until_ready(y)
print(f"same-args : {(time.perf_counter()-t0)/10*1e3:.3f} ms/call")

g = jax.jit(lambda a, b: 0.5 * (a @ b))
y = g(x, w); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(10):
    x = g(x, w)
jax.block_until_ready(x)
print(f"chained   : {(time.perf_counter()-t0)/10*1e3:.3f} ms/call")
# fp32 4096^3 matmul ~ 137 GFLOP -> ~1.4 ms at 100 TFLOP/s
