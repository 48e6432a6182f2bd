"""Segment operations over sorted keys — the TPU replacement for hashmaps.

The reference resolves "group by voxel / neighbourhood" queries with gtl hash
tables (reference: include/chad/detail/octree.hpp:187,
include/chad/detail/levels.hpp:93,143).  Hash tables are pointer-chasing and
hostile to TPU; the idiomatic equivalent is *sorted keys + segment ops*:

* segment starts via boundary flags + running maxima (dense scans),
* exact per-segment sums via a segmented associative scan (numerically safe —
  no catastrophic cancellation from global-cumsum differences),
* stream compaction of few-from-many via rank binary search (avoids XLA
  scatter, which measures ~78 M elem/s on TPU v5e, and avoids large
  searchsorted, which is worse).

All functions are shape-polymorphic pure jnp and run on CPU/TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def boundary_flags(keys) -> jnp.ndarray:
    """True where a run of equal keys starts. keys: sorted (N,) or tuple of
    parallel key arrays compared lexicographically-equal."""
    if not isinstance(keys, (tuple, list)):
        keys = (keys,)
    neq = None
    for k in keys:
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]])
        neq = d if neq is None else (neq | d)
    return neq


def segment_start_positions(flags: jnp.ndarray) -> jnp.ndarray:
    """For each element, the index where its segment starts (inclusive scan
    of max over flag positions)."""
    n = flags.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    return jax.lax.associative_scan(jnp.maximum, jnp.where(flags, idx, 0))


def segment_end_positions(flags: jnp.ndarray) -> jnp.ndarray:
    """For each element, the exclusive end index of its segment."""
    n = flags.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    nxt = jnp.where(flags, idx, n)
    # next segment start strictly after i = suffix-min of nxt shifted left
    shifted = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    return jax.lax.associative_scan(jnp.minimum, shifted[::-1])[::-1]


def segmented_sum_scan(flags: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running sum that resets at each segment start.

    ``values`` may be (N,) or feature-major (F, N) — feature-major so the
    large N axis is the TPU lane dimension (an (N, F) layout would pad F to
    128 lanes).  ``flags`` is (N,) boolean.  The value at a segment's last
    element is the exact per-segment sum, accumulated only within the
    segment (numerically superior to cumsum-difference).
    """
    axis = values.ndim - 1
    if values.ndim > 1:
        f = jnp.broadcast_to(flags[None, :], values.shape)
    else:
        f = flags

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)

    _, out = jax.lax.associative_scan(combine, (f, values), axis=axis)
    return out


def compact_flag_positions(flags: jnp.ndarray, capacity: int):
    """Positions of set flags, padded to ``capacity``.

    Returns ``(positions, count)`` where ``positions`` is int32 (capacity,)
    holding the indices of the first ``count`` set flags in ascending order;
    slots beyond ``count`` are filled with ``n`` (one past the end).

    Implemented as cumulative rank + ``searchsorted`` with *capacity* queries
    (small), never a scatter over *n* elements (large).
    """
    n = flags.shape[0]
    rank = jnp.cumsum(flags.astype(jnp.int32))
    count = rank[-1] if n > 0 else jnp.int32(0)
    j = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(rank, j, side="left").astype(jnp.int32)
    pos = jnp.where(j <= count, pos, n)
    return pos, jnp.minimum(count, capacity), count
