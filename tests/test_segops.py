"""Segment-op unit tests (the hashmap-replacement primitives)."""

import numpy as np
import jax.numpy as jnp

from chad_tsdf_tpu.ops import segops


def test_boundary_and_positions():
    keys = jnp.asarray([2, 2, 2, 5, 5, 9, 9, 9, 9], jnp.int32)
    flags = segops.boundary_flags(keys)
    np.testing.assert_array_equal(
        np.asarray(flags), [1, 0, 0, 1, 0, 1, 0, 0, 0])
    starts = segops.segment_start_positions(flags)
    np.testing.assert_array_equal(np.asarray(starts),
                                  [0, 0, 0, 3, 3, 5, 5, 5, 5])
    ends = segops.segment_end_positions(flags)
    np.testing.assert_array_equal(np.asarray(ends),
                                  [3, 3, 3, 5, 5, 9, 9, 9, 9])


def test_pair_boundaries():
    a = jnp.asarray([1, 1, 1, 1], jnp.int32)
    b = jnp.asarray([7, 7, 8, 8], jnp.int32)
    flags = segops.boundary_flags((a, b))
    np.testing.assert_array_equal(np.asarray(flags), [1, 0, 1, 0])


def test_segmented_sum_scan_exact():
    rng = np.random.default_rng(0)
    n = 1000
    seg_ids = np.sort(rng.integers(0, 50, n))
    flags = jnp.asarray(np.concatenate([[True], seg_ids[1:] != seg_ids[:-1]]))
    vals = rng.normal(size=(4, n)).astype(np.float32)   # feature-major
    run = np.asarray(segops.segmented_sum_scan(flags, jnp.asarray(vals)))
    # value at each segment's last element == exact numpy per-segment sum
    ends = np.nonzero(np.concatenate([np.asarray(flags)[1:], [True]]))[0]
    starts = np.nonzero(np.asarray(flags))[0]
    for s, e in zip(starts, ends):
        np.testing.assert_allclose(run[:, e], vals[:, s:e + 1].sum(1),
                                   rtol=1e-5, atol=1e-5)


def test_compact_flag_positions():
    flags = np.zeros(1000, bool)
    want = np.array([3, 17, 18, 500, 999])
    flags[want] = True
    pos, count, total = segops.compact_flag_positions(jnp.asarray(flags), 8)
    assert int(count) == 5 and int(total) == 5
    np.testing.assert_array_equal(np.asarray(pos)[:5], want)
    assert (np.asarray(pos)[5:] == 1000).all()
    # capacity overflow reports the true total
    pos, count, total = segops.compact_flag_positions(jnp.asarray(flags), 3)
    assert int(count) == 3 and int(total) == 5
    np.testing.assert_array_equal(np.asarray(pos), want[:3])
