"""Differential tests for the fused DDA+accumulate kernel
(ops/fused_integrate.py): insert_step_fused must match the XLA scatter
pipeline exactly in structure (directory, weights) and within f32
reassociation tolerance in signed-distance sums — including the sparse case
that exercises the sort-based overflow fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position


def _sphere_points(n, r=5.0, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * r).astype(np.float32)


@pytest.mark.parametrize("radius,expect_fallback", [
    (0.25, False),   # dense: every tile fits its block list
    (5.0, True),     # sparse: ~1 block/point, exercises the sort fallback
])
def test_insert_step_fused_matches_xla(radius, expect_fallback):
    cfg_x = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="xla")
    cfg_f = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="fused")
    pts = _sphere_points(2048, r=radius, seed=0)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg_x)

    sx = create_state(cfg_x, origin)
    sx, mx = integrate.insert_step(sx, jnp.asarray(pts), jnp.int32(2048),
                                   jnp.asarray(pos), cfg_x)
    sf = create_state(cfg_f, origin)
    sf, mf = integrate.insert_step_fused(sf, jnp.asarray(pts),
                                         jnp.int32(2048), jnp.asarray(pos),
                                         cfg_f, interpret=True)

    assert int(mf["n_valid_samples"]) == int(mx["n_valid_samples"])
    assert int(mf["n_blocks"]) == int(mx["n_blocks"])
    assert (int(sf.tile_overflow) > 0) == expect_fallback
    np.testing.assert_array_equal(np.asarray(sf.dir_keys),
                                  np.asarray(sx.dir_keys))

    nbk = int(sx.n_blocks)
    sl_x = np.asarray(sx.dir_slots)[:nbk]
    sl_f = np.asarray(sf.dir_slots)[:nbk]
    wx = np.asarray(sx.pool_w)[sl_x]
    wf = np.asarray(sf.pool_w)[sl_f]
    np.testing.assert_array_equal(wf, wx)
    sdx = np.asarray(sx.pool_sd)[sl_x]
    sdf = np.asarray(sf.pool_sd)[sl_f]
    err = np.abs(sdf - sdx) / np.maximum(wx, 1)
    assert err.max() < 1e-4, err.max()


def test_fused_incremental_and_determinism():
    cfg = MapConfig(max_points=1024, block_capacity=2048,
                    touched_capacity=2048, accumulate_impl="fused")
    pts = _sphere_points(1024, seed=3)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg)

    def run(state):
        return integrate.insert_step_fused(
            state, jnp.asarray(pts), jnp.int32(1024), jnp.asarray(pos),
            cfg, interpret=True)

    s1, _ = run(create_state(cfg, origin))
    s2, _ = run(create_state(cfg, origin))
    np.testing.assert_array_equal(np.asarray(s1.pool_sd),
                                  np.asarray(s2.pool_sd))
    np.testing.assert_array_equal(np.asarray(s1.pool_w),
                                  np.asarray(s2.pool_w))

    s3, _ = run(s1)
    np.testing.assert_array_equal(np.asarray(s3.pool_w),
                                  2 * np.asarray(s2.pool_w))
