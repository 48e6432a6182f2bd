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


def test_bf16_acc_matches_codec_quantization():
    """The TPU path accumulates signed-distance sums in bf16 on the MXU
    (ops/fused_integrate.py acc_dtype).  Force that dtype in interpret mode
    and require (a) weights exactly equal (0/1 products are exact in bf16),
    (b) the raw mean drift to stay below the codec's trunc/127 step, and
    (c) the persisted 8-bit codes to differ by at most ONE step and only on
    a small fraction of voxels (floor quantization flips a code whenever
    the half-step bf16 drift crosses a bin boundary — bit-identity is not
    attainable, measured ~3% single-step flips on this workload)."""
    from chad_tsdf_tpu.ops import codec

    cfg = MapConfig(max_points=2048, block_capacity=8192,
                    touched_capacity=8192, accumulate_impl="fused")
    pts = _sphere_points(2048, r=0.25, seed=1)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg)

    outs = {}
    for name, acc in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        st = create_state(cfg, origin)
        st, m = integrate.insert_step_fused(
            st, jnp.asarray(pts), jnp.int32(2048), jnp.asarray(pos), cfg,
            interpret=True, acc_dtype=acc)
        nbk = int(st.n_blocks)
        sl = np.asarray(st.dir_slots)[:nbk]
        outs[name] = (np.asarray(st.dir_keys)[:nbk],
                      np.asarray(st.pool_sd)[sl], np.asarray(st.pool_w)[sl])

    kf, sdf32, wf32 = outs["f32"]
    kb, sdb16, wb16 = outs["bf16"]
    np.testing.assert_array_equal(kb, kf)
    np.testing.assert_array_equal(wb16, wf32)          # weights exact

    occ = wf32 > 0
    mean32 = np.where(occ, sdf32 / np.maximum(wf32, 1), 0.0)
    mean16 = np.where(occ, sdb16 / np.maximum(wb16, 1), 0.0)
    # raw bf16 drift stays well under the codec step trunc/127
    drift = np.abs(mean16 - mean32)[occ]
    assert drift.max() < cfg.sdf_trunc / 127, drift.max()
    q32 = codec.encode_sd(np, mean32[occ], cfg.sdf_trunc)
    q16 = codec.encode_sd(np, mean16[occ], cfg.sdf_trunc)
    exact = (q32 == q16).mean()
    assert exact > 0.95, exact
    assert np.abs(q32.astype(np.int32) - q16.astype(np.int32)).max() <= 1


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
