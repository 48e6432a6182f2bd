"""Differential tests for the sort-free tile accumulation path
(ops/tile_accum.py): stage A vs a numpy oracle, and the full
insert_step_tiled vs the XLA scatter pipeline (weights exact, sd within
f32 reassociation tolerance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position
from chad_tsdf_tpu.ops import tile_accum

INT32_MAX = 2**31 - 1


def test_tile_partials_vs_numpy():
    rng = np.random.default_rng(0)
    k, n, nb = 4, 2 * tile_accum.TILE, 16
    t = n // tile_accum.TILE
    # ~6 distinct blocks per tile + some invalid slots
    base = np.repeat(rng.integers(0, 1 << 20, (t,)), tile_accum.TILE)
    bkey = (base[None, :] + rng.integers(0, 6, (k, n))).astype(np.int32)
    bkey[rng.uniform(size=(k, n)) < 0.1] = INT32_MAX
    okey = rng.integers(0, 512, (k, n)).astype(np.int32)
    sd = rng.uniform(-0.1, 0.1, (k, n)).astype(np.float32)

    pkeys, psd, pw, ovfmask = tile_accum.tile_partials(
        jnp.asarray(bkey), jnp.asarray(okey), jnp.asarray(sd), nb=nb,
        interpret=True)
    pkeys, psd, pw = map(np.asarray, (pkeys, psd, pw))
    assert np.asarray(ovfmask).sum() == 0
    for ti in range(t):
        sl = slice(ti * tile_accum.TILE, (ti + 1) * tile_accum.TILE)
        bk, ok, sv = bkey[:, sl].ravel(), okey[:, sl].ravel(), \
            sd[:, sl].ravel()
        live = bk != INT32_MAX
        uniq = np.unique(bk[live])
        keys_got = pkeys[ti * nb:(ti + 1) * nb].ravel()
        assert (keys_got[:len(uniq)] == uniq).all()
        assert (keys_got[len(uniq):] == INT32_MAX).all()
        ref_sd = np.zeros((nb, 512), np.float64)
        ref_w = np.zeros((nb, 512), np.float64)
        for b, o, s in zip(bk[live], ok[live], sv[live]):
            r = np.searchsorted(uniq, b)
            ref_sd[r, o] += s
            ref_w[r, o] += 1.0
        np.testing.assert_array_equal(pw[ti * nb:(ti + 1) * nb], ref_w)
        np.testing.assert_allclose(psd[ti * nb:(ti + 1) * nb], ref_sd,
                                   atol=1e-4)


def test_tile_overflow_counted():
    k, n, nb = 1, tile_accum.TILE, 8
    bkey = np.arange(n, dtype=np.int32).reshape(k, n)   # 1024 distinct
    okey = np.zeros((k, n), np.int32)
    sd = np.ones((k, n), np.float32)
    pkeys, psd, pw, ovfmask = tile_accum.tile_partials(
        jnp.asarray(bkey), jnp.asarray(okey), jnp.asarray(sd), nb=nb,
        interpret=True)
    assert int(np.asarray(ovfmask).sum()) == n - nb
    # the nb smallest keys are kept, each with exactly one sample
    np.testing.assert_array_equal(np.asarray(pkeys).ravel()[:nb],
                                  np.arange(nb))
    np.testing.assert_array_equal(np.asarray(pw)[:nb, 0], np.ones(nb))


def _sphere_points(n, r=5.0, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * r).astype(np.float32)


@pytest.mark.parametrize("radius,expect_fallback", [
    (0.25, False),   # dense: every tile fits its block list
    (5.0, True),     # sparse: ~1 block/point, exercises the sort fallback
])
def test_insert_step_tiled_matches_xla(radius, expect_fallback):
    cfg_x = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="xla")
    cfg_t = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="tile")
    pts = _sphere_points(2048, r=radius, seed=0)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg_x)

    sx = create_state(cfg_x, origin)
    sx, mx = integrate.insert_step(sx, jnp.asarray(pts), jnp.int32(2048),
                                   jnp.asarray(pos), cfg_x)
    st = create_state(cfg_t, origin)
    st, mt = integrate.insert_step_tiled(st, jnp.asarray(pts),
                                         jnp.int32(2048), jnp.asarray(pos),
                                         cfg_t, interpret=True)

    assert int(mt["n_valid_samples"]) == int(mx["n_valid_samples"])
    assert int(mt["n_blocks"]) == int(mx["n_blocks"])
    assert (int(st.tile_overflow) > 0) == expect_fallback
    np.testing.assert_array_equal(np.asarray(st.dir_keys),
                                  np.asarray(sx.dir_keys))

    # pools live in different slot orders only if allocation order differs;
    # compare via the directory
    kx = np.asarray(sx.dir_keys)
    nbk = int(sx.n_blocks)
    sl_x = np.asarray(sx.dir_slots)[:nbk]
    sl_t = np.asarray(st.dir_slots)[:nbk]
    wx = np.asarray(sx.pool_w)[sl_x]
    wt = np.asarray(st.pool_w)[sl_t]
    np.testing.assert_array_equal(wt, wx)
    sdx = np.asarray(sx.pool_sd)[sl_x]
    sdt = np.asarray(st.pool_sd)[sl_t]
    err = np.abs(sdt - sdx) / np.maximum(wx, 1)
    assert err.max() < 1e-4, err.max()


def test_tiled_incremental_and_determinism():
    cfg = MapConfig(max_points=1024, block_capacity=2048,
                    touched_capacity=2048, accumulate_impl="tile")
    pts = _sphere_points(1024, seed=3)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg)

    def run(state):
        return integrate.insert_step_tiled(
            state, jnp.asarray(pts), jnp.int32(1024), jnp.asarray(pos),
            cfg, interpret=True)

    s1, _ = run(create_state(cfg, origin))
    s2, _ = run(create_state(cfg, origin))
    np.testing.assert_array_equal(np.asarray(s1.pool_sd),
                                  np.asarray(s2.pool_sd))
    np.testing.assert_array_equal(np.asarray(s1.pool_w),
                                  np.asarray(s2.pool_w))

    # a second insert accumulates on top of the first (weights double)
    s3, _ = run(s1)
    np.testing.assert_array_equal(np.asarray(s3.pool_w),
                                  2 * np.asarray(s2.pool_w))


@pytest.mark.parametrize("radius,expect_fallback", [
    # at r=5 this 2048-pt sphere is ~1 point/block (~7 samples/block, below
    # the nb=128 coverage bound of 8) so the exact fallback must fire; real
    # LiDAR (~12 points/block, 40+ samples/block) stays on the fast path
    (5.0, True),
    (0.25, False),   # dense also works (sorted samples group even tighter)
])
def test_insert_step_sample_tiled_matches_xla(radius, expect_fallback):
    """The sparse path (global sample sort + sorted-sample tiling through
    tile_partials) must match the XLA scatter oracle exactly on weights
    and to f32-reassociation tolerance on sd sums."""
    cfg_x = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="xla")
    cfg_s = MapConfig(max_points=2048, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="sample_tile")
    pts = _sphere_points(2048, r=radius, seed=1)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg_x)

    sx = create_state(cfg_x, origin)
    sx, mx = integrate.insert_step(sx, jnp.asarray(pts), jnp.int32(2048),
                                   jnp.asarray(pos), cfg_x)
    st = create_state(cfg_s, origin)
    st, mt = integrate.insert_step_sample_tiled(
        st, jnp.asarray(pts), jnp.int32(2048), jnp.asarray(pos), cfg_s,
        interpret=True)

    assert int(mt["n_valid_samples"]) == int(mx["n_valid_samples"])
    assert int(mt["n_blocks"]) == int(mx["n_blocks"])
    assert (int(st.tile_overflow) > 0) == expect_fallback
    np.testing.assert_array_equal(np.asarray(st.dir_keys),
                                  np.asarray(sx.dir_keys))
    kx = np.asarray(sx.dir_keys)
    nbk = int(sx.n_blocks)
    sl_x = np.asarray(sx.dir_slots)[:nbk]
    sl_t = np.asarray(st.dir_slots)[:nbk]
    np.testing.assert_array_equal(np.asarray(st.pool_w)[sl_t],
                                  np.asarray(sx.pool_w)[sl_x])
    sdx = np.asarray(sx.pool_sd)[sl_x]
    sdt = np.asarray(st.pool_sd)[sl_t]
    err = np.abs(sdt - sdx) / np.maximum(np.asarray(sx.pool_w)[sl_x], 1)
    assert err.max() < 1e-4, err.max()


def test_sample_tiled_overflow_fallback_exact():
    """Force sparse_tile_nb below the distinct-block count of a sorted
    sample tile so the sort fallback must run, and assert exactness."""
    cfg_x = MapConfig(max_points=1024, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="xla")
    cfg_s = MapConfig(max_points=1024, block_capacity=8192,
                      touched_capacity=8192, accumulate_impl="sample_tile",
                      sparse_tile_nb=8)
    pts = _sphere_points(1024, r=5.0, seed=2)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, cfg_x)

    sx = create_state(cfg_x, origin)
    sx, _ = integrate.insert_step(sx, jnp.asarray(pts), jnp.int32(1024),
                                  jnp.asarray(pos), cfg_x)
    st = create_state(cfg_s, origin)
    st, _ = integrate.insert_step_sample_tiled(
        st, jnp.asarray(pts), jnp.int32(1024), jnp.asarray(pos), cfg_s,
        interpret=True)
    assert int(st.tile_overflow) > 0
    np.testing.assert_array_equal(np.asarray(st.dir_keys),
                                  np.asarray(sx.dir_keys))
    nbk = int(sx.n_blocks)
    sl_x = np.asarray(sx.dir_slots)[:nbk]
    sl_t = np.asarray(st.dir_slots)[:nbk]
    np.testing.assert_array_equal(np.asarray(st.pool_w)[sl_t],
                                  np.asarray(sx.pool_w)[sl_x])
