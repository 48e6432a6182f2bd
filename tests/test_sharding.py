"""SPMD tests on the 8-device virtual CPU mesh (SURVEY §4: multi-host
without a cluster): the sharded insert must reproduce the single-device map
within float tolerance, with ownership exactly partitioned."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core import integrate
from chad_tsdf_tpu.core.state import create_state, origin_blocks_for_position
from chad_tsdf_tpu.parallel import (create_sharded_state, gather_states,
                                    key_bounds, make_mesh,
                                    make_sharded_insert)

CFG = MapConfig(max_points=512, block_capacity=4096, touched_capacity=2048,
                accumulate_impl="xla")


def sphere_points(n, r=2.0, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * r).astype(np.float32)


def merged_voxel_dict(states, cfg):
    from tests.test_integrate import pool_voxels
    out = {}
    for st in states:
        class S:  # pool_voxels expects attribute access with device arrays
            pass
        s = S()
        for k in ("dir_keys", "dir_slots", "pool_sd", "pool_w", "origin_blocks"):
            setattr(s, k, np.asarray(getattr(st, k)))
        s.n_blocks = int(st.n_blocks)
        coords, sd, w = pool_voxels(s, cfg)
        for c, x, ww in zip(coords, sd, w):
            key = tuple(c)
            assert key not in out, "shards must own disjoint voxels"
            out[key] = (x, ww)
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    n_dev = 8
    mesh = make_mesh(n_dev)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, CFG)

    pts = sphere_points(n_dev * CFG.max_points)
    state_stack = create_sharded_state(CFG, mesh, origin)
    # equal key-range partition concentrates this small sphere into few
    # shards; give routing full-worst-case capacity for the equivalence test
    step, route_cap = make_sharded_insert(
        CFG, mesh, route_capacity=CFG.max_points * CFG.dda_steps,
        point_route_slack=8.0)
    n_per = np.full((n_dev,), CFG.max_points, np.int32)
    state_stack, metrics = step(state_stack, jnp.asarray(pts),
                                jnp.asarray(n_per), jnp.asarray(pos))
    metrics = {k: int(v) for k, v in metrics.items()}
    assert metrics["route_overflow"] == 0
    assert metrics["point_route_overflow"] == 0

    # single-device oracle over the same full cloud
    sd_cfg = MapConfig(**{**CFG.__dict__,
                          "max_points": n_dev * CFG.max_points,
                          "block_capacity": 16384,
                          "touched_capacity": 8192})
    ref_state = create_state(sd_cfg, origin)
    ref_state, ref_metrics = integrate.insert_step(
        ref_state, jnp.asarray(pts), jnp.int32(len(pts)), jnp.asarray(pos),
        sd_cfg)
    assert metrics["n_valid_samples"] == int(ref_metrics["n_valid_samples"])

    got = merged_voxel_dict(gather_states(state_stack), CFG)
    from tests.test_integrate import pool_voxels
    coords, sd, w = pool_voxels(ref_state, sd_cfg)
    want = {tuple(c): (x, ww) for c, x, ww in zip(coords, sd, w)}
    assert set(got) == set(want)
    diffs = []
    for k in want:
        assert got[k][1] == want[k][1]                  # identical weights
        diffs.append(abs(got[k][0] - want[k][0]))
    # signed distances differ only through normals: the sharded path
    # estimates them from each shard's data-parallel point subset, so
    # neighbourhoods are subsampled (point routing before normal estimation
    # is the planned refinement).  Values must still be close.
    diffs = np.asarray(diffs)
    assert np.median(diffs) < 2e-3
    assert diffs.max() < 5e-2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ownership_partition():
    """Every block a shard holds must be inside its Morton key range."""
    n_dev = 8
    mesh = make_mesh(n_dev)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, CFG)
    pts = sphere_points(n_dev * CFG.max_points, seed=3)
    state_stack = create_sharded_state(CFG, mesh, origin)
    step, _ = make_sharded_insert(
        CFG, mesh, route_capacity=CFG.max_points * CFG.dda_steps,
        point_route_slack=8.0)
    n_per = np.full((n_dev,), CFG.max_points, np.int32)
    state_stack, _ = step(state_stack, jnp.asarray(pts), jnp.asarray(n_per),
                          jnp.asarray(pos))
    bounds = key_bounds(n_dev, CFG)
    for d, st in enumerate(gather_states(state_stack)):
        nb = int(st.n_blocks)
        keys = np.asarray(st.dir_keys)[:nb]
        assert (keys >= bounds[d]).all() and (keys < bounds[d + 1]).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_determinism():
    n_dev = 8
    mesh = make_mesh(n_dev)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, CFG)
    pts = sphere_points(n_dev * CFG.max_points, seed=4)
    step, _ = make_sharded_insert(
        CFG, mesh, route_capacity=CFG.max_points * CFG.dda_steps,
        point_route_slack=8.0)
    n_per = np.full((n_dev,), CFG.max_points, np.int32)
    s1, _ = step(create_sharded_state(CFG, mesh, origin), jnp.asarray(pts),
                 jnp.asarray(n_per), jnp.asarray(pos))
    s2, _ = step(create_sharded_state(CFG, mesh, origin), jnp.asarray(pts),
                 jnp.asarray(n_per), jnp.asarray(pos))
    np.testing.assert_array_equal(np.asarray(s1.pool_sd), np.asarray(s2.pool_sd))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_finalize_matches_single_device():
    """finalize_sharded over per-shard states == single-device finalize."""
    from chad_tsdf_tpu.core import submap as submap_mod
    from chad_tsdf_tpu.core.dag import NodeLevels

    n_dev = 8
    mesh = make_mesh(n_dev)
    pos = np.zeros(3, np.float32)
    origin = origin_blocks_for_position(pos, CFG)
    pts = sphere_points(n_dev * CFG.max_points, seed=11)
    state_stack = create_sharded_state(CFG, mesh, origin)
    step, _ = make_sharded_insert(
        CFG, mesh, route_capacity=CFG.max_points * CFG.dda_steps,
        point_route_slack=8.0)
    n_per = np.full((n_dev,), CFG.max_points, np.int32)
    state_stack, _ = step(state_stack, jnp.asarray(pts), jnp.asarray(n_per),
                          jnp.asarray(pos))

    levels = NodeLevels(use_native=False)
    sm = submap_mod.finalize_sharded(gather_states(state_stack), levels,
                                     CFG, [pos])
    codes_sh, words_sh = levels.walk_leaf_clusters(sm.root_addr_tsdf)

    # single-device oracle
    sd_cfg = MapConfig(**{**CFG.__dict__,
                          "max_points": n_dev * CFG.max_points,
                          "block_capacity": 16384,
                          "touched_capacity": 8192})
    ref_state = create_state(sd_cfg, origin)
    ref_state, _ = integrate.insert_step(
        ref_state, jnp.asarray(pts), jnp.int32(len(pts)), jnp.asarray(pos),
        sd_cfg)
    levels2 = NodeLevels(use_native=False)
    sm2 = submap_mod.finalize(ref_state, levels2, sd_cfg, [pos])
    codes_sd, words_sd = levels2.walk_leaf_clusters(sm2.root_addr_tsdf)

    np.testing.assert_array_equal(codes_sh, codes_sd)
    # words may differ in the last quantization bit where normals differ at
    # shard boundaries; compare decoded values loosely and exact >=99%
    same = (words_sh == words_sd).mean()
    assert same > 0.97, same
