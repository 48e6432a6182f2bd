"""Differential tests: the C++ hash-consing backend must match the numpy
implementation exactly (addresses, layout, counters)."""

import numpy as np
import pytest

from chad_tsdf_tpu import native
from chad_tsdf_tpu.core import dag

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native backend unavailable")


def test_nodelevel_matches_python():
    rng = np.random.default_rng(0)
    py = dag.NodeLevel()
    nl = native.NativeNodeLevel()
    for _ in range(5):
        batch = rng.integers(0, 6, size=(300, 8)).astype(np.uint32)
        a_py = py.add_batch(batch)
        a_nt = nl.add_batch(batch)
        # canonical content equality: the nodes behind the addresses match
        np.testing.assert_array_equal(py.child_addrs(a_py.astype(np.uint32)),
                                      nl.child_addrs(a_nt))
    assert py.uniques_n == nl.uniques_n
    assert py.dupes_n == nl.dupes_n


def test_nodelevel_identical_layout_for_identical_order():
    """When batches contain no duplicates, python np.unique reorders but the
    pool layout invariants still hold; with sequentially unique single rows
    the layouts are byte-identical."""
    py = dag.NodeLevel()
    nl = native.NativeNodeLevel()
    rng = np.random.default_rng(1)
    for _ in range(50):
        row = rng.integers(0, 100, size=(1, 8)).astype(np.uint32)
        assert py.add_batch(row)[0] == nl.add_batch(row)[0]
    np.testing.assert_array_equal(py.raw, nl.raw)


def test_lclevel_matches_python():
    rng = np.random.default_rng(2)
    py = dag.LeafClusterLevel()
    nl = native.NativeLeafClusterLevel()
    for _ in range(5):
        batch = rng.integers(0, 50, size=400).astype(np.uint64)
        a_py = py.add_batch(batch)
        a_nt = nl.add_batch(batch)
        np.testing.assert_array_equal(py.get(a_py), nl.get(a_nt))
    assert py.uniques_n == nl.uniques_n
    assert py.dupes_n == nl.dupes_n


def test_restore_roundtrip():
    rng = np.random.default_rng(3)
    nl = native.NativeNodeLevel()
    batch = rng.integers(0, 10, size=(500, 8)).astype(np.uint32)
    addrs = nl.add_batch(batch)
    raw = nl.raw
    nl2 = native.NativeNodeLevel()
    nl2.restore(raw)
    np.testing.assert_array_equal(nl2.raw, raw)
    assert nl2.uniques_n == nl.uniques_n
    # re-adding the same batch finds every node (no growth)
    addrs2 = nl2.add_batch(batch)
    np.testing.assert_array_equal(addrs2, addrs)
    assert nl2.raw.shape[0] == raw.shape[0]

    lc = native.NativeLeafClusterLevel()
    words = rng.integers(0, 30, size=200).astype(np.uint64)
    a = lc.add_batch(words)
    lc2 = native.NativeLeafClusterLevel()
    lc2.restore(lc.raw)
    np.testing.assert_array_equal(lc2.add_batch(words), a)


def test_full_map_with_native_levels():
    """End-to-end finalize + walk on the native backend."""
    from chad_tsdf_tpu import MapConfig, TSDFMap
    cfg = MapConfig(max_points=1024, block_capacity=2048,
                    touched_capacity=2048, accumulate_impl="xla")
    m = TSDFMap(config=cfg)
    assert m.levels.native
    rng = np.random.default_rng(4)
    d = rng.normal(size=(1024, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m.insert((d * 1.0).astype(np.float32), np.zeros(3))
    m.finalize_active()
    codes, sd = m.voxel_samples()
    assert codes.shape[0] > 500

    # identical geometry dedups (compression oracle on the native path)
    u = [lv.uniques_n for lv in m.levels.nodes]
    m._start_submap(np.zeros(3, np.float32))
    m.insert((d * 1.0).astype(np.float32), np.zeros(3))
    m.finalize_active()
    assert [lv.uniques_n for lv in m.levels.nodes] == u
