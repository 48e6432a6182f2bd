"""DAG oracles (SURVEY §4): hash-consing dedup counters, child-rank lookup
vs brute force, and leaf-cluster round trip through finalize + walk."""

import numpy as np

from chad_tsdf_tpu.core import dag


def test_node_level_dedup_and_layout():
    lv = dag.NodeLevel()
    a = np.array([[1, 0, 2, 0, 0, 0, 0, 3]], np.uint32)
    addr1 = lv.add_batch(a)
    addr2 = lv.add_batch(a)           # identical -> same address
    assert addr1[0] == addr2[0]
    assert lv.uniques_n == 1 and lv.dupes_n == 1
    # layout: [mask][compacted children] (levels.hpp:62-74)
    raw = lv.raw
    m = raw[addr1[0]]
    assert m == 0b10000101
    np.testing.assert_array_equal(raw[addr1[0] + 1: addr1[0] + 4], [1, 2, 3])


def test_child_addrs_vs_bruteforce():
    rng = np.random.default_rng(0)
    lv = dag.NodeLevel()
    nodes = rng.integers(0, 5, size=(200, 8)).astype(np.uint32)
    addrs = lv.add_batch(nodes)
    got = lv.child_addrs(addrs)
    np.testing.assert_array_equal(got, nodes)


def test_leaf_cluster_level():
    lv = dag.LeafClusterLevel()
    w = np.array([7, 7, 9, 7], np.uint64)
    addrs = lv.add_batch(w)
    assert addrs[0] == addrs[1] == addrs[3]
    assert addrs[2] != addrs[0]
    assert lv.uniques_n == 2 and lv.dupes_n == 2
    np.testing.assert_array_equal(lv.get(addrs), w)


def test_identical_geometry_dedups_across_submaps():
    """Inserting identical geometry twice must not grow unique counts
    (compression oracle, levels.hpp:90,141)."""
    from chad_tsdf_tpu.core.dag import NodeLevels
    levels = NodeLevels()
    rng = np.random.default_rng(1)
    codes = np.sort(np.unique(rng.integers(0, 1 << 40, 500).astype(np.uint64)))
    words = rng.integers(1, 1 << 60, codes.shape[0]).astype(np.uint64)

    from chad_tsdf_tpu.core.map import _rebuild_submap
    sm1 = _rebuild_submap(levels, codes, words, words, [])
    uniques_after_first = [lv.uniques_n for lv in levels.nodes]
    lc_uniques = levels.leaf_clusters.uniques_n
    sm2 = _rebuild_submap(levels, codes, words, words, [])
    assert [lv.uniques_n for lv in levels.nodes] == uniques_after_first
    assert levels.leaf_clusters.uniques_n == lc_uniques
    assert sm1.root_addr_tsdf == sm2.root_addr_tsdf


def test_walk_roundtrip():
    from chad_tsdf_tpu.core.dag import NodeLevels
    from chad_tsdf_tpu.core.map import _rebuild_submap
    levels = NodeLevels()
    rng = np.random.default_rng(2)
    codes = np.sort(np.unique(rng.integers(0, 1 << 50, 300).astype(np.uint64)))
    words = rng.integers(1, 1 << 62, codes.shape[0]).astype(np.uint64)
    sm = _rebuild_submap(levels, codes, words, words, [])
    got_codes, got_words = levels.walk_leaf_clusters(sm.root_addr_tsdf)
    np.testing.assert_array_equal(got_codes, codes)
    np.testing.assert_array_equal(got_words, words)
