"""End-to-end loop closure: a drifted second pass over known geometry is
corrected by the pose graph and the re-anchored map matches the no-drift
oracle — the reference's roadmap item built out
(reference: README.md:59 "Loop closure"; declared surface tsdf.hpp:158-161).
"""

import numpy as np

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.core.map import TSDFMap


def _sphere_points(n=20000, r=2.0, seed=7):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (d * r).astype(np.float32)


def _cfg():
    return MapConfig(max_points=1 << 15, block_capacity=1 << 14,
                     touched_capacity=1 << 13, submap_distance=0.5)


def _trans(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


DRIFT = np.float32([0.35, 0.0, 0.0])
POS2_TRUE = np.float32([0.6, 0.0, 0.0])


def _build_drifted_map():
    """Two passes over the same sphere; pass 2's odometry is off by DRIFT."""
    pts = _sphere_points()
    m = TSDFMap(config=_cfg())
    m.insert(pts, np.zeros(3, np.float32))
    m.finalize_active()
    # second pass: same true geometry, poses corrupted by odometry drift
    m.insert(pts + DRIFT, POS2_TRUE + DRIFT)
    m.finalize_active()
    return m


def _build_oracle_map():
    """The same two passes with perfect odometry, all in one submap."""
    pts = _sphere_points()
    m = TSDFMap(config=_cfg())
    m.insert(pts, np.zeros(3, np.float32))
    m.insert(pts, POS2_TRUE)
    m.finalize_active()
    return m


def test_loop_closure_corrects_drifted_map():
    m = _build_drifted_map()
    assert len(m.submaps) == 2
    codes_drift, _ = m.voxel_samples()

    oracle = _build_oracle_map()
    codes_o, sd_o = oracle.voxel_samples()

    # before correction the two displaced copies roughly double the voxels
    assert codes_drift.shape[0] > 1.5 * codes_o.shape[0]

    # place recognition says: submap 1 revisits the same scene; its true
    # relative pose to submap 0 is the (known) translation POS2_TRUE
    stats = m.optimize_loop_closures(
        loop_edges=[(0, 1, _trans(POS2_TRUE), 1000.0)])
    assert stats["final_cost"] < stats["initial_cost"]

    corr = m.submaps[1].corrected
    assert corr is not None
    np.testing.assert_allclose(corr[:3, 3], -DRIFT, atol=0.01)
    assert m.submaps[0].corrected is None        # gauge-fixed node untouched

    codes_c, sd_c = m.voxel_samples()
    # re-anchored voxels collapse onto the oracle's footprint
    assert abs(codes_c.shape[0] - codes_o.shape[0]) < 0.1 * codes_o.shape[0]
    common, ia, ib = np.intersect1d(codes_c, codes_o, return_indices=True)
    assert common.shape[0] > 0.9 * codes_o.shape[0]
    # fused signed distances agree with the oracle within a few quanta
    # (re-quantization at the shifted voxel grid costs about one step)
    quantum = m.config.sdf_trunc / 127
    diff = np.abs(sd_c[ia] - sd_o[ib])
    assert float(np.median(diff)) < 2 * quantum
    assert float(np.mean(diff)) < 6 * quantum


def test_loop_closure_noop_without_drift():
    """A consistent trajectory plus a truthful loop edge must not move
    anything (corrections collapse to identity)."""
    pts = _sphere_points()
    m = TSDFMap(config=_cfg())
    m.insert(pts, np.zeros(3, np.float32))
    m.finalize_active()
    m.insert(pts, POS2_TRUE)
    m.finalize_active()
    before, sd_before = m.voxel_samples()
    m.optimize_loop_closures(loop_edges=[(0, 1, _trans(POS2_TRUE), 1000.0)])
    after, sd_after = m.voxel_samples()
    np.testing.assert_array_equal(before, after)
    np.testing.assert_allclose(sd_before, sd_after)


def test_loop_closure_checkpoint_roundtrip(tmp_path):
    """Corrections survive checkpoint save/load."""
    from chad_tsdf_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    m = _build_drifted_map()
    m.optimize_loop_closures(loop_edges=[(0, 1, _trans(POS2_TRUE), 1000.0)])
    codes_c, sd_c = m.voxel_samples()
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, m)
    m2 = load_checkpoint(p)
    assert m2.submaps[1].corrected is not None
    codes_2, sd_2 = m2.voxel_samples()
    np.testing.assert_array_equal(codes_c, codes_2)
    np.testing.assert_allclose(sd_c, sd_2)
