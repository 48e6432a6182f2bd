"""Differential test: fused Pallas normals (interpret mode) vs the XLA
segmented-scan path.  Totals differ only by float reassociation and the
anchoring shift (block corner vs segment first point) — both shift-
invariant — so normals must agree to ~1e-3."""

import numpy as np
import jax.lax
import jax.numpy as jnp
import pytest

from chad_tsdf_tpu.config import MapConfig
from chad_tsdf_tpu.ops import morton, normals, normals_pallas

CFG = MapConfig()


def _sorted_cloud(n, r, seed, n_valid=None):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * r).astype(np.float32)
    if n_valid is None:
        n_valid = n
    origin = np.asarray([-512, -512, -512], np.int32) * 8
    local, _ = morton.points_to_local_voxels(
        jnp.asarray(pts), jnp.asarray(origin), 8192, CFG.sdf_res)
    bk = morton.encode_block(local[:, 0] >> 3, local[:, 1] >> 3,
                             local[:, 2] >> 3)
    ok = morton.encode_offset(local[:, 0] & 7, local[:, 1] & 7,
                              local[:, 2] & 7)
    invalid = jnp.arange(n) >= n_valid
    bk = jnp.where(invalid, normals_pallas.INT32_MAX, bk)
    ok = jnp.where(invalid, normals_pallas.INT32_MAX, ok)
    sb, so, perm = jax.lax.sort(
        (bk, ok, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    return jnp.asarray(pts)[perm], sb, so


@pytest.mark.parametrize("n,r,n_valid", [
    (2048, 1.0, 2048),     # dense: plane fits dominate
    (2048, 5.0, 2048),     # sparse: mostly fallback normals
    (1024, 1.0, 900),      # with padding points
])
def test_pallas_matches_xla(n, r, n_valid):
    pts, sb, so = _sorted_cloud(n, r, seed=1, n_valid=n_valid)
    pos = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    valid = sb != normals_pallas.INT32_MAX

    x0, y0, z0 = normals.estimate_normals_soa(
        pts[:, 0], pts[:, 1], pts[:, 2], sb, so, valid, pos,
        CFG.normal_min_points, CFG.normal_max_depth)
    origin_voxel = jnp.asarray([-512 * 8] * 3, jnp.int32)
    x1, y1, z1 = normals_pallas.estimate_normals_pallas(
        pts[:, 0], pts[:, 1], pts[:, 2], sb, so, pos,
        CFG.normal_min_points, CFG.normal_max_depth, CFG.sdf_res,
        origin_voxel=origin_voxel, interpret=True)

    a = np.stack([np.asarray(x0), np.asarray(y0), np.asarray(z0)], -1)
    b = np.stack([np.asarray(x1), np.asarray(y1), np.asarray(z1)], -1)
    # compare as directions (dot close to 1)
    dots = np.sum(a * b, axis=-1)
    assert np.min(dots) > 1.0 - 1e-3, (np.min(dots), np.argmin(dots))


def test_multi_tile_carry():
    """Segments spanning lane-tile boundaries must get identical normals
    for all members (exercises the forward and backward carries)."""
    n = 16384
    lanes = normals_pallas.pick_lanes(n)
    assert lanes < n           # the segment must span multiple lane tiles
    # force one giant segment across the whole array: same voxel for all
    # (voxel [1.0,1.05) etc; 1.012 +- 4 sigma stays inside)
    pts = np.tile(np.asarray([[1.012, 2.012, 3.012]], np.float32), (n, 1))
    pts += np.random.default_rng(0).normal(0, 1e-3, (n, 3)).astype(np.float32)
    origin = np.asarray([-512, -512, -512], np.int32) * 8
    local, _ = morton.points_to_local_voxels(
        jnp.asarray(pts), jnp.asarray(origin), 8192, CFG.sdf_res)
    bk = morton.encode_block(local[:, 0] >> 3, local[:, 1] >> 3,
                             local[:, 2] >> 3)
    ok = morton.encode_offset(local[:, 0] & 7, local[:, 1] & 7,
                              local[:, 2] & 7)
    sb, so, perm = jax.lax.sort(
        (bk, ok, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    pts_s = jnp.asarray(pts)[perm]
    pos = jnp.zeros(3, jnp.float32)
    valid = jnp.ones(n, bool)

    x0, y0, z0 = normals.estimate_normals_soa(
        pts_s[:, 0], pts_s[:, 1], pts_s[:, 2], sb, so, valid, pos,
        CFG.normal_min_points, CFG.normal_max_depth)
    x1, y1, z1 = normals_pallas.estimate_normals_pallas(
        pts_s[:, 0], pts_s[:, 1], pts_s[:, 2], sb, so, pos,
        CFG.normal_min_points, CFG.normal_max_depth, CFG.sdf_res,
        origin_voxel=jnp.asarray([-512 * 8] * 3, jnp.int32), interpret=True)
    a = np.stack([np.asarray(x0), np.asarray(y0), np.asarray(z0)], -1)
    b = np.stack([np.asarray(x1), np.asarray(y1), np.asarray(z1)], -1)
    dots = np.sum(a * b, axis=-1)
    assert np.min(dots) > 1.0 - 1e-3
    # all members of one segment share one normal bit-exactly, across tiles
    assert np.unique(b, axis=0).shape[0] <= 2
