"""Normal-estimation tests: plane recovery, scanner flip, fallback
(reference semantics: normals.hpp:81-148, with the documented full-segment
deviation)."""

import numpy as np
import jax.numpy as jnp

from chad_tsdf_tpu.ops import morton, normals


def _keys_for(points, res=0.05, origin=(-512, -512, -512)):
    vox = np.floor(points / res).astype(np.int32)
    lb = (vox >> 3) - np.asarray(origin, np.int32)
    bk = np.asarray(morton.encode_block(jnp.asarray(lb[:, 0]),
                                        jnp.asarray(lb[:, 1]),
                                        jnp.asarray(lb[:, 2])))
    ok = np.asarray(morton.encode_offset(jnp.asarray(vox[:, 0] & 7),
                                         jnp.asarray(vox[:, 1] & 7),
                                         jnp.asarray(vox[:, 2] & 7)))
    order = np.lexsort((ok, bk))
    return points[order], jnp.asarray(bk[order]), jnp.asarray(ok[order])


def test_recovers_plane_normal():
    rng = np.random.default_rng(0)
    # points on the z=0.3 plane, within a few voxels
    pts = np.zeros((64, 3), np.float32)
    pts[:, 0] = rng.uniform(0.0, 0.1, 64)
    pts[:, 1] = rng.uniform(0.0, 0.1, 64)
    pts[:, 2] = 0.3
    pts_s, bk, ok = _keys_for(pts)
    position = jnp.asarray([0.05, 0.05, 5.0])  # scanner above
    out = np.asarray(normals.estimate_normals(
        jnp.asarray(pts_s), bk, ok, jnp.ones(64, bool), position))
    # normal must be +z (flipped toward the scanner)
    np.testing.assert_allclose(np.abs(out[:, 2]), 1.0, atol=1e-3)
    assert (out[:, 2] > 0).all()


def test_fallback_for_sparse_points():
    # two isolated points far apart -> neighbourhoods < 8 -> fallback
    pts = np.array([[1.0, 0.0, 0.0], [50.0, 50.0, 50.0]], np.float32)
    pts_s, bk, ok = _keys_for(pts)
    position = jnp.zeros(3)
    out = np.asarray(normals.estimate_normals(
        jnp.asarray(pts_s), bk, ok, jnp.ones(2, bool), position))
    want = -pts_s / np.linalg.norm(pts_s, axis=1, keepdims=True)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_sphere_normals_point_inward():
    """On a scanned sphere centred at the scanner, normals ≈ -radial."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 5.0).astype(np.float32)
    pts_s, bk, ok = _keys_for(pts)
    position = jnp.zeros(3)
    out = np.asarray(normals.estimate_normals(
        jnp.asarray(pts_s), bk, ok, jnp.ones(len(pts), bool), position))
    radial = pts_s / np.linalg.norm(pts_s, axis=1, keepdims=True)
    cos = np.sum(out * -radial, axis=1)
    # all normals point toward the scanner hemisphere; most align well
    assert (cos > 0).mean() > 0.99
    assert np.median(cos) > 0.95


def test_padding_masked_out():
    pts = np.zeros((16, 3), np.float32)
    pts[:8] = np.random.default_rng(2).uniform(0, 0.1, (8, 3))
    valid = np.zeros(16, bool)
    valid[:8] = True
    pts_s, bk, ok = _keys_for(pts)
    out = np.asarray(normals.estimate_normals(
        jnp.asarray(pts), bk, ok, jnp.asarray(valid), jnp.asarray([0., 0., 9.])))
    assert np.isfinite(out).all()
