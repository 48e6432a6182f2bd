"""Normal estimation from Morton neighbourhoods, vectorized.

The reference walks the Morton-sorted point list sequentially: for each point
it grows a neighbourhood by coarsening the Morton prefix 3 bits at a time
(up to 3 rounds — voxel, 2^3 block, 4^3 block) until it has >= 8 points,
fits a plane with the weighted-determinant covariance method, flips the
normal toward the scanner, and assigns it to the whole run (reference:
include/chad/detail/normals.hpp:81-148; plane fit at 10-80, credited to
"plane from points", ilikebigbits.com).

TPU-native reformulation (order-independent, deterministic):

* points are sorted by their local (block, offset) Morton key;
* for depth d in {0,1,2} the points partition into *segments* of equal
  ``code >> 3d``; segment moments are computed with one segmented
  associative scan (no hashmaps, no scatter);
* each point uses the smallest depth whose full segment reaches
  ``min_points``; the plane fit then consumes the exact per-segment
  covariance; otherwise the fallback normal ``normalize(position - point)``
  is used (normals.hpp:127-134).

Two deliberate deviations from the reference, documented per SURVEY §7:
the reference's greedy cursor makes later points in a segment use only the
segment *suffix* and its forward walk never absorbs the final point
(normals.hpp:100, a bounds quirk); we use full segments for every point —
order-independent and strictly more data per fit.

Numerical care: covariance is accumulated from coordinates *relative to the
segment's first point* (shift-invariant), so second moments never suffer the
catastrophic cancellation a global cumsum-difference would have at world
scale.  The reference uses double precision (normals.hpp:12); TPUs have no
f64, and the relative-coordinate trick achieves comparable accuracy in f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import segops


def _plane_normal_from_moments(n, s, ss):
    """Weighted-determinant plane normal from segment moments.

    ``n``: (N,) counts; ``s``: (N,3) coordinate sums; ``ss``: (N,6) sums of
    products (xx, xy, xz, yy, yz, zz) — all relative to an arbitrary
    per-segment shift.  Reproduces normals.hpp:10-80 exactly in f32.
    """
    recip = 1.0 / jnp.maximum(n, 1.0)
    mean = s * recip[:, None]
    xx = ss[:, 0] * recip - mean[:, 0] * mean[:, 0]
    xy = ss[:, 1] * recip - mean[:, 0] * mean[:, 1]
    xz = ss[:, 2] * recip - mean[:, 0] * mean[:, 2]
    yy = ss[:, 3] * recip - mean[:, 1] * mean[:, 1]
    yz = ss[:, 4] * recip - mean[:, 1] * mean[:, 2]
    zz = ss[:, 5] * recip - mean[:, 2] * mean[:, 2]

    # The reference computes in f64 (normals.hpp:12); in f32 the quartic
    # determinant weights underflow for mm-scale neighbourhoods.  The normal
    # direction is invariant to a uniform covariance scale, so normalize the
    # covariance to unit max element first.
    m = jnp.max(jnp.stack([jnp.abs(xx), jnp.abs(xy), jnp.abs(xz),
                           jnp.abs(yy), jnp.abs(yz), jnp.abs(zz)]), axis=0)
    ms = 1.0 / jnp.maximum(m, 1e-30)
    xx, xy, xz = xx * ms, xy * ms, xz * ms
    yy, yz, zz = yy * ms, yz * ms, zz * ms

    det_x = yy * zz - yz * yz
    ax = jnp.stack([det_x, xz * yz - xy * zz, xy * yz - xz * yy], axis=-1)
    w = det_x * det_x
    wdir = ax * w[:, None]

    det_y = xx * zz - xz * xz
    ay = jnp.stack([xz * yz - xy * zz, det_y, xy * xz - yz * xx], axis=-1)
    w = det_y * det_y
    w = jnp.where(jnp.sum(wdir * ay, axis=-1) < 0.0, -w, w)
    wdir = wdir + ay * w[:, None]

    det_z = xx * yy - xy * xy
    az = jnp.stack([xy * yz - xz * yy, xy * xz - yz * xx, det_z], axis=-1)
    w = det_z * det_z
    w = jnp.where(jnp.sum(wdir * az, axis=-1) < 0.0, -w, w)
    wdir = wdir + az * w[:, None]

    norm = jnp.linalg.norm(wdir, axis=-1, keepdims=True)
    return wdir / jnp.maximum(norm, 1e-30)


def estimate_normals(points_sorted: jnp.ndarray, block_keys: jnp.ndarray,
                     offsets: jnp.ndarray, valid: jnp.ndarray,
                     position: jnp.ndarray, min_points: int = 8,
                     max_depth: int = 3) -> jnp.ndarray:
    """Estimate one normal per (sorted) point.

    Args:
      points_sorted: (N, 3) f32 points in Morton order.
      block_keys / offsets: (N,) int32 local Morton key of each point's voxel.
      valid: (N,) bool — padding mask; invalid points get the fallback normal.
      position: (3,) scanner position.
    Returns:
      (N, 3) f32 unit normals, flipped toward the scanner
      (normals.hpp:117-118).
    """
    n = points_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    # relative coordinates for numerically safe second moments
    # (anchor = the segment start at the COARSEST depth, shared by all finer
    # segments within it)
    coarse_key = offsets >> (3 * (max_depth - 1))
    coarse_flags = segops.boundary_flags((block_keys, coarse_key)) | \
        segops.boundary_flags(valid)
    anchor_pos = segops.segment_start_positions(coarse_flags)
    anchor = points_sorted[anchor_pos]
    rel = points_sorted - anchor

    prods = jnp.stack([
        rel[:, 0] * rel[:, 0], rel[:, 0] * rel[:, 1], rel[:, 0] * rel[:, 2],
        rel[:, 1] * rel[:, 1], rel[:, 1] * rel[:, 2], rel[:, 2] * rel[:, 2],
    ], axis=-1)
    feats = jnp.concatenate([jnp.ones((n, 1), jnp.float32), rel, prods], axis=-1)

    best_n = jnp.zeros((n,), jnp.float32)
    best_s = jnp.zeros((n, 3), jnp.float32)
    best_ss = jnp.zeros((n, 6), jnp.float32)
    found = jnp.zeros((n,), jnp.bool_)

    for depth in range(max_depth):
        key_d = offsets >> (3 * depth)
        flags = segops.boundary_flags((block_keys, key_d)) | \
            segops.boundary_flags(valid)
        run = segops.segmented_sum_scan(flags, feats)
        end = segops.segment_end_positions(flags)
        seg = run[jnp.clip(end - 1, 0, n - 1)]        # per-segment totals
        cnt = seg[:, 0]
        ok = (~found) & (cnt >= float(min_points))
        best_n = jnp.where(ok, cnt, best_n)
        best_s = jnp.where(ok[:, None], seg[:, 1:4], best_s)
        best_ss = jnp.where(ok[:, None], seg[:, 4:10], best_ss)
        found = found | ok

    normal = _plane_normal_from_moments(best_n, best_s, best_ss)
    to_scanner = position[None, :] - points_sorted
    to_scanner = to_scanner / jnp.maximum(
        jnp.linalg.norm(to_scanner, axis=-1, keepdims=True), 1e-30)
    # flip plane normal toward the scanner (normals.hpp:117-118)
    flip = jnp.sum(normal * to_scanner, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    # fallback: normalized point->scanner vector (normals.hpp:127-134)
    use_fallback = (~found) | (~valid)
    return jnp.where(use_fallback[:, None], to_scanner, normal)
