"""Fixed-budget Amanatides–Woo voxel traversal, vectorized over rays.

The reference walks each sensor ray through its truncation band with a
scalar DDA loop of data-dependent length (reference:
include/chad/detail/octree.hpp:90-152, citing "A fast voxel traversal
algorithm for ray tracing").  Data-dependent loops don't exist under XLA;
here the traversal is a ``lax.scan`` over a *static* step budget K with a
validity mask — every ray emits exactly K (voxel, valid) slots, and K is
chosen so no traversal is ever truncated (see MapConfig.dda_steps).

Semantics replicated exactly (verified against a scalar port in tests):

* ray from ``point - dir*trunc`` to ``point + dir*trunc`` (octree.hpp:96-97),
* per-axis step = sign(voxel_final - voxel_start) (octree.hpp:103),
* tMax initialisation from floor/ceil of the start voxel boundary with
  +inf for zero-step axes (octree.hpp:108-121),
* step the axis with the smallest tMax, tie-break x<y, then z before x/y
  exactly as the nested ifs at octree.hpp:128-148,
* terminate (without emitting) when the stepped axis passes its final
  voxel; the start voxel is always emitted (octree.hpp:124-125).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FMAX = jnp.float32(3.4028235e38)


def traverse(points: jnp.ndarray, position: jnp.ndarray, sdf_res: float,
             sdf_trunc: float, num_steps: int):
    """Traverse rays through their truncation bands.

    Args:
      points: (N, 3) float32 world points (ray endpoints).
      position: (3,) float32 scanner position (ray origins).
      sdf_res: voxel edge length.
      sdf_trunc: truncation distance.
      num_steps: static sample budget K.

    Returns:
      voxels: (N, K, 3) int32 world voxel coordinates.
      valid: (N, K) bool — True where the slot holds a traversed voxel.
    """
    res_recip = jnp.float32(1.0 / sdf_res)
    direction = points - position[None, :]
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    # guard rays of zero length (point == position): direction becomes NaN;
    # mark them fully invalid below.
    dir_ok = jnp.all(jnp.isfinite(direction), axis=-1)

    start = points - direction * sdf_trunc
    final = points + direction * sdf_trunc
    voxel_start = jnp.floor(start * res_recip).astype(jnp.int32)
    voxel_final = jnp.floor(final * res_recip).astype(jnp.int32)

    step_dir = jnp.sign(voxel_final - voxel_start).astype(jnp.int32)
    dir_recip = 1.0 / direction
    step_delta = jnp.abs(sdf_res * dir_recip)

    # tMax: distance (in ray parameter) to the first voxel boundary per axis
    bound = jnp.where(step_dir < 0,
                      sdf_res * jnp.floor(start * res_recip),
                      sdf_res * jnp.ceil(start * res_recip))
    tmax = jnp.abs((bound - start) * dir_recip)
    tmax = jnp.where(step_dir == 0, _FMAX, tmax)
    step_delta = jnp.where(step_dir == 0, _FMAX, step_delta)

    def body(carry, _):
        voxel, tmax, alive = carry
        # axis selection replicating octree.hpp:128-148 nested conditionals:
        # if tx < ty: (tx < tz ? x : z) else: (ty < tz ? y : z)
        tx, ty, tz = tmax[:, 0], tmax[:, 1], tmax[:, 2]
        axis = jnp.where(tx < ty,
                         jnp.where(tx < tz, 0, 2),
                         jnp.where(ty < tz, 1, 2))
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_voxel = voxel + onehot * step_dir
        new_tmax = tmax + onehot.astype(tmax.dtype) * step_delta
        # stop when the stepped axis has passed its final voxel
        stepped_coord = jnp.take_along_axis(new_voxel, axis[:, None], axis=1)[:, 0]
        stepped_final = jnp.take_along_axis(voxel_final, axis[:, None], axis=1)[:, 0]
        stepped_sdir = jnp.take_along_axis(step_dir, axis[:, None], axis=1)[:, 0]
        passed = stepped_coord == stepped_final + stepped_sdir
        new_alive = alive & ~passed
        # emit the new voxel only while still alive after the step
        out_voxel = new_voxel
        return (new_voxel, new_tmax, new_alive), (out_voxel, new_alive)

    n = points.shape[0]
    alive0 = dir_ok
    carry0 = (voxel_start, tmax, alive0)
    _, (vox_seq, valid_seq) = jax.lax.scan(body, carry0, None, length=num_steps - 1)
    # (K-1, N, 3) / (K-1, N) -> (N, K, 3) / (N, K); slot 0 = start voxel
    vox = jnp.concatenate([voxel_start[:, None, :],
                           jnp.moveaxis(vox_seq, 0, 1)], axis=1)
    valid = jnp.concatenate([alive0[:, None], jnp.moveaxis(valid_seq, 0, 1)],
                            axis=1)
    return vox, valid


def signed_distances(voxels: jnp.ndarray, points: jnp.ndarray,
                     normals: jnp.ndarray, sdf_res: float, sdf_trunc: float):
    """Projective signed distance per traversed voxel.

    Matches octree.hpp:156-159: ``sd = clamp(dot(normal, voxel*res - point),
    -trunc, +trunc)`` — the distance along the *surface normal*, measured at
    the voxel's grid position (its minimum corner, as in the reference).

    voxels: (N, K, 3) int32; points: (N, 3); normals: (N, 3) -> (N, K) f32.
    """
    vpos = voxels.astype(jnp.float32) * sdf_res
    d = vpos - points[:, None, :]
    sd = jnp.einsum("nd,nkd->nk", normals, d)
    return jnp.clip(sd, -sdf_trunc, sdf_trunc)
