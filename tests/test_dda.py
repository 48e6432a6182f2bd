"""DDA fidelity oracle: the fixed-K vectorized traversal must visit exactly
the voxels of a scalar Amanatides-Woo port of reference octree.hpp:92-152."""

import numpy as np
import jax.numpy as jnp

from chad_tsdf_tpu.ops import dda

FMAX = np.float32(3.4028235e38)


def scalar_dda(point, position, res, trunc):
    """Direct scalar port of the reference traversal (octree.hpp:92-152)."""
    point = np.asarray(point, np.float32)
    position = np.asarray(position, np.float32)
    direction = point - position
    direction = direction / np.linalg.norm(direction)
    direction_recip = np.float32(1.0) / direction
    start = point - direction * np.float32(trunc)
    final = point + direction * np.float32(trunc)
    res_recip = np.float32(1.0 / res)
    voxel_start = np.floor(start * res_recip).astype(np.int64)
    voxel_final = np.floor(final * res_recip).astype(np.int64)
    step_dir = np.sign(voxel_final - voxel_start).astype(np.int64)
    step_delta = np.abs(np.float32(res) * direction_recip)
    step_max = np.empty(3, np.float32)
    for a in range(3):
        if step_dir[a] < 0:
            step_max[a] = res * np.floor(start[a] * res_recip)
        elif step_dir[a] > 0:
            step_max[a] = res * np.ceil(start[a] * res_recip)
        else:
            step_max[a] = FMAX
        if step_dir[a] != 0:
            step_max[a] = abs((step_max[a] - start[a]) * direction_recip[a])
        step_delta = np.where(step_dir == 0, FMAX, step_delta)
    voxels = [tuple(voxel_start)]
    cur = voxel_start.copy()
    for _ in range(1000):
        if step_max[0] < step_max[1]:
            a = 0 if step_max[0] < step_max[2] else 2
        else:
            a = 1 if step_max[1] < step_max[2] else 2
        cur[a] += step_dir[a]
        step_max[a] += step_delta[a]
        if cur[a] == voxel_final[a] + step_dir[a]:
            break
        voxels.append(tuple(cur))
    return voxels


def test_traverse_matches_scalar_reference():
    rng = np.random.default_rng(0)
    res, trunc = 0.05, 0.1
    n = 256
    pts = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    pos = np.array([0.1, -0.2, 0.3], np.float32)
    k = 12
    vx, vy, vz, valid = dda.traverse(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]),
        jnp.asarray(pos), res, trunc, k)
    vx, vy, vz = np.asarray(vx), np.asarray(vy), np.asarray(vz)
    valid = np.asarray(valid)
    for i in range(n):
        want = scalar_dda(pts[i], pos, res, trunc)
        got = [(vx[j, i], vy[j, i], vz[j, i]) for j in range(k) if valid[j, i]]
        assert got == want, f"ray {i}: {got} != {want}"


def test_traverse_axis_aligned_and_degenerate():
    res, trunc = 0.05, 0.1
    pts = np.array([
        [1.0, 0.025, 0.025],    # axis-aligned +x
        [0.0, -1.0, 0.0],       # axis-aligned -y
        [0.026, 0.026, 0.026],  # short diagonal
    ], np.float32)
    pos = np.zeros(3, np.float32)
    vx, vy, vz, valid = dda.traverse(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]),
        jnp.asarray(pos), res, trunc, 12)
    vx, vy, vz = np.asarray(vx), np.asarray(vy), np.asarray(vz)
    valid = np.asarray(valid)
    for i in range(len(pts)):
        want = scalar_dda(pts[i], pos, res, trunc)
        got = [(vx[j, i], vy[j, i], vz[j, i]) for j in range(12) if valid[j, i]]
        assert got == want


def test_budget_never_truncates():
    """K from MapConfig.dda_steps must cover the worst case."""
    from chad_tsdf_tpu.config import MapConfig
    cfg = MapConfig()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    pos = np.zeros(3, np.float32)
    k = cfg.dda_steps
    _, _, _, valid = dda.traverse(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]),
        jnp.asarray(pos), cfg.sdf_res, cfg.sdf_trunc, k)
    valid = np.asarray(valid)
    # every ray must terminate before exhausting the budget: the last slot
    # can only be valid if the scalar reference also visits k voxels
    for i in np.nonzero(valid[-1, :])[0]:
        want = scalar_dda(pts[i], pos, cfg.sdf_res, cfg.sdf_trunc)
        assert len(want) == k


def test_signed_distance_clamped_projective():
    res, trunc = 0.05, 0.1
    # one ray, K=3 slots: voxels 21, 19, 50 along x
    vx = jnp.asarray([[21], [19], [50]], jnp.int32)
    vy = jnp.zeros((3, 1), jnp.int32)
    vz = jnp.zeros((3, 1), jnp.int32)
    one = jnp.asarray([1.0], jnp.float32)
    zero = jnp.zeros(1, jnp.float32)
    sd = np.asarray(dda.signed_distances(
        vx, vy, vz, one, zero, zero, -one, zero, zero, res, trunc))
    # voxel position = voxel*res (min corner), sd = dot(n, vpos - p)
    np.testing.assert_allclose(sd[0, 0], -(21 * res - 1.0), rtol=1e-5)
    np.testing.assert_allclose(sd[1, 0], -(19 * res - 1.0), rtol=1e-4)
    assert sd[2, 0] == -trunc  # clamped
