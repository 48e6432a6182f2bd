"""Reference-semantics oracle: an exact numpy re-derivation of the C++
reference's insert pipeline, used to produce the golden mesh for BASELINE
target 2 ("vertex RMSE vs the reference mesh") inside this network-less
environment (VERDICT r4 task 5, option b).

The reference itself cannot be compiled here (all its CMake dependencies
are FetchContent-only — /root/reference/CMakeLists.txt, cmake/*.cmake), so
this module reimplements its *semantics*, not its code, with every rule
pinned to a file:line of the reference:

* voxel discretization ``floor(p * float(1.0/double(res)))`` and 63-bit
  biased Morton codes                       (morton.hpp:59-80, 21-28)
* DESCENDING Morton sort                    (morton.hpp:85-89)
* greedy prefix-run normal estimation: neighbourhood grows forward by
  coarsening the code mask 3 bits at a time, up to 3 levels, until >= 8
  points; weighted-determinant plane fit in double; flip toward the
  scanner using the run's FIRST point; < 8 points -> per-point
  (position - point) fallback               (normals.hpp:81-148, 10-80)
  Replicated quirks: the forward walk stops at ``cend() - 1`` so the
  final sorted point is never absorbed into a preceding run
  (normals.hpp:100).  (When the run *starts* at the final point the
  reference reads one element past the end — UB; the oracle treats it as
  a size-1 run, the only defined reading.)
* exact Amanatides-Woo DDA in float32, including step-axis tie-breaking
  (x<y?x:z / y<z?y:z), per-axis FLT_MAX sentinels and the
  ``current == final + step`` termination that drops the overstepped
  voxel                                     (octree.hpp:92-152)
* projective signed distance at the voxel's MIN CORNER
  ``clamp(dot(normal, voxel*res - point), +-trunc)``  (octree.hpp:156-159)
* per-voxel arithmetic mean of its samples  (octree.hpp:161-163; the
  reference's incremental float mean equals the arithmetic mean up to
  float rounding — the oracle averages in double, a deviation orders of
  magnitude below the 8-bit output quantum trunc/127)
* 8-bit quantization with C float->uint TRUNCATION:
  ``uint(clamp(sd/trunc,-1,1)*127 + 127)``, dequantized
  ``(q-127) * float(1/127) * trunc``        (cluster.hpp:13-52,
  submap.hpp:24)
* mesh query points at ``voxel * res`` carrying the dequantized sd, cells
  culled unless all 8 corners exist         (lvr2.cpp:76-89,115-129) —
  matched by chad_tsdf_tpu.mesh.marching_cubes's placement/culling rules.

Run ``python tools/reference_oracle.py`` (CPU-only, pure numpy) to write
``tests/golden/reference_sphere.ply`` from the reference demo workload
(1M points on an r=5 m sphere sampled from a normalized uniform cube
distribution, res 0.05, trunc 0.1 — main.cpp:7-39; the RNG differs from
std::mt19937 seed 420, the sampled surface does not, which is what vertex
RMSE measures — see tools/compare_reference.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chad_tsdf_tpu.ops import morton  # noqa: E402  (bit-exact-tested encode)

F32 = np.float32
FLT_MAX = np.float32(np.finfo(np.float32).max)


def _normalize_rows_f32(v: np.ndarray) -> np.ndarray:
    """glm::normalize on float vec3: v * (1 / sqrt(dot(v, v))), all f32."""
    v = v.astype(F32)
    s = np.sqrt((v * v).sum(axis=-1, dtype=F32))
    return (v / s[..., None]).astype(F32)


def voxelize(points: np.ndarray, res: float):
    """morton.hpp:59-80: floor(p * float(1/double(res))) voxel coords and
    63-bit biased codes."""
    recip = F32(1.0 / np.float64(res))
    vox = np.floor(points.astype(F32) * recip).astype(np.int32)
    return vox, morton.np_encode63(vox)


def sort_descending(points: np.ndarray, codes: np.ndarray):
    """morton.hpp:85-89 sorts by code value DESCENDING."""
    order = np.argsort(codes, kind="stable")[::-1]
    return points[order], codes[order]


def _plane_fit(pts: np.ndarray) -> np.ndarray:
    """normals.hpp:10-80: centroid + covariance in double, three
    determinant axis directions blended by squared-determinant weights
    whose sign follows the running direction."""
    p = pts.astype(np.float64)
    m = len(p)
    recip = 1.0 / m
    centroid = p.sum(axis=0) * recip
    r = p - centroid
    xx = (r[:, 0] * r[:, 0]).sum() * recip
    xy = (r[:, 0] * r[:, 1]).sum() * recip
    xz = (r[:, 0] * r[:, 2]).sum() * recip
    yy = (r[:, 1] * r[:, 1]).sum() * recip
    yz = (r[:, 1] * r[:, 2]).sum() * recip
    zz = (r[:, 2] * r[:, 2]).sum() * recip

    weighted = np.zeros(3)
    for det, axis_dir in (
        (yy * zz - yz * yz,
         np.array([yy * zz - yz * yz, xz * yz - xy * zz, xy * yz - xz * yy])),
        (xx * zz - xz * xz,
         np.array([xz * yz - xy * zz, xx * zz - xz * xz, xy * xz - yz * xx])),
        (xx * yy - xy * xy,
         np.array([xy * yz - xz * yy, xy * xz - yz * xx, xx * yy - xy * xy])),
    ):
        w = det * det
        if weighted @ axis_dir < 0.0:
            w = -w
        weighted = weighted + axis_dir * w
    return (weighted / np.sqrt(weighted @ weighted)).astype(F32)


def estimate_normals(points_s: np.ndarray, codes_s: np.ndarray,
                     position: np.ndarray,
                     min_points: int = 8) -> np.ndarray:
    """normals.hpp:81-148 over the DESCENDING-sorted cloud."""
    n = len(codes_s)
    normals = np.empty((n, 3), F32)
    pos = np.asarray(position, F32)
    codes = codes_s.tolist()               # python ints: fast scalar masks
    i = 0
    while i < n:
        end = i + 1
        size = 1
        for depth in range(3):
            mask = ((1 << 64) - 1) << (depth * 3)
            target = codes[i] & mask
            # forward walk bounded at cend()-1 (normals.hpp:100): the last
            # point can never be ABSORBED into a run starting before it
            while end < n - 1 and (codes[end] & mask) == target:
                end += 1
            size = end - i
            if size >= min_points:
                break
        if size >= min_points:
            nrm = _plane_fit(points_s[i:end])
            flip_ref = _normalize_rows_f32(pos - points_s[i])
            if float(nrm @ flip_ref) < 0.0:            # normals.hpp:117-118
                nrm = -nrm
            normals[i:end] = nrm
        else:
            normals[i:end] = _normalize_rows_f32(pos - points_s[i:end])
        i = end
    return normals


def dda_traverse(points: np.ndarray, position: np.ndarray, res: float,
                 trunc: float):
    """octree.hpp:92-152 in float32, vectorized in lockstep over rays
    (elementwise IEEE ops are identical to the scalar loop).

    Returns (vox (M, 3) int32, pt_idx (M,) int64) — every traversed voxel
    with the index of the ray that visited it, in per-ray traversal order.
    """
    p = points.astype(F32)
    pos = np.asarray(position, F32)
    n = len(p)
    res32 = F32(res)
    res_recip = F32(1.0 / np.float64(res))

    d = p - pos
    dn = _normalize_rows_f32(d)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        recip = (F32(1.0) / dn).astype(F32)
        start = p - dn * F32(trunc)
        final = p + dn * F32(trunc)
        vs = np.floor(start * res_recip).astype(np.int32)
        vf = np.floor(final * res_recip).astype(np.int32)
        stepd = np.sign(vf - vs).astype(np.int32)
        delta = np.abs(res32 * recip)
        m0 = np.where(stepd < 0, res32 * np.floor(start * res_recip),
                      np.where(stepd > 0, res32 * np.ceil(start * res_recip),
                               FLT_MAX)).astype(F32)
        smax = np.abs((m0 - start) * recip).astype(F32)

    vox_chunks = [vs.copy()]
    idx_chunks = [np.arange(n, dtype=np.int64)]
    cur = vs.copy()
    done = np.zeros(n, bool)
    for _ in range(256):
        act = np.flatnonzero(~done)
        if act.size == 0:
            break
        sa = smax[act]
        # exact tie-breaking of octree.hpp:126-150
        xlty = sa[:, 0] < sa[:, 1]
        ax = np.where(xlty,
                      np.where(sa[:, 0] < sa[:, 2], 0, 2),
                      np.where(sa[:, 1] < sa[:, 2], 1, 2))
        cur[act, ax] += stepd[act, ax]
        smax[act, ax] += delta[act, ax]
        finished = cur[act, ax] == vf[act, ax] + stepd[act, ax]
        rec = act[~finished]                 # overstepped voxel NOT pushed
        vox_chunks.append(cur[rec].copy())
        idx_chunks.append(rec.astype(np.int64))
        done[act[finished]] = True
    assert done.all(), "DDA failed to terminate within 256 steps"
    return np.concatenate(vox_chunks), np.concatenate(idx_chunks)


def integrate(points_s: np.ndarray, normals: np.ndarray,
              position: np.ndarray, res: float, trunc: float):
    """DDA + clamp(dot(normal, voxel*res - point), +-trunc) + per-voxel
    mean (octree.hpp:153-163).  Returns code-sorted unique
    (codes u64, mean sd f32, weight counts int64)."""
    vox, pt = dda_traverse(points_s, position, res, trunc)
    sd = ((vox.astype(F32) * F32(res) - points_s[pt].astype(F32)) *
          normals[pt].astype(F32)).sum(axis=1, dtype=F32)
    sd = np.clip(sd, F32(-trunc), F32(trunc))
    codes = morton.np_encode63(vox)
    order = np.argsort(codes, kind="stable")
    codes, sd = codes[order], sd[order]
    starts = np.flatnonzero(np.concatenate([[True], codes[1:] != codes[:-1]]))
    counts = np.diff(np.append(starts, len(codes)))
    mean = np.add.reduceat(sd.astype(np.float64), starts) / counts
    return codes[starts], mean.astype(F32), counts


def quantize_roundtrip(sd: np.ndarray, trunc: float) -> np.ndarray:
    """cluster.hpp:13-52 8-bit codec with C float->uint truncation."""
    recip = F32(1.0 / trunc)                          # submap.hpp:24
    sdn = np.clip(sd.astype(F32) * recip, F32(-1.0), F32(1.0))
    q = np.trunc(sdn * F32(127.0) + F32(127.0)).astype(np.uint8)
    return ((q.astype(F32) - F32(127.0)) * F32(1.0 / 127.0) *
            F32(trunc)).astype(F32)


def reference_voxel_samples(points: np.ndarray, position, res: float,
                            trunc: float):
    """The full reference insert pipeline: (codes u64, dequantized sd f32)
    exactly as the reference's meshing stage would read them."""
    points = np.asarray(points, F32)
    position = np.asarray(position, F32)
    vox, codes = voxelize(points, res)
    del vox
    pts_s, codes_s = sort_descending(points, codes)
    normals = estimate_normals(pts_s, codes_s, position)
    ucodes, mean_sd, _ = integrate(pts_s, normals, position, res, trunc)
    return ucodes, quantize_roundtrip(mean_sd, trunc)


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden",
        "reference_sphere.ply")
    n = 1 << 20
    res, trunc = 0.05, 0.1
    rng = np.random.default_rng(420)
    d = rng.uniform(-1.0, 1.0, (n, 3))                 # main.cpp:12-26
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 5.0).astype(np.float32)
    pos = np.zeros(3, np.float32)

    print(f"oracle: integrating {n} points (pure numpy, ~1 min) ...")
    codes, sd = reference_voxel_samples(pts, pos, res, trunc)
    print(f"oracle: {len(codes)} voxels")

    from chad_tsdf_tpu.mesh import marching_cubes, write_ply
    mesh = marching_cubes(codes, sd, res)
    rr = np.linalg.norm(mesh.vertices, axis=1)
    print(f"oracle mesh: {mesh.n_vertices} verts, {mesh.n_faces} faces; "
          f"|v| = {rr.mean():.4f} +- {rr.std():.4f} (want 5.0)")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_ply(out, mesh)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
