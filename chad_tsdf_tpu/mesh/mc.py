"""Marching cubes over sparse TSDF voxel samples.

Replaces the reference's LVR2 pipeline — ``ChadGrid`` query-point/cell
construction (reference: src/chad/detail/lvr2.cpp:15-133), per-cell
``BilinearFastBox::getSurface`` triangulation and mesh finalization
(lvr2.cpp:235-320) — with a vectorized pipeline over flat arrays:

* samples: (voxel 63-bit Morton code, signed distance) pairs — the "query
  points" (lvr2.cpp:86-89);
* candidate cells: each sample spawns the 8 incident cells (same offset
  table as lvr2.cpp:91-103), deduplicated by cell Morton code;
* cells missing any of their 8 corner samples are culled — mesh only where
  all 8 SDF samples exist (lvr2.cpp:115-129);
* MC case per cell -> triangles via the generated tables, with vertices
  interpolated on cell edges and welded via canonical (voxel, axis) edge
  keys, so shared vertices are exact and the mesh is watertight where cells
  are contiguous;
* vertex normals = angle-agnostic average of incident face normals
  (reference uses LVR2 calcFaceNormals/calcVertexNormals, lvr2.cpp:296-297).

All arrays are numpy; meshing runs at save() cadence, not per scan.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import morton
from .tables import CORNERS, EDGES, TRI_TABLE

# offsets of the 8 cells incident to a voxel vertex (lvr2.cpp:91-103);
# cell c contains the voxel at corner i iff voxel == c + CORNERS[i]
_CELL_OFFSETS = -CORNERS


@dataclasses.dataclass
class TriangleMesh:
    vertices: np.ndarray      # (V, 3) float32
    faces: np.ndarray         # (F, 3) int32
    vertex_normals: np.ndarray  # (V, 3) float32

    @property
    def n_vertices(self):
        return self.vertices.shape[0]

    @property
    def n_faces(self):
        return self.faces.shape[0]


def marching_cubes(sample_codes: np.ndarray, sample_sd: np.ndarray,
                   sdf_res: float, iso: float = 0.0) -> TriangleMesh:
    """Extract the isosurface from sparse voxel samples.

    Args:
      sample_codes: (N,) uint64 63-bit voxel Morton codes, unique.
      sample_sd: (N,) float32 signed distances at those voxels.
      sdf_res: voxel edge length (vertex positions = voxel coord * res,
        the reference's convention at lvr2.cpp:78-80).
    """
    order = np.argsort(sample_codes, kind="stable")
    sample_codes = sample_codes[order]
    sample_sd = np.ascontiguousarray(sample_sd[order], np.float32)
    coords = morton.np_decode63(sample_codes)            # (N, 3) int32

    # ---- candidate cells (8 per sample), deduplicated ----
    cand = coords[:, None, :] + _CELL_OFFSETS[None, :, :]
    cand_codes = morton.np_encode63(cand.reshape(-1, 3))
    cell_codes = np.unique(cand_codes)

    # ---- gather the 8 corner samples of each cell; cull incomplete ----
    cell_coords = morton.np_decode63(cell_codes)
    corner_codes = morton.np_encode63(
        (cell_coords[:, None, :] + CORNERS[None, :, :]).reshape(-1, 3))
    pos = np.searchsorted(sample_codes, corner_codes)
    pos_c = np.minimum(pos, sample_codes.shape[0] - 1)
    found = sample_codes[pos_c] == corner_codes
    found = found.reshape(-1, 8)
    complete = found.all(axis=1)
    cell_coords = cell_coords[complete]
    corner_idx = pos_c.reshape(-1, 8)[complete]
    corner_sd = sample_sd[corner_idx]                    # (C, 8)

    # ---- classify ----
    inside = corner_sd < iso
    case = (inside << np.arange(8)).sum(axis=1).astype(np.int32)
    active = (case != 0) & (case != 255)
    cell_coords, corner_sd, case = (cell_coords[active], corner_sd[active],
                                    case[active])
    c = cell_coords.shape[0]
    if c == 0:
        z3 = np.zeros((0, 3), np.float32)
        return TriangleMesh(z3, np.zeros((0, 3), np.int32), z3.copy())

    # ---- triangles: per-cell tri-table gather + compaction ----
    tris_e = TRI_TABLE[case][:, :15]                     # (C, 15); col 16 pad
    tri_edges = tris_e.reshape(c, 5, 3)                  # padded with -1
    tri_valid = tri_edges[:, :, 0] >= 0                  # (C, 5)

    # canonical global edge key: (min corner voxel code, axis) so welded
    # vertices are shared bit-exactly between neighbouring cells
    e0, e1 = EDGES[:, 0], EDGES[:, 1]                    # (12,)
    ca = CORNERS[e0]                                     # (12, 3)
    cb = CORNERS[e1]
    lo = np.minimum(ca, cb)                              # (12, 3)
    axis = np.argmax(np.abs(ca - cb), axis=1).astype(np.uint64)  # (12,)
    edge_vox = cell_coords[:, None, :] + lo[None, :, :]  # (C, 12, 3)
    edge_key = (morton.np_encode63(edge_vox.reshape(-1, 3)).reshape(c, 12)
                << np.uint64(2)) | axis[None, :]

    # interpolated vertex position per (cell, edge)
    sd_a = np.take_along_axis(corner_sd, np.broadcast_to(e0, (c, 12)), axis=1)
    sd_b = np.take_along_axis(corner_sd, np.broadcast_to(e1, (c, 12)), axis=1)
    denom = sd_a - sd_b
    t = np.where(np.abs(denom) > 1e-30, (sd_a - iso) / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0).astype(np.float32)
    pa = (cell_coords[:, None, :] + ca[None, :, :]).astype(np.float32)
    pb = (cell_coords[:, None, :] + cb[None, :, :]).astype(np.float32)
    edge_pos = (pa + (pb - pa) * t[:, :, None]) * np.float32(sdf_res)

    # flatten triangle soup -> edge keys per triangle corner
    tv = tri_valid.reshape(-1)                            # (C*5,)
    tri_edges_f = tri_edges.reshape(-1, 3)[tv]            # (T, 3)
    cell_of_tri = np.repeat(np.arange(c), 5)[tv]          # (T,)
    keys_soup = edge_key[cell_of_tri[:, None], tri_edges_f]       # (T, 3)
    pos_soup = edge_pos[cell_of_tri[:, None], tri_edges_f]        # (T, 3, 3)

    # ---- weld vertices ----
    uniq_keys, inverse = np.unique(keys_soup.reshape(-1), return_inverse=True)
    vertices = np.zeros((uniq_keys.shape[0], 3), np.float32)
    vertices[inverse] = pos_soup.reshape(-1, 3)
    faces = inverse.reshape(-1, 3).astype(np.int32)
    # drop degenerate triangles (two corners welded to the same vertex)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
          (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    vn = _vertex_normals(vertices, faces)
    return TriangleMesh(vertices, faces, vn)


def _vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (reference: LVR2 calcFaceNormals +
    calcVertexNormals, lvr2.cpp:296-297)."""
    if faces.shape[0] == 0:
        return np.zeros_like(vertices)
    v0, v1, v2 = (vertices[faces[:, 0]], vertices[faces[:, 1]],
                  vertices[faces[:, 2]])
    fn = np.cross(v1 - v0, v2 - v0)                      # area-weighted
    vn = np.empty_like(vertices, dtype=np.float64)
    idx = faces.reshape(-1)
    w = np.repeat(fn, 3, axis=0)
    for c in range(3):      # bincount ~10x np.add.at at mesh scale
        vn[:, c] = np.bincount(idx, weights=w[:, c],
                               minlength=vertices.shape[0])
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-30)).astype(np.float32)
