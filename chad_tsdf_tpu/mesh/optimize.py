"""Mesh contour optimization.

The reference's "PMC" path runs LVR2's ``BilinearFastBox::optimizePlanarFaces
(mesh, 5)`` after triangulation (reference: src/chad/detail/lvr2.cpp:262-266)
— an iterative pass that regularizes vertices so planar regions mesh with
clean contours.  The TPU build's equivalent is Taubin λ|μ smoothing
(shrink-free Laplacian): vertices move toward their one-ring average and are
pushed back by the negative pass, which flattens staircase artifacts on
planar regions while preserving volume.  Off by default
(MapConfig via TSDFMap.extract_mesh(optimize_iterations=...)) so meshes stay
bit-reproducible for the test oracles.
"""

from __future__ import annotations

import numpy as np

from .mc import TriangleMesh, _vertex_normals


def taubin_smooth(mesh: TriangleMesh, iterations: int = 5,
                  lam: float = 0.5, mu: float = -0.53) -> TriangleMesh:
    """Shrink-free smoothing over the vertex one-ring graph."""
    if iterations <= 0 or mesh.n_faces == 0:
        return mesh
    v = mesh.vertices.astype(np.float64).copy()
    f = mesh.faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    i, j = edges[:, 0], edges[:, 1]
    deg = np.zeros(len(v))
    np.add.at(deg, i, 1)
    np.add.at(deg, j, 1)
    deg = np.maximum(deg, 1)[:, None]

    def laplace_step(v, factor):
        acc = np.zeros_like(v)
        np.add.at(acc, i, v[j])
        np.add.at(acc, j, v[i])
        return v + factor * (acc / deg - v)

    for _ in range(iterations):
        v = laplace_step(v, lam)
        v = laplace_step(v, mu)
    v = v.astype(np.float32)
    return TriangleMesh(v, f, _vertex_normals(v, f))
