"""Fused integrate kernel: DDA traversal + signed distance + tile
accumulation in ONE Pallas pass over point tiles.

Round-1 profiling showed the insert pipeline's cost was dominated not by
FLOPs but by materializing the (K, N) sample grids in HBM between the XLA
DDA scan (ops/dda.py) and the stage-A tile kernel (ops/tile_accum.py), plus
the multi-pass elementwise soup XLA emits around them.  This kernel fuses
the whole span — for each tile of ``TILE`` Morton-sorted points it:

1. runs the Amanatides-Woo traversal for all K steps in VMEM registers
   (identical step/tie-break semantics to ops/dda.py, reference
   include/chad/detail/octree.hpp:92-152),
2. computes the projective signed distance along the per-point normal
   (octree.hpp:156-159) and the local (block, offset) Morton keys,
3. accumulates every sample into per-tile partial block rows with the
   stacked one-hot MXU matmul of ops/tile_accum.py (see that module's
   docstring for why the matmul formulation is fast).

The (K, N) sample arrays never exist outside VMEM.  Per-tile outputs are
the same partial rows stage B (`core.integrate.update_pool_tiled`) already
merges, plus a per-tile counter row [n_valid, n_not_covered, n_samp_ovf].

Samples beyond a tile's ``nb`` distinct blocks are NOT accumulated here;
the caller re-derives them (rare path, under lax.cond) via the legacy
sample-grid pipeline and routes them through the sort-based update.

Recorded real-TPU caveat (tools/TPU_EQUALITY.json, round 4): Mosaic and
XLA may round a ray's truncation-band-EDGE boundary differently (the
``floor((p + d*trunc) * res_recip)`` endpoint), so against the XLA oracle
the fused path can disagree on a ray's last voxel — measured ONE voxel in
1.97M on the canonical sphere (2 samples of 15M, both at sd = +trunc
exactly, bit-stable across runs).  Interpret mode is bit-equal; the
equality tool gates on exactly this structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import morton

INT32_MAX = np.int32(2**31 - 1)
_FMAX = np.float32(3.4028235e38)

TILE = 1024


def _axis_setup(p, d, res, res_recip, trunc):
    """Per-axis DDA init — same math as ops/dda.py axis_setup.

    ``res_recip`` must be the HOST-rounded f32 constant float(1.0/res) —
    the same value dda.py uses — so the lax.cond sort fallback's coverage
    decision (which recomputes the traversal via dda.py) agrees with this
    kernel bit-for-bit at voxel boundaries."""
    start = p - d * trunc
    final = p + d * trunc
    vs = jnp.floor(start * res_recip).astype(jnp.int32)
    vf = jnp.floor(final * res_recip).astype(jnp.int32)
    sdir = jnp.sign(vf - vs).astype(jnp.int32)
    d_recip = 1.0 / d
    delta = jnp.abs(res * d_recip)
    bound = jnp.where(sdir < 0, res * jnp.floor(start * res_recip),
                      res * jnp.ceil(start * res_recip))
    tmax = jnp.abs((bound - start) * d_recip)
    tmax = jnp.where(sdir == 0, _FMAX, tmax)
    delta = jnp.where(sdir == 0, _FMAX, delta)
    return vs, vf, sdir, delta, tmax


def _kernel(nb: int, k: int, res: float, trunc: float, extent: int,
            n_sub: int, acc_dtype, phase,
            pos_ref, org_ref,                       # scalar prefetch (SMEM)
            px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, sb_ref,
            keys_out, psd_out, pw_out, counts_out):
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]   # (1, n_sub * TILE)
    nx, ny, nz = nx_ref[...], ny_ref[...], nz_ref[...]
    resf = jnp.float32(res)
    # host-rounded, identical to dda.py's jnp.float32(1.0 / sdf_res)
    res_recip = jnp.float32(float(np.float32(1.0 / res)))
    truncf = jnp.float32(trunc)
    posx, posy, posz = pos_ref[0], pos_ref[1], pos_ref[2]
    ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]           # origin voxel

    valid_pt = sb_ref[...] != INT32_MAX

    # ---- ray directions (octree.hpp:96-97) ----
    dx = px - posx
    dy = py - posy
    dz = pz - posz
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = 1.0 / norm
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    dir_ok = jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz)

    vsx, vfx, sx, dlx, tx = _axis_setup(px, dx, resf, res_recip, truncf)
    vsy, vfy, sy, dly, ty = _axis_setup(py, dy, resf, res_recip, truncf)
    vsz, vfz, sz, dlz, tz = _axis_setup(pz, dz, resf, res_recip, truncf)

    rows_b, rows_o, rows_sd = [], [], []
    n_samp_ovf = jnp.zeros((), jnp.int32)
    n_valid = jnp.zeros((), jnp.int32)

    def emit(vx, vy, vz, valid):
        nonlocal n_samp_ovf, n_valid
        lx = vx - ox
        ly = vy - oy
        lz = vz - oz
        in_range = ((lx >= 0) & (lx < extent) & (ly >= 0) & (ly < extent) &
                    (lz >= 0) & (lz < extent))
        n_samp_ovf += jnp.sum((valid & ~in_range).astype(jnp.int32))
        ok = valid & in_range
        n_valid += jnp.sum(ok.astype(jnp.int32))
        lx = jnp.clip(lx, 0, extent - 1)
        ly = jnp.clip(ly, 0, extent - 1)
        lz = jnp.clip(lz, 0, extent - 1)
        bkey = morton.encode_block(lx >> 3, ly >> 3, lz >> 3)
        okey = morton.encode_offset(lx & 7, ly & 7, lz & 7)
        # projective sd along the normal (octree.hpp:156-159)
        sd = (nx * (vx.astype(jnp.float32) * resf - px) +
              ny * (vy.astype(jnp.float32) * resf - py) +
              nz * (vz.astype(jnp.float32) * resf - pz))
        sd = jnp.clip(sd, -truncf, truncf)
        rows_b.append(jnp.where(ok, bkey, INT32_MAX))
        rows_o.append(jnp.where(ok, okey, 0))
        rows_sd.append(jnp.where(ok, sd, 0.0))

    alive = dir_ok & valid_pt
    vx, vy, vz = vsx, vsy, vsz
    emit(vx, vy, vz, alive)
    for _ in range(k - 1):
        # axis pick replicating octree.hpp:128-148 nested conditionals
        pick_x = (tx < ty) & (tx < tz)
        pick_y = (~(tx < ty)) & (ty < tz)
        pick_z = ~(pick_x | pick_y)
        vx = jnp.where(pick_x, vx + sx, vx)
        vy = jnp.where(pick_y, vy + sy, vy)
        vz = jnp.where(pick_z, vz + sz, vz)
        tx = jnp.where(pick_x, tx + dlx, tx)
        ty = jnp.where(pick_y, ty + dly, ty)
        tz = jnp.where(pick_z, tz + dlz, tz)
        # boolean mask arithmetic (picks are mutually exclusive); Mosaic
        # cannot lower select-of-bool vectors
        passed = ((pick_x & (vx == vfx + sx)) |
                  (pick_y & (vy == vfy + sy)) |
                  (pick_z & (vz == vfz + sz)))
        alive = alive & ~passed
        emit(vx, vy, vz, alive)

    bkey_all = jnp.concatenate(rows_b, axis=0)           # (K, n_sub * TILE)
    okey_all = jnp.concatenate(rows_o, axis=0)
    sd_all = jnp.concatenate(rows_sd, axis=0)

    if phase == "dda":                       # dev knockout (profiling only)
        keys_out[...] = jnp.full_like(keys_out, INT32_MAX)
        psd_out[...] = jnp.zeros_like(psd_out)
        pw_out[...] = jnp.zeros_like(pw_out) + sd_all[0, 0]
        cnt = jnp.zeros((8, 128), jnp.int32)
        counts_out[...] = cnt + bkey_all[0, 0] * 0
        return

    # per-subtile slices: the distinct-list extraction below is a chain of
    # nb data-dependent reduction rounds (latency-bound, not
    # throughput-bound); running n_sub independent subtile chains
    # interleaved hides that latency (measured ~2x on the extraction phase
    # per doubling at equal total work).
    sub = [slice(s * TILE, (s + 1) * TILE) for s in range(n_sub)]
    bkeys = [bkey_all[:, sl] for sl in sub]

    # ---- distinct block lists, ascending (nb min-extraction rounds) ----
    # The extraction is the kernel's VPU hot spot (measured ~60% of stage A
    # standalone): each round re-scans the whole (K, TILE) work array.  A
    # typical tile has far fewer distinct blocks than nb, so rounds run in
    # chunks of EXT_CHUNK with a per-chunk early exit once the previous
    # chunk exhausted the keys (work all-INT32_MAX => min == INT32_MAX).
    EXT_CHUNK = 8
    assert nb % EXT_CHUNK == 0

    def ext_body(work_refs, lst_refs):
        for s in range(n_sub):
            work_refs[s][...] = bkeys[s]
            lst_refs[s][...] = jnp.full((nb, 1), INT32_MAX, jnp.int32)
        for c in range(0, nb, EXT_CHUNK):
            for s in range(n_sub):
                first = jnp.min(work_refs[s][...])

                def do_chunk(s=s, c=c):
                    # mins stay (1, 1)-shaped vectors end to end: a scalar
                    # jnp.min here forces a vreg->sreg->vreg round trip per
                    # round (~100 cycles each), which measured as ~2/3 of
                    # the whole extraction phase
                    w = work_refs[s][...]
                    mins = []
                    for j in range(EXT_CHUNK):
                        m = jnp.min(jnp.min(w, axis=0, keepdims=True),
                                    axis=1, keepdims=True)        # (1, 1)
                        mins.append(m)
                        # Mosaic cannot broadcast (1,1)->(K,TILE) in one
                        # step; lane-broadcast first, sublane-broadcast in
                        # the compare
                        mrow = jnp.broadcast_to(m, (1, TILE))
                        w = jnp.where(w == mrow, INT32_MAX, w)
                    work_refs[s][...] = w
                    lst_refs[s][pl.ds(c, EXT_CHUNK), :] = \
                        jnp.concatenate(mins, axis=0)

                pl.when(first != INT32_MAX)(do_chunk)
        return ([lst_refs[s][...] for s in range(n_sub)],
                [work_refs[s][...] for s in range(n_sub)])

    lst_vecs, final_works = pl.run_scoped(
        ext_body,
        work_refs=[pltpu.VMEM((k, TILE), jnp.int32) for _ in range(n_sub)],
        lst_refs=[pltpu.VMEM((nb, 1), jnp.int32) for _ in range(n_sub)])

    lsts = [[lst_vecs[s][r, 0] for r in range(nb)] for s in range(n_sub)]
    keys_out[...] = jnp.concatenate(lst_vecs, axis=0)

    n_ovf = jnp.zeros((), jnp.int32)
    uses = []
    for s in range(n_sub):
        covered = final_works[s] == INT32_MAX
        valid = bkeys[s] != INT32_MAX
        not_covered = valid & ~covered
        n_ovf += jnp.sum(not_covered.astype(jnp.int32))
        uses.append((valid & covered).astype(jnp.float32))

    if phase == "extract":                   # dev knockout (profiling only)
        psd_out[...] = jnp.zeros_like(psd_out)
        pw_out[...] = jnp.zeros_like(pw_out) + uses[0][0, 0]
        cnt = jnp.zeros((8, 128), jnp.int32)
        counts_out[...] = cnt + n_ovf * 0
        return

    # ---- ranks + SLAB-SKIPPED one-hot accumulation, with data-dependent
    # skips:
    # * a rank round whose list slot is exhausted (INT32_MAX) cannot change
    #   any rank (no valid key is >= INT32_MAX) — most tiles use ~60% of nb;
    # * a sample row with no usable samples contributes nothing — DDA tail
    #   rows are mostly dead (K covers the worst case, the mean is ~2/3);
    # * block ranks are grouped into SLAB=16-rank slabs; a slab whose first
    #   list slot is INT32_MAX (ascending list => whole slab empty) skips
    #   BOTH its one-hot build and its matmul.  The bench workload averages
    #   ~15 distinct blocks/tile (1.4 live slabs of nb=48's 3), so the
    #   scatter phase pays for observed density, not worst-case capacity.
    # Accumulator layout is slab-major so each slab owns one (128, 128) MXU
    # tile: acc[lo, s*128 + plane*64 + hi*16 + rank_in_slab].
    # pl.when bodies may only write refs, so ranks/accs live in scratch.
    SLAB = 16
    assert nb % SLAB == 0, "slab-skipped accumulate requires nb % 16 == 0"
    nslab = nb // SLAB
    rids = jax.lax.broadcasted_iota(jnp.int32, (128, TILE), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (128, TILE), 0)
    rank_hi_col = ccol & 63                      # hi*16 + rank_in_slab
    is_w_col = ccol >= 64                        # plane: rows 64.. = weight

    def acc_ref_body(lrow_refs, acc_refs):
        for s in range(n_sub):
            lrow_refs[s][...] = jnp.zeros((k, TILE), jnp.int32)
            acc_refs[s][...] = jnp.zeros((128, nslab * 128), jnp.float32)
        # rank rounds chunked under one guard each — per-round pl.when
        # regions measurably stall the vector pipeline at this granularity
        RANK_CHUNK = 8
        for c in range(0, nb, RANK_CHUNK):
            for s in range(n_sub):
                def add_ranks(s=s, c=c):
                    # NOTE: unlike the extraction rounds above, these
                    # compares use extracted scalars (lst_vecs[s][r, 0]) —
                    # the (1, 1)-slice form was tried and did not measure
                    # faster here (the guard granularity dominates)
                    acc = lrow_refs[s][...]
                    for r in range(max(c, 1), c + RANK_CHUNK):
                        acc += (bkeys[s] >= lsts[s][r]).astype(jnp.int32)
                    lrow_refs[s][...] = acc
                pl.when(lsts[s][c] != INT32_MAX)(add_ranks)
        for s in range(n_sub):
            for sl in range(nslab):
                def slab_update(s=s, sl=sl):
                    sb_ = sub[s]
                    acc = acc_refs[s][:, sl * 128:(sl + 1) * 128]
                    for r in range(k):
                        offr = okey_all[r:r + 1, sb_]
                        lrr = lrow_refs[s][r:r + 1, :]
                        sdr = sd_all[r:r + 1, sb_]
                        user = uses[s][r:r + 1]
                        # use-mask folded into the (1, C) lo row: a zero
                        # oh column kills the sample on the matmul's other
                        # side for free
                        lo = jnp.where(user > 0, offr & 127, -1)
                        hi = offr >> 7
                        oh = (lo == rids).astype(acc_dtype)    # (128, C)
                        # out-of-slab ranks must NOT alias into another hi
                        # bucket: j only indexes this slab when 0 <= j < 16
                        j = lrr - sl * SLAB
                        in_slab = (j >= 0) & (j < SLAB)
                        m = jnp.where(in_slab, hi * SLAB + j, -1)
                        ind = (rank_hi_col == m)
                        wsd = jnp.where(is_w_col, 1.0, sdr)
                        vals = (ind.astype(jnp.float32) *
                                wsd).astype(acc_dtype)         # (128, C)
                        acc = acc + jax.lax.dot_general(
                            oh, vals, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    acc_refs[s][:, sl * 128:(sl + 1) * 128] = acc
                pl.when(lsts[s][sl * SLAB] != INT32_MAX)(slab_update)
        # unscramble: acc[lo, s*128 + plane*64 + hi*16 + j] -> psd/pw row
        # (s*16 + j), column off = hi*128 + lo — one (128, 128) transpose
        # per slab, then hi chunks concatenate along lanes
        psd_parts, pw_parts = [], []
        for s in range(n_sub):
            for sl in range(nslab):
                at = acc_refs[s][:, sl * 128:(sl + 1) * 128].T  # (128, 128)
                psd_parts.append(jnp.concatenate(
                    [at[h * SLAB: (h + 1) * SLAB, :] for h in range(4)],
                    axis=1))                                    # (16, 512)
                pw_parts.append(jnp.concatenate(
                    [at[64 + h * SLAB: 64 + (h + 1) * SLAB, :]
                     for h in range(4)], axis=1))
        psd_out[...] = jnp.concatenate(psd_parts, axis=0)
        pw_out[...] = jnp.concatenate(pw_parts, axis=0)

    pl.run_scoped(
        acc_ref_body,
        lrow_refs=[pltpu.VMEM((k, TILE), jnp.int32) for _ in range(n_sub)],
        acc_refs=[pltpu.VMEM((128, nslab * 128), jnp.float32)
                  for _ in range(n_sub)])

    # counters in row 0, lanes [0..2]; 8-sublane block for TPU tiling
    cnt = jnp.zeros((8, 128), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cnt = jnp.where((row == 0) & (lane == 0), n_valid, cnt)
    cnt = jnp.where((row == 0) & (lane == 1), n_ovf, cnt)
    cnt = jnp.where((row == 0) & (lane == 2), n_samp_ovf, cnt)
    counts_out[...] = cnt


def fused_tile_partials(px, py, pz, nx, ny, nz, sb, position, origin_voxel,
                        *, nb: int, k: int, res: float, trunc: float,
                        extent: int, n_sub: int = 4,
                        interpret: bool = False, acc_dtype=None,
                        _phase: str = "full"):
    """Fused DDA + tile accumulation over Morton-sorted points.

    px..nz: f32[N] sorted coords and normals; sb: i32[N] sorted block key
    (INT32_MAX = padding); position: f32[3]; origin_voxel: i32[3]; ``n_sub``
    subtiles of TILE points are processed per grid step (interleaved
    latency-hiding — tile semantics are per-TILE regardless).

    Returns (pkeys i32[T*nb, 1], psd f32[T*nb, 512], pw f32[T*nb, 512],
    counts i32[G*8, 128]) with T = N/TILE tiles and G = T/n_sub grid steps —
    grid step g's counters live at counts[g*8, 0:3] = [n_valid, n_tile_ovf,
    n_samp_ovf]; all other entries are zero, so plain column sums aggregate.
    """
    n = px.shape[0]
    while n_sub > 1 and n % (n_sub * TILE) != 0:
        n_sub //= 2
    assert n % (n_sub * TILE) == 0, (n, n_sub, TILE)
    g = n // (n_sub * TILE)
    t = n // TILE
    if acc_dtype is None:
        # TPU ships bf16 MXU accumulation inputs; interpret (CPU test) mode
        # defaults to f32 but can force bf16 to exercise the TPU numerics
        # (tests/test_fused.py::test_bf16_acc_matches_codec_quantization)
        acc_dtype = jnp.float32 if interpret else jnp.bfloat16
    r1 = lambda a: a.reshape(1, n)
    spec = pl.BlockSpec((1, n_sub * TILE), lambda i, *_: (0, i),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[spec] * 7,
        out_specs=[
            pl.BlockSpec((n_sub * nb, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sub * nb, 512), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sub * nb, 512), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, nb, k, float(res), float(trunc),
                          int(extent), n_sub, acc_dtype, _phase),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t * nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            jax.ShapeDtypeStruct((t * nb, 512), jnp.float32),
            jax.ShapeDtypeStruct((g * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(position, origin_voxel, r1(px), r1(py), r1(pz),
      r1(nx), r1(ny), r1(nz), r1(sb))
