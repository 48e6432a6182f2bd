"""Experiment: windowed merge kernel — dynamic grid + prefetch index maps +
aliased pool windows.  Validates correctness + measures time for a
representative workload (500 groups, ~12K live partials).

PYTHONPATH=/root/.axon_site:/root/repo python scripts/micro_merge_v2.py
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNKW = 128
CB = 1 << 18          # pool rows
P_CAP = 1 << 14       # gathered live partial rows
G_CAP = 4096          # subgroup table capacity


def _kernel(gstart_ref, gend_ref, grow_ref, first_ref, cstart_ref,
            poh0, poh1, pd0, pd1, pw0, pw1, pool_sd_in, pool_w_in,
            out_sd, out_w):
    i = pl.program_id(0)
    gstart = gstart_ref[i]
    gend = gend_ref[i]
    base = cstart_ref[i] * CHUNKW

    ridx = jax.lax.broadcasted_iota(jnp.int32, (CHUNKW, 8), 0)
    in0 = ((base + ridx >= gstart) & (base + ridx < gend))
    in1 = ((base + CHUNKW + ridx >= gstart) & (base + CHUNKW + ridx < gend))
    a0 = poh0[...] * in0.astype(jnp.float32)        # (CHUNKW, 8)
    a1 = poh1[...] * in1.astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    acc_sd = (jax.lax.dot_general(a0, pd0[...], dn,
                                  preferred_element_type=jnp.float32) +
              jax.lax.dot_general(a1, pd1[...], dn,
                                  preferred_element_type=jnp.float32))
    acc_w = (jax.lax.dot_general(a0, pw0[...], dn,
                                 preferred_element_type=jnp.float32) +
             jax.lax.dot_general(a1, pw1[...], dn,
                                 preferred_element_type=jnp.float32))

    @pl.when(first_ref[i] == 1)
    def _():
        out_sd[...] = pool_sd_in[...] + acc_sd
        out_w[...] = pool_w_in[...] + acc_w

    @pl.when(first_ref[i] == 0)
    def _():
        out_sd[...] += acc_sd
        out_w[...] += acc_w


def merge_v2(pool_sd, pool_w, n_sub, gstart, gend, grow, first, cstart,
             gsd, gw, poh, static_grid=None):
    last_chunk = P_CAP // CHUNKW - 1
    chunk0 = lambda i, gs, ge, gr, fi, cs: (cs[i], 0)
    chunk1 = lambda i, gs, ge, gr, fi, cs: (jnp.minimum(cs[i] + 1,
                                                        last_chunk), 0)
    poolmap = lambda i, gs, ge, gr, fi, cs: (gr[i], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(static_grid if static_grid is not None else n_sub,),
        in_specs=[
            pl.BlockSpec((CHUNKW, 8), chunk0, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNKW, 8), chunk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNKW, 512), chunk0, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNKW, 512), chunk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNKW, 512), chunk0, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNKW, 512), chunk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 512), poolmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 512), poolmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 512), poolmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 512), poolmap, memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_sd.shape, jnp.float32),
            jax.ShapeDtypeStruct(pool_w.shape, jnp.float32),
        ],
        # flat args: 5 scalars, poh x2, gsd x2, gw x2, pool_sd=11, pool_w=12
        input_output_aliases={11: 0, 12: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(gstart, gend, grow, first, cstart,
      poh, poh, gsd, gsd, gw, gw, pool_sd, pool_w)


merge_jit = jax.jit(merge_v2, donate_argnums=(0, 1),
                    static_argnames=("static_grid",))


def main():
    rng = np.random.default_rng(0)
    n_groups = 500
    rows_per_group = rng.integers(1, 40, n_groups)
    n_live = int(rows_per_group.sum())
    print(f"{n_groups} groups, {n_live} live rows")

    # slot-sorted stream: groups have ascending distinct grow ids
    grows = np.sort(rng.choice(CB // 8 - 1, n_groups, replace=False))
    slot_rows = []
    for g, r in zip(grows, rows_per_group):
        rows = g * 8 + np.sort(rng.integers(0, 8, r))
        slot_rows.append(rows)
    slots = np.concatenate(slot_rows).astype(np.int32)

    gsd = np.zeros((P_CAP, 512), np.float32)
    gw = np.zeros((P_CAP, 512), np.float32)
    gsd[:n_live] = rng.normal(size=(n_live, 512)).astype(np.float32)
    gw[:n_live] = rng.integers(0, 5, (n_live, 512)).astype(np.float32)

    # subgroup plan on host (numpy mirror of the jax plan)
    gkey = slots // 8
    gb = np.ones(n_live, bool)
    gb[1:] = gkey[1:] != gkey[:-1]
    start_of = np.maximum.accumulate(np.where(gb, np.arange(n_live), -1))
    off = np.arange(n_live) - start_of
    f2 = gb | (off % CHUNKW == 0)
    starts2 = np.nonzero(f2)[0]
    n_sub = len(starts2)
    ends2 = np.append(starts2[1:], n_live)
    gstart = np.zeros(G_CAP, np.int32); gstart[:n_sub] = starts2
    gend = np.zeros(G_CAP, np.int32); gend[:n_sub] = ends2
    # dummy tail entries target the reserved pool group with an empty span
    grow = np.full(G_CAP, CB // 8 - 1, np.int32); grow[:n_sub] = gkey[starts2]
    first = np.zeros(G_CAP, np.int32); first[:n_sub] = gb[starts2]
    if n_sub < G_CAP:
        first[n_sub] = 1
    cstart = np.zeros(G_CAP, np.int32); cstart[:n_sub] = starts2 // CHUNKW
    prow = np.full(P_CAP, 8, np.int32)
    prow[:n_live] = slots - gkey * 8
    poh = (prow[:, None] == np.arange(8)[None, :]).astype(np.float32)

    pool_sd = np.zeros((CB, 512), np.float32)
    pool_w = np.zeros((CB, 512), np.float32)
    pool_sd[:] = rng.normal(size=(CB, 512)).astype(np.float32) * 0.01
    ref_sd = pool_sd.copy()
    ref_w = pool_w.copy()
    for i in range(n_live):
        ref_sd[slots[i]] += gsd[i]
        ref_w[slots[i]] += gw[i]

    args = [jnp.asarray(x) for x in
            (gstart, gend, grow, first, cstart, gsd, gw, poh)]
    for sg in (None, 512, 1024, 4096):
        out_sd, out_w = merge_jit(jnp.asarray(pool_sd), jnp.asarray(pool_w),
                                  jnp.int32(n_sub), *args, static_grid=sg)
        err_sd = np.abs(np.asarray(out_sd) - ref_sd).max()
        err_w = np.abs(np.asarray(out_w) - ref_w).max()

        reps = 20
        cur_sd, cur_w = out_sd, out_w
        t0 = time.perf_counter()
        for _ in range(reps):
            cur_sd, cur_w = merge_jit(cur_sd, cur_w, jnp.int32(n_sub),
                                      *args, static_grid=sg)
        np.asarray(cur_sd[0, 0])          # true sync (axon relay)
        dt = (time.perf_counter() - t0) / reps
        print(f"merge_v2[grid={sg}]: {dt*1e3:.2f} ms per call "
              f"({n_sub} subgroups)  err sd {err_sd:.2e} w {err_w:.2e}")


if __name__ == "__main__":
    main()
