"""Prototype v3 sparse-update kernel: manual DMA pipeline, dynamic length.

v2 (group-blocked grid) pays ~0.35-0.44 us for EVERY grid step, including
the padded dummy steps that duplicate-heavy index sets produce (grid length
is the static occurrence count K, while distinct touched groups are often
30-45% fewer under pop^alpha sampling). v3 runs ONE kernel invocation that
fori-loops over only the real groups (dynamic bound from scalar prefetch)
with a depth-D software pipeline of manual HBM<->VMEM async copies.

Measures adagrad (no momentum/L2) at published shapes vs the v2 kernel.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gru4rec_tpu.ops.kernels.sparse_update import (EPSILON,
                                                   fused_adagrad_update,
                                                   group_pack)

LR = 0.05
DEPTH = 4


def group_pack_v3(idx, g, n_rows):
    """group_pack + the number of real (non-dummy) groups."""
    K = idx.shape[0]
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    ar = jnp.arange(K, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx.astype(jnp.int32), ar), num_keys=1)
    sg = jnp.take(g, order, axis=0)
    valid = sidx < n_rows
    gid = jnp.where(valid, sidx >> 3, sentinel)
    ghead = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
    gslot = jnp.cumsum(ghead.astype(jnp.int32)) - 1
    dummy_blk = n_rows // 8 - 1
    gblk = jnp.full((K,), -1, jnp.int32)
    gblk = gblk.at[gslot].max(jnp.where(valid, gid, -1))
    gblk = jnp.where(gblk < 0, dummy_blk, gblk)
    sub = (sidx & 7).astype(jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    bits = jnp.where(valid & head, jnp.int32(1) << sub, 0)
    mask = jnp.zeros((K,), jnp.int32).at[gslot].add(bits)
    slot = jnp.where(valid, 8 * gslot + sub, 8 * K)
    gpad = jnp.zeros((8 * K, g.shape[-1]), g.dtype).at[slot].add(
        sg, mode="drop", indices_are_sorted=True)
    nreal = jnp.sum(ghead & valid).astype(jnp.int32).reshape((1,))
    return gblk, mask, nreal, gpad


@functools.partial(jax.jit, static_argnames=("interpret",))
def v3_adagrad(table, acc, gblk, mask, nreal, gpad, interpret=False):
    n_rows, d = table.shape
    K = gblk.shape[0]

    def kernel(gblk_ref, mask_ref, nreal_ref, t_hbm, a_hbm, g_hbm,
               to_hbm, ao_hbm,
               tbuf, abuf, gbuf, in_sems, out_sems):
        n = nreal_ref[0]

        def start_in(j):
            slot = jax.lax.rem(j, DEPTH)
            blk = gblk_ref[j]
            pltpu.make_async_copy(
                t_hbm.at[pl.ds(blk * 8, 8), :], tbuf.at[slot],
                in_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(blk * 8, 8), :], abuf.at[slot, 0],
                in_sems.at[slot, 1]).start()
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(j * 8, 8), :], gbuf.at[slot],
                in_sems.at[slot, 2]).start()

        # prologue: fill the pipeline
        def pro(p, _):
            @pl.when(p < n)
            def _():
                start_in(p)
            return 0

        jax.lax.fori_loop(0, DEPTH, pro, 0)

        def body(j, _):
            slot = jax.lax.rem(j, DEPTH)
            blk = gblk_ref[j]
            # wait current group's inputs
            pltpu.make_async_copy(t_hbm.at[pl.ds(blk * 8, 8), :],
                                  tbuf.at[slot], in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(a_hbm.at[pl.ds(blk * 8, 8), :],
                                  abuf.at[slot, 0], in_sems.at[slot, 1]).wait()
            pltpu.make_async_copy(g_hbm.at[pl.ds(j * 8, 8), :],
                                  gbuf.at[slot], in_sems.at[slot, 2]).wait()
            # ensure the out slot from D iterations ago has drained
            @pl.when(j >= DEPTH)
            def _():
                pj = j - DEPTH
                pblk = gblk_ref[pj]
                ps = jax.lax.rem(pj, DEPTH)
                pltpu.make_async_copy(tbuf.at[ps], to_hbm.at[pl.ds(pblk * 8, 8), :],
                                      out_sems.at[ps, 0]).wait()
                pltpu.make_async_copy(abuf.at[ps, 1], ao_hbm.at[pl.ds(pblk * 8, 8), :],
                                      out_sems.at[ps, 1]).wait()

            g = gbuf[slot]
            acc_new = abuf[slot, 0] + g * g
            gs = g / jnp.sqrt(acc_new + EPSILON)
            tbuf[slot] = tbuf[slot] - LR * gs   # in-place: out copy reads this
            abuf[slot, 1] = acc_new
            pltpu.make_async_copy(tbuf.at[slot], to_hbm.at[pl.ds(blk * 8, 8), :],
                                  out_sems.at[slot, 0]).start()
            pltpu.make_async_copy(abuf.at[slot, 1], ao_hbm.at[pl.ds(blk * 8, 8), :],
                                  out_sems.at[slot, 1]).start()
            # refill the in-slot for group j + DEPTH
            @pl.when(j + DEPTH < n)
            def _():
                start_in(j + DEPTH)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

        # epilogue: drain outstanding out-DMAs
        def epi(p, _):
            j = n - DEPTH + p
            @pl.when(j >= 0)
            def _():
                blk = gblk_ref[j]
                s = jax.lax.rem(j, DEPTH)
                pltpu.make_async_copy(tbuf.at[s], to_hbm.at[pl.ds(blk * 8, 8), :],
                                      out_sems.at[s, 0]).wait()
                pltpu.make_async_copy(abuf.at[s, 1], ao_hbm.at[pl.ds(blk * 8, 8), :],
                                      out_sems.at[s, 1]).wait()
            return 0

        jax.lax.fori_loop(0, DEPTH, epi, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # table
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc
            pl.BlockSpec(memory_space=pltpu.ANY),  # gpad
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 8, d), jnp.float32),      # tbuf (in+out in place)
            pltpu.VMEM((DEPTH, 2, 8, d), jnp.float32),   # abuf in/out
            pltpu.VMEM((DEPTH, 8, d), jnp.float32),      # gbuf
            pltpu.SemaphoreType.DMA((DEPTH, 3)),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
        ],
    )
    t_out, a_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(table.shape, table.dtype),
                   jax.ShapeDtypeStruct(acc.shape, acc.dtype)],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(gblk, mask, nreal, table, acc, gpad)
    return t_out, a_out


def measure(name, n_rows, d, K, n_pool, reps=6, steps=64):
    rng = np.random.RandomState(0)
    pool = rng.choice(n_rows - 8, n_pool, replace=False)
    idx = pool[rng.randint(0, n_pool, (steps, K))].astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    acc = jnp.abs(jnp.asarray(rng.randn(n_rows, d).astype(np.float32))) + 0.1

    @jax.jit
    def run_v2(table, acc, idx_c, g_c):
        def body(carry, xs):
            table, acc = carry
            i, gg = xs
            gblk, mask, gpad = group_pack(i, gg, table.shape[0])
            t, a, _ = fused_adagrad_update(table, acc, None, gblk, mask, gpad,
                                           lr=LR, momentum=0.0, lmbd=0.0)
            return (t, a), None
        (table, acc), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
        return table, acc

    @jax.jit
    def run_v3(table, acc, idx_c, g_c):
        def body(carry, xs):
            table, acc = carry
            i, gg = xs
            gblk, mask, nreal, gpad = group_pack_v3(i, gg, table.shape[0])
            return v3_adagrad(table, acc, gblk, mask, nreal, gpad), None
        (table, acc), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
        return table, acc

    # correctness vs v2 (2 steps)
    t2, a2 = run_v2(table, acc, idx_j[:2], g_j[:2])
    t3, a3 = run_v3(table, acc, idx_j[:2], g_j[:2])
    np.testing.assert_allclose(np.asarray(t3), np.asarray(t2), rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a2), rtol=1e-6,
                               atol=1e-7)

    for tag, fn in (("v2", run_v2), ("v3", run_v3)):
        out = fn(table, acc, idx_j, g_j)
        float(out[0][0, 0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(table, acc, idx_j, g_j)
        float(out[0][0, 0])
        us = (time.time() - t0) / (reps * steps) * 1e6
        print(json.dumps({"shape": name, "K": K, "pool": n_pool,
                          "variant": tag, "us_per_step": round(us, 1)}),
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "interp":
        # CPU correctness only
        rng = np.random.RandomState(0)
        n_rows, d, K = 64, 16, 24
        idx = rng.randint(0, n_rows - 8, K).astype(np.int32)
        idx[5] = idx[3]; idx[-4:] = np.iinfo(np.int32).max
        g = (rng.randn(K, d) * 0.1).astype(np.float32)
        table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
        acc = jnp.abs(jnp.asarray(rng.randn(n_rows, d).astype(np.float32)))
        gblk, mask, gpad = group_pack(jnp.asarray(idx), jnp.asarray(g), n_rows)
        t2, a2, _ = fused_adagrad_update(table, acc, None, gblk, mask, gpad,
                                         lr=LR, momentum=0.0, lmbd=0.0,
                                         interpret=True)
        gblk, mask, nreal, gpad = group_pack_v3(jnp.asarray(idx),
                                                jnp.asarray(g), n_rows)
        t3, a3 = v3_adagrad(table, acc, gblk, mask, nreal, gpad, interpret=True)
        np.testing.assert_allclose(np.asarray(t3), np.asarray(t2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a2), rtol=1e-6)
        print("interpret-mode correctness OK")
    else:
        # pop^alpha-like duplication: pool sizes chosen to mimic distinct-row
        # counts at each shape
        measure("rees46", 200064, 513, 2528, 1500)
        measure("diginetica", 43136, 513, 2304, 1800)
        measure("yoochoose", 37120, 481, 2144, 1700)
        measure("uniform-distinct", 200064, 513, 2528, 2500)
