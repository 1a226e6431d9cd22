"""Prototype: merged [table|acc] (n, 2d) group-blocked adagrad kernel.

Hypothesis: the grouped kernel's per-step cost is DMA-ISSUE bound (~40ns per
block DMA on the serial scalar core; 7 DMAs/group for separate table/acc/vel
buffers). Merging table+acc columns into one (n, 2d) buffer cuts a
no-momentum adagrad group to 3 DMAs (in [t|a], in g, out [t|a]) — expect
~2x on the kernel portion. Measured inside lax.scan per the measurement
rules (PERF_NOTES / memory).
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.ops.kernels.sparse_update import (EPSILON,
                                                   fused_adagrad_update,
                                                   group_pack)

LR = 0.05


@partial(jax.jit, static_argnames=("interpret",))
def merged_adagrad(merged, gblk, mask, gpad, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d2 = merged.shape
    d = d2 // 2
    K = gblk.shape[0]

    def blk_map(j, gblk_ref, mask_ref):
        return (gblk_ref[j], 0)

    def g_map(j, gblk_ref, mask_ref):
        return (j, 0)

    def kernel(gblk_ref, mask_ref, m_ref, g_ref, mo_ref):
        g = g_ref[...]
        t = m_ref[:, :d]
        acc_new = m_ref[:, d:] + g * g
        gs = g / jnp.sqrt(acc_new + EPSILON)
        mo_ref[:, :d] = t - LR * gs
        mo_ref[:, d:] = acc_new

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(K,),
        in_specs=[pl.BlockSpec((8, d2), blk_map), pl.BlockSpec((8, d), g_map)],
        out_specs=[pl.BlockSpec((8, d2), blk_map)],
    )
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(merged.shape, merged.dtype)],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(gblk, mask, merged, gpad)
    return out


def measure(n_rows, d, K, reps=6, steps=64):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n_rows - 8, (steps, K)).astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)

    # --- current kernel: separate table / acc ---
    @jax.jit
    def run_separate(table, acc, idx_c, g_c):
        def body(carry, xs):
            table, acc = carry
            i, gg = xs
            gblk, mask, gpad = group_pack(i, gg, table.shape[0])
            t, a, _ = fused_adagrad_update(table, acc, None, gblk, mask, gpad,
                                           lr=LR, momentum=0.0, lmbd=0.0)
            return (t, a), None
        (table, acc), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
        return table[0, 0] + acc[0, 0]

    # --- merged buffer ---
    @jax.jit
    def run_merged(merged, idx_c, g_c):
        def body(merged, xs):
            i, gg = xs
            gblk, mask, gpad = group_pack(i, gg, merged.shape[0])
            return merged_adagrad(merged, gblk, mask, gpad), None
        merged, _ = jax.lax.scan(body, merged, (idx_c, g_c))
        return merged[0, 0]

    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    acc = jnp.abs(jnp.asarray(rng.randn(n_rows, d).astype(np.float32)))
    merged = jnp.concatenate([table, acc], axis=1)

    # correctness check (one step)
    gblk, mask, gpad = group_pack(idx_j[0], g_j[0], n_rows)
    t1, a1, _ = fused_adagrad_update(table, acc, None, gblk, mask, gpad,
                                     lr=LR, momentum=0.0, lmbd=0.0)
    m1 = merged_adagrad(merged, gblk, mask, gpad)
    np.testing.assert_allclose(np.asarray(m1[:, :d]), np.asarray(t1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m1[:, d:]), np.asarray(a1),
                               rtol=1e-6, atol=1e-7)

    for name, fn, args in (("separate", run_separate, (table, acc, idx_j, g_j)),
                           ("merged", run_merged, (merged, idx_j, g_j))):
        float(fn(*args))  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        float(out)
        us = (time.time() - t0) / (reps * steps) * 1e6
        print(json.dumps({"shape": f"{n_rows}x{d}", "K": K, "variant": name,
                          "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    measure(43136, 513, 2304)    # diginetica
    measure(200064, 513, 2544)   # rees46 (b240: K = 240+240+2048... close enough)
    measure(37120, 481, 2144)    # yoochoose
    measure(37120, 225, 2208)    # retailrocket flagship
