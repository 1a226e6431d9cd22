"""Measure slab-split scan carries vs whole-table scatters at mid-size shapes.

Hypothesis: XLA row scatters update in place only while the operand fits
fast memory (~33MB empirically on v5e); above that each scatter materializes
full-table copies. Carrying the table as R separate sub-cliff slab buffers
makes every slab scatter in-place at the cost of R gathers/scatters with
K descriptors each.

Measures one gather+scatter-SET round trip per step (the skeleton of a
row-sparse optimizer update), whole vs slabbed.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.train.optimizers import dedup_rows

LR = 0.05


def measure(n_rows, d, K, R, reps=6, steps=64):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n_rows, (steps, K)).astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    P = n_rows // R

    @jax.jit
    def run_whole(table, idx_c, g_c):
        def body(table, xs):
            i, gg = xs
            uidx, gs = dedup_rows(i, gg)
            rows = table.at[uidx].get(mode="fill", fill_value=0.0,
                                      indices_are_sorted=True,
                                      unique_indices=True)
            return table.at[uidx].set(rows - LR * gs, mode="drop",
                                      indices_are_sorted=True,
                                      unique_indices=True), None
        table, _ = jax.lax.scan(body, table, (idx_c, g_c))
        return table

    @jax.jit
    def run_slabs(slabs, idx_c, g_c):
        def body(slabs, xs):
            i, gg = xs
            uidx, gs = dedup_rows(i, gg)
            ar = jnp.arange(uidx.shape[0], dtype=jnp.int32)
            out = []
            for r, slab in enumerate(slabs):
                # slab r's rows occupy a contiguous ascending range of the
                # sorted uidx; roll them to the front so the localized index
                # vector stays sorted (sentinel tail), keeping the fast
                # sorted+unique scatter path
                b = jnp.searchsorted(uidx, jnp.int32(r * P))
                e = jnp.searchsorted(uidx, jnp.int32((r + 1) * P))
                u_r = jnp.where(ar < e - b,
                                jnp.roll(uidx, -b) - np.int32(r * P),
                                np.int32(2**31 - 1))
                g_r = jnp.roll(gs, -b, axis=0)
                rows = slab.at[u_r].get(mode="fill", fill_value=0.0,
                                        indices_are_sorted=True,
                                        unique_indices=True)
                out.append(slab.at[u_r].set(rows - LR * g_r, mode="drop",
                                            indices_are_sorted=True,
                                            unique_indices=True))
            return tuple(out), None
        slabs, _ = jax.lax.scan(body, slabs, (idx_c, g_c))
        return slabs

    # correctness
    w = run_whole(table, idx_j[:2], g_j[:2])
    slabs0 = tuple(table[r * P:(r + 1) * P] for r in range(R))
    s = run_slabs(slabs0, idx_j[:2], g_j[:2])
    np.testing.assert_allclose(np.asarray(jnp.concatenate(s)), np.asarray(w),
                               rtol=1e-6, atol=1e-7)

    for name, fn, arg in (("whole", run_whole, table),
                          (f"slab{R}", run_slabs, slabs0)):
        out = fn(arg, idx_j, g_j)
        jnp.stack([o[0, 0] for o in out]) if isinstance(out, tuple) else None
        float(out[0][0, 0] if isinstance(out, tuple) else out[0, 0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(arg, idx_j, g_j)
        float(out[0][0, 0] if isinstance(out, tuple) else out[0, 0])
        us = (time.time() - t0) / (reps * steps) * 1e6
        print(json.dumps({"shape": f"{n_rows}x{d}", "K": K, "variant": name,
                          "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    measure(43136, 513, 2304, 4)     # diginetica
    measure(43136, 513, 2304, 2)
    measure(37120, 481, 2144, 4)     # yoochoose
    measure(37120, 481, 2144, 2)
    measure(200064, 513, 2544, 8)    # rees46
    measure(37120, 225, 2208, 2)     # flagship (already under cliff: control)
