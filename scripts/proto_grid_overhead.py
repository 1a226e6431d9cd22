"""Decompose the grouped kernel's per-grid-step cost.

Questions:
1. Is per-group cost transfer-bound (scales with d) or fixed overhead?
2. Do duplicate/dummy grid steps (same block index as previous step) cost
   less (Mosaic revisit elision)?
3. How much of the total is group_pack (packing scatter) vs the kernel grid?
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.ops.kernels.sparse_update import (fused_adagrad_update,
                                                   group_pack)

LR = 0.05


def measure(tag, n_rows, d, K, n_distinct, reps=6, steps=64, pack_only=False):
    rng = np.random.RandomState(0)
    pool = rng.choice(n_rows - 8, n_distinct, replace=False)
    idx = pool[rng.randint(0, n_distinct, (steps, K))].astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    acc = jnp.abs(jnp.asarray(rng.randn(n_rows, d).astype(np.float32)))

    @jax.jit
    def run(table, acc, idx_c, g_c):
        def body(carry, xs):
            table, acc = carry
            i, gg = xs
            gblk, mask, gpad = group_pack(i, gg, table.shape[0])
            if pack_only:
                # consume the packing outputs without the kernel
                table = table + 0.0 * gpad[:8]
                acc = acc + 0.0 * (gblk[0] + mask[0])
            else:
                table, acc, _ = fused_adagrad_update(
                    table, acc, None, gblk, mask, gpad,
                    lr=LR, momentum=0.0, lmbd=0.0)
            return (table, acc), None
        (table, acc), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
        return table[0, 0] + acc[0, 0]

    float(run(table, acc, idx_j, g_j))
    t0 = time.time()
    for _ in range(reps):
        out = run(table, acc, idx_j, g_j)
    float(out)
    us = (time.time() - t0) / (reps * steps) * 1e6
    print(json.dumps({"tag": tag, "d": d, "K": K, "distinct": n_distinct,
                      "pack_only": pack_only, "us_per_step": round(us, 1)}),
          flush=True)


if __name__ == "__main__":
    measure("base", 43136, 513, 2304, 2304)
    measure("dup400", 43136, 513, 2304, 400)
    measure("dup64", 43136, 513, 2304, 64)
    measure("narrow", 43136, 129, 2304, 2304)
    measure("tail2x", 43136, 513, 4608, 2304)
    measure("pack", 43136, 513, 2304, 2304, pack_only=True)
    measure("halfK", 43136, 513, 1152, 1152)
