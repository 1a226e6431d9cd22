"""Verify that table WIDTH beyond the 128-lane tile boundary is already paid
for physically: scatter/gather cost on (n, 513) vs (n, 640) vs (n, 512)
tables. If 513 ~ 640 >> 512, logical column padding to the tile multiple is
free and the 513-wide layout is already wasting ~20% of every table pass.
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


def measure(n_rows, d, K, reps=6, steps=64):
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, n_rows, (steps, K)).astype(np.int32))
    g = jnp.asarray((rng.randn(steps, K, d) * 0.01).astype(np.float32))
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))

    @jax.jit
    def run(table, idx_c, g_c):
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

    out = run(table, idx, g)
    float(out[0, 0])
    t0 = time.time()
    for _ in range(reps):
        out = run(table, idx, g)
    float(out[0, 0])
    us = (time.time() - t0) / (reps * steps) * 1e6
    print(json.dumps({"shape": f"{n_rows}x{d}", "K": K,
                      "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    measure(43136, 512, 2304)
    measure(43136, 513, 2304)
    measure(43136, 640, 2304)
    measure(200064, 512, 2528)
    measure(200064, 513, 2528)
    measure(200064, 640, 2528)
