"""Probe XLA's scatter copy-on-write at mid-size table shapes.

Profile insight (scripts/profile_shape.py, Diginetica): the per-step scatter
cost is bimodal — the buffer XLA promotes to fast memory (S(1)) scatters at
full bandwidth, the HBM-resident tables pay a full-table copy-on-write pass
at ~1/3 bandwidth. Probes: (a) optimization_barrier to make the scatter the
sole consumer of the table value, (b) three tables like the real optimizer
step (table f32 + acc f32 + vel bf16) to reproduce the bimodality, (c) the
xla_tpu_scoped_vmem_limit_kib flag.
"""

import json
import os
import sys
import time

import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "vmem":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_tpu_scoped_vmem_limit_kib=98304")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.train.optimizers import dedup_rows

LR = 0.05


def measure(tag, n_rows, d, K, barrier=False, three=False, reps=6, steps=64):
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, n_rows, (steps, K)).astype(np.int32))
    g = jnp.asarray((rng.randn(steps, K, d) * 0.01).astype(np.float32))
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    acc = jnp.abs(jnp.asarray(rng.randn(n_rows, d).astype(np.float32)))
    vel = jnp.zeros((n_rows, d), jnp.bfloat16)

    def rt(t, uidx, gs):
        rows = t.at[uidx].get(mode="fill", fill_value=0.0,
                              indices_are_sorted=True, unique_indices=True)
        if barrier:
            t = jax.lax.optimization_barrier(t)
        return t.at[uidx].set((rows - LR * gs).astype(t.dtype), mode="drop",
                              indices_are_sorted=True, unique_indices=True)

    @jax.jit
    def run(carry, idx_c, g_c):
        def body(carry, xs):
            i, gg = xs
            uidx, gs = dedup_rows(i, gg)
            if three:
                t, a, v = carry
                return (rt(t, uidx, gs), rt(a, uidx, gs), rt(v, uidx, gs)), None
            return rt(carry, uidx, gs), None
        carry, _ = jax.lax.scan(body, carry, (idx_c, g_c))
        return carry

    carry0 = (table, acc, vel) if three else table
    out = run(carry0, idx, g)
    float((out[0] if three else out)[0, 0])
    t0 = time.time()
    for _ in range(reps):
        out = run(carry0, idx, g)
    float((out[0] if three else out)[0, 0])
    us = (time.time() - t0) / (reps * steps) * 1e6
    print(json.dumps({"tag": tag, "shape": f"{n_rows}x{d}", "K": K,
                      "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    measure("one", 43136, 513, 2304)
    measure("one+barrier", 43136, 513, 2304, barrier=True)
    measure("three", 43136, 513, 2304, three=True)
    measure("three+barrier", 43136, 513, 2304, three=True, barrier=True)
