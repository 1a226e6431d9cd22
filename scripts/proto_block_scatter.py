"""Prototype: 8-row-block gather/scatter for the sparse update (XLA only).

Profile insight (scripts/profile_shape.py, rsc15/yoochoose round 4): the
XLA path's per-buffer scatter-SET runs at ~56 GB/s effective because every
single-row update read-modify-writes its whole (8, 128) f32 tile — an 8x
(read+write) amplification. The kernel path (v3) pays the same tile
granularity through its 8-row group DMAs.

Candidate: keep the tables 2-D, but do the update through a 3-D view —
``table.reshape(n//8, 8, d)`` is a FREE relayout on TPU (splitting the
sublane-adjacent factor of the row dim matches the (8, 128) tiling), and
on that view a gather/scatter along axis 0 moves whole (8, d) groups:

* gather reads each touched tile exactly once (aligned, no waste);
* scatter writes complete (1, 8, d) windows — full minor dims, so XLA can
  emit a pure write (no read-modify-write pass);
* the update applies elementwise on the gathered blocks, with
  ``group_pack``'s existing mask keeping untouched sublanes bit-identical
  (decay-style optimizers must not touch rows that merely share a group).

The gradient blocks come from the existing ``group_pack`` (gblk/mask/gpad
— the same staging the Pallas kernels consume), so this measures ONLY the
scatter-granularity question. Variants, each timed as dedup/pack + update
round trip on (table f32, acc f32) like a real adagrad step:

  rowwise — the shipped XLA path: dedup_rows + per-row gather/scatter x2
  block   — group_pack + 3-D-view block gather/update/scatter x2

Run on the real TPU:  python scripts/proto_block_scatter.py [shape ...]
CPU correctness only: JAX_PLATFORMS=cpu python scripts/proto_block_scatter.py check
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.ops.kernels.sparse_update import group_pack
from gru4rec_tpu.train.optimizers import dedup_rows
from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

SENTINEL = np.iinfo(np.int32).max
LR = 0.05

# (name, n_rows, d, K, touched-pool size) — n_rows % 8 == 0, last group spare
SHAPES = {
    "rsc15": (37_000 // 8 * 8 + 8, 128, 2112, 20_000),
    "flagship": (36_968, 225 // 128 * 128 + 128, 2208, 20_000),
    "diginetica": (43_008, 512, 2176, 20_000),
    "yoochoose": (37_000 // 8 * 8 + 8, 512, 2144, 15_000),
    "rees46": (200_064, 512, 2288, 60_000),
}


def step_rowwise(table, acc, idx, g):
    uidx, gs = dedup_rows(idx, g)
    a = acc.at[uidx].get(mode="fill", fill_value=1.0,
                         indices_are_sorted=True, unique_indices=True)
    a = a + gs * gs
    t = table.at[uidx].get(mode="fill", fill_value=0.0,
                           indices_are_sorted=True, unique_indices=True)
    t = t - LR * gs * jax.lax.rsqrt(a + 1e-6)
    acc = acc.at[uidx].set(a, mode="drop", indices_are_sorted=True,
                           unique_indices=True)
    table = table.at[uidx].set(t, mode="drop", indices_are_sorted=True,
                               unique_indices=True)
    return table, acc


def step_block(table, acc, idx, g):
    n, d = table.shape
    K = idx.shape[0]
    gblk, mask, gpad, nreal = group_pack(idx, g, n, return_nreal=True)
    gb = gpad.reshape(K, 8, d)
    # real grid slots are [0, nreal); pad slots point at the dummy group —
    # push them out of bounds so gather fills zeros and scatter drops them
    # (keeps gather/scatter indices unique, which duplicate dummies are not)
    real = jnp.arange(K, dtype=jnp.int32) < nreal[0]
    safe = jnp.where(real, gblk, jnp.int32(n // 8))  # first OOB group id
    t3 = table.reshape(n // 8, 8, d)
    a3 = acc.reshape(n // 8, 8, d)
    tb = t3.at[safe].get(mode="fill", fill_value=0.0,
                         indices_are_sorted=True, unique_indices=True)
    ab = a3.at[safe].get(mode="fill", fill_value=1.0,
                         indices_are_sorted=True, unique_indices=True)
    sub = (mask[:, None] >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1
    m = (sub > 0)[:, :, None]
    ab_new = jnp.where(m, ab + gb * gb, ab)
    tb_new = jnp.where(m, tb - LR * gb * jax.lax.rsqrt(ab_new + 1e-6), tb)
    a3 = a3.at[safe].set(ab_new, mode="drop", indices_are_sorted=True,
                         unique_indices=True)
    t3 = t3.at[safe].set(tb_new, mode="drop", indices_are_sorted=True,
                         unique_indices=True)
    return t3.reshape(n, d), a3.reshape(n, d)


VARIANTS = {"rowwise": step_rowwise, "block": step_block}


def check():
    rng = np.random.RandomState(0)
    for K, d, n in ((256, 128, 4096), (2112, 128, 37_008)):
        idx = rng.randint(0, n - 8, K).astype(np.int32)  # keep spare group free
        idx[-7:] = SENTINEL
        g = rng.randn(K, d).astype(np.float32)
        table = rng.randn(n, d).astype(np.float32)
        acc = np.abs(rng.randn(n, d)).astype(np.float32) + 0.5
        outs = {}
        for name, fn in VARIANTS.items():
            outs[name] = jax.jit(fn)(jnp.asarray(table), jnp.asarray(acc),
                                     jnp.asarray(idx), jnp.asarray(g))
        for i, what in enumerate(("table", "acc")):
            np.testing.assert_allclose(
                np.asarray(outs["rowwise"][i]), np.asarray(outs["block"][i]),
                rtol=2e-5, atol=2e-5, err_msg=what)
    print("CHECK OK: block update matches rowwise (reassociation tolerance)")


def measure(shape_name, reps=6, steps=64):
    n, d, K, pool_n = SHAPES[shape_name]
    rng = np.random.RandomState(0)
    pool = rng.choice(n - 16, pool_n, replace=False)
    idx = pool[rng.randint(0, pool_n, (steps, K))].astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)
    table = jnp.asarray(rng.randn(n, d).astype(np.float32))
    acc = jnp.asarray(np.abs(rng.randn(n, d)).astype(np.float32) + 0.5)

    for name, fn in VARIANTS.items():
        @jax.jit
        def run(table, acc, idx_c, g_c, fn=fn):
            def body(carry, xs):
                t, a = carry
                i, gg = xs
                return fn(t, a, i, gg), None
            (t, a), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
            return t[0, 0] + a[0, 0]

        float(run(table, acc, idx_j, g_j))
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = run(table, acc, idx_j, g_j)
        float(out)
        us = (time.time() - t0) / (reps * steps) * 1e6
        print(json.dumps({"shape": shape_name, "variant": name,
                          "us_per_step": round(us, 1), "d": d, "K": K,
                          "n": n}), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["check"]
    if args == ["check"]:
        check()
    else:
        for s in args:
            if s == "all":
                for name in SHAPES:
                    measure(name)
            else:
                measure(s)
