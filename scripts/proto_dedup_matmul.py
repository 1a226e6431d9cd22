"""Prototype: replace the XLA-path dedup chain with an MXU equality-matmul.

The sub-64MB shapes (RSC15/Coveo/RetailRocket — where XLA's promoted
scatters beat the grouped kernel) spend ~48-85 us/step in the dedup chain of
train/optimizers.py::dedup_rows: two-output sort (~6), take(g, order) (~20),
segment_sum (~43), uidx int scatter (~14) [flagship d=225 numbers,
PERF_NOTES.md "Where a step's time goes"]. Candidate replacement:

    uidx  = sort(idx); head-mask; second 1-D sort compacts distinct values
    g_sum = (uidx[:, None] == idx[None, :]) @ g        # one MXU matmul

The equality matrix has exactly one 1 per column (duplicate columns share a
row), so the matmul IS the segment sum — 2*K^2*d f32 FLOPs, tiny on the MXU,
and it needs neither the permutation gather nor the segment machinery. Three
variants measured:

  chain   — the shipped dedup_rows (sort+take+segment_sum+int scatter)
  mm_xla  — materialized (K, K) equality matrix + jnp.dot (control: pays
            ~K^2*4 bytes of HBM round-trip for the eq matrix)
  mm_pal  — Pallas kernel fusing the compare into the matmul tiles (the eq
            matrix never exists in memory)

Numerics: identical summand sets, different association (MXU accumulates in
f32 tree order vs segment_sum's sequential order) — allclose, not
bit-equal. Sentinel (masked-lane) handling matches dedup_rows: sentinel
rows sum masked gradients and are dropped by the scatter's mode="drop".

Run on the real TPU:  python scripts/proto_dedup_matmul.py [shape ...]
CPU correctness only: JAX_PLATFORMS=cpu python scripts/proto_dedup_matmul.py check
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.train.optimizers import dedup_rows
from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

SENTINEL = np.iinfo(np.int32).max


def _uidx_two_sorts(idx):
    """Sorted-unique compaction without the int scatter: first sort the
    keys, then sort again with duplicates replaced by the sentinel."""
    sidx = jax.lax.sort(idx.astype(jnp.int32))
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    return jax.lax.sort(jnp.where(head, sidx, SENTINEL))


def dedup_rows_mm_xla(idx, g):
    uidx = _uidx_two_sorts(idx)
    eq = (uidx[:, None] == idx[None, :]).astype(g.dtype)
    return uidx, jnp.dot(eq, g, preferred_element_type=jnp.float32)


# the SHIPPED impl (ops/kernels/dedup_matmul.py) IS the measured variant:
# benchmarking a local copy would let the product path and the A/B number
# silently drift apart. mm_xla above stays as the single-bf16-pass control
# (its timing is what an IMPRECISE dot would buy — a lower bound).
from gru4rec_tpu.ops.kernels.dedup_matmul import dedup_rows_matmul

VARIANTS = {
    "chain": dedup_rows,
    "mm_xla": dedup_rows_mm_xla,
    "mm_exact": dedup_rows_matmul,
}

# (name, n_rows, d, K, n_distinct-ish pool)
SHAPES = {
    "flagship": (36_968, 225, 2208, 20_000),
    "rsc15": (37_968, 101, 2112, 20_000),
    "coveo": (10_848, 257, 2176, 9_000),
    "yoochoose": (27_000, 481, 2144, 15_000),
    # big-K rows bound the O(K^2 d) matmul's crossover for the dispatch
    # gate (large-batch sub-64MB configs: flagship at batch 512, and a
    # worst-case wide-d synthetic)
    "flagship_b512": (36_968, 225, 3072, 20_000),
    "bigK_wide": (36_968, 513, 4224, 20_000),
}


def check():
    rng = np.random.RandomState(0)
    for K, d in ((256, 101), (2208, 225)):
        idx = rng.randint(0, 500, K).astype(np.int32)
        idx[-7:] = SENTINEL  # masked lanes
        g = rng.randn(K, d).astype(np.float32)
        u0, s0 = dedup_rows(jnp.asarray(idx), jnp.asarray(g))
        for name in ("mm_xla", "mm_exact"):
            u1, s1 = VARIANTS[name](jnp.asarray(idx), jnp.asarray(g))
            np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1),
                                          err_msg=name)
            real = np.asarray(u0) != SENTINEL
            np.testing.assert_allclose(
                np.asarray(s0)[real], np.asarray(s1)[real], rtol=2e-5,
                atol=2e-5, err_msg=name)
    print("CHECK OK: uidx bit-equal, sums allclose (reassociation only)")


def measure(shape_name, reps=6, steps=64):
    n_rows, d, K, pool_n = SHAPES[shape_name]
    rng = np.random.RandomState(0)
    pool = rng.choice(n_rows, pool_n, replace=False)
    idx = pool[rng.randint(0, pool_n, (steps, K))].astype(np.int32)
    g = (rng.randn(steps, K, d) * 0.01).astype(np.float32)
    idx_j, g_j = jnp.asarray(idx), jnp.asarray(g)
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))

    results = {}
    for name, fn in VARIANTS.items():
        # dedup + the consuming scatter-SET: what the step actually pays
        @jax.jit
        def run(table, idx_c, g_c, fn=fn):
            def body(tab, xs):
                i, gg = xs
                uidx, gs = fn(i, gg)
                tab = tab.at[uidx].set(
                    (tab.at[uidx].get(mode="fill", fill_value=0.0,
                                      indices_are_sorted=True,
                                      unique_indices=True) - 0.01 * gs
                     ).astype(tab.dtype),
                    mode="drop", indices_are_sorted=True, unique_indices=True)
                return tab, None
            tab, _ = jax.lax.scan(body, table, (idx_c, g_c))
            return tab[0, 0]

        float(run(table, idx_j, g_j))
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = run(table, idx_j, g_j)
        float(out)
        us = (time.time() - t0) / (reps * steps) * 1e6
        results[name] = round(us, 1)
        print(json.dumps({"shape": shape_name, "variant": name,
                          "us_per_step": results[name], "d": d, "K": K}))
    return results


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
