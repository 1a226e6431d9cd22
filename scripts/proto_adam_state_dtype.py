"""Probe: how much of the adam v3-kernel gap is state-buffer BYTES?

Round-3 question (PERF_NOTES "adam/adadelta kernel gap"): adam's merged
state rides one (n, 2d+128) f32 buffer — 45 KB/group/direction vs
adadelta's bf16 20.5 KB — and adam runs 830 us vs adadelta's 576 at the
same issue count. If that 254 us is mostly bytes, storing the second
moment in bf16 (stochastically rounded so the 0.999-decay EMA doesn't
freeze — see _ema_dtype) would buy most of it back.

This probe times the KERNEL ONLY (lax.scan over packed chunks, float()
sync; methodology per PERF_NOTES / memory) with the state buffer in f32 vs
bf16 at the Rees46 shape. bf16 numerics are garbage here (count column
freezes at 256, acc rounds deterministically) — ONLY the DMA timing is
meaningful; correctness machinery (stochastic rounding, limb-packed
counts) is built only if this says the bytes are worth it.

Usage: python scripts/proto_adam_state_dtype.py
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from gru4rec_tpu.ops.kernels.sparse_update import fused_update_v3, group_pack

N_ROWS = 200_064   # Rees46 catalog, padded
D = 640            # GRU-512 + folded bias, tile-aligned
B, NSAMP = 240, 2048
STEPS = 64
REPS = 4


def make_idx_chunk(rng, steps):
    """(steps, B+NSAMP) pop^0.5-duplicated indices, Rees46-like."""
    ranks = np.arange(1, N_ROWS - 7, dtype=np.float64)
    p = 1.0 / ranks ** 0.8
    p /= p.sum()
    n = B + NSAMP
    return rng.choice(N_ROWS - 8, size=(steps, n), p=p).astype(np.int32)


@partial(jax.jit, static_argnames=("adapt",))
def scan_kernel(adapt, table, acc, idx_c, g_c):
    def body(carry, xs):
        table, acc = carry
        idx, g = xs
        gblk, mask, gpad, nreal = group_pack(idx, g, table.shape[0],
                                             return_nreal=True)
        table, acc, _ = fused_update_v3(
            adapt, table, acc, None, gblk, mask, nreal, gpad,
            lr=0.05, momentum=0.0, lmbd=0.0, v1=0.9, v2=0.999,
            interpret=jax.default_backend() != "tpu")
        return (table, acc), jnp.float32(0)

    (table, acc), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
    return table[0, 0] + acc[0, 0].astype(jnp.float32)


def run(adapt, state_dtype):
    ds = 2 * D + 128 if adapt == "adam" else 2 * D if adapt == "adadelta" else D
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N_ROWS, D).astype(np.float32))
    acc = jnp.full((N_ROWS, ds), 0.1, dtype=state_dtype)
    idx_c = jnp.asarray(make_idx_chunk(rng, STEPS))
    g_c = jnp.asarray(rng.randn(STEPS, B + NSAMP, D).astype(np.float32) * 0.01)

    float(scan_kernel(adapt, table, acc, idx_c, g_c))  # compile + warm
    t0 = time.time()
    out = None
    for _ in range(REPS):
        out = scan_kernel(adapt, table, acc, idx_c, g_c)
    float(out)
    us = (time.time() - t0) / (REPS * STEPS) * 1e6
    print(json.dumps({"adapt": adapt, "state_dtype": str(state_dtype),
                      "state_cols": ds, "us_per_step": round(us, 1)}),
          flush=True)


if __name__ == "__main__":
    for adapt, dt in [
        ("adam", jnp.float32), ("adam", jnp.bfloat16),
        ("adadelta", jnp.float32), ("adadelta", jnp.bfloat16),
        ("rmsprop", jnp.float32), ("rmsprop", jnp.bfloat16),
    ]:
        try:
            run(adapt, dt)
        except Exception as e:
            print(json.dumps({"adapt": adapt, "state_dtype": str(dt),
                              "error": str(e)[:200]}), flush=True)
