"""Measure v4 (compact gradients + in-kernel sublane alignment) vs v3.

v4 removes the (8K, d) gpad staging round-trip (zero + scatter + kernel
re-read ~ 8x the real gradient bytes) by feeding the kernel COMPACT deduped
gradients whose 8-row window DMA starts at a DYNAMIC UNALIGNED row, and
aligning members to table sublanes with an 8x8 one-hot matmul in-register.

Two questions this script answers on real hardware:
1. does Mosaic accept the unaligned dynamic-start (8, d) HBM->VMEM copy,
   and does the kernel still match the XLA oracle on-device?
2. full apply-path time (staging + kernel) v3 vs v4 at the Rees46 shape.

Usage: python scripts/proto_v4_kernel.py [check|measure]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from gru4rec_tpu.ops.kernels.sparse_update import (
    fused_update_v3, fused_update_v4, group_pack, group_pack_compact)


def make_idx(rng, n_rows, K, steps):
    ranks = np.arange(1, n_rows - 63, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    q = p**0.5
    q /= q.sum()
    return np.stack([
        np.concatenate([
            rng.randint(0, n_rows - 64, K - 2048),
            rng.choice(n_rows - 64, 2048, p=q),
        ]).astype(np.int32)
        for _ in range(steps)
    ])


def check(adapt="rmsprop", n_rows=512, d=128, K=96):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, n_rows - 8, K).astype(np.int32)
    idx[5] = idx[3]
    idx[-4:] = np.iinfo(np.int32).max
    g = (rng.randn(K, d) * 0.01).astype(np.float32)
    table = rng.randn(n_rows, d).astype(np.float32)
    ds = 2 * d + 128 if adapt == "adam" else d
    acc = np.abs(rng.randn(n_rows, ds)).astype(np.float32) * 0.1
    if adapt == "adam":
        acc[:, 2 * d:] = 0.0  # integral step counts
    kw = dict(lr=0.05, momentum=0.0, lmbd=0.0, v1=0.9, v2=0.999)

    gblk, mask, gpad, nreal = group_pack(
        jnp.asarray(idx), jnp.asarray(g), n_rows, return_nreal=True)
    t3, a3, _ = fused_update_v3(adapt, jnp.asarray(table), jnp.asarray(acc),
                                None, gblk, mask, nreal, gpad, **kw)
    gblk4, mask4, gstart, nreal4, gcomp = group_pack_compact(
        jnp.asarray(idx), jnp.asarray(g), n_rows)
    t4, a4, _ = fused_update_v4(adapt, jnp.asarray(table), jnp.asarray(acc),
                                None, gblk4, mask4, gstart, nreal4, gcomp,
                                **kw)
    dt = float(jnp.max(jnp.abs(t4 - t3)))
    da = float(jnp.max(jnp.abs(a4 - a3)))
    print(f"check {adapt}: max|dT|={dt:.3e} max|dAcc|={da:.3e}")
    assert dt < 1e-6 and da < 1e-6, "v4 != v3 on device"


def measure(adapt, n_rows=200_064, d=640, K=2528, steps=16, reps=6):
    rng = np.random.RandomState(0)
    idxs = jnp.asarray(make_idx(rng, n_rows, K, steps))
    gs = jnp.asarray((rng.randn(K, d) * 1e-3).astype(np.float32))
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    if adapt == "adam":
        st = jnp.concatenate([
            jnp.abs(jnp.asarray(rng.randn(n_rows, 2 * d).astype(np.float32)))
            * 0.01,
            jnp.zeros((n_rows, 128), jnp.float32),
        ], axis=1)
    else:
        st = jnp.abs(jnp.asarray(
            rng.randn(n_rows, d).astype(np.float32))) * 0.01
    kw = dict(lr=0.05, momentum=0.0, lmbd=0.0, v1=0.9, v2=0.999)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_v3(table, st, idxs):
        def body(carry, i):
            table, st = carry
            gblk, mask, gpad, nreal = group_pack(i, gs, n_rows,
                                                 return_nreal=True)
            t, a, _ = fused_update_v3(adapt, table, st, None, gblk, mask,
                                      nreal, gpad, **kw)
            return (t, a), 0.0
        (t, a), _ = jax.lax.scan(body, (table, st), idxs)
        return t, a, t[0, 0] + a[0, 0]

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_v4(table, st, idxs):
        def body(carry, i):
            table, st = carry
            gblk, mask, gstart, nreal, gcomp = group_pack_compact(i, gs,
                                                                  n_rows)
            t, a, _ = fused_update_v4(adapt, table, st, None, gblk, mask,
                                      gstart, nreal, gcomp, **kw)
            return (t, a), 0.0
        (t, a), _ = jax.lax.scan(body, (table, st), idxs)
        return t, a, t[0, 0] + a[0, 0]

    table_h, st_h = np.asarray(table), np.asarray(st)
    for name, fn in (("v3", run_v3), ("v4", run_v4)):
        # upload once; outputs feed back as donated inputs so every rep is
        # in-place on device (no tunnel transfers inside the timed region)
        t, s_ = jnp.asarray(table_h), jnp.asarray(st_h)
        t, s_, scal = fn(t, s_, idxs)  # compile + warm
        float(scal)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            t, s_, scal = fn(t, s_, idxs)
            float(scal)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"{adapt} {name}: {best*1e6:.0f} us/step (apply path only)", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "check"
    if what == "check":
        check("rmsprop")
        check("adam")
    else:
        for adapt in ("rmsprop", "adam", "adagrad"):
            measure(adapt)
