"""Prototype measurement: XLA-side gradient staging for the fused kernel.

The v3 kernel consumes ``gpad`` — a group-aligned (8K, d) buffer built by
group_pack (zero-init + scatter-add). The candidate v4 design instead feeds
the kernel COMPACT deduped gradients (dedup_rows: sort + segment_sum, (K, d))
plus per-group start offsets, aligning rows to sublanes IN-kernel with an
(8,8) permutation matmul on the MXU. This script measures the two staging
pipelines alone (inside lax.scan, real TPU) so the kernel rework only
proceeds if the staging savings are real.

Usage: python scripts/proto_v4_staging.py [K d]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gru4rec_tpu.ops.kernels.sparse_update import group_pack
from gru4rec_tpu.train.optimizers import dedup_rows


def main(K=2528, d=640, n_rows=200_064, iters=16, reps=8):
    rng = np.random.RandomState(0)
    ranks = np.arange(1, n_rows + 1, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    q = p**0.5
    q /= q.sum()
    idxs = np.stack([
        np.concatenate([
            rng.randint(0, n_rows - 64, K - 2048),
            rng.choice(n_rows - 64, 2048, p=q),
        ]).astype(np.int32)
        for _ in range(iters)
    ])
    g = jnp.asarray(rng.randn(K, d).astype(np.float32) * 1e-3)
    idxs = jnp.asarray(idxs)

    @jax.jit
    def run_group_pack(idxs):
        def body(acc, idx):
            gblk, mask, gpad, nreal = group_pack(idx, g, n_rows,
                                                 return_nreal=True)
            # consume everything so nothing is dead-code eliminated
            return acc + gpad[0, 0] + gblk[0] + mask[0] + nreal[0], 0.0
        acc, _ = jax.lax.scan(body, 0.0, idxs)
        return acc

    @jax.jit
    def run_dedup_compact(idxs):
        sentinel = jnp.int32(np.iinfo(np.int32).max)
        dummy_blk = n_rows // 8 - 1
        def body(acc, idx):
            uidx, gsum = dedup_rows(idx, g)
            valid = uidx < n_rows
            gid = jnp.where(valid, uidx >> 3, sentinel)
            ghead = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
            gslot = jnp.cumsum(ghead.astype(jnp.int32)) - 1
            gblk = jnp.full((K,), -1, jnp.int32).at[gslot].max(
                jnp.where(valid, gid, -1))
            gblk = jnp.where(gblk < 0, dummy_blk, gblk)
            sub = (uidx & 7).astype(jnp.int32)
            bits = jnp.where(valid, jnp.int32(1) << sub, 0)
            mask = jnp.zeros((K,), jnp.int32).at[gslot].add(bits)
            rank = jnp.arange(K, dtype=jnp.int32)
            gstart = jnp.full((K,), K, jnp.int32).at[gslot].min(
                jnp.where(valid, rank, K))
            nreal = jnp.sum(ghead & valid).astype(jnp.int32)
            return acc + gsum[0, 0] + gblk[0] + mask[0] + gstart[0] + nreal, 0.0
        acc, _ = jax.lax.scan(body, 0.0, idxs)
        return acc

    for name, fn in (("group_pack(gpad)", run_group_pack),
                     ("dedup+compact(v4)", run_dedup_compact)):
        acc = fn(idxs); float(acc)
        t0 = time.time()
        for _ in range(reps):
            acc = fn(idxs)
        float(acc)
        us = (time.time() - t0) / (reps * iters) * 1e6
        print(f"{name}: {us:.0f} us/step  (K={K}, d={d})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
