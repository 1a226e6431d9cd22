"""Sortless (counting) group_pack prototype — attack the staging sort.

Round-5 staging isolation (PERF_NOTES "group_pack staging cost") measured
the (K,)-key `lax.sort` at 227.9 us (yoochoose, K=2144) / 163.8 us
(rees46, K=2528) — over HALF of the kernel-path update at yoochoose. But
every group_pack output except the gradient payload depends only on WHICH
rows are touched, not on a sorted order:

  * per-row presence flags are one K-scatter into (n_rows,) bool;
  * the per-group member bitmask is a free (n_groups, 8) reshape of those
    flags times a power-of-two vector;
  * group slots are a cumsum over the (n_groups,) flagged vector —
    n_rows/8 elements (4.6k at yoochoose), not an O(K log K) sort;
  * gpad packing scatter-adds occurrences at 8*g_rank[idx>>3] + (idx&7) —
    duplicates still sum, in the same ascending-occurrence order a stable
    sort would give (XLA applies scatter updates in update order).

This probe checks bit-equality of (gblk, mask, gpad, nreal) against the
shipped group_pack on adversarial cases (duplicates, sentinels, dummy-group
padding) and times staging-only and staging+v3-kernel at the kernel-path
shapes.

Usage: python scripts/proto_sortless_pack.py [shape ...]   (on the TPU)
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from gru4rec_tpu.ops.kernels.sparse_update import fused_update_v3, group_pack

LR = 0.05

SHAPES = {
    "yoochoose": (37_120, 512, 2144, 1700),
    "rees46": (200_064, 640, 2528, 1500),
    "diginetica": (43_136, 512, 2256, 1800),
}


def group_pack_sortless(idx, g, n_rows):
    """Counting-based group_pack: same outputs, no comparison sort."""
    K = idx.shape[0]
    d = g.shape[-1]
    n_groups = n_rows // 8
    dummy_blk = n_groups - 1
    idx = idx.astype(jnp.int32)
    valid = idx < n_rows
    rid = jnp.where(valid, idx, n_rows)  # OOB -> dropped by mode="drop"

    rflags = jnp.zeros((n_rows,), bool).at[rid].set(True, mode="drop")
    bits8 = rflags.reshape(n_groups, 8).astype(jnp.int32)
    gmask_full = (bits8 * (jnp.int32(1) << jnp.arange(8, dtype=jnp.int32))).sum(
        axis=1, dtype=jnp.int32)
    gflags = gmask_full != 0
    g_rank = jnp.cumsum(gflags.astype(jnp.int32)) - 1
    nreal = gflags.sum(dtype=jnp.int32).reshape((1,))

    tgt = jnp.where(gflags, g_rank, K)  # (n_groups,) scatter into (K,)
    gblk = jnp.full((K,), dummy_blk, jnp.int32).at[tgt].set(
        jnp.arange(n_groups, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    mask = jnp.zeros((K,), jnp.int32).at[tgt].set(
        gmask_full, mode="drop", unique_indices=True)

    gslot_occ = jnp.take(g_rank, jnp.where(valid, idx >> 3, 0))
    slot = jnp.where(valid, 8 * gslot_occ + (idx & 7), 8 * K)
    gpad = jnp.zeros((8 * K, d), g.dtype).at[slot].add(g, mode="drop")
    return gblk, mask, gpad, nreal


def group_pack_packedkey(idx, g, n_rows):
    """group_pack with the two-output sort fused into ONE packed int32 key:
    key = row_id * 4096 + occurrence_rank (stable by construction; invalid
    rows clamp to n_rows so they sort to the tail exactly like the sentinel
    path). Valid whenever n_rows*4096 + K fits int32 — true for every
    published shape (n_rows < 2^19, K <= 4096). Halves the bytes moving
    through the sorting network vs the variadic two-array sort."""
    K = idx.shape[0]
    d = g.shape[-1]
    assert K <= 4096
    dummy_blk = n_rows // 8 - 1
    ar = jnp.arange(K, dtype=jnp.int32)
    idx = idx.astype(jnp.int32)
    clamped = jnp.where((idx < 0) | (idx >= n_rows), n_rows, idx)
    key = jax.lax.sort(clamped * 4096 + ar)
    sidx = key >> 12
    order = key & 4095
    sg = jnp.take(g, order, axis=0)
    valid = sidx < n_rows
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    gid = jnp.where(valid, sidx >> 3, sentinel)
    ghead = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
    gslot = jnp.cumsum(ghead.astype(jnp.int32)) - 1

    gblk = jnp.full((K,), -1, jnp.int32)
    gblk = gblk.at[gslot].max(jnp.where(valid, gid, -1))
    gblk = jnp.where(gblk < 0, dummy_blk, gblk)

    sub = (sidx & 7).astype(jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    bits = jnp.where(valid & head, jnp.int32(1) << sub, 0)
    mask = jnp.zeros((K,), jnp.int32).at[gslot].add(bits)

    slot = jnp.where(valid, 8 * gslot + sub, 8 * K)
    gpad = jnp.zeros((8 * K, d), g.dtype).at[slot].add(
        sg, mode="drop", indices_are_sorted=True)
    nreal = jnp.sum(ghead & valid).astype(jnp.int32).reshape((1,))
    return gblk, mask, gpad, nreal


def check_equality(n_rows=1024, K=96, d=128, cases=30):
    rng = np.random.RandomState(0)
    ref = jax.jit(lambda i, g: group_pack(i, g, n_rows, return_nreal=True))
    new = jax.jit(lambda i, g: group_pack_sortless(i, g, n_rows))
    pk = jax.jit(lambda i, g: group_pack_packedkey(i, g, n_rows))
    sent = np.iinfo(np.int32).max
    for c in range(cases):
        # heavy duplicates + sentinel tail + rows clustered in few groups
        pool = rng.choice(n_rows - 8, size=max(4, K // 8), replace=False)
        idx = pool[rng.randint(0, len(pool), K)].astype(np.int32)
        n_sent = rng.randint(0, K // 3)
        if n_sent:
            idx[rng.choice(K, n_sent, replace=False)] = sent
        g = (rng.randn(K, d) * 0.1).astype(np.float32)
        r = ref(jnp.asarray(idx), jnp.asarray(g))
        n = new(jnp.asarray(idx), jnp.asarray(g))
        p = pk(jnp.asarray(idx), jnp.asarray(g))
        for name, a, b, c2 in zip(("gblk", "mask", "gpad", "nreal"), r, n, p):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"case {c}: sortless {name} mismatch")
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(c2),
                err_msg=f"case {c}: packedkey {name} mismatch")
    print(json.dumps({"equality_cases": cases, "result": "bit-identical"}),
          flush=True)


def measure(shape_name, reps=6, steps=32):
    n_rows, d, K, pool_n = SHAPES[shape_name]
    rng = np.random.RandomState(0)
    pool = rng.choice(n_rows, pool_n, replace=False)
    idx = jnp.asarray(pool[rng.randint(0, pool_n, (steps, K))].astype(np.int32))
    g = jnp.asarray((rng.randn(steps, K, d) * 0.01).astype(np.float32))
    table = jnp.asarray(rng.randn(n_rows, d).astype(np.float32))
    acc = jnp.full((n_rows, d), 0.1, jnp.float32)

    def time_scan(jitted, *args):
        float(np.asarray(jitted(*args)).ravel()[0])
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = jitted(*args)
        float(np.asarray(out).ravel()[0])
        return (time.time() - t0) / (reps * steps) * 1e6

    def pack_runner(pack_fn):
        @jax.jit
        def run(carry, idx_c, g_c):
            def body(c, xs):
                i, gg = xs
                gblk, mask, gpad, nreal = pack_fn(i, gg + c * 0, n_rows)
                return (gpad[0, 0] + (gblk[0] + mask[0]).astype(jnp.float32)
                        + nreal[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, carry, (idx_c, g_c))
            return c
        return run

    def full_runner(pack_fn):
        @jax.jit
        def run(table, acc, idx_c, g_c):
            def body(carry, xs):
                tab, ac = carry
                i, gg = xs
                gblk, mask, gpad, nreal = pack_fn(i, gg, n_rows)
                tab, ac, _ = fused_update_v3(
                    "adagrad", tab, ac, None, gblk, mask, nreal, gpad,
                    lr=LR, momentum=0.0, lmbd=0.0, v1=0.0, v2=0.0)
                return (tab, ac), None
            (tab, ac), _ = jax.lax.scan(body, (table, acc), (idx_c, g_c))
            return tab[0, 0]
        return run

    sorted_pack = lambda i, gg, n: group_pack(i, gg, n, return_nreal=True)
    res = {"shape": shape_name, "d": d, "K": K, "n_groups": n_rows // 8}
    res["pack_sorted_us"] = round(time_scan(pack_runner(sorted_pack),
                                            jnp.float32(0.0), idx, g), 1)
    res["pack_sortless_us"] = round(time_scan(pack_runner(group_pack_sortless),
                                              jnp.float32(0.0), idx, g), 1)
    res["pack_packedkey_us"] = round(
        time_scan(pack_runner(group_pack_packedkey), jnp.float32(0.0), idx, g), 1)
    res["full_sorted_us"] = round(time_scan(full_runner(sorted_pack),
                                            table, acc, idx, g), 1)
    res["full_sortless_us"] = round(time_scan(full_runner(group_pack_sortless),
                                              table, acc, idx, g), 1)
    res["full_packedkey_us"] = round(
        time_scan(full_runner(group_pack_packedkey), table, acc, idx, g), 1)
    res["full_speedup_sortless"] = round(
        res["full_sorted_us"] / res["full_sortless_us"], 3)
    res["full_speedup_packedkey"] = round(
        res["full_sorted_us"] / res["full_packedkey_us"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    check_equality()
    for s in (sys.argv[1:] or ["yoochoose", "rees46", "diginetica"]):
        measure(s)
