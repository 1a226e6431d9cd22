"""MXU equality-matmul duplicate-row reduction (opt-in XLA-path dedup).

Same contract as ``train/optimizers.py::dedup_rows`` — map (possibly
duplicated, sentinel-masked) row indices of a gradient stack to
(sorted-unique indices, per-row summed gradients) with static shapes — but
the summation runs on the MXU instead of the VPU's segment machinery:

* two 1-D key-only sorts produce the compacted sorted-unique indices
  (first sort orders the keys; the second pushes duplicate positions —
  rewritten to the sentinel — to the tail), replacing the two-output
  sort + permutation gather + int compaction scatter;
* the duplicate sum is ``eq @ g`` where ``eq[u, k] = (uidx[u] == idx[k])``
  — exactly one 1 per real column, so the matmul IS the segment sum
  (2*K^2*d MXU FLOPs).

Implementation (third generation, measured round 4 on v5e): a plain XLA
dot over a materialized bfloat16 eq matrix. Two Pallas generations that
built eq in-register lost to it on hardware — (rowblock x dstripe) grid:
212 us vs 162 at the flagship microbench (the whole gradient re-read from
HBM per row block); dstripe grid + in-kernel fori over row blocks: 212 us
(VMEM-held splits serialize the MXU) and a scoped-VMEM OOM at K=4224,
d=513. XLA's dot emission — eq materialized once (K^2 bf16), streamed
through the MXU with its own pipelining — beats both, and the eq bytes
are the price of not paying the chain's take+segment_sum+scatter.

Numerics (measured on hardware, round 4): the MXU's DEFAULT f32 precision
feeds each operand through ONE bf16 pass, which rounds every summed
gradient to bf16 — a 0.9% table error that CPU runs hide. The 0/1 eq
operand is bf16-EXACT, so instead of HIGHEST (6 passes on both operands)
g is split into three bf16 terms (hi + mid + lo; each term carries 8
disjoint significand bits, so the split is exact for f32 inputs),
concatenated along d, and summed through ONE bf16 dot with f32
accumulation — the exact f32 product, eq read once, 3x the MXU passes of
the (wrong) single-pass dot.

The summand SETS are identical to dedup_rows' for every REAL row; only
the accumulation order differs (MXU tree reduction vs sequential
segment_sum), so results are allclose, not bit-equal — differential tests
must compare with a small tolerance. Sentinel rows (masked lanes,
non-owned shard rows, tail padding) are ZERO here, while dedup_rows leaves
the masked-lane sum in its first sentinel row; both are consumed only
through ``mode="drop"`` scatters, which drop them either way — no consumer
may read sentinel rows.

Motivation: the dedup chain is the largest fixed cost of small-shape
steps on the XLA-scatter path (the sub-64MB regime where the grouped
update kernels lose; PERF_NOTES.md "Where a step's time goes"). The
matmul is O(K^2 d) against the chain's O(K d), so dispatch carries a K
gate (``K_MAX_MATMUL``) calibrated from the measured crossover. Reference
lineage: the dedup replaces the reference's slower-but-correct duplicate
handling (gru4rec.py:321-326) which TPU scatters make the FAST path
(PERF_NOTES "Approximate duplicate handling" rejection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SENTINEL = jnp.iinfo(jnp.int32).max

# The equality matmul costs O(K^2 d) MXU FLOPs plus a K^2 bf16 eq matrix,
# against the chain's O(K d). Measured microbench crossover on v5e
# (scripts/proto_dedup_matmul.py, dedup + consuming scatter): the matmul
# wins every shape with K^2*d <= 1.2e9 (flagship 1.1e9: 189 vs 206 us;
# coveo 1.2e9: 193 vs 224; rsc15 0.45e9: 131 vs 152) and loses every
# shape above 2.1e9 (flagship@b512 2.1e9: 238 vs 218; yoochoose 2.2e9:
# 296 vs 272; K=4224/d=513 9.2e9: 755 vs 478). Re-confirmed on a second
# hardware run before flipping the config default to "matmul" (flagship
# 209 vs 224; rsc15 138 vs 153; coveo 195 vs 211; same losses above the
# gate). Dispatch in train/optimizers.py falls back to dedup_rows above
# this line.
MATMUL_MAX_K2D = 1_500_000_000


def _uidx_two_sorts(idx):
    sidx = jax.lax.sort(idx.astype(jnp.int32))
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    return jax.lax.sort(jnp.where(head, sidx, SENTINEL))


@jax.jit
def dedup_rows_matmul(idx, g):
    """Drop-in replacement for ``dedup_rows`` (same output contract)."""
    K, d = g.shape
    idx = idx.astype(jnp.int32)
    uidx = _uidx_two_sorts(idx)
    # 0/1 is exact in bf16; sentinel output rows are zeroed in the same
    # fused compare (dedup_rows leaves its FIRST sentinel row holding the
    # masked-lane sum and later tail rows zero — both layouts are consumed
    # only through mode="drop" scatters, but zeros make this impl's tail
    # deterministic rather than contract-divergent)
    eq = ((uidx[:, None] == idx[None, :])
          & (uidx[:, None] != SENTINEL)).astype(jnp.bfloat16)
    g32 = g.astype(jnp.float32)

    # The split terms are built by INTEGER mantissa masking, not
    # f32->bf16->f32 casts: this environment compiles with
    # --xla_allow_excess_precision=true, under which XLA legally ELIDES a
    # round-trip cast as a precision-increasing no-op — measured on
    # hardware, that silently restored the single-pass bf16 rounding the
    # split exists to remove. A bitcast+mask truncation is opaque to that
    # rewrite, and each term still carries <=8 significant bits (24 = 3x8
    # after each residual renormalizes), so the final f32->bf16 converts
    # are exact-value.
    def trunc_bf16(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32)

    g_hi = trunc_bf16(g32)
    r1 = g32 - g_hi
    g_mid = trunc_bf16(r1)
    g_lo = r1 - g_mid
    gcat = jnp.concatenate([g_hi, g_mid, g_lo],
                           axis=1).astype(jnp.bfloat16)  # (K, 3d), exact
    s3 = jnp.dot(eq, gcat, preferred_element_type=jnp.float32)
    return uidx, s3[:, :d] + s3[:, d:2 * d] + s3[:, 2 * d:]
