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
  (2*K^2*d f32 MXU FLOPs). The Pallas kernel builds each (128, K)
  equality block in-register; the eq matrix never exists in memory.

Numerics: the summand SETS are identical to dedup_rows' for every REAL
row; only the accumulation order differs (MXU tree reduction vs
sequential segment_sum), so results are allclose, not bit-equal —
differential tests must compare with a small tolerance. Sentinel rows
(masked lanes, non-owned shard rows, tail padding) are ZERO here, while
dedup_rows leaves the masked-lane sum in its first sentinel row; both are
consumed only through ``mode="drop"`` scatters, which drop them either
way — no consumer may read sentinel rows.

Motivation: the dedup chain is the largest fixed cost of small-shape
steps on the XLA-scatter path (the sub-64MB regime where the grouped
update kernels lose; PERF_NOTES.md "Where a step's time goes" and the
round-4 "equality-matmul dedup" checklist entry). Opt-in via
``GRU4RecConfig(dedup_impl="matmul")`` until the hardware A/B
(scripts/proto_dedup_matmul.py) lands. Reference lineage: the dedup
replaces the reference's slower-but-correct duplicate handling
(gru4rec.py:321-326) which TPU scatters make the FAST path (PERF_NOTES
"Approximate duplicate handling" rejection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SENTINEL = jnp.iinfo(jnp.int32).max


def _uidx_two_sorts(idx):
    sidx = jax.lax.sort(idx.astype(jnp.int32))
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    return jax.lax.sort(jnp.where(head, sidx, SENTINEL))


def _eq_mm_kernel(uidx_ref, idx_ref, g_ref, out_ref):
    # uidx arrives as a (128, 1) column, idx as a (1, K) row: the compare is
    # a plain 2-D broadcast (no 1-D refs / reshapes, which Mosaic lowers
    # poorly). The 0/1 operand is exact in f32, so each summand enters the
    # MXU un-rounded. Sentinel output rows are zeroed in the same fused
    # compare (dedup_rows leaves its FIRST sentinel row holding the
    # masked-lane sum and later tail rows zero — both layouts are consumed
    # only through mode="drop" scatters, but zeros make this impl's tail
    # deterministic rather than contract-divergent).
    eq = (uidx_ref[:] == idx_ref[:]) & (uidx_ref[:] != SENTINEL)
    out_ref[:] = jnp.dot(eq.astype(jnp.float32), g_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dedup_rows_matmul(idx, g, interpret=None):
    """Drop-in replacement for ``dedup_rows`` (same output contract)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K, d = g.shape
    k_pad = -K % 128
    d_block = 256 if d > 128 else 128
    d_pad = -d % d_block
    gp = jnp.pad(g, ((0, k_pad), (0, d_pad))) if (k_pad or d_pad) else g
    idx_p = (jnp.pad(idx.astype(jnp.int32), (0, k_pad),
                     constant_values=SENTINEL) if k_pad
             else idx.astype(jnp.int32))
    Kp = K + k_pad
    uidx = _uidx_two_sorts(idx_p)
    out = pl.pallas_call(
        _eq_mm_kernel,
        grid=(Kp // 128, (d + d_pad) // d_block),
        in_specs=[
            pl.BlockSpec((128, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, Kp), lambda i, j: (0, 0)),
            pl.BlockSpec((Kp, d_block), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((128, d_block), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Kp, d + d_pad), jnp.float32),
        interpret=interpret,
    )(uidx[:, None], idx_p[None, :], gp.astype(jnp.float32))
    # distinct count <= K: slicing back to K keeps every real row and a
    # sentinel tail — dedup_rows' exact layout
    return uidx[:K], out[:K, :d]
