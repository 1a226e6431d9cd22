"""Pallas TPU kernel: fused row-sparse adagrad(+momentum) update, group-blocked.

The spiritual successor of the reference's one hand-written hot kernel
(``GpuAdvancedSubtensor1_fast``, custom_theano_ops.py:409-595 — a faster row
gather/scatter for the per-step item-table updates). XLA's row scatters stop
updating in place once the table outgrows fast memory (~100k rows on v5e) and
fall back to materializing a full-table copy per scatter — at a Rees46-sized
table (200k x 513) that is ~1.8 ms PER SCATTER. This kernel updates
parameter + adagrad accumulator (+ momentum velocity) rows in one pass whose
cost is proportional to the number of touched rows.

Design (v2 — "group-blocked"): Mosaic requires block shapes whose last two
dims are (8k, 128m) or equal to the array dims, so arbitrary single rows of a
2-D f32 table cannot be blocks. The first version lifted tables to (n, 1, d)
to get per-row blocks, but that forces a T(1,128) layout on the table and the
step's forward gather then relayouts the WHOLE table back to 2-D T(8,128)
every step (~1.5 ms at Rees46 size). Instead, v2 keeps the table in its
natural 2-D layout and works on the 8-row GROUPS the (8,128) tiling already
defines:

* the (sorted, deduped) touched rows are bucketed by row-group ``r >> 3``;
  each distinct group becomes one grid step whose table/acc/vel blocks are
  the aligned (8, d) slice — a legal block spec, bit-compatible with the
  table's natural tiles;
* gradient rows are pre-packed (one XLA gather) into a group-aligned
  (8*K, d) buffer where member row ``r`` sits at sublane ``r & 7`` of its
  group's block and non-member sublanes are ZERO — for adagrad a zero
  gradient row is an exact no-op, so untouched rows in a visited group pass
  through bit-identically without masking;
* momentum / L2 terms are not no-ops under zero gradient, so those variants
  additionally take a per-group member bitmask (scalar-prefetched) and
  ``where`` the non-members back to their inputs;
* padded grid steps (the group list is padded to static length) point at a
  dedicated all-padding dummy group (models/gru.py pad_items guarantees >= 8
  spare rows) so their write-backs can never clobber a real group — the grid
  is sequential, but block DMAs are pipelined, so two grid steps must never
  target the same block.

Dispatch: used by train/optimizers.py when the optimizer is adagrad and the
table is large enough for XLA's scatters to lose (``rows >= PALLAS_MIN_ROWS``).
All other cases take the XLA path, which doubles as this kernel's
differential-test oracle (the reference's own disable_custom_op pattern,
gpu_ops.py:13-27).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-6  # keep in sync with train/optimizers.py
PALLAS_MIN_ROWS = 98304  # below this, XLA's in-place scatters win (v5e)


def _kernels_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def group_pack(idx, g, n_rows):
    """Sort raw (possibly duplicated / sentinel-masked) scatter indices,
    bucket them by 8-row group, and pack gradients group-aligned — with the
    duplicate-index summing folded into the packing scatter, so the kernel
    path never needs a separate segment-sum or deduped index vector.

    Returns:

    * ``gblk``  (K,) int32 — per grid step, the 8-row block id to update;
      padded steps point at the dummy group ``n_rows//8 - 1`` (all padding
      rows by pad_items' >= 8 spare-row guarantee);
    * ``mask``  (K,) int32 — per grid step, bit ``b`` set iff sublane ``b``
      is a real member (only consumed by the momentum/L2 kernel variants);
    * ``gpad``  (8K, d) — gradient rows scatter-ADDED to slot
      ``8*group_slot + (row & 7)`` (duplicate occurrences of a row share a
      slot and sum — the dedup semantics); all other slots zero.
    """
    K = idx.shape[0]
    d = g.shape[-1]
    dummy_blk = n_rows // 8 - 1
    ar = jnp.arange(K, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx.astype(jnp.int32), ar), num_keys=1)
    sg = jnp.take(g, order, axis=0)
    valid = sidx < n_rows
    gid = jnp.where(valid, sidx >> 3, jnp.int32(np.iinfo(np.int32).max))
    ghead = jnp.concatenate([jnp.ones((1,), bool), gid[1:] != gid[:-1]])
    gslot = jnp.cumsum(ghead.astype(jnp.int32)) - 1  # group slot per occurrence

    gblk = jnp.full((K,), -1, jnp.int32)
    gblk = gblk.at[gslot].max(jnp.where(valid, gid, -1))
    gblk = jnp.where(gblk < 0, dummy_blk, gblk)

    sub = (sidx & 7).astype(jnp.int32)
    # membership bit once per distinct row (first occurrence only)
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    bits = jnp.where(valid & head, jnp.int32(1) << sub, 0)
    mask = jnp.zeros((K,), jnp.int32).at[gslot].add(bits)

    # slots ascend with the sorted occurrences; duplicates share a slot
    slot = jnp.where(valid, 8 * gslot + sub, 8 * K)
    gpad = jnp.zeros((8 * K, d), g.dtype).at[slot].add(
        sg, mode="drop", indices_are_sorted=True
    )
    return gblk, mask, gpad


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "interpret"))
def fused_adagrad_update(table, acc, vel, gblk, mask, gpad, *, lr: float,
                         momentum: float, lmbd: float, interpret: bool = False):
    """Group-blocked fused update over the touched rows of a 2-D table:

        acc[r]   += g[r]^2                 (adagrad accumulator)
        gs        = g[r] / sqrt(acc[r]+eps)
        delta     = lr * (gs + lmbd * table[r])
        vel[r]    = momentum * vel[r] - delta   (if momentum > 0)
        table[r] += vel[r]                      (or -= delta without momentum)

    ``gblk``/``mask``/``gpad`` come from :func:`group_pack`. ``vel`` may be
    None when momentum == 0. Returns (table, acc, vel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = table.shape
    K = gblk.shape[0]
    has_momentum = momentum > 0
    needs_mask = has_momentum or lmbd > 0
    if vel is None:
        vel = jnp.zeros((8, d), table.dtype)  # dummy, only block 0 is read

    def blk_map(j, gblk_ref, mask_ref):
        return (gblk_ref[j], 0)

    def vel_map(j, gblk_ref, mask_ref):
        if has_momentum:
            return (gblk_ref[j], 0)
        return (0, 0)

    def g_map(j, gblk_ref, mask_ref):
        return (j, 0)

    vel_dtype = vel.dtype

    def kernel(gblk_ref, mask_ref, t_ref, a_ref, v_ref, g_ref,
               to_ref, ao_ref, vo_ref):
        g = g_ref[...]
        acc_new = a_ref[...] + g * g
        # divide by sqrt (not multiply by rsqrt): rsqrt rounds differently
        # and the 1-ulp difference vs the XLA oracle path compounds over a
        # training run
        gs = g / jnp.sqrt(acc_new + EPSILON)
        if needs_mask:
            j = pl.program_id(0)
            bits = mask_ref[j]
            rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            member = ((bits >> rowid) & 1) > 0
        if lmbd > 0:
            delta = lr * (gs + lmbd * t_ref[...])
        else:
            delta = lr * gs
        if has_momentum:
            # velocity may be stored narrow (opt_state_dtype); math runs in
            # f32 and the UNROUNDED v2 updates the table — exactly like the
            # XLA path (train/optimizers.py)
            v_old = v_ref[...].astype(jnp.float32)
            v2 = momentum * v_old - delta
            v2 = jnp.where(member, v2, v_old)
            vo_ref[...] = v2.astype(vel_dtype)
            to_ref[...] = t_ref[...] + jnp.where(member, v2, 0.0)
        else:
            vo_ref[...] = v_ref[...]
            if lmbd > 0:
                to_ref[...] = t_ref[...] - jnp.where(member, delta, 0.0)
            else:
                # zero gradient rows give delta == 0: exact no-op, no mask
                to_ref[...] = t_ref[...] - delta
        ao_ref[...] = acc_new  # zero-g rows: acc unchanged exactly

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((8, d), blk_map),
            pl.BlockSpec((8, d), blk_map),
            pl.BlockSpec((8, d), vel_map),
            pl.BlockSpec((8, d), g_map),
        ],
        out_specs=[
            pl.BlockSpec((8, d), blk_map),
            pl.BlockSpec((8, d), blk_map),
            pl.BlockSpec((8, d), vel_map),
        ],
    )
    t_out, a_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            jax.ShapeDtypeStruct(vel.shape, vel.dtype),
        ],
        # alias (gblk, mask, table, acc, vel, gpad) inputs 2..4 onto outputs
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(gblk, mask, table, acc, vel, gpad)
    vel = v_out if has_momentum else None
    return t_out, a_out, vel
