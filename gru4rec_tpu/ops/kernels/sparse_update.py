"""Pallas TPU kernels: fused row-sparse optimizer updates, group-blocked.

The spiritual successor of the reference's one hand-written hot kernel
(``GpuAdvancedSubtensor1_fast``, custom_theano_ops.py:409-595 — a faster row
gather/scatter serving the per-step item-table updates of EVERY optimizer).
XLA's row scatters stop updating in place once the table outgrows fast memory
(~100k rows on v5e) and fall back to materializing a full-table copy per
scatter — at a Rees46-sized table (200k x 513) that is ~1.8 ms PER SCATTER.
These kernels update parameter + optimizer-state rows in one pass whose cost
is proportional to the number of touched rows. Covered: all four adaptive
optimizers — adagrad, rmsprop, adadelta, adam — each with momentum/L2.

Design (v2 — "group-blocked"): Mosaic requires block shapes whose last two
dims are (8k, 128m) or equal to the array dims, so arbitrary single rows of a
2-D f32 table cannot be blocks. The first version lifted tables to (n, 1, d)
to get per-row blocks, but that forces a T(1,128) layout on the table and the
step's forward gather then relayouts the WHOLE table back to 2-D T(8,128)
every step (~1.5 ms at Rees46 size). Instead, v2 keeps the table in its
natural 2-D layout and works on the 8-row GROUPS the (8,128) tiling already
defines:

* the (sorted, deduped) touched rows are bucketed by row-group ``r >> 3``;
  each distinct group becomes one grid step whose table/state blocks are
  the aligned (8, d) slice — a legal block spec, bit-compatible with the
  table's natural tiles;
* gradient rows are pre-packed (one XLA gather) into a group-aligned
  (8*K, d) buffer where member row ``r`` sits at sublane ``r & 7`` of its
  group's block and non-member sublanes are ZERO — for adagrad a zero
  gradient row is an exact no-op, so untouched rows in a visited group pass
  through bit-identically without masking;
* updates that are NOT no-ops under zero gradient (EMA decay of
  rmsprop/adam state, momentum velocity, L2) take a per-group member
  bitmask (scalar-prefetched) and ``where`` the non-members back to their
  inputs;
* two-slot optimizers (adam, adadelta) keep their sparse state MERGED in
  one buffer (train/optimizers.py init_state) so a single block DMA pair
  serves every slot; adam's per-row step count rides along as a column of
  that buffer and is incremented in-kernel, with the bias corrections
  derived in-register (_neg_expm1) — no count bookkeeping outside;
* padded grid steps (the group list is padded to static length) point at a
  dedicated all-padding dummy group (models/gru.py pad_items guarantees >= 8
  spare rows) so their write-backs can never clobber a real group — the grid
  is sequential, but block DMAs are pipelined, so two grid steps must never
  target the same block.

Dispatch: used by train/optimizers.py when the table is large enough for
XLA's scatters to lose (``rows >= PALLAS_MIN_ROWS``). All other cases take
the XLA path, which doubles as these kernels' differential-test oracle (the
reference's own disable_custom_op pattern, gpu_ops.py:13-27).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gru4rec_tpu.ops.sr import (limbs_decode, limbs_encode, sr_bits16,
                                sr_round_bf16)

EPSILON = 1e-6  # keep in sync with train/optimizers.py
PALLAS_MIN_ROWS = 98304  # below this, XLA's in-place scatters win (v5e)


def _kernels_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _neg_expm1(x):
    """-expm1(x) for adam's bias corrections 1 - v^c = -expm1(c ln v): the
    naive 1 - exp(...) cancels catastrophically when v^c ~ 1 (v2=0.999,
    small c). Mosaic has no expm1 primitive, so: 6-term series below
    |x| < 0.5 (rel. err ~1.5e-6, below f32 noise), exp(x) - 1 above (no
    cancellation there)."""
    poly = x * (1 + x / 2 * (1 + x / 3 * (1 + x / 4 * (
        1 + x / 5 * (1 + x / 6)))))
    return -jnp.where(jnp.abs(x) < 0.5, poly, jnp.exp(x) - 1.0)


# v3 (manual-DMA pipeline, dynamic length) dispatch threshold: it wins once
# XLA's scatters lose fast-memory promotion, which is a per-table BYTE
# budget, not a row count (PERF_NOTES.md "mid-size regime, resolved").
# Measured full-step winners at depth 16: Rees46 512MB tables (+108%),
# Diginetica 110MB (+117%), Yoochoose 76MB (+29%); measured loser: the
# 38MB flagship (-24%: every state buffer gets fast-memory promotion and
# XLA's promoted scatters are cheaper than any per-group DMA).
V3_MIN_TABLE_BYTES = 64 * 1024 * 1024
# Software pipeline depth (in-flight groups per direction). Each (8, d)
# group DMA is latency-bound (~16-20KB), so deep pipelining keeps winning
# well past classic double-buffering: measured Rees46 full step at
# D=4/6/8/12/16 = 777/688/625/583/578 us. VMEM cost is
# streams x 2 x D x 8 x d x itemsize (~3MB worst case at d=640 adam).
# Depth is exhausted as a knob: yoochoose (d=512) full step at
# D=16/24/32 = 410.2/410.0/406.5 us (<1%) — the kernel sits at its
# byte/issue floor, not a pipeline stall (round-4 sweep).
V3_DEPTH = 16
# v4 (compact gradients, in-kernel sublane alignment) keeps the whole
# deduped gradient buffer (K+16, d) f32 VMEM-resident. Budget it to half
# of the ~16MB/core VMEM so the pipeline scratch (~3MB) and compiler
# overhead always fit; above this, fall back to v3's streamed gpad.
COMPACT_VMEM_BYTES = 8 * 1024 * 1024


def group_pack(idx, g, n_rows, return_slot_rows: bool = False,
               return_nreal: bool = False):
    """Sort raw (possibly duplicated / sentinel-masked) scatter indices,
    bucket them by 8-row group, and pack gradients group-aligned — with the
    duplicate-index summing folded into the packing scatter, so the kernel
    path never needs a separate segment-sum or deduped index vector.

    Returns:

    * ``gblk``  (K,) int32 — per grid step, the 8-row block id to update;
      padded steps point at the dummy group ``n_rows//8 - 1`` (all padding
      rows by pad_items' >= 8 spare-row guarantee);
    * ``mask``  (K,) int32 — per grid step, bit ``b`` set iff sublane ``b``
      is a real member (consumed by the masked kernel variants);
    * ``gpad``  (8K, d) — gradient rows scatter-ADDED to slot
      ``8*group_slot + (row & 7)`` (duplicate occurrences of a row share a
      slot and sum — the dedup semantics); all other slots zero;
    * with ``return_slot_rows``: ``crows``/``cslots`` (K,) int32 — the i-th
      distinct touched row id and its packed slot (ascending; drop-sentinel
      tail) — the adam path's count-update / bias-correction indices;
    * with ``return_nreal``: ``nreal`` (1,) int32 — the number of REAL
      (non-dummy) groups, which always occupy grid slots [0, nreal); the v3
      kernel loops over only these.
    """
    K = idx.shape[0]
    d = g.shape[-1]
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    dummy_blk = n_rows // 8 - 1
    ar = jnp.arange(K, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx.astype(jnp.int32), ar), num_keys=1)
    sg = jnp.take(g, order, axis=0)
    valid = sidx < n_rows
    gid = jnp.where(valid, sidx >> 3, sentinel)
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
    out = [gblk, mask, gpad]
    if return_slot_rows:
        # COMPACT (K-long) bookkeeping: entry i = the i-th distinct touched
        # row and its packed slot (ascending; sentinel tail). 1-D index ops
        # in slot space (8K long) cost ~8x more per use — adam's count
        # gather/scatter measured 232 us/step that way.
        rank = jnp.cumsum((head & valid).astype(jnp.int32)) - 1
        tgt = jnp.where(head & valid, rank, K)
        crows = jnp.full((K,), sentinel).at[tgt].set(
            sidx, mode="drop", unique_indices=True)
        cslots = jnp.full((K,), 8 * K).at[tgt].set(
            slot.astype(jnp.int32), mode="drop", unique_indices=True)
        out += [crows, cslots]
    if return_nreal:
        out.append(jnp.sum(ghead & valid).astype(jnp.int32).reshape((1,)))
    return tuple(out)


def group_pack_compact(idx, g, n_rows):
    """v4 staging: compact deduped gradients + per-group window starts.

    Same sort/dedup semantics as :func:`group_pack`, but the gradients stay
    COMPACT — (K+8, d), row ``i`` = the i-th distinct touched row's summed
    gradient (ascending row id; zero-padded tail) — instead of being
    scattered into the 8x larger group-aligned ``gpad``. The (8K, d) gpad
    round-trip (zero + scatter + kernel re-read) is pure HBM traffic the v4
    kernel eliminates by aligning sublanes in-register (see
    ``_fused_update_v3``'s compact mode): the staging becomes one (K, d)
    segment-sum.

    Returns ``(gblk, mask, gstart, nreal, gcomp)``:

    * ``gblk``/``mask``/``nreal`` — exactly as :func:`group_pack`;
    * ``gstart`` (K,) int32 — for group slot j, the compact row index of its
      first member: group j's members are compact rows
      ``gstart[j] .. gstart[j] + popcount(mask[j]) - 1`` (contiguous,
      ascending sublane — the compact order IS the sorted row order);
    * ``gcomp`` (K+16, d) — the deduped gradient rows; 16 zero tail rows so
      the kernel's ALIGNED 16-row window at ``(gstart >> 3) * 8`` stays in
      bounds for any real start (Mosaic cannot prove tile-alignment of a
      raw dynamic start, so the kernel reads the enclosing aligned window
      and folds ``gstart & 7`` into its permutation matmul).
    """
    K = idx.shape[0]
    d = g.shape[-1]
    sentinel = jnp.int32(np.iinfo(np.int32).max)
    dummy_blk = n_rows // 8 - 1
    ar = jnp.arange(K, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx.astype(jnp.int32), ar), num_keys=1)
    sg = jnp.take(g, order, axis=0)
    valid = sidx < n_rows
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    # compact rank of each occurrence's distinct row; invalid (sentinel)
    # occurrences sort to the tail and are dropped from every scatter
    rank = jnp.cumsum((head & valid).astype(jnp.int32)) - 1
    gcomp = jnp.zeros((K + 16, d), g.dtype).at[
        jnp.where(valid, rank, K + 16)
    ].add(sg, mode="drop", indices_are_sorted=True)
    # the i-th distinct valid row id (ascending; sentinel tail)
    urow = jnp.full((K,), sentinel).at[
        jnp.where(head & valid, rank, K)
    ].set(sidx, mode="drop", unique_indices=True)

    gvalid = urow < n_rows
    ug = jnp.where(gvalid, urow >> 3, sentinel)
    ughead = jnp.concatenate([jnp.ones((1,), bool), ug[1:] != ug[:-1]])
    grank = jnp.cumsum((ughead & gvalid).astype(jnp.int32)) - 1
    gtgt = jnp.where(ughead & gvalid, grank, K)
    gblk = jnp.full((K,), -1, jnp.int32).at[gtgt].max(
        jnp.where(gvalid, ug, -1), mode="drop")
    gblk = jnp.where(gblk < 0, dummy_blk, gblk)
    gstart = jnp.zeros((K,), jnp.int32).at[gtgt].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop", unique_indices=True)
    bits = jnp.where(gvalid, jnp.int32(1) << (urow & 7).astype(jnp.int32), 0)
    mask = jnp.zeros((K,), jnp.int32).at[
        jnp.where(gvalid, grank, K)
    ].add(bits, mode="drop")
    nreal = jnp.sum(ughead & gvalid).astype(jnp.int32).reshape((1,))
    return gblk, mask, gstart, nreal, gcomp


def _popcount8(x):
    """Population count of the low 8 bits (member masks are 8-bit)."""
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def _fused_update(adapt, table, acc, vel, gblk, mask, gpad, *, lr, momentum,
                  lmbd, v1, v2, interpret):
    """Shared group-blocked kernel body for adagrad / rmsprop / adadelta / adam.

    Update math per touched row r (g already duplicate-summed by group_pack):

        adagrad:  acc += g^2;                        gs = g/sqrt(acc+eps)
        rmsprop:  acc  = v1*acc + (1-v1)*g^2;        gs = g/sqrt(acc+eps)
        adadelta: acc  = v1*acc + (1-v1)*g^2
                  scal = (upd + eps) / (acc + eps)
                  upd  = v1*upd + (1-v1)*scal*g^2
                  gs   = g * sqrt(scal)
        adam:     acc  = v2*acc + (1-v2)*g^2
                  meang= v1*meang + (1-v1)*g
                  gs   = (meang/corr1) / (sqrt(acc/corr2) + eps)
        delta     = lr * (gs + lmbd * table[r])
        vel[r]    = momentum * vel[r] - delta        (if momentum > 0)
        table[r] += vel[r]                           (or -= delta)

    For adam/adadelta, ``acc`` is the MERGED state buffer holding
    [acc | upd] (adadelta, (n, 2d)) or [acc | meang | count-column block]
    (adam, (n, 2d + 128)) side by side (train/optimizers.py init_state):
    one block DMA pair serves every slot — the v3 manual-DMA pipeline is
    issue-bound on the scalar core (~40ns per DMA), so merging halves the
    state stream's issue cost where bytes are nearly free. Adam's per-row
    step count (column 2d) is incremented in-kernel for member rows and
    feeds the bias corrections; nothing count-related happens outside.
    ``vel`` may be None when momentum == 0. State may be stored narrow
    (opt_state_dtype); math runs in f32 and the UNROUNDED values update the
    table — exactly like the XLA path (train/optimizers.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = table.shape
    K = gblk.shape[0]
    has_momentum = momentum > 0
    is_adam = adapt == "adam"
    merged = adapt in ("adam", "adadelta")
    ds = acc.shape[1]
    assert ds == (2 * d + 128 if is_adam else 2 * d if merged else d), (
        adapt, acc.shape, table.shape)
    # zero gradient is an exact no-op only for adagrad's monotone sum; EMA
    # state, momentum, and L2 all move under zero g and need the member mask
    needs_mask = has_momentum or lmbd > 0 or adapt != "adagrad"
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

    acc_dtype, vel_dtype = acc.dtype, vel.dtype

    # v == 0 means correction 1 - 0^t = 1 exactly (the XLA path's _ln uses
    # -inf for this); ln = 0.0 would yield -expm1(0) = 0 and a divide-by-zero
    ln_v1 = float(np.log(v1)) if is_adam and v1 > 0 else None
    ln_v2 = float(np.log(v2)) if is_adam and v2 > 0 else None

    def kernel(gblk_ref, mask_ref, *refs):
        t_ref, a_ref, v_ref, g_ref, to_ref, ao_ref, vo_ref = refs
        g = g_ref[...]
        if needs_mask:
            j = pl.program_id(0)
            bits = mask_ref[j]
            rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            member = ((bits >> rowid) & 1) > 0
        if adapt == "adagrad":
            acc_new = a_ref[...] + g * g  # zero-g rows: exact no-op
            # divide by sqrt (not multiply by rsqrt): rsqrt rounds differently
            # and the 1-ulp difference vs the XLA oracle path compounds over a
            # training run
            gs = g / jnp.sqrt(acc_new + EPSILON)
            ao_ref[...] = acc_new
        elif adapt == "rmsprop":
            a_old = a_ref[...].astype(jnp.float32)
            acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g, a_old)
            gs = g / jnp.sqrt(acc_new + EPSILON)
            ao_ref[...] = acc_new.astype(acc_dtype)
        elif adapt == "adadelta":
            am = a_ref[...].astype(jnp.float32)
            a_old, u_old = am[:, :d], am[:, d:]
            acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g, a_old)
            scal = (u_old + EPSILON) / (acc_new + EPSILON)
            u_new = jnp.where(member,
                              v1 * u_old + (1.0 - v1) * scal * g * g, u_old)
            gs = g * jnp.sqrt(scal)
            ao_ref[...] = jnp.concatenate([acc_new, u_new],
                                          axis=1).astype(acc_dtype)
        else:  # adam: [acc | meang | count-column block]
            am = a_ref[...].astype(jnp.float32)
            a_old, m_old = am[:, :d], am[:, d:2 * d]
            cntb = am[:, 2 * d:]
            acc_new = jnp.where(member, v2 * a_old + (1.0 - v2) * g * g, a_old)
            m_new = jnp.where(member, v1 * m_old + (1.0 - v1) * g, m_old)
            # the per-row step count rides the state block: increment member
            # rows, derive bias corrections in-register (non-members keep
            # corr = 1, an inf/NaN-free dummy — their lanes are masked)
            cnt_new = jnp.where(member, cntb[:, :1] + 1.0, cntb[:, :1])
            one = jnp.ones_like(cnt_new)
            c1 = (jnp.where(member, _neg_expm1(cnt_new * ln_v1), 1.0)
                  if ln_v1 is not None else one)
            c2 = (jnp.where(member, _neg_expm1(cnt_new * ln_v2), 1.0)
                  if ln_v2 is not None else one)
            gs = (m_new / c1) / (jnp.sqrt(acc_new / c2) + EPSILON)
            # the count fills ALL 128 lanes of its block: a broadcast is
            # aligned-only VPU work, while a 127-lane passthrough concat at
            # offset 1 pays cross-tile lane shifts
            cntb_new = jnp.broadcast_to(cnt_new, (8, 128))
            ao_ref[...] = jnp.concatenate([acc_new, m_new, cntb_new],
                                          axis=1).astype(acc_dtype)
        if lmbd > 0:
            delta = lr * (gs + lmbd * t_ref[...])
        else:
            delta = lr * gs
        if has_momentum:
            v_old = v_ref[...].astype(jnp.float32)
            vnew = momentum * v_old - delta
            vnew = jnp.where(member, vnew, v_old)
            vo_ref[...] = vnew.astype(vel_dtype)
            to_ref[...] = t_ref[...] + jnp.where(member, vnew, 0.0)
        else:
            vo_ref[...] = v_ref[...]
            if needs_mask:
                to_ref[...] = t_ref[...] - jnp.where(member, delta, 0.0)
            else:
                # adagrad, no L2: zero-g rows give delta == 0 exactly
                to_ref[...] = t_ref[...] - delta

    in_specs = [
        pl.BlockSpec((8, d), blk_map),    # table
        pl.BlockSpec((8, ds), blk_map),   # state (merged for adam/adadelta)
    ]
    inputs = [table, acc]
    out_specs = [
        pl.BlockSpec((8, d), blk_map),
        pl.BlockSpec((8, ds), blk_map),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(table.shape, table.dtype),
        jax.ShapeDtypeStruct(acc.shape, acc.dtype),
    ]
    aliases = {2: 0, 3: 1}  # inputs 2.. are offset by the 2 scalar-prefetch args
    in_specs.append(pl.BlockSpec((8, d), vel_map))
    inputs.append(vel)
    out_specs.append(pl.BlockSpec((8, d), vel_map))
    out_shape.append(jax.ShapeDtypeStruct(vel.shape, vel.dtype))
    aliases[4] = 2
    in_specs.append(pl.BlockSpec((8, d), g_map))
    inputs.append(gpad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(K,), in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases, interpret=interpret,
    )(gblk, mask, *inputs)
    t_out, a_out, v_out = outs
    v_out = v_out if has_momentum else None
    return t_out, a_out, v_out


def _fused_update_v3(adapt, table, acc, vel, gblk, mask, nreal, gpad,
                     *, lr, momentum, lmbd, v1, v2, interpret, gstart=None,
                     sr_seed=None):
    """v3: manual-DMA software pipeline over ONLY the real groups.

    With ``gstart`` (v4, "compact" mode): ``gpad`` is instead the COMPACT
    deduped gradient buffer from :func:`group_pack_compact` ((K+16, d);
    group j's member rows at ``gstart[j]``..), held ENTIRELY IN VMEM — no
    per-group gradient DMA at all (one less issue on the DMA-issue-bound
    pipeline). The kernel reads the enclosing ALIGNED 16-row window
    ``(gstart >> 3) * 8`` (Mosaic can prove its tile-alignment; a raw
    dynamic start it cannot) and aligns members to their table sublanes
    in-register with an (8, 16) one-hot permutation matmul derived from the
    member mask and the sub-block offset (ascending compact order ==
    ascending sublane order within a group, so ``P[s, i] = member(s) and
    i == (gstart & 7) + popcount(mask & (2^s - 1))``; non-member sublanes
    come out zero, exactly like gpad's empty slots). This removes the
    (8K, d) gpad round-trip — zero + scatter + re-read, ~8x the real
    gradient bytes — from the XLA staging at the cost of one tiny MXU op
    per group. Requires gcomp to fit VMEM (COMPACT_VMEM_BYTES guard in the
    dispatcher).

    The v2 grid pays ~0.35-0.45 us of fixed cost for every one of its K
    (static) grid steps — including the padded dummy steps that
    duplicate-heavy index sets produce (pop^alpha negatives: 30-45% of K).
    v3 runs one kernel invocation that fori-loops to the DYNAMIC real-group
    count (scalar-prefetched ``nreal``; real groups always occupy slots
    [0, nreal) of ``gblk``) with a depth-``V3_DEPTH`` pipeline of manual
    HBM<->VMEM async copies — measured ~40% faster than v2 at Rees46/
    Diginetica shapes even before dummy elimination (PERF_NOTES.md).

    Requires the table width to be a 128-lane tile multiple (models/gru.py
    pad_cols) — Mosaic DMA slices must be tile-aligned. Same update math and
    same member-masking semantics as :func:`_fused_update`; in/out VMEM
    buffers are separate per stream so an in-flight out-DMA never races the
    next refill.

    For adam/adadelta, ``acc`` is the MERGED state buffer ([acc | meang |
    count-column block] (n, 2d + 128) for adam, [acc | upd] (n, 2d) for
    adadelta — train/optimizers.py init_state): the v3 pipeline is
    DMA-ISSUE-bound on the scalar core (~40 ns per issue; measured:
    adagrad's +20 KB/group over rmsprop costs only ~13 ns), so one wide
    state DMA pair beats two (8, d) pairs by ~80 ns/group. Adam's per-row
    step count (column 2d of the merged buffer) is incremented in-kernel
    for member rows and feeds the bias corrections computed in-register
    (1 - v^c as -expm1(c ln v), see _neg_expm1) — no count bookkeeping
    exists outside the kernel at all (the earlier compact-1-D-ops variant
    cost 78 us/step of XLA gather/scatter at the Rees46 shape).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = table.shape
    K = gblk.shape[0]
    D = V3_DEPTH
    compact = gstart is not None
    has_momentum = momentum > 0
    is_adam = adapt == "adam"
    merged = adapt in ("adam", "adadelta")
    ds = acc.shape[1]
    assert ds == (2 * d + 128 if is_adam else 2 * d if merged else d), (
        adapt, acc.shape, table.shape)
    # stochastic-rounding state layout (ops/sr.py): bf16 storage for
    # adagrad's acc / adam's merged buffer, SR on the slow slot, adam count
    # as base-256 limbs in the count block's first three lanes
    sr = sr_seed is not None
    if sr:
        assert adapt in ("adagrad", "adam"), adapt
        assert acc.dtype == jnp.bfloat16, acc.dtype
        # [seed, global-row-offset]: the dither hashes GLOBAL (row, col)
        # cells so a row-sharded run rounds bit-identically to single-chip
        sr_seed = jnp.reshape(sr_seed, (-1,)).astype(jnp.int32)
        if sr_seed.shape[0] == 1:
            sr_seed = jnp.concatenate([sr_seed, jnp.zeros((1,), jnp.int32)])
    needs_mask = has_momentum or lmbd > 0 or adapt != "adagrad"
    acc_dtype = acc.dtype
    vel_dtype = vel.dtype if has_momentum else None
    # v == 0 means correction 1 - 0^t = 1 exactly (the XLA path's _ln uses
    # -inf for this); ln = 0.0 would yield -expm1(0) = 0 and a divide-by-zero
    ln_v1 = float(np.log(v1)) if is_adam and v1 > 0 else None
    ln_v2 = float(np.log(v2)) if is_adam and v2 > 0 else None
    # decay-gated rounding for adam's first moment under SR storage: a slow
    # v1 (> 0.99, the _ema_dtype threshold) would freeze under plain
    # round-to-nearest bf16, so it gets its own SR dither (hashed on its
    # buffer columns d..2d-1 — matches the XLA path bit-for-bit)
    sr_m = sr and is_adam and v1 > 0.99

    def kernel(gblk_ref, mask_ref, nreal_ref, *refs):
        refs = list(refs)
        gstart_ref = refs.pop(0) if compact else None
        seed_ref = refs.pop(0) if sr else None
        t_hbm = refs.pop(0)
        a_hbm = refs.pop(0)
        v_hbm = refs.pop(0) if has_momentum else None
        g_hbm = refs.pop(0)
        to_hbm = refs.pop(0)
        ao_hbm = refs.pop(0)
        vo_hbm = refs.pop(0) if has_momentum else None
        (tin, tout, ain, aout) = refs[:4]
        refs = refs[4:]
        vin = refs.pop(0) if has_momentum else None
        vout = refs.pop(0) if has_momentum else None
        gin = None if compact else refs.pop(0)
        in_sems, out_sems = refs

        n = nreal_ref[0]

        def in_copies(j, slot):
            blk = gblk_ref[j]
            rows = pl.ds(blk * 8, 8)
            # ONE state DMA even for the wide merged buffers: splitting it in
            # half was measured SLOWER (903 vs 829 us/step at Rees46 adam) —
            # the pipeline is issue-bound, not wide-DMA-penalized
            cp = [
                pltpu.make_async_copy(t_hbm.at[rows, :], tin.at[slot],
                                      in_sems.at[slot, 0]),
                pltpu.make_async_copy(a_hbm.at[rows, :], ain.at[slot],
                                      in_sems.at[slot, 1]),
            ]
            if not compact:
                cp.append(pltpu.make_async_copy(g_hbm.at[pl.ds(j * 8, 8), :],
                                                gin.at[slot],
                                                in_sems.at[slot, 4]))
            if has_momentum:
                cp.append(pltpu.make_async_copy(v_hbm.at[rows, :],
                                                vin.at[slot],
                                                in_sems.at[slot, 3]))
            return cp

        def out_copies(j, slot):
            blk = gblk_ref[j]
            rows = pl.ds(blk * 8, 8)
            cp = [
                pltpu.make_async_copy(tout.at[slot], to_hbm.at[rows, :],
                                      out_sems.at[slot, 0]),
                pltpu.make_async_copy(aout.at[slot], ao_hbm.at[rows, :],
                                      out_sems.at[slot, 1]),
            ]
            if has_momentum:
                cp.append(pltpu.make_async_copy(vout.at[slot],
                                                vo_hbm.at[rows, :],
                                                out_sems.at[slot, 3]))
            return cp

        def pro(p, _):
            @pl.when(p < n)
            def _():
                for c in in_copies(p, jax.lax.rem(p, D)):
                    c.start()
            return 0

        jax.lax.fori_loop(0, D, pro, 0, unroll=True)

        def body(j, _):
            slot = jax.lax.rem(j, D)
            for c in in_copies(j, slot):
                c.wait()
            # drain the out-DMAs that used this slot D groups ago before
            # overwriting the out buffers
            @pl.when(j >= D)
            def _():
                for c in out_copies(j - D, slot):
                    c.wait()

            if needs_mask or compact:
                bits = mask_ref[j]
                rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                member = ((bits >> rowid) & 1) > 0
            if compact:
                # read the enclosing ALIGNED 16-row window of the
                # VMEM-resident compact gradients ((start >> 3) * 8 is
                # provably tile-aligned) and align members to table
                # sublanes: window position (start & 7) + i holds the
                # group's i-th member (ascending sublane), so
                # P[s, w] = member(s) & (w == off + rank of bit s in mask);
                # the matmul also zeroes non-member sublanes (gpad
                # semantics)
                start = gstart_ref[j]
                win = g_hbm[pl.ds((start >> 3) * 8, 16), :]
                off = start & 7
                s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 0)
                w_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)
                rank_s = _popcount8(bits & ((jnp.int32(1) << s_iota) - 1))
                member_s = ((bits >> s_iota) & 1) > 0
                P = (member_s & (w_iota == off + rank_s)).astype(jnp.float32)
                # HIGHEST precision: the default TPU f32 dot truncates the
                # operands to bf16 passes, which would ROUND the gradients
                # this matmul merely selects (one-hot rows make the highest-
                # precision product/sum chain exact)
                g = jax.lax.dot(P, win.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            else:
                g = gin[slot]
            t_old = tin[slot].astype(jnp.float32)
            if sr:
                # dither bits keyed on (seed, absolute table row, column):
                # the XLA path hashes the same triples, so SR state stays
                # bit-identical across paths. Rows whose f32 value is
                # already bf16-representable (all non-member lanes: g = 0)
                # round EXACTLY for every dither value.
                rowv = seed_ref[1] + gblk_ref[j] * 8 + jax.lax.broadcasted_iota(
                    jnp.int32, (8, 1), 0)
                dbits = sr_bits16(seed_ref[0], rowv, d)
            if adapt == "adagrad":
                acc_new = (ain[slot].astype(jnp.float32) if sr
                           else ain[slot]) + g * g
                gs = g / jnp.sqrt(acc_new + EPSILON)
                aout[slot] = sr_round_bf16(acc_new, dbits) if sr else acc_new
            elif adapt == "rmsprop":
                a_old = ain[slot].astype(jnp.float32)
                acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g,
                                    a_old)
                gs = g / jnp.sqrt(acc_new + EPSILON)
                aout[slot] = acc_new.astype(acc_dtype)
            elif adapt == "adadelta":
                am = ain[slot].astype(jnp.float32)
                a_old, u_old = am[:, :d], am[:, d:]
                acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g,
                                    a_old)
                scal = (u_old + EPSILON) / (acc_new + EPSILON)
                u_new = jnp.where(
                    member, v1 * u_old + (1.0 - v1) * scal * g * g, u_old)
                gs = g * jnp.sqrt(scal)
                aout[slot] = jnp.concatenate([acc_new, u_new],
                                             axis=1).astype(acc_dtype)
            else:  # adam: [acc | meang | count-column block]
                am = ain[slot].astype(jnp.float32)
                a_old, m_old = am[:, :d], am[:, d:2 * d]
                cntb = am[:, 2 * d:]
                acc_new = jnp.where(member, v2 * a_old + (1.0 - v2) * g * g,
                                    a_old)
                m_new = jnp.where(member, v1 * m_old + (1.0 - v1) * g, m_old)
                # the per-row step count rides the state block: increment
                # member rows, derive the bias corrections in-register
                # (non-member lanes keep corr = 1, an inf/NaN-free dummy).
                # SR layout stores it as base-256 limbs in lanes 0..2 (bf16
                # holds integers exactly only to 256; the limbs' exact
                # range 2^24 equals a single f32 count's — ops/sr.py)
                if sr:
                    cnt_old = limbs_decode(cntb[:, :1], cntb[:, 1:2],
                                           cntb[:, 2:3])
                else:
                    cnt_old = cntb[:, :1]
                cnt_new = jnp.where(member, cnt_old + 1.0, cnt_old)
                one = jnp.ones_like(cnt_new)
                c1 = (jnp.where(member, _neg_expm1(cnt_new * ln_v1), 1.0)
                      if ln_v1 is not None else one)
                c2 = (jnp.where(member, _neg_expm1(cnt_new * ln_v2), 1.0)
                      if ln_v2 is not None else one)
                gs = (m_new / c1) / (jnp.sqrt(acc_new / c2) + EPSILON)
                if sr:
                    lo, mid, hi = limbs_encode(cnt_new)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                    cntb_new = jnp.where(
                        lane == 0, lo, jnp.where(
                            lane == 1, mid, jnp.where(lane == 2, hi, 0.0)))
                    # slow second moment stored with SR (unbiased, no
                    # freeze); the exact-integer limbs round-to-nearest
                    # exactly. The first moment follows the decay gate:
                    # RN at the usual fast v1, SR when v1 > 0.99 (sr_m)
                    if sr_m:
                        mbits = sr_bits16(seed_ref[0], rowv, d, col_offset=d)
                        m_stored = sr_round_bf16(m_new, mbits)
                    else:
                        m_stored = m_new.astype(acc_dtype)
                    aout[slot] = jnp.concatenate(
                        [sr_round_bf16(acc_new, dbits),
                         m_stored,
                         cntb_new.astype(acc_dtype)], axis=1)
                else:
                    # count fills ALL 128 lanes (aligned broadcast, no
                    # cross-tile lane shifts -- see the v2 kernel note)
                    cntb_new = jnp.broadcast_to(cnt_new, (8, 128))
                    aout[slot] = jnp.concatenate([acc_new, m_new, cntb_new],
                                                 axis=1).astype(acc_dtype)
            if lmbd > 0:
                delta = lr * (gs + lmbd * t_old)
            else:
                delta = lr * gs
            if has_momentum:
                v_old = vin[slot].astype(jnp.float32)
                vnew = momentum * v_old - delta
                vnew = jnp.where(member, vnew, v_old)
                vout[slot] = vnew.astype(vel_dtype)
                tout[slot] = (t_old + jnp.where(member, vnew, 0.0)).astype(
                    table.dtype)
            else:
                if needs_mask:
                    tout[slot] = (t_old - jnp.where(member, delta, 0.0)).astype(
                        table.dtype)
                else:
                    tout[slot] = (t_old - delta).astype(table.dtype)
            for c in out_copies(j, slot):
                c.start()
            @pl.when(j + D < n)
            def _():
                for c in in_copies(j + D, jax.lax.rem(j + D, D)):
                    c.start()
            return 0

        jax.lax.fori_loop(0, n, body, 0)

        def epi(p, _):
            j = n - D + p
            @pl.when(j >= 0)
            def _():
                for c in out_copies(j, jax.lax.rem(j, D)):
                    c.wait()
            return 0

        jax.lax.fori_loop(0, D, epi, 0, unroll=True)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    inputs = [table, acc]
    in_specs = [any_spec, any_spec]
    if has_momentum:
        inputs.append(vel)
        in_specs.append(any_spec)
    inputs.append(gpad)
    # compact mode: the whole gradient buffer is VMEM-resident (read
    # directly per group — no DMA stream, no scratch slot)
    in_specs.append(
        pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)
        if compact else any_spec)
    out_shape = [jax.ShapeDtypeStruct(table.shape, table.dtype),
                 jax.ShapeDtypeStruct(acc.shape, acc.dtype)]
    out_specs = [any_spec, any_spec]
    # aliases offset by the scalar-prefetch args
    # (gblk, mask, nreal[, gstart][, sr_seed])
    n_pref = (4 if compact else 3) + (1 if sr else 0)
    aliases = {n_pref: 0, n_pref + 1: 1}
    if has_momentum:
        out_shape.append(jax.ShapeDtypeStruct(vel.shape, vel.dtype))
        out_specs.append(any_spec)
        aliases[n_pref + 2] = 2

    scratch = [
        pltpu.VMEM((D, 8, d), table.dtype),   # tin
        pltpu.VMEM((D, 8, d), table.dtype),   # tout
        pltpu.VMEM((D, 8, ds), acc.dtype),    # ain (merged state for adam/adadelta)
        pltpu.VMEM((D, 8, ds), acc.dtype),    # aout
    ]
    if has_momentum:
        scratch += [pltpu.VMEM((D, 8, d), vel.dtype)] * 2
    if not compact:
        scratch.append(pltpu.VMEM((D, 8, d), gpad.dtype))
    scratch += [pltpu.SemaphoreType.DMA((D, 5)),
                pltpu.SemaphoreType.DMA((D, 4))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref, grid=(1,), in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch,
    )
    pref = (gblk, mask, nreal) + ((gstart,) if compact else ())
    if sr:
        pref = pref + (sr_seed,)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases, interpret=interpret,
    )(*pref, *inputs)
    outs = list(outs)
    t_out = outs.pop(0)
    a_out = outs.pop(0)
    v_out = outs.pop(0) if has_momentum else None
    return t_out, a_out, v_out


@partial(jax.jit, static_argnames=("adapt", "lr", "momentum", "lmbd", "v1",
                                   "v2", "interpret"))
def fused_update_v3(adapt, table, acc, vel, gblk, mask, nreal, gpad,
                    *, lr: float, momentum: float, lmbd: float,
                    v1: float, v2: float, interpret: bool = False,
                    sr_seed=None):
    """``acc`` is the single state buffer: (n, d) for adagrad/rmsprop,
    merged (n, 2d) [acc | upd] for adadelta, (n, 2d + 128)
    [acc | meang | count-column] for adam. ``sr_seed`` (int32 scalar)
    enables the bfloat16 stochastic-rounding state layout (ops/sr.py;
    requires a bf16 ``acc`` and adapt adagrad/adam). Returns
    (table, state, velocity-or-None)."""
    return _fused_update_v3(
        adapt, table, acc, vel, gblk, mask, nreal, gpad,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=v2,
        interpret=interpret, sr_seed=sr_seed,
    )


@partial(jax.jit, static_argnames=("adapt", "lr", "momentum", "lmbd", "v1",
                                   "v2", "interpret"))
def fused_update_v4(adapt, table, acc, vel, gblk, mask, gstart, nreal, gcomp,
                    *, lr: float, momentum: float, lmbd: float,
                    v1: float, v2: float, interpret: bool = False,
                    sr_seed=None):
    """v4: the v3 pipeline fed COMPACT deduped gradients
    (:func:`group_pack_compact`) with in-kernel sublane alignment — no
    (8K, d) gpad staging buffer. Same state layout contract as v3."""
    return _fused_update_v3(
        adapt, table, acc, vel, gblk, mask, nreal, gcomp,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=v2,
        interpret=interpret, gstart=gstart, sr_seed=sr_seed,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "interpret"))
def fused_adagrad_update(table, acc, vel, gblk, mask, gpad, *, lr: float,
                         momentum: float, lmbd: float, interpret: bool = False):
    return _fused_update(
        "adagrad", table, acc, vel, gblk, mask, gpad,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=0.0, v2=0.0,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1", "interpret"))
def fused_rmsprop_update(table, acc, vel, gblk, mask, gpad, *, lr: float,
                         momentum: float, lmbd: float, v1: float,
                         interpret: bool = False):
    return _fused_update(
        "rmsprop", table, acc, vel, gblk, mask, gpad,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=0.0,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1",
                                   "interpret"))
def fused_adadelta_update(table, acc2, vel, gblk, mask, gpad, *, lr: float,
                          momentum: float, lmbd: float, v1: float,
                          interpret: bool = False):
    """``acc2`` is the merged (n, 2d) [acc | upd] state buffer."""
    return _fused_update(
        "adadelta", table, acc2, vel, gblk, mask, gpad,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=0.0,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1", "v2",
                                   "interpret"))
def fused_adam_update(table, acc2, vel, gblk, mask, gpad,
                      *, lr: float, momentum: float, lmbd: float, v1: float,
                      v2: float, interpret: bool = False):
    """``acc2`` is the merged (n, 2d + 128) [acc | meang | count-column]
    state buffer."""
    return _fused_update(
        "adam", table, acc2, vel, gblk, mask, gpad,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=v2,
        interpret=interpret,
    )
