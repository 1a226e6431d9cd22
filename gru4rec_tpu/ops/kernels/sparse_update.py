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
* adam's bias corrections depend on per-row step counts, which live OUTSIDE
  the kernel as a 1-D f32 array updated with cheap XLA ops; the per-slot
  correction factors enter the kernel as packed (8K, 1) columns;
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

EPSILON = 1e-6  # keep in sync with train/optimizers.py
PALLAS_MIN_ROWS = 98304  # below this, XLA's in-place scatters win (v5e)


def _kernels_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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
V3_DEPTH = 16


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


def _fused_update(adapt, table, acc, extra, vel, gblk, mask, gpad, corr1,
                  corr2, *, lr, momentum, lmbd, v1, v2, interpret):
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

    ``extra`` is the second state slot: adam's first moment / adadelta's upd
    (None otherwise). ``corr1``/``corr2`` are adam-only. ``vel`` may be None
    when momentum == 0. State may be stored narrow (opt_state_dtype); math
    runs in f32 and the UNROUNDED values update the table — exactly like the
    XLA path (train/optimizers.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = table.shape
    K = gblk.shape[0]
    has_momentum = momentum > 0
    is_adam = adapt == "adam"
    has_extra = adapt in ("adam", "adadelta")
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
    extra_dtype = extra.dtype if has_extra else None

    def kernel(gblk_ref, mask_ref, *refs):
        if is_adam:
            (t_ref, a_ref, m_ref, v_ref, g_ref, c1_ref, c2_ref,
             to_ref, ao_ref, mo_ref, vo_ref) = refs
        elif has_extra:  # adadelta
            (t_ref, a_ref, m_ref, v_ref, g_ref,
             to_ref, ao_ref, mo_ref, vo_ref) = refs
        else:
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
            a_old = a_ref[...].astype(jnp.float32)
            u_old = m_ref[...].astype(jnp.float32)
            acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g, a_old)
            scal = (u_old + EPSILON) / (acc_new + EPSILON)
            u_new = jnp.where(member,
                              v1 * u_old + (1.0 - v1) * scal * g * g, u_old)
            gs = g * jnp.sqrt(scal)
            ao_ref[...] = acc_new.astype(acc_dtype)
            mo_ref[...] = u_new.astype(extra_dtype)
        else:  # adam
            a_old = a_ref[...].astype(jnp.float32)
            m_old = m_ref[...].astype(jnp.float32)
            acc_new = jnp.where(member, v2 * a_old + (1.0 - v2) * g * g, a_old)
            m_new = jnp.where(member, v1 * m_old + (1.0 - v1) * g, m_old)
            gs = (m_new / c1_ref[...]) / (jnp.sqrt(acc_new / c2_ref[...])
                                          + EPSILON)
            ao_ref[...] = acc_new.astype(acc_dtype)
            mo_ref[...] = m_new.astype(extra_dtype)
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
        pl.BlockSpec((8, d), blk_map),   # table
        pl.BlockSpec((8, d), blk_map),   # acc
    ]
    inputs = [table, acc]
    out_specs = [
        pl.BlockSpec((8, d), blk_map),
        pl.BlockSpec((8, d), blk_map),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(table.shape, table.dtype),
        jax.ShapeDtypeStruct(acc.shape, acc.dtype),
    ]
    aliases = {2: 0, 3: 1}  # inputs 2.. are offset by the 2 scalar-prefetch args
    if has_extra:
        in_specs.append(pl.BlockSpec((8, d), blk_map))
        inputs.append(extra)
        out_specs.append(pl.BlockSpec((8, d), blk_map))
        out_shape.append(jax.ShapeDtypeStruct(extra.shape, extra.dtype))
        aliases[4] = 2
    vel_pos = len(inputs) + 2
    in_specs.append(pl.BlockSpec((8, d), vel_map))
    inputs.append(vel)
    out_specs.append(pl.BlockSpec((8, d), vel_map))
    out_shape.append(jax.ShapeDtypeStruct(vel.shape, vel.dtype))
    aliases[vel_pos] = len(out_shape) - 1
    in_specs.append(pl.BlockSpec((8, d), g_map))
    inputs.append(gpad)
    if is_adam:
        for c in (corr1, corr2):
            in_specs.append(pl.BlockSpec((8, 1), g_map))
            inputs.append(c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(K,), in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases, interpret=interpret,
    )(gblk, mask, *inputs)
    if has_extra:
        t_out, a_out, m_out, v_out = outs
    else:
        t_out, a_out, v_out = outs
        m_out = None
    v_out = v_out if has_momentum else None
    return t_out, a_out, m_out, v_out


def _fused_update_v3(adapt, table, acc, extra, vel, gblk, mask, nreal, gpad,
                     corr1, corr2, *, lr, momentum, lmbd, v1, v2, interpret):
    """v3: manual-DMA software pipeline over ONLY the real groups.

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
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, d = table.shape
    K = gblk.shape[0]
    D = V3_DEPTH
    has_momentum = momentum > 0
    is_adam = adapt == "adam"
    has_extra = adapt in ("adam", "adadelta")
    needs_mask = has_momentum or lmbd > 0 or adapt != "adagrad"
    acc_dtype = acc.dtype
    extra_dtype = extra.dtype if has_extra else None
    vel_dtype = vel.dtype if has_momentum else None

    def kernel(gblk_ref, mask_ref, nreal_ref, *refs):
        refs = list(refs)
        t_hbm = refs.pop(0)
        a_hbm = refs.pop(0)
        x_hbm = refs.pop(0) if has_extra else None
        v_hbm = refs.pop(0) if has_momentum else None
        g_hbm = refs.pop(0)
        c1_ref = refs.pop(0) if is_adam else None
        c2_ref = refs.pop(0) if is_adam else None
        to_hbm = refs.pop(0)
        ao_hbm = refs.pop(0)
        xo_hbm = refs.pop(0) if has_extra else None
        vo_hbm = refs.pop(0) if has_momentum else None
        (tin, tout, ain, aout) = refs[:4]
        refs = refs[4:]
        xin = refs.pop(0) if has_extra else None
        xout = refs.pop(0) if has_extra else None
        vin = refs.pop(0) if has_momentum else None
        vout = refs.pop(0) if has_momentum else None
        gin = refs.pop(0)
        in_sems, out_sems = refs

        n = nreal_ref[0]

        def in_copies(j, slot):
            blk = gblk_ref[j]
            rows = pl.ds(blk * 8, 8)
            cp = [
                pltpu.make_async_copy(t_hbm.at[rows, :], tin.at[slot],
                                      in_sems.at[slot, 0]),
                pltpu.make_async_copy(a_hbm.at[rows, :], ain.at[slot],
                                      in_sems.at[slot, 1]),
                pltpu.make_async_copy(g_hbm.at[pl.ds(j * 8, 8), :],
                                      gin.at[slot], in_sems.at[slot, 4]),
            ]
            if has_extra:
                cp.append(pltpu.make_async_copy(x_hbm.at[rows, :],
                                                xin.at[slot],
                                                in_sems.at[slot, 2]))
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
            if has_extra:
                cp.append(pltpu.make_async_copy(xout.at[slot],
                                                xo_hbm.at[rows, :],
                                                out_sems.at[slot, 2]))
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

            g = gin[slot]
            if needs_mask:
                bits = mask_ref[j]
                rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                member = ((bits >> rowid) & 1) > 0
            t_old = tin[slot].astype(jnp.float32)
            if adapt == "adagrad":
                acc_new = ain[slot] + g * g
                gs = g / jnp.sqrt(acc_new + EPSILON)
                aout[slot] = acc_new
            elif adapt == "rmsprop":
                a_old = ain[slot].astype(jnp.float32)
                acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g,
                                    a_old)
                gs = g / jnp.sqrt(acc_new + EPSILON)
                aout[slot] = acc_new.astype(acc_dtype)
            elif adapt == "adadelta":
                a_old = ain[slot].astype(jnp.float32)
                u_old = xin[slot].astype(jnp.float32)
                acc_new = jnp.where(member, v1 * a_old + (1.0 - v1) * g * g,
                                    a_old)
                scal = (u_old + EPSILON) / (acc_new + EPSILON)
                u_new = jnp.where(
                    member, v1 * u_old + (1.0 - v1) * scal * g * g, u_old)
                gs = g * jnp.sqrt(scal)
                aout[slot] = acc_new.astype(acc_dtype)
                xout[slot] = u_new.astype(extra_dtype)
            else:  # adam
                a_old = ain[slot].astype(jnp.float32)
                m_old = xin[slot].astype(jnp.float32)
                acc_new = jnp.where(member, v2 * a_old + (1.0 - v2) * g * g,
                                    a_old)
                m_new = jnp.where(member, v1 * m_old + (1.0 - v1) * g, m_old)
                c1 = c1_ref[pl.ds(j * 8, 8), :]
                c2 = c2_ref[pl.ds(j * 8, 8), :]
                gs = (m_new / c1) / (jnp.sqrt(acc_new / c2) + EPSILON)
                aout[slot] = acc_new.astype(acc_dtype)
                xout[slot] = m_new.astype(extra_dtype)
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
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    inputs = [table, acc]
    in_specs = [any_spec, any_spec]
    if has_extra:
        inputs.append(extra)
        in_specs.append(any_spec)
    if has_momentum:
        inputs.append(vel)
        in_specs.append(any_spec)
    inputs.append(gpad)
    in_specs.append(any_spec)
    if is_adam:
        inputs += [corr1, corr2]
        in_specs += [vmem_full, vmem_full]
    out_shape = [jax.ShapeDtypeStruct(table.shape, table.dtype),
                 jax.ShapeDtypeStruct(acc.shape, acc.dtype)]
    out_specs = [any_spec, any_spec]
    # aliases: +3 for the scalar-prefetch args (gblk, mask, nreal)
    aliases = {3: 0, 4: 1}
    pos = 5
    out_i = 2
    if has_extra:
        out_shape.append(jax.ShapeDtypeStruct(extra.shape, extra.dtype))
        out_specs.append(any_spec)
        aliases[pos] = out_i
        pos += 1
        out_i += 1
    if has_momentum:
        out_shape.append(jax.ShapeDtypeStruct(vel.shape, vel.dtype))
        out_specs.append(any_spec)
        aliases[pos] = out_i

    scratch = [
        pltpu.VMEM((D, 8, d), table.dtype),  # tin
        pltpu.VMEM((D, 8, d), table.dtype),  # tout
        pltpu.VMEM((D, 8, d), acc.dtype),    # ain
        pltpu.VMEM((D, 8, d), acc.dtype),    # aout
    ]
    if has_extra:
        scratch += [pltpu.VMEM((D, 8, d), extra.dtype)] * 2
    if has_momentum:
        scratch += [pltpu.VMEM((D, 8, d), vel.dtype)] * 2
    scratch.append(pltpu.VMEM((D, 8, d), gpad.dtype))
    scratch += [pltpu.SemaphoreType.DMA((D, 5)),
                pltpu.SemaphoreType.DMA((D, 4))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(1,), in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases, interpret=interpret,
    )(gblk, mask, nreal, *inputs)
    outs = list(outs)
    t_out = outs.pop(0)
    a_out = outs.pop(0)
    x_out = outs.pop(0) if has_extra else None
    v_out = outs.pop(0) if has_momentum else None
    return t_out, a_out, x_out, v_out


@partial(jax.jit, static_argnames=("adapt", "lr", "momentum", "lmbd", "v1",
                                   "v2", "interpret"))
def fused_update_v3(adapt, table, acc, extra, vel, gblk, mask, nreal, gpad,
                    corr1, corr2, *, lr: float, momentum: float, lmbd: float,
                    v1: float, v2: float, interpret: bool = False):
    return _fused_update_v3(
        adapt, table, acc, extra, vel, gblk, mask, nreal, gpad, corr1, corr2,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=v2,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "interpret"))
def fused_adagrad_update(table, acc, vel, gblk, mask, gpad, *, lr: float,
                         momentum: float, lmbd: float, interpret: bool = False):
    t, a, _, v = _fused_update(
        "adagrad", table, acc, None, vel, gblk, mask, gpad, None, None,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=0.0, v2=0.0,
        interpret=interpret,
    )
    return t, a, v


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1", "interpret"))
def fused_rmsprop_update(table, acc, vel, gblk, mask, gpad, *, lr: float,
                         momentum: float, lmbd: float, v1: float,
                         interpret: bool = False):
    t, a, _, v = _fused_update(
        "rmsprop", table, acc, None, vel, gblk, mask, gpad, None, None,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=0.0,
        interpret=interpret,
    )
    return t, a, v


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1",
                                   "interpret"))
def fused_adadelta_update(table, acc, upd, vel, gblk, mask, gpad, *, lr: float,
                          momentum: float, lmbd: float, v1: float,
                          interpret: bool = False):
    return _fused_update(
        "adadelta", table, acc, upd, vel, gblk, mask, gpad, None, None,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=0.0,
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "v1", "v2",
                                   "interpret"))
def fused_adam_update(table, acc, meang, vel, gblk, mask, gpad, corr1, corr2,
                      *, lr: float, momentum: float, lmbd: float, v1: float,
                      v2: float, interpret: bool = False):
    return _fused_update(
        "adam", table, acc, meang, vel, gblk, mask, gpad, corr1, corr2,
        lr=lr, momentum=momentum, lmbd=lmbd, v1=v1, v2=v2,
        interpret=interpret,
    )
