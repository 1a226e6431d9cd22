"""The five optimizers of GRU4Rec with dense and row-sparse paths.

Reference: gru4rec.py:300-432 (adagrad/rmsprop/adadelta/adam + plain SGD,
each with a dense path and a sampled-row path, plus Nesterov momentum, L2,
and global-norm clipping in the ``RMSprop`` orchestrator).

Deliberate divergences from the reference (documented, not accidental):

* **Duplicate row indices.** The reference's sparse paths either tolerate
  nondeterministic last-write-wins scatters or use a slower
  ``inc_subtensor(set_subtensor(...))`` trick (gru4rec.py:319-326). On TPU we
  instead *dedup first*: duplicate-index gradients are summed into one row
  gradient (sort + segment-sum, static shapes), after which every touched row
  is updated exactly once with dense-equivalent math — deterministic by
  construction (SURVEY.md §5).
* **Adam.** The reference's sparse Adam updates the first moment with the
  *squared* gradient (gru4rec.py:325) and bias-corrects the second moment
  with the first moment's decay (gru4rec.py:329) — both long-standing bugs.
  We implement textbook Adam.

Padding rows created for MXU tiling are protected by a drop-sentinel index:
all scatters use ``mode='drop'`` and dead-lane/padded entries carry an
out-of-bounds index.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gru4rec_tpu.config import GRU4RecConfig

EPSILON = 1e-6
_FORCE_PALLAS = None  # test hook: None = auto, True/False = override
_FORCE_PALLAS_VERSION = None  # test hook: None = auto, "v2"/"v3" = pin


def _ln(v: float) -> float:
    """log of a decay constant for the expm1 bias-correction form; v=0
    (degenerate adapt_params) maps to -inf, for which -expm1(t*-inf) = 1 =
    the correct 1 - 0^t."""
    import math

    return math.log(v) if v > 0 else -math.inf


def dedup_rows(idx, g):
    """Sum gradients of duplicate row indices; static output shapes.

    Returns ``(uidx, g_sum)`` of the same length as ``idx``: position k holds
    the k-th distinct index and the sum of its gradient rows; unused tail
    positions hold a drop-sentinel (int32 max) with zero gradient. Entries of
    ``idx`` already equal to a sentinel (masked lanes) sort to the tail and
    stay dropped.
    """
    n = idx.shape[0]
    # one two-output sort yields both the sorted keys and the permutation
    # (argsort + a separate take costs an extra pass)
    sidx, order = jax.lax.sort(
        (idx.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    sg = jnp.take(g, order, axis=0)
    head = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    g_sum = jax.ops.segment_sum(sg, seg, num_segments=n, indices_are_sorted=True)
    sentinel = jnp.iinfo(jnp.int32).max
    uidx = jnp.full((n,), sentinel, dtype=jnp.int32)
    uidx = uidx.at[seg].set(sidx.astype(jnp.int32))
    return uidx, g_sum


def _take_rows(table, uidx, fill=0.0):
    # uidx comes from dedup_rows: sorted ascending with a sentinel tail.
    # Sorted+unique gather/scatter hits a ~2x faster XLA path on TPU.
    # Math always runs in float32; narrow-stored state is promoted on read.
    return table.at[uidx].get(
        mode="fill", fill_value=fill, indices_are_sorted=True, unique_indices=True
    ).astype(jnp.float32)


def _put_rows(table, uidx, rows):
    # Counterpart of _take_rows: round to the table's storage dtype on write.
    return table.at[uidx].set(
        rows.astype(table.dtype), mode="drop", indices_are_sorted=True,
        unique_indices=True,
    )


class Optimizer:
    """Functional optimizer bundle parameterized by the config."""

    def __init__(self, cfg: GRU4RecConfig):
        self.adapt = cfg.adapt
        self.lr = cfg.learning_rate
        self.momentum = cfg.momentum
        self.lmbd = cfg.lmbd
        self.grad_cap = cfg.grad_cap
        # "bfloat16_sr" = bfloat16 storage EVERYWHERE the decay gate would
        # otherwise force f32 (adagrad's monotone accumulator, adam's
        # v2=0.999 second moment), kept unbiased by stochastic rounding
        # (ops/sr.py) instead of freezing under round-to-nearest
        self.state_sr = cfg.opt_state_dtype == "bfloat16_sr"
        self.sparse_state_dtype = jnp.dtype(
            jnp.bfloat16 if self.state_sr else cfg.opt_state_dtype)
        # getattr: hand-built configs predating the knob stay valid
        self.dedup_impl = getattr(cfg, "dedup_impl", "sort")
        ap = cfg.adapt_params
        self.v1 = ap[0] if ap else 0.9
        self.v2 = ap[1] if len(ap) > 1 else 0.999

    # ------------------------------------------------------------------ #
    def _ema_dtype(self, decay, param):
        """Storage dtype for sparse EMA state with the given decay constant.

        An EMA near steady state changes by ~(1-decay) relative per step.
        Stored narrower than the dtype's rounding threshold (bf16 half-ULP
        ~3.9e-3), the update rounds back to the old value and the state
        silently FREEZES — e.g. adam's second moment at the default
        v2=0.999 (per-step change ~1e-3). Narrow storage is only allowed
        when the per-step change clears bf16's threshold with margin
        (decay <= 0.99); slower EMAs stay in the parameter dtype. The
        ``opt_state_dtype="bfloat16_sr"`` escape (stochastic rounding, no
        freeze — ops/sr.py) is NOT granted here: it applies only to the
        slots whose update paths actually implement SR, which init_state
        narrows explicitly (adam's merged acc2, adagrad's acc).
        """
        if decay <= 0.99:
            return self.sparse_state_dtype
        return param.dtype

    def init_state(self, param, sparse: bool = False) -> Dict:
        # NOTE: one fresh buffer per slot — sharing a zeros array between
        # state slots breaks buffer donation (same buffer donated twice).
        # Sparse (row-updated item-table) state MAY be stored in the narrow
        # ``opt_state_dtype`` (see config.py); dense state stays float32.
        # Adagrad's accumulator is a MONOTONE sum — in a narrow dtype with
        # round-to-nearest, late g^2 increments would round away entirely and
        # silently freeze the 1/sqrt(T) decay — so it stays in the
        # parameter dtype by default. (Stochastic rounding fixes the bias
        # but on the XLA-scatter path was measured a net loss on v5e: the
        # dither costs more than bf16 scatters save, because the (16,128)
        # bf16 tile doubles the sublane read-modify-write amplification of
        # row scatters. The fused-KERNEL path has no such amplification —
        # its manual 8-row DMAs move exactly the touched bytes — which is
        # what the opt-in ``opt_state_dtype="bfloat16_sr"`` is for: SR-kept
        # bf16 storage for this slot and adam's merged state, ops/sr.py.)
        # EMA-type state (rmsprop / adadelta / adam accumulators, momentum
        # velocity) is a contraction where nearest-rounding is noise — but
        # ONLY while the decay is fast enough that per-step changes survive
        # the rounding; _ema_dtype gates each slot on its decay constant.
        # Two-slot optimizers (adam: acc+meang, adadelta: acc+upd) store their
        # SPARSE state MERGED side-by-side in one buffer ("acc2"): the fused
        # v3 kernel is DMA-issue-bound on the scalar core (~40ns/issue;
        # bytes are nearly free there), so one wide state DMA pair replaces
        # two (8, d) pairs, ~-80ns per touched row group.
        #
        # * adadelta: (n, 2d), columns [0:d] = acc, [d:2d] = upd.
        # * adam: (n, 2d + 128), columns [0:d] = acc, [d:2d] = meang, and
        #   [2d] = the per-row STEP COUNT for bias correction (the rest of
        #   the 128-lane block is padding). Folding the count into the state
        #   rows removes all per-step 1-D count bookkeeping (a compact
        #   gather + 2 scatters, measured 78 us/step at the Rees46 shape) —
        #   the count and its corrections ride the state DMA/gather that
        #   happens anyway.
        #
        # The merged buffer shares one dtype: adam's second moment requires
        # f32 (v2=0.999 freezes in bf16, _ema_dtype), which costs the bf16
        # meang storage the split layout had — measured a net win on the
        # kernel path and a small loss on the XLA path (where adaptive state
        # is promoted and cheap).
        def zeros(dtype):
            return jnp.zeros(param.shape, dtype=dtype)

        def ema(decay):
            return self._ema_dtype(decay, param) if sparse else param.dtype

        two_slot = self.adapt in ("adam", "adadelta")
        merged = sparse and two_slot and param.ndim == 2
        st: Dict = {}
        sr = self.state_sr and sparse and param.ndim == 2
        if self.adapt == "adagrad":
            st["acc"] = zeros(jnp.bfloat16 if sr else param.dtype)
        elif self.adapt == "rmsprop":
            st["acc"] = zeros(ema(self.v1))
        elif merged and self.adapt == "adadelta":
            st["acc2"] = jnp.zeros((param.shape[0], 2 * param.shape[1]),
                                   dtype=ema(self.v1))
        elif merged:  # adam: [acc | meang | count-column block]
            # f32 by default: the count column stores integers, and bf16's
            # 8 mantissa bits freeze any count at 256 (256 + 1 rounds back
            # under ties-to-even) — bias corrections would stick at
            # 1 - v^256 forever; and the v2=0.999 second moment freezes in
            # bf16 under round-to-nearest (_ema_dtype).
            # Under "bfloat16_sr" the whole buffer narrows to bf16: the
            # second moment is kept unbiased by stochastic rounding, the
            # first moment is RN at the usual fast v1 and SR when
            # v1 > 0.99 (the same decay gate as _ema_dtype), and the
            # count is packed as THREE base-256 limbs in the count block's
            # first lanes (each limb 0..255 is exact in bf16; exact range
            # 2^24 = the same bound a single f32 count has). ops/sr.py.
            st["acc2"] = jnp.zeros(
                (param.shape[0], 2 * param.shape[1] + 128),
                dtype=jnp.bfloat16 if sr else jnp.float32)
        elif self.adapt == "adadelta":
            st["acc"] = zeros(ema(self.v1))
            st["upd"] = zeros(ema(self.v1))
        elif self.adapt == "adam":
            st["acc"] = zeros(ema(self.v2))
            st["meang"] = zeros(ema(self.v1))
        if self.adapt == "adam" and not merged:
            # per-ROW count, not a scalar: this layout also serves
            # apply_sparse on a dense-layout state (rows advance at
            # different rates there — test_sparse_matches_dense). Still a
            # compression of the reference's full param-shaped countt
            # (gru4rec.py:307); _adapt_dense reads count[0] since dense
            # steps advance all rows in lockstep.
            st["count"] = (
                jnp.zeros((param.shape[0],), dtype=jnp.float32)
                if param.ndim >= 1
                else jnp.zeros((), dtype=jnp.float32)
            )
        if self.momentum > 0:
            st["velocity"] = zeros(ema(self.momentum))
        return st

    # ------------------------------------------------------------------ #
    def _adapt_dense(self, g, st):
        a = self.adapt
        if a == "adagrad":
            acc = st["acc"] + g**2
            st = {**st, "acc": acc}
            return g / jnp.sqrt(acc + EPSILON), st
        if a == "rmsprop":
            acc = self.v1 * st["acc"] + (1.0 - self.v1) * g**2
            st = {**st, "acc": acc}
            return g / jnp.sqrt(acc + EPSILON), st
        if a == "adadelta":
            acc = self.v1 * st["acc"] + (1.0 - self.v1) * g**2
            scaling = (st["upd"] + EPSILON) / (acc + EPSILON)
            upd = self.v1 * st["upd"] + (1.0 - self.v1) * scaling * g**2
            st = {**st, "acc": acc, "upd": upd}
            return g * jnp.sqrt(scaling), st
        if a == "adam":
            acc = self.v2 * st["acc"] + (1.0 - self.v2) * g**2
            meang = self.v1 * st["meang"] + (1.0 - self.v1) * g
            count = st["count"] + 1.0
            t = count if count.ndim == 0 else count[0]
            # 1 - v^t as -expm1(t ln v): the naive form cancels
            # catastrophically when v^t ~ 1 (v2=0.999, small t)
            mhat = meang / -jnp.expm1(t * _ln(self.v1))
            vhat = acc / -jnp.expm1(t * _ln(self.v2))
            st = {**st, "acc": acc, "meang": meang, "count": count}
            return mhat / (jnp.sqrt(vhat) + EPSILON), st
        return g, st  # plain SGD

    def _adapt_sparse(self, uidx, g, st, sr_seed=None):
        """Row-sparse adaptation; ``uidx`` is deduped with a drop-sentinel tail.

        ``sr_seed`` — an int32 (2,) vector [seed, global-row-offset] — is
        required for the slots stored with stochastic rounding
        (``opt_state_dtype="bfloat16_sr"``): the UNROUNDED f32 state drives
        this step's update math, the SR-rounded value is what's stored —
        the same convention as the fused kernels."""
        a = self.adapt

        def _sr_store(rows_f32, col_offset=0):
            from gru4rec_tpu.ops.sr import sr_bits16, sr_round_bf16

            return sr_round_bf16(
                rows_f32,
                sr_bits16(sr_seed[0], uidx + sr_seed[1], rows_f32.shape[1],
                          col_offset=col_offset))

        if a == "adagrad":
            rows = _take_rows(st["acc"], uidx) + g**2
            stored = _sr_store(rows) if (
                self.state_sr and st["acc"].dtype == jnp.bfloat16) else rows
            st = {**st, "acc": _put_rows(st["acc"], uidx, stored)}
            return g / jnp.sqrt(rows + EPSILON), st
        if a == "rmsprop":
            rows = self.v1 * _take_rows(st["acc"], uidx) + (1.0 - self.v1) * g**2
            st = {**st, "acc": _put_rows(st["acc"], uidx, rows)}
            return g / jnp.sqrt(rows + EPSILON), st
        if a == "adadelta":
            if "acc2" in st:  # merged [acc | upd] layout (see init_state)
                d = g.shape[1]
                au = _take_rows(st["acc2"], uidx)
                acc_old, upd_rows_old = au[:, :d], au[:, d:]
                acc_rows = self.v1 * acc_old + (1.0 - self.v1) * g**2
                scaling = (upd_rows_old + EPSILON) / (acc_rows + EPSILON)
                upd_rows = (self.v1 * upd_rows_old
                            + (1.0 - self.v1) * scaling * g**2)
                merged_rows = jnp.concatenate([acc_rows, upd_rows], axis=1)
                st = {**st, "acc2": _put_rows(st["acc2"], uidx, merged_rows)}
                return g * jnp.sqrt(scaling), st
            acc_rows = self.v1 * _take_rows(st["acc"], uidx) + (1.0 - self.v1) * g**2
            upd_rows_old = _take_rows(st["upd"], uidx)
            scaling = (upd_rows_old + EPSILON) / (acc_rows + EPSILON)
            upd_rows = self.v1 * upd_rows_old + (1.0 - self.v1) * scaling * g**2
            st = {
                **st,
                "acc": _put_rows(st["acc"], uidx, acc_rows),
                "upd": _put_rows(st["upd"], uidx, upd_rows),
            }
            return g * jnp.sqrt(scaling), st
        if a == "adam":
            if "acc2" in st:  # merged [acc | meang | count-column] layout
                d = g.shape[1]
                W = st["acc2"].shape[1]
                sr = self.state_sr and st["acc2"].dtype == jnp.bfloat16
                am = _take_rows(st["acc2"], uidx)
                acc_rows = self.v2 * am[:, :d] + (1.0 - self.v2) * g**2
                meang_rows = self.v1 * am[:, d:2 * d] + (1.0 - self.v1) * g
                if sr:
                    # count packed as base-256 limbs in the block's first
                    # three lanes (bf16 buffer; see init_state / ops/sr.py)
                    from gru4rec_tpu.ops.sr import limbs_decode, limbs_encode

                    cb = am[:, 2 * d:]
                    cnt = limbs_decode(cb[:, 0], cb[:, 1], cb[:, 2]) + 1.0
                else:
                    cnt = am[:, 2 * d] + 1.0
                corr1 = -jnp.expm1(cnt * _ln(self.v1))[:, None]
                corr2 = -jnp.expm1(cnt * _ln(self.v2))[:, None]
                if sr:
                    lo, mid, hi = limbs_encode(cnt[:, None])
                    cnt_block = jnp.concatenate(
                        [lo, mid, hi,
                         jnp.zeros((cnt.shape[0], W - 2 * d - 3), jnp.float32)],
                        axis=1)
                    # decay-gated rounding for the first moment: at the
                    # usual fast v1 (<= 0.99) round-to-nearest is exact
                    # enough (per-step relative change clears bf16's
                    # half-ULP, _ema_dtype); a SLOW v1 would freeze under
                    # RN, so it gets SR too — dithered on its own buffer
                    # columns d..2d-1
                    meang_stored = (
                        _sr_store(meang_rows, col_offset=d)
                        if self.v1 > 0.99 else
                        meang_rows.astype(jnp.bfloat16))
                    new_am = jnp.concatenate(
                        [_sr_store(acc_rows),
                         meang_stored,
                         cnt_block.astype(jnp.bfloat16)], axis=1)
                else:
                    # the count fills ALL 128 lanes of its block (see the
                    # kernel: aligned broadcast instead of lane-shifting
                    # concat)
                    new_am = jnp.concatenate(
                        [acc_rows, meang_rows,
                         jnp.broadcast_to(cnt[:, None],
                                          (cnt.shape[0], W - 2 * d))],
                        axis=1)
                st = {**st, "acc2": _put_rows(st["acc2"], uidx, new_am)}
                return (meang_rows / corr1) / (jnp.sqrt(acc_rows / corr2)
                                               + EPSILON), st
            acc_rows = self.v2 * _take_rows(st["acc"], uidx) + (1.0 - self.v2) * g**2
            meang_rows = self.v1 * _take_rows(st["meang"], uidx) + (1.0 - self.v1) * g
            cnt = _take_rows(st["count"], uidx) + 1.0
            corr1 = -jnp.expm1(cnt * _ln(self.v1))
            corr2 = -jnp.expm1(cnt * _ln(self.v2))
            if g.ndim > 1:
                corr1 = corr1[:, None]
                corr2 = corr2[:, None]
            st = {
                **st,
                "acc": _put_rows(st["acc"], uidx, acc_rows),
                "meang": _put_rows(st["meang"], uidx, meang_rows),
                "count": _put_rows(st["count"], uidx, cnt),
            }
            return (meang_rows / corr1) / (jnp.sqrt(acc_rows / corr2) + EPSILON), st
        return g, st

    # ------------------------------------------------------------------ #
    def apply_dense(self, p, g, st):
        g, st = self._adapt_dense(g, st)
        if self.momentum > 0:
            vel = self.momentum * st["velocity"] - self.lr * (g + self.lmbd * p)
            st = {**st, "velocity": vel}
            return p + vel, st
        return p * (1.0 - self.lr * self.lmbd) - self.lr * g, st

    def _kernel_version(self, table, st, n_idx=None):
        """Pick the fused-kernel variant for this table: None (XLA path),
        "v2" (group-blocked grid), "v3" (manual-DMA pipeline, dynamic
        length; requires a 128-aligned width) or "v4" (v3 fed compact
        VMEM-resident gradients — one less DMA issue per group and no
        (8K, d) gpad staging; requires the compact buffer to fit the
        COMPACT_VMEM_BYTES budget)."""
        if self.adapt is None or table.ndim != 2:
            return None  # plain SGD keeps the XLA path (no state to fuse)
        # the grouped kernels need 8-row-aligned tables and a final all-
        # padding group (guaranteed by models/gru.py pad_items for whole
        # tables; for row-shards, by dist_step's per-shard scratch rows)
        if table.shape[0] % 8:
            return None
        # adagrad's accumulator matches the param dtype (init_state) except
        # under bfloat16_sr; any other mismatch means an exotic hand-built
        # state — take the XLA path. Narrow (bf16) EMA state and velocity
        # are handled natively.
        if self.adapt == "adagrad" and st["acc"].dtype != table.dtype:
            if not (self.state_sr and st["acc"].dtype == jnp.bfloat16):
                return None

        # the v2 grid kernel has no stochastic-rounding support; SR configs
        # fall back to XLA wherever v3/v4 can't run
        def _gate(v):
            if (v == "v2" and self.state_sr
                    and self.adapt in ("adagrad", "adam")):
                return None
            return v
        # the kernels consume adam/adadelta state in the merged (n, 2d)
        # layout; a split-layout state (hand-built, or a non-2D param) takes
        # the XLA path
        if self.adapt in ("adam", "adadelta") and "acc2" not in st:
            return None
        width_ok = table.shape[1] % 128 == 0
        if _FORCE_PALLAS is not None:
            if not _FORCE_PALLAS:
                return None
            if _FORCE_PALLAS_VERSION is not None:
                return _gate(_FORCE_PALLAS_VERSION)
            return _gate("v3" if width_ok else "v2")
        from gru4rec_tpu.ops.kernels.sparse_update import (
            COMPACT_VMEM_BYTES, PALLAS_MIN_ROWS, V3_MIN_TABLE_BYTES,
            _kernels_available)

        if not _kernels_available():
            return None
        nbytes = table.shape[0] * table.shape[1] * table.dtype.itemsize
        if width_ok and nbytes >= V3_MIN_TABLE_BYTES:
            # Measured r4 hardware A/B (PERF_NOTES "v4 refutation"): v3
            # beats v4 at EVERY >=64MB shape (rees46 adagrad 573 vs 846 us)
            # — v4's per-group one-hot alignment matmul costs more than the
            # DMA issue + gpad staging it saves. The one exception is
            # adam + SR state, where v4's compact path wins ~4% (977 vs
            # 1015 us). Sub-64MB v4 lost to XLA everywhere, so there is no
            # v4 dispatch floor below the v3 line.
            if (self.state_sr and self.adapt == "adam" and n_idx is not None
                    and (n_idx + 16) * table.shape[1] * 4
                    <= COMPACT_VMEM_BYTES):
                return "v4"
            return "v3"
        if table.shape[0] >= PALLAS_MIN_ROWS:
            return _gate("v2")
        return None

    def apply_sparse(self, table, idx, g, st, key=None, allow_kernel=True,
                     sr_row_offset=None):
        """Update ``table`` rows at (possibly duplicated / sentinel-masked) ``idx``.

        ``key`` is the per-step PRNG key; it seeds the stochastic-rounding
        dither when the state is stored under ``opt_state_dtype="bfloat16_sr"``
        (ops/sr.py; the stateless mixer keeps kernel and XLA paths
        bit-identical) and is otherwise unused. Under a mesh, pass the
        REPLICATED per-step key and the shard's GLOBAL row offset
        (``sr_row_offset``) so the dither hashes global (row, col) cells —
        the sharded run then rounds bit-identically to the single-chip one.
        ``allow_kernel=False`` forces the XLA path — the grouped Pallas
        kernel requires the table's LAST 8-row group to be all padding
        (models/gru.py pad_items; parallel/dist_step.py appends per-shard
        scratch rows to guarantee it shard-locally)."""
        sr_active = self.state_sr and (
            (self.adapt == "adagrad" and st["acc"].dtype == jnp.bfloat16)
            or (self.adapt == "adam" and "acc2" in st
                and st["acc2"].dtype == jnp.bfloat16))
        if sr_active:
            if key is None:
                raise ValueError(
                    "opt_state_dtype='bfloat16_sr' requires the per-step PRNG"
                    " key for the stochastic-rounding dither")
            from gru4rec_tpu.ops.sr import seed_from_key

            off = (jnp.asarray(0, jnp.int32) if sr_row_offset is None
                   else jnp.asarray(sr_row_offset, jnp.int32))
            sr_seed = jnp.stack([seed_from_key(key), off])
        else:
            sr_seed = None
        version = (self._kernel_version(table, st, n_idx=idx.shape[0])
                   if allow_kernel else None)
        if version:
            import jax

            from gru4rec_tpu.ops.kernels.sparse_update import (
                fused_adadelta_update, fused_adagrad_update, fused_adam_update,
                fused_rmsprop_update, fused_update_v3, group_pack)

            interpret = jax.default_backend() != "tpu"
            # the single state operand: "acc" for adagrad/rmsprop, the merged
            # "acc2" for adam/adadelta (_kernel_version guarantees it)
            state_key = "acc2" if self.adapt in ("adam", "adadelta") else "acc"
            if version == "v4":
                from gru4rec_tpu.ops.kernels.sparse_update import (
                    fused_update_v4, group_pack_compact)

                # compact staging: one (K, d) segment-sum, no (8K, d) gpad
                # round-trip — the kernel aligns sublanes in-register
                gblk, mask, gstart, nreal, gcomp = group_pack_compact(
                    idx, g, table.shape[0])
                table, state, vel = fused_update_v4(
                    self.adapt, table, st[state_key], st.get("velocity"),
                    gblk, mask, gstart, nreal, gcomp,
                    lr=self.lr, momentum=self.momentum, lmbd=self.lmbd,
                    v1=self.v1, v2=self.v2, interpret=interpret,
                    sr_seed=sr_seed,
                )
                st = dict(st)
                st[state_key] = state
                if vel is not None:
                    st["velocity"] = vel
                return table, st
            # group_pack folds the duplicate-index summing into its packing
            # scatter, so the kernel path skips dedup_rows entirely. Adam
            # needs NO extra bookkeeping: its per-row step count lives as a
            # column of the merged state buffer (init_state) and is updated
            # in-kernel.
            gblk, mask, gpad, nreal = group_pack(
                idx, g, table.shape[0], return_nreal=True)
            if version == "v3":
                table, state, vel = fused_update_v3(
                    self.adapt, table, st[state_key], st.get("velocity"),
                    gblk, mask, nreal, gpad,
                    lr=self.lr, momentum=self.momentum, lmbd=self.lmbd,
                    v1=self.v1, v2=self.v2, interpret=interpret,
                    sr_seed=sr_seed,
                )
            elif self.adapt == "adam":
                table, state, vel = fused_adam_update(
                    table, st["acc2"], st.get("velocity"),
                    gblk, mask, gpad,
                    lr=self.lr, momentum=self.momentum, lmbd=self.lmbd,
                    v1=self.v1, v2=self.v2, interpret=interpret,
                )
            elif self.adapt == "adadelta":
                table, state, vel = fused_adadelta_update(
                    table, st["acc2"], st.get("velocity"), gblk,
                    mask, gpad, lr=self.lr, momentum=self.momentum,
                    lmbd=self.lmbd, v1=self.v1, interpret=interpret,
                )
            elif self.adapt == "adagrad":
                table, state, vel = fused_adagrad_update(
                    table, st["acc"], st.get("velocity"), gblk, mask,
                    gpad, lr=self.lr, momentum=self.momentum,
                    lmbd=self.lmbd, interpret=interpret,
                )
            else:
                table, state, vel = fused_rmsprop_update(
                    table, st["acc"], st.get("velocity"), gblk, mask,
                    gpad, lr=self.lr, momentum=self.momentum,
                    lmbd=self.lmbd, v1=self.v1, interpret=interpret,
                )
            st = {**st, state_key: state}
            if vel is not None:
                st["velocity"] = vel
            return table, st
        if self.dedup_impl == "matmul":
            from gru4rec_tpu.ops.kernels.dedup_matmul import (MATMUL_MAX_K2D,
                                                              dedup_rows_matmul)

            if idx.shape[0] ** 2 * g.shape[1] <= MATMUL_MAX_K2D:
                uidx, g = dedup_rows_matmul(idx, g)
            else:
                # the equality matmul is O(K^2 d); past the measured
                # crossover the sort chain wins (dedup_matmul.py gate)
                uidx, g = dedup_rows(idx, g)
        else:
            uidx, g = dedup_rows(idx, g)
        g, st = self._adapt_sparse(uidx, g, st, sr_seed=sr_seed)
        if self.lmbd > 0:
            rows = _take_rows(table, uidx)
            delta = self.lr * (g + self.lmbd * rows)
        else:
            delta = self.lr * g
        if self.momentum > 0:
            v2 = self.momentum * _take_rows(st["velocity"], uidx) - delta
            st = {**st, "velocity": _put_rows(st["velocity"], uidx, v2)}
            new_rows = _take_rows(table, uidx) + v2
            return _put_rows(table, uidx, new_rows), st
        new_rows = _take_rows(table, uidx) - delta
        return _put_rows(table, uidx, new_rows), st

    # ------------------------------------------------------------------ #
    def clip_by_global_norm(self, dense_grads, sparse_grads):
        """Global-norm gradient clipping over all grads (gru4rec.py:386-389)."""
        if self.grad_cap <= 0:
            return dense_grads, sparse_grads
        sq = sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(dense_grads))
        sq = sq + sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(sparse_grads))
        norm = jnp.sqrt(sq)
        scale = jnp.where(norm >= self.grad_cap, self.grad_cap / norm, 1.0)
        dense_grads = jax.tree_util.tree_map(lambda g: g * scale, dense_grads)
        sparse_grads = jax.tree_util.tree_map(lambda g: g * scale, sparse_grads)
        return dense_grads, sparse_grads


def make_optimizer(cfg: GRU4RecConfig) -> Optimizer:
    return Optimizer(cfg)
