"""Pallas TPU kernel: fused row-sparse adagrad(+momentum) update.

The spiritual successor of the reference's one hand-written hot kernel
(``GpuAdvancedSubtensor1_fast``, custom_theano_ops.py:409-595 — a faster row
gather/scatter for the per-step item-table updates). XLA's scatter slows
down as the vocabulary grows; this kernel updates parameter, adagrad
accumulator, and momentum-velocity rows in ONE pass over the touched rows
(scalar-prefetched indices drive per-row block DMAs, in-place via
input/output aliasing), with cost proportional to the update size, not the
table size: measured end-to-end on v5e, +11% training throughput at a
1M-item vocabulary (and flat in vocab size), break-even around 100-200k.

Dispatch: ``fused_adagrad_update`` is used by train/optimizers.py when the
table is large enough for the XLA scatters to lose
(``rows >= PALLAS_MIN_ROWS``) and the optimizer is adagrad(+momentum) — the
configuration of every published best-hyperparameter file. All other cases
take the XLA path, which doubles as this kernel's differential-test oracle
(the reference's own disable_custom_op pattern, gpu_ops.py:13-27).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-6  # keep in sync with train/optimizers.py
PALLAS_MIN_ROWS = 131072  # below this, XLA scatters win (measured on v5e)


def _kernels_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("lr", "momentum", "lmbd", "interpret"))
def fused_adagrad_update(table, acc, vel, uidx, g, *, lr: float, momentum: float,
                         lmbd: float, interpret: bool = False):
    """In one pass over the touched rows:

        acc[i]   += g[i]^2                  (adagrad accumulator)
        gs        = g[i] / sqrt(acc[i]+eps)
        delta     = lr * (gs + lmbd * table[i])
        vel[i]    = momentum * vel[i] - delta   (if momentum > 0)
        table[i] += vel[i]                      (or -= delta without momentum)

    ``uidx`` is deduped-sorted with an int32-max sentinel tail (see
    train/optimizers.py:dedup_rows); sentinel rows are passed through
    untouched (they map onto the guaranteed padding row, models/gru.py
    pad_items). ``vel`` may be None when momentum == 0 (a dummy is threaded
    to keep one kernel signature). Returns (table, acc, vel).

    IMPORTANT: tables should be passed in (n, 1, d) layout when called inside
    a scan — reshaping a scan carry breaks XLA's in-place aliasing and turns
    the update into full-table copies (measured 20x slowdown at 1M rows).
    2-D inputs are accepted and reshaped for convenience (tests, one-off use).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    was_2d = table.ndim == 2
    if was_2d:
        table = table[:, None, :]
        acc = acc[:, None, :]
        vel = vel[:, None, :] if vel is not None else None
    n_rows, _, d = table.shape
    n_idx = uidx.shape[0]
    has_momentum = momentum > 0
    if vel is None:
        vel = jnp.zeros((1, 1, d), table.dtype)  # dummy, never indexed beyond row 0

    t3, a3, v3 = table, acc, vel
    g3 = g.reshape(n_idx, 1, d)

    def row_map(i, idx_ref):
        return (jnp.minimum(idx_ref[i], n_rows - 1), 0, 0)

    def vel_map(i, idx_ref):
        if has_momentum:
            return (jnp.minimum(idx_ref[i], n_rows - 1), 0, 0)
        return (0, 0, 0)

    def g_map(i, idx_ref):
        return (i, 0, 0)

    def kernel(idx_ref, t_ref, a_ref, v_ref, g_ref, to_ref, ao_ref, vo_ref):
        i = pl.program_id(0)
        valid = idx_ref[i] < n_rows

        @pl.when(valid)
        def _():
            gr = g_ref[...]
            acc_new = a_ref[...] + gr * gr
            gs = gr * jax.lax.rsqrt(acc_new + EPSILON)
            if lmbd > 0:
                delta = lr * (gs + lmbd * t_ref[...])
            else:
                delta = lr * gs
            if has_momentum:
                v2 = momentum * v_ref[...] - delta
                vo_ref[...] = v2
                to_ref[...] = t_ref[...] + v2
            else:
                vo_ref[...] = v_ref[...]
                to_ref[...] = t_ref[...] - delta
            ao_ref[...] = acc_new

        @pl.when(jnp.logical_not(valid))
        def _():
            to_ref[...] = t_ref[...]
            ao_ref[...] = a_ref[...]
            vo_ref[...] = v_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_idx,),
        in_specs=[
            pl.BlockSpec((1, 1, d), row_map),
            pl.BlockSpec((1, 1, d), row_map),
            pl.BlockSpec((1, 1, d), vel_map),
            pl.BlockSpec((1, 1, d), g_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d), row_map),
            pl.BlockSpec((1, 1, d), row_map),
            pl.BlockSpec((1, 1, d), vel_map),
        ],
    )
    t_out, a_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(t3.shape, t3.dtype),
            jax.ShapeDtypeStruct(a3.shape, a3.dtype),
            jax.ShapeDtypeStruct(v3.shape, v3.dtype),
        ],
        # alias (idx, table, acc, vel, g) inputs 1..3 onto outputs 0..2
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(uidx, t3, a3, v3, g3)
    vel = v_out if has_momentum else None
    if was_2d:
        t_out = t_out[:, 0, :]
        a_out = a_out[:, 0, :]
        vel = vel[:, 0, :] if vel is not None else None
    return t_out, a_out, vel
