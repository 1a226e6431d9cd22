"""Multi-chip training step: shard_map over the (data, model) mesh.

Per-device program (one SPMD function, collectives over ICI):

* lanes are split over ``data``; each device runs its own lane block through
  the GRU and scores it against the *global* target set (within-batch
  negatives couple lanes, so targets/validity are ``all_gather``-ed — a
  (B,)-sized int transfer, tiny);
* item tables are row-sharded over ``model``; a row gather is a shard-local
  take (out-of-shard rows fill 0) + ``psum``, a row update is a shard-local
  deduped scatter (out-of-shard rows dropped);
* dense-parameter gradients are ``psum``-ed over ``data`` and applied
  redundantly (replicated params);
* the positive-score diagonal of each local score block is shifted by
  ``data_index * local_batch`` (ops/losses.py diag_offset).

The reference has no distributed backend at all (SURVEY.md §2.10); this
module is new capability, not a port.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.losses import get_loss
from gru4rec_tpu.ops.sampling import draw_negatives
from gru4rec_tpu.parallel.mesh import (fetch_to_host, param_pspecs, put_global,
                                       state_pspecs)
from gru4rec_tpu.train.optimizers import make_optimizer
from gru4rec_tpu.train.step import (SENTINEL, SR_TABLE_SALT, init_train_state,
                                    merge_dense, split_params)


# Per-shard scratch rows appended to every row-shard of an item table: the
# grouped Pallas kernel parks padded grid steps on the shard's LAST 8-row
# group, which must contain no real item row (ops/kernels/sparse_update.py).
# Whole tables get this from models/gru.py pad_items; arbitrary row-shards
# need it appended per shard.
SCRATCH_ROWS = 8


def _expand_scratch(arr, nm: int):
    """(n_pad, ...) -> (n_pad + 8*nm, ...): append SCRATCH_ROWS zero rows to
    each of the nm row-shards (shard-interleaved layout)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    L = n // nm
    blocks = arr.reshape((nm, L) + arr.shape[1:])
    pad = np.zeros((nm, SCRATCH_ROWS) + arr.shape[1:], arr.dtype)
    out = np.concatenate([blocks, pad], axis=1)
    # host numpy, not jnp: the caller device_puts straight to the mesh
    # sharding (which may span other processes' devices)
    return out.reshape((n + SCRATCH_ROWS * nm,) + arr.shape[1:])


def _strip_scratch(arr, nm: int):
    """Inverse of _expand_scratch. Returns HOST numpy: the callers gather
    per-shard and must never materialize the whole canonical table on one
    device (a jnp result here would silently place it on device 0)."""
    arr = np.asarray(arr)
    Lp = arr.shape[0] // nm
    blocks = arr.reshape((nm, Lp) + arr.shape[1:])[:, : Lp - SCRATCH_ROWS]
    return np.ascontiguousarray(
        blocks.reshape((arr.shape[0] - SCRATCH_ROWS * nm,) + arr.shape[1:])
    )


def _map_item_tables(params, fn, mode):
    """Apply ``fn`` to the row-sharded item tables of a parameter dict."""
    out = dict(params)
    out["Wy"] = fn(params["Wy"])
    if mode == "embedding" and "E" in params:
        out["E"] = fn(params["E"])
    if mode == "onehot":
        out["Wx"] = [fn(params["Wx"][0])] + list(params["Wx"][1:])
    return out


def shard_train_state(state, cfg: GRU4RecConfig, mesh):
    """Place a freshly-initialized TrainState according to the mesh layout,
    appending per-shard kernel scratch rows to the item tables (and their
    row-sparse optimizer state)."""
    mode = gru.input_mode(cfg)
    nm = mesh.shape["model"]
    expand = lambda a: _expand_scratch(a, nm)
    params_x = _map_item_tables(state.params, expand, mode)
    opt_state_x = dict(state.opt_state)
    opt_state_x["sparse"] = jax.tree_util.tree_map(
        expand, state.opt_state["sparse"]
    )
    pspec = param_pspecs(params_x, mode)
    sspec = state_pspecs(opt_state_x)

    def put(x, spec):
        return put_global(x, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map(put, params_x, pspec)
    opt_state = jax.tree_util.tree_map(put, opt_state_x, sspec)
    H = tuple(put(h, P("data", None)) for h in state.H)
    key = put(state.key, P())
    step = put(state.step, P())
    return state._replace(params=params, opt_state=opt_state, H=H, key=key, step=step)


def unshard_params(params, cfg: GRU4RecConfig, mesh):
    """Gather just the parameters to host-local arrays in the canonical
    layout (scratch rows stripped) — per-shard host fetches, no device ever
    holds the whole item table. Used by fit()'s keep-best snapshots."""
    mode = gru.input_mode(cfg)
    nm = mesh.shape["model"]
    host = jax.tree_util.tree_map(fetch_to_host, params)
    return _map_item_tables(host, lambda a: _strip_scratch(a, nm), mode)


def unshard_train_state(state, cfg: GRU4RecConfig, mesh):
    """Gather a sharded TrainState back to host-local arrays in the canonical
    single-device layout (per-shard scratch rows stripped)."""
    mode = gru.input_mode(cfg)
    nm = mesh.shape["model"]
    strip = lambda a: _strip_scratch(a, nm)
    # host numpy throughout: the canonical full-size item tables must not
    # be placed on a single device (they may only fit sharded)
    host = lambda t: jax.tree_util.tree_map(fetch_to_host, t)
    params = _map_item_tables(host(state.params), strip, mode)
    opt_state = dict(host(state.opt_state))
    opt_state["sparse"] = jax.tree_util.tree_map(strip, opt_state["sparse"])
    return state._replace(
        params=params, opt_state=opt_state, H=host(state.H),
        key=host(state.key), step=jnp.asarray(np.asarray(state.step)),
    )


def detect_scratch_layout(params, n_items: int, cfg: GRU4RecConfig, mesh):
    """0 if ``params`` are in the canonical layout, :data:`SCRATCH_ROWS` if
    every item table carries the per-shard kernel-scratch rows (the live
    training layout from :func:`shard_train_state`). Raises on any other
    row count. Shared by the distributed eval and serving entry points so
    a layout change cannot make them disagree."""
    nm = mesh.shape["model"]
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    wy_rows = int(params["Wy"].shape[0])
    if wy_rows == n_pad + SCRATCH_ROWS * nm:
        return SCRATCH_ROWS
    if wy_rows == n_pad:
        return 0
    raise ValueError(
        f"Wy has {wy_rows} rows; expected {n_pad} (canonical) or "
        f"{n_pad + SCRATCH_ROWS * nm} (training shard layout)"
    )


def make_row_gather(r0, rows_local):
    """Shard-local row gather merged with a psum over the ``model`` axis.

    The non-owned sentinel is ``shard.shape[0]`` — PAST the kernel-scratch
    rows: ``rows_local`` itself addresses the first scratch row when the
    training layout is live, which ``mode="fill"`` would then happily
    return instead of zeroing (scratch rows are zero by kernel invariant
    today, but nothing should depend on it). One definition serves the
    train, eval, and serving shard_map bodies."""

    def gather_rows(shard, idx):
        loc = jnp.where((idx >= r0) & (idx < r0 + rows_local), idx - r0,
                        shard.shape[0])
        rows = jnp.take(shard, loc, axis=0, mode="fill", fill_value=0)
        return jax.lax.psum(rows, "model")

    return gather_rows


def make_dist_chunk_fn(cfg: GRU4RecConfig, n_items: int, mesh):
    """Build the jitted shard_map training chunk. Same contract as
    train/step.py:make_chunk_fn, but state/schedule arrive sharded."""
    mode = gru.input_mode(cfg)
    loss_fn = get_loss(cfg.loss, cfg.n_sample, cfg.smoothing, cfg.bpreg)
    opt = make_optimizer(cfg)
    B = cfg.batch_size
    n_sample = cfg.n_sample
    use_logq = bool(cfg.logq)
    nd = mesh.shape["data"]
    nm = mesh.shape["model"]
    if B % nd:
        raise ValueError(f"batch_size {B} must divide over data axis {nd}")
    B_local = B // nd

    def chunk_body(params, opt_state, H, key, step, in_c, out_c, valid_c, reset_c,
                   samp1, logp0):
        # local shard = n_pad//nm real rows + SCRATCH_ROWS kernel scratch rows
        rows_local = params["Wy"].shape[0] - SCRATCH_ROWS
        mi = jax.lax.axis_index("model")
        di = jax.lax.axis_index("data")
        r0 = mi * rows_local
        diag_offset = di * B_local

        gather_rows = make_row_gather(r0, rows_local)

        def to_local(idx):
            return jnp.where(
                (idx >= r0) & (idx < r0 + rows_local), idx - r0, SENTINEL
            ).astype(jnp.int32)

        chunk = in_c.shape[0]
        if n_sample > 0:
            # identical on every device: replicated key
            neg_key = jax.random.fold_in(jax.random.fold_in(key, 1), step)
            neg = draw_negatives(neg_key, samp1, chunk, n_sample, n_items,
                                 cfg.sample_alpha, cfg.sampler)
        else:
            neg = jnp.zeros((chunk, 0), jnp.int32)

        def step_fn(carry, xs):
            params, opt_state, H, key, step, loss_sum, ev_count = carry
            in_l, out_l, valid_l, reset_l, neg_t = xs
            base_key = jax.random.fold_in(jax.random.fold_in(key, 0), step)
            # per-device dropout must differ per lane block; anything feeding
            # REPLICATED state (e.g. stochastic-rounding keys) must use
            # base_key, which is identical on every device
            step_key = jax.random.fold_in(base_key, di)

            valid_all = jax.lax.all_gather(valid_l, "data", tiled=True)
            out_all = jax.lax.all_gather(out_l, "data", tiled=True)
            M = jnp.sum(valid_all)
            any_valid = M > 0
            Mf = M.astype(jnp.float32)

            if n_sample > 0:
                col_valid = jnp.concatenate([valid_all, jnp.ones((n_sample,), bool)])
                Y = jnp.concatenate([jnp.where(valid_all, out_all, 0), neg_t])
                # fully-padded steps must be complete no-ops (see
                # train/step.py): gate the negatives' scatter on any_valid
                Y_scatter = jnp.concatenate(
                    [jnp.where(valid_all, out_all, SENTINEL),
                     jnp.where(any_valid, neg_t, SENTINEL)]
                ).astype(jnp.int32)
            else:
                col_valid = valid_all
                Y = jnp.where(valid_all, out_all, 0)
                Y_scatter = jnp.where(valid_all, out_all, SENTINEL).astype(jnp.int32)
            Xg = jnp.where(valid_l, in_l, 0)
            X_scatter = jnp.where(valid_l, in_l, SENTINEL).astype(jnp.int32)

            H = tuple(jnp.where(reset_l[:, None], 0.0, h) for h in H)

            if mode == "onehot":
                srows = {
                    "Wx0": gather_rows(params["Wx"][0], Xg),
                    "Wy": gather_rows(params["Wy"], Y),
                }
            elif mode == "embedding":
                srows = {
                    "E": gather_rows(params["E"], Xg),
                    "Wy": gather_rows(params["Wy"], Y),
                }
            else:  # constrained
                srows = {
                    "WyS": jnp.concatenate(
                        [gather_rows(params["Wy"], Xg), gather_rows(params["Wy"], Y)]
                    ),
                }

            logq_corr = None
            if use_logq:
                lp_pos = jnp.take(logp0, Y[:B] if n_sample > 0 else Y)
                if n_sample > 0:
                    lp_neg = cfg.sample_alpha * jnp.take(logp0, neg_t)
                    logq_corr = cfg.logq * jnp.concatenate([lp_pos, lp_neg])
                else:
                    logq_corr = cfg.logq * lp_pos

            dense, _ = split_params(params, mode)

            def loss_of(dense_p, srows_p):
                fwd_params = merge_dense(params, dense_p, mode)
                H_new, yhat = gru.forward(
                    fwd_params, srows_p, list(H), cfg, M=B_local, training=True,
                    key=step_key, col_valid=col_valid, logq_correction=logq_corr,
                )
                cost = loss_fn(yhat, Mf, valid_l, col_valid, diag_offset) / B
                return cost, tuple(H_new)

            (cost_local, H_new), grads = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True
            )(dense, srows)
            g_dense, g_srows = grads
            cost = jax.lax.psum(cost_local, "data")

            # --- communicate gradients: everyone ends up with the global set ---
            g_dense = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, "data"), g_dense
            )
            scatter: Dict[str, tuple] = {}
            if mode == "constrained":
                gS = g_srows["WyS"]
                gX = jax.lax.all_gather(gS[:B_local], "data", tiled=True)  # (B, h)
                gY = jax.lax.psum(gS[B_local:], "data")                    # (N, h)
                X_all = jax.lax.all_gather(X_scatter, "data", tiled=True)  # (B,)
                scatter["Wy"] = (
                    jnp.concatenate([X_all, Y_scatter]),
                    jnp.concatenate([gX, gY]),
                )
            else:
                xname = "Wx0" if mode == "onehot" else "E"
                gX = jax.lax.all_gather(g_srows[xname], "data", tiled=True)
                X_all = jax.lax.all_gather(X_scatter, "data", tiled=True)
                scatter[xname] = (X_all, gX)
                scatter["Wy"] = (Y_scatter, jax.lax.psum(g_srows["Wy"], "data"))

            sparse_flat = [g for _, g in scatter.values()]
            g_dense, sparse_flat = opt.clip_by_global_norm(g_dense, sparse_flat)
            scatter = {
                k: (idx, g2)
                for (k, (idx, _)), g2 in zip(scatter.items(), sparse_flat)
            }

            # --- dense updates (replicated, identical on all devices) ---
            new_dense, new_dense_state = {}, {}
            for group in ("Wx", "Wh", "Wrz", "Bh"):
                ps, gs, sts = dense[group], g_dense[group], opt_state["dense"][group]
                ups = [opt.apply_dense(p, g, st) for p, g, st in zip(ps, gs, sts)]
                new_dense[group] = tuple(u[0] for u in ups)
                new_dense_state[group] = tuple(u[1] for u in ups)
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(any_valid, a, b), new, old
            )
            new_dense = sel(new_dense, dense)
            new_dense_state = sel(new_dense_state, opt_state["dense"])

            # --- sparse updates on the local table shard ---
            new_params = merge_dense(params, new_dense, mode)
            new_sparse_state = dict(opt_state["sparse"])
            for name, (idx, g) in scatter.items():
                idx_l = to_local(idx)
                if name == "Wx0":
                    table = new_params["Wx"][0]
                else:
                    table = new_params[name]
                # the fused kernel is shard-safe: every local shard carries
                # SCRATCH_ROWS trailing padding rows (shard_train_state), so
                # the grouped kernel's all-padding dummy group exists locally
                # base_key (replicated) + the shard's global row offset:
                # stochastic rounding hashes global (row, col) cells, so the
                # sharded run rounds bit-identically to the single-chip one
                sr_key = (jax.random.fold_in(base_key, SR_TABLE_SALT[name])
                          if opt.state_sr else base_key)
                table, new_sparse_state[name] = opt.apply_sparse(
                    table, idx_l, g, opt_state["sparse"][name],
                    key=sr_key, sr_row_offset=r0, allow_kernel=True,
                )
                if name == "Wx0":
                    new_params["Wx"] = [table] + list(new_params["Wx"][1:])
                else:
                    new_params[name] = table

            H_out = tuple(
                jnp.where(valid_l[:, None], hn, ho) for hn, ho in zip(H_new, H)
            )
            new_opt_state = {"dense": new_dense_state, "sparse": new_sparse_state}
            return (
                new_params, new_opt_state, H_out, key, step + 1,
                loss_sum + cost * Mf, ev_count + Mf,
            ), None

        carry = (
            params, opt_state, H, key, step,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        )
        carry, _ = jax.lax.scan(step_fn, carry, (in_c, out_c, valid_c, reset_c, neg))
        params, opt_state, H, key, step, loss_sum, ev_count = carry
        return params, opt_state, H, key, step, loss_sum, ev_count

    # --- wire up shard_map specs ---
    dummy = init_train_state(cfg, n_items, jax.random.PRNGKey(0))
    pspec = param_pspecs(dummy.params, mode)
    sspec = state_pspecs(dummy.opt_state)
    h_spec = tuple(P("data", None) for _ in cfg.layers)
    sched_spec = P(None, "data")
    in_specs = (
        pspec, sspec, h_spec, P(), P(),
        sched_spec, sched_spec, sched_spec, sched_spec, P(None), P(None),
    )
    out_specs = (pspec, sspec, h_spec, P(), P(), P(), P())
    del dummy

    sharded = jax.shard_map(
        chunk_body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2))
