"""Jitted training step and scan-chunked epoch runner.

The reference pays one host->device round trip per event step (one compiled
Theano function call, gru4rec.py:623) — its headline trick. The TPU design
removes the host from the loop entirely: an epoch is a sequence of
``lax.scan`` chunks of ``cfg.chunk_size`` steps, each chunk one device
program. Negative samples for the whole chunk are drawn in-graph (one
uniform+searchsorted batch — the reference's device-resident sample store,
gru4rec.py:555-566, becomes scan input data), and the persistent hidden
state, parameters, and optimizer state are donated carry.

Gradients w.r.t. the big item tables stay row-sparse: the gathered rows are
explicit differentiation targets (mirroring the reference's sampled-params
gradients, gru4rec.py:384) and are applied with deterministic deduped
scatters (train/optimizers.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.losses import get_loss
from gru4rec_tpu.ops.sampling import draw_negatives
from gru4rec_tpu.train.optimizers import make_optimizer

SENTINEL = np.iinfo(np.int32).max


class TrainState(NamedTuple):
    params: Dict
    opt_state: Dict
    H: tuple
    key: jax.Array
    step: jax.Array  # global step counter (for per-step RNG folding)


def init_train_state(cfg: GRU4RecConfig, n_items: int, key) -> TrainState:
    params = gru.init_params(cfg, n_items)
    opt = make_optimizer(cfg)
    mode = gru.input_mode(cfg)
    dense, sparse_names = split_params(params, mode)
    opt_state = {
        "dense": jax.tree_util.tree_map(opt.init_state, dense),
        "sparse": {
            name: opt.init_state(
                params["Wx"][0] if name == "Wx0" else params[name], sparse=True
            )
            for name in sparse_names
        },
    }
    H = tuple(gru.init_hidden(cfg, cfg.batch_size))
    return TrainState(params, opt_state, H, key, jnp.zeros((), jnp.int32))


def split_params(params: Dict, mode: str):
    """Split the parameter dict into the densely-updated subtree and the
    names of row-sparsely-updated item tables (reference: gru4rec.py:578)."""
    dense = {
        "Wx": tuple(params["Wx"][1:] if mode == "onehot" else params["Wx"]),
        "Wh": tuple(params["Wh"]),
        "Wrz": tuple(params["Wrz"]),
        "Bh": tuple(params["Bh"]),
    }
    if mode == "onehot":
        sparse_names = ("Wx0", "Wy")
    elif mode == "embedding":
        sparse_names = ("E", "Wy")
    else:
        sparse_names = ("Wy",)
    return dense, sparse_names


def merge_dense(params: Dict, dense: Dict, mode: str) -> Dict:
    out = dict(params)
    if mode == "onehot":
        out["Wx"] = [params["Wx"][0]] + list(dense["Wx"])
    else:
        out["Wx"] = list(dense["Wx"])
    out["Wh"] = list(dense["Wh"])
    out["Wrz"] = list(dense["Wrz"])
    out["Bh"] = list(dense["Bh"])
    return out


def _state_name(srow_name: str) -> str:
    return {"WyS": "Wy"}.get(srow_name, srow_name)


# Per-table salt folded into the step key before stochastic-rounding dither
# derivation (opt_state_dtype="bfloat16_sr"): without it, every sparse table
# updated in the same step would share one dither stream (identical
# (seed, row, col) hashes), perfectly correlating their rounding noise.
# Keyed on STATE names so the single-chip and distributed steps (which name
# the constrained-mode update "WyS" vs "Wy") fold identically and stay
# bit-identical. Values live far outside the small-integer fold_in domain
# used elsewhere (device indices in dist_step.py fold_in(base_key, di),
# the 0/1 dropout-vs-negatives discriminator): a salt equal to a device
# index would hand one shard's dropout stream to a table's SR dither.
# 0x5352 = ASCII "SR".
SR_TABLE_SALT = {"Wx0": 0x53520001, "E": 0x53520002, "Wy": 0x53520003}


def _take_rows2d(table, idx):
    rows = jnp.take(table, idx, axis=0)
    return rows


def make_chunk_fn(cfg: GRU4RecConfig, n_items: int):
    """Build the jitted per-chunk training function.

    Signature: ``chunk_fn(state, in_c, out_c, valid_c, reset_c, samp1, logp0)
    -> (state, loss_weighted_sum, event_count)`` where the ``*_c`` arrays are
    (chunk, B) schedule slices and ``samp1`` is the sampler table (packed
    alias table or CDF; unused content when ``n_sample == 0``). Loss bookkeeping follows the reference: the
    per-step cost is already divided by the *static* batch size
    (gru4rec.py:577) and epoch averages weight steps by live-lane count
    (gru4rec.py:654).
    """
    mode = gru.input_mode(cfg)
    loss_fn = get_loss(cfg.loss, cfg.n_sample, cfg.smoothing, cfg.bpreg)
    opt = make_optimizer(cfg)
    B = cfg.batch_size
    n_sample = cfg.n_sample
    use_logq = bool(cfg.logq)

    def chunk_fn(state: TrainState, in_c, out_c, valid_c, reset_c, samp1,
                 logp0):
        chunk = in_c.shape[0]
        if n_sample > 0:
            neg_key = jax.random.fold_in(jax.random.fold_in(state.key, 1), state.step)
            neg = draw_negatives(neg_key, samp1, chunk, n_sample, n_items,
                                 cfg.sample_alpha, cfg.sampler)
        else:
            neg = jnp.zeros((chunk, 0), jnp.int32)

        def step_fn(carry, xs):
            params, opt_state, H, key, step, loss_sum, ev_count = carry
            in_idx, out_idx, valid, reset, neg_t = xs
            step_key = jax.random.fold_in(jax.random.fold_in(key, 0), step)

            M = jnp.sum(valid)
            any_valid = M > 0
            Mf = M.astype(jnp.float32)

            row_valid = valid
            if n_sample > 0:
                col_valid = jnp.concatenate([valid, jnp.ones((n_sample,), bool)])
                Y = jnp.concatenate([jnp.where(valid, out_idx, 0), neg_t])
                # fully-padded steps (a chunk's zero-padded tail) must be
                # complete no-ops: without the any_valid gate the negatives'
                # zero-gradient scatter would still decay EMA optimizer state
                # and bump adam row counts — an artifact no real step of the
                # reference loop has
                Y_scatter = jnp.concatenate(
                    [jnp.where(valid, out_idx, SENTINEL),
                     jnp.where(any_valid, neg_t, SENTINEL)]
                ).astype(jnp.int32)
            else:
                col_valid = valid
                Y = jnp.where(valid, out_idx, 0)
                Y_scatter = jnp.where(valid, out_idx, SENTINEL).astype(jnp.int32)
            Xg = jnp.where(valid, in_idx, 0)
            X_scatter = jnp.where(valid, in_idx, SENTINEL).astype(jnp.int32)

            # pre-step hidden reset (see data/scheduler.py on reset semantics)
            H = tuple(jnp.where(reset[:, None], 0.0, h) for h in H)

            # gather rows (outside the differentiated fn => row-sparse grads)
            if mode == "onehot":
                srows = {
                    "Wx0": _take_rows2d(params["Wx"][0], Xg),
                    "Wy": _take_rows2d(params["Wy"], Y),
                }
                scatter_idx = {"Wx0": X_scatter, "Wy": Y_scatter}
            elif mode == "embedding":
                srows = {
                    "E": _take_rows2d(params["E"], Xg),
                    "Wy": _take_rows2d(params["Wy"], Y),
                }
                scatter_idx = {"E": X_scatter, "Wy": Y_scatter}
            else:  # constrained: single concatenated gather (gru4rec.py:438-448)
                XY = jnp.concatenate([Xg, Y])
                XY_scatter = jnp.concatenate([X_scatter, Y_scatter])
                srows = {
                    "WyS": _take_rows2d(params["Wy"], XY),
                }
                scatter_idx = {"WyS": XY_scatter}

            logq_corr = None
            if use_logq:
                # score -= logq*log(concat(P0[pos], P0[neg]^alpha)) (gru4rec.py:494-495)
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
                    fwd_params,
                    srows_p,
                    list(H),
                    cfg,
                    M=B,
                    training=True,
                    key=step_key,
                    col_valid=col_valid,
                    logq_correction=logq_corr,
                )
                cost = loss_fn(yhat, Mf, row_valid, col_valid) / B
                return cost, tuple(H_new)

            (cost, H_new), grads = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True
            )(dense, srows)
            g_dense, g_srows = grads
            g_dense, g_srows = opt.clip_by_global_norm(g_dense, g_srows)

            # --- dense updates (skipped entirely on fully-padded steps) ---
            new_dense = {}
            new_dense_state = {}
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

            # --- sparse (row) updates; sentinel indices are dropped ---
            new_params = merge_dense(params, new_dense, mode)
            new_sparse_state = dict(opt_state["sparse"])
            for name, g in g_srows.items():
                sname = _state_name(name)
                idx = scatter_idx[name]
                if name == "Wx0":
                    table = new_params["Wx"][0]
                elif name == "WyS":
                    table = new_params["Wy"]
                else:
                    table = new_params[name]
                sr_key = (jax.random.fold_in(step_key, SR_TABLE_SALT[sname])
                          if opt.state_sr else step_key)
                table, new_sparse_state[sname] = opt.apply_sparse(
                    table, idx, g, opt_state["sparse"][sname], key=sr_key
                )
                if name == "Wx0":
                    new_params["Wx"] = [table] + list(new_params["Wx"][1:])
                elif name == "WyS":
                    new_params["Wy"] = table
                else:
                    new_params[name] = table

            H_out = tuple(
                jnp.where(valid[:, None], hn, ho) for hn, ho in zip(H_new, H)
            )
            new_opt_state = {"dense": new_dense_state, "sparse": new_sparse_state}
            return (
                new_params,
                new_opt_state,
                H_out,
                key,
                step + 1,
                loss_sum + cost * Mf,
                ev_count + Mf,
            ), None

        carry = (
            state.params,
            state.opt_state,
            state.H,
            state.key,
            state.step,
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        xs = (in_c, out_c, valid_c, reset_c, neg)
        carry, _ = jax.lax.scan(step_fn, carry, xs)
        params, opt_state, H, key, step, loss_sum, ev_count = carry
        return TrainState(params, opt_state, H, key, step), loss_sum, ev_count

    return jax.jit(chunk_fn, donate_argnums=(0,))
