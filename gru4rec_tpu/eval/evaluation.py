"""Recall@N / MRR@N evaluation, compiled and chunked like training.

Re-design of the reference's ``evaluate_gpu`` (evaluation.py:15-147): the
same session-parallel lane iteration (shared schedule builder), the same
rank graph with four tie-break modes (evaluation.py:62-66), multi-cutoff
accumulation in one compiled function — but instead of one device call per
event step, steps are fused into ``lax.scan`` chunks and only the final
counters come back to the host.

Per reference semantics kept exactly:
* test items are inner-joined to the training vocabulary (unseen items are
  dropped, evaluation.py:77);
* events are sorted by (session, time, item) (evaluation.py:78);
* metrics average per *event*;
* ranks use ``<= cutoff`` (the per-event baseline evaluator's strict ``<``
  off-by-one at evaluation.py:296 is deliberately not replicated here).

``evaluate_sessions`` (the per-event protocol for baseline predictors) is
also provided.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.data.scheduler import build_schedule
from gru4rec_tpu.data.tools import compute_offset
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.activations import rank_invariant
from gru4rec_tpu.ops.ranking import TIE_MODES, compute_ranks, ranks_from_counts


# Compiled-evaluator cache: make_eval_chunk_fn returns a fresh jax.jit
# wrapper, and a fresh wrapper means a full retrace + (tunnel) recompile —
# ~1.7s per evaluate() call even with identical shapes. Keyed by everything
# that shapes the compiled graph. LRU-bounded: a long-lived process sweeping
# eval settings (paropt-style) must not pin compiled programs (and, for dist
# entries, mesh device references) forever.
from collections import OrderedDict

_CHUNK_FN_CACHE: OrderedDict = OrderedDict()
_CHUNK_FN_CACHE_MAX = 16


def _cache_get_or_build(key, build):
    fn = _CHUNK_FN_CACHE.get(key)
    if fn is None:
        fn = build()
        _CHUNK_FN_CACHE[key] = fn
        while len(_CHUNK_FN_CACHE) > _CHUNK_FN_CACHE_MAX:
            _CHUNK_FN_CACHE.popitem(last=False)
    else:
        _CHUNK_FN_CACHE.move_to_end(key)
    return fn


def _cached_eval_chunk_fn(cfg, n_items, cutoffs, tie_mode, batch_size,
                          items_subset):
    import json

    key = (
        json.dumps(cfg.to_dict(), sort_keys=True, default=str),
        n_items, tuple(int(c) for c in cutoffs), tie_mode, int(batch_size),
        bool(items_subset),
    )
    return _cache_get_or_build(
        key,
        lambda: make_eval_chunk_fn(cfg, n_items, cutoffs, tie_mode, batch_size,
                                   items_subset),
    )


def _cached_dist_eval_chunk_fn(cfg, n_items, cutoffs, tie_mode, batch_size,
                               mesh, items_subset, scratch_rows=0):
    import json

    key = (
        "dist", json.dumps(cfg.to_dict(), sort_keys=True, default=str),
        n_items, tuple(int(c) for c in cutoffs), tie_mode, int(batch_size),
        tuple(mesh.shape.items()),
        tuple(d.id for d in mesh.devices.flat),
        bool(items_subset), int(scratch_rows),
    )
    return _cache_get_or_build(
        key,
        lambda: make_dist_eval_chunk_fn(cfg, n_items, cutoffs, tie_mode,
                                        batch_size, mesh, items_subset,
                                        scratch_rows),
    )


def make_eval_chunk_fn(cfg: GRU4RecConfig, n_items: int, cutoffs: Sequence[int],
                       tie_mode: str, batch_size: int, items_subset: bool = False):
    """Build the jitted per-chunk evaluation function."""
    if tie_mode not in TIE_MODES:
        raise NotImplementedError(f"Unknown tie mode: {tie_mode!r}")
    mode = gru.input_mode(cfg)
    cutoffs = tuple(int(c) for c in cutoffs)
    # Full-catalog ranking on PRE-activation logits when the final activation
    # is strictly monotone (every published config: softmax, elu, tanh,
    # linear): ranks and ties are provably unchanged, and the activation's
    # normalize + mask passes over the (batch, n_items_pad) f32 matrix are
    # the single largest eval cost at big catalogs — the round-5 rees46
    # profile attributes 1.78 ms/step to them vs 1.47 ms for the scoring
    # matmul fusion. The distributed evaluator already ranks on logits (see
    # make_dist_eval_chunk_fn); this aligns the single-chip path with it.
    # Non-monotone activations (relu and zero-parameter leaky/elu/selu) keep
    # the activated path.
    rank_on_logits = (not items_subset) and rank_invariant(cfg.final_act)
    if rank_on_logits:
        import copy

        cfg_score = copy.copy(cfg)  # not dataclasses.replace: skips __post_init__
        cfg_score.final_act = "linear"

    def chunk_fn(params, H, in_c, out_c, valid_c, reset_c, rec, mrr, n, key, step,
                 item_idx=None):
        n_pad = params["Wy"].shape[0]
        item_valid = (jnp.arange(n_pad) < n_items) if not items_subset else None
        if items_subset:
            # the subset columns are loop-invariant: gather their rows ONCE
            # per chunk (the dist path already hoists this); only the b
            # target rows are gathered per step
            sub_rows = jnp.take(params["Wy"], item_idx, axis=0)

        def step_fn(carry, xs):
            H, rec, mrr, n, step = carry
            in_idx, out_idx, valid, reset = xs
            H = tuple(jnp.where(reset[:, None], 0.0, h) for h in H)
            Xg = jnp.where(valid, in_idx, 0)
            if mode == "constrained":
                srows = {"WyS": jnp.take(params["Wy"], Xg, axis=0)}
            elif mode == "embedding":
                srows = {"E": jnp.take(params["E"], Xg, axis=0)}
            else:
                srows = {"Wx0": jnp.take(params["Wx"][0], Xg, axis=0)}
            if items_subset:
                # score only the target + the item list (evaluation.py:104-105)
                t_rows = jnp.take(params["Wy"], jnp.where(valid, out_idx, 0),
                                  axis=0)
                srows["Wy"] = jnp.concatenate([t_rows, sub_rows], axis=0)
                H_new, yhat = gru.forward(
                    params, srows, list(H), cfg, M=batch_size, training=False,
                    col_valid=None, full_catalog=False,
                )
                b = yhat.shape[0]
                if tie_mode == "tiebreaking":
                    yhat = yhat + jax.random.uniform(
                        jax.random.fold_in(key, step), yhat.shape
                    ) * 1e-10
                target = yhat[jnp.arange(b), jnp.arange(b)]
                others = yhat[:, b:]
                if tie_mode == "tiebreaking":
                    # when the target item is among the subset columns, that
                    # duplicate column carries an INDEPENDENT dither draw —
                    # it would count as > target with probability ~1/2,
                    # inflating the rank by +0.5/event. Full-catalog
                    # semantics: the self-comparison is exact and
                    # contributes 0 — so exclude the duplicate.
                    out_v = jnp.where(valid, out_idx, -1)
                    dup = item_idx[None, :] == out_v[:, None]
                    others = jnp.where(dup, -jnp.inf, others)
                # The reference's subset path drops the target's
                # self-comparison (evaluation.py:59-60), which makes its
                # 'conservative' mode yield rank 0 (-> inf MRR) whenever the
                # target outscores the whole subset, and its 'median' mode
                # subtract a self-tie that is not there. We count the self
                # exactly once, matching full-catalog semantics: when the
                # target item is NOT among the subset columns, conservative
                # ranks shift by +1 and median by +0.5 — a deliberate
                # divergence (SURVEY.md §7 quirks).
                self_adj = 0.0
                if tie_mode in ("conservative", "median"):
                    out_v = jnp.where(valid, out_idx, -1)
                    in_sub = jnp.any(item_idx[None, :] == out_v[:, None], axis=1)
                    self_adj = jnp.where(
                        in_sub, 0.0, 1.0 if tie_mode == "conservative" else 0.5
                    )
            elif rank_on_logits:
                # Count-based ranks on raw logits, masks fused into the
                # compare-reduces — no activation pass, no materialized
                # where(item_valid, ., -inf) copy of the score matrix. The
                # target score is gathered FROM the score matrix so the
                # self-comparison is exact (same bf16 matmul value).
                H_new, scores = gru.forward(
                    params, srows, list(H), cfg_score, M=batch_size,
                    training=False, full_catalog=True, item_valid=None,
                )
                b = scores.shape[0]
                if tie_mode == "tiebreaking":
                    # RELATIVE dither (same rationale as the dist path):
                    # logits are O(1), where the activated path's absolute
                    # 1e-10 would be below one f32 ULP and round away
                    u = jax.random.uniform(
                        jax.random.fold_in(key, step), scores.shape)
                    scores = scores + u * (jnp.abs(scores) * 1e-6 + 1e-12)
                target = scores[jnp.arange(b), jnp.where(valid, out_idx, 0)]
                t = target[:, None]
                gt = jnp.sum((scores > t) & item_valid, axis=1)
                second = None
                if tie_mode == "conservative":
                    second = jnp.sum((scores >= t) & item_valid, axis=1)
                elif tie_mode == "median":
                    second = jnp.sum((scores == t) & item_valid, axis=1)
                ranks = ranks_from_counts(gt, second, tie_mode)
            else:
                self_adj = 0.0  # full catalog: self-comparison is in `others`
                H_new, yhat = gru.forward(
                    params, srows, list(H), cfg, M=batch_size, training=False,
                    full_catalog=True, item_valid=item_valid,
                )
                yhat = jnp.where(item_valid, yhat, -jnp.inf)
                b = yhat.shape[0]
                if tie_mode == "tiebreaking":
                    yhat = yhat + jax.random.uniform(
                        jax.random.fold_in(key, step), yhat.shape
                    ) * 1e-10
                target = yhat[jnp.arange(b), jnp.where(valid, out_idx, 0)]
                others = yhat

            if not rank_on_logits:
                ranks = compute_ranks(others, target, tie_mode) + self_adj

            vf = valid.astype(jnp.float32)
            for k, c in enumerate(cutoffs):
                hit = (ranks <= c).astype(jnp.float32) * vf
                rec = rec.at[k].add(jnp.sum(hit))
                mrr = mrr.at[k].add(jnp.sum(hit / ranks))
            n = n + jnp.sum(vf)
            H_out = tuple(jnp.where(valid[:, None], hn, ho) for hn, ho in zip(H_new, H))
            return (H_out, rec, mrr, n, step + 1), None

        carry = (H, rec, mrr, n, step)
        carry, _ = jax.lax.scan(step_fn, carry, (in_c, out_c, valid_c, reset_c))
        return carry

    return jax.jit(chunk_fn, donate_argnums=(1, 6, 7, 8), static_argnames=())


def make_dist_eval_chunk_fn(cfg: GRU4RecConfig, n_items: int,
                            cutoffs: Sequence[int], tie_mode: str,
                            batch_size: int, mesh, items_subset: bool = False,
                            scratch_rows: int = 0):
    """Multi-chip full-catalog evaluation (SURVEY.md §2.10: sharded matmul
    over the row-sharded item table). Rank-based Recall/MRR distributes
    without any top-k: each model shard counts how many of ITS items outscore
    the target and the counts are ``psum``-med — lanes shard over ``data``,
    ``Wy`` rows over ``model``, exactly the training layout, so a trained
    sharded model can be evaluated without gathering the table to one chip.

    ``items_subset=True`` restricts the rank competitors to an item list
    (reference: evaluation.py:104-105): the subset's score columns shard over
    ``model`` exactly like the catalog — each shard scores the subset rows it
    owns (the rest gather as zero and are masked from the counts) and the
    comparison counts are psum-reduced, with the single-chip path's
    self-comparison adjustment applied unchanged.

    ``scratch_rows=k`` evaluates item tables in the TRAINING shard layout
    (parallel/dist_step.py: each row-shard carries k trailing kernel-scratch
    rows). This lets fit()'s in-fit validation run directly on the live
    sharded train state without ever gathering the item table to one chip.
    """
    from jax.sharding import PartitionSpec as P

    if tie_mode not in TIE_MODES:
        raise NotImplementedError(f"Unknown tie mode: {tie_mode!r}")
    mode_in = gru.input_mode(cfg)
    cutoffs = tuple(int(c) for c in cutoffs)
    nd = mesh.shape["data"]
    if batch_size % nd:
        raise ValueError(f"batch_size {batch_size} must divide over data axis {nd}")
    nm = mesh.shape["model"]
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    if n_pad % nm:
        raise ValueError(
            f"padded item count {n_pad} must divide over model axis {nm}; "
            f"adjust item_pad_multiple or the mesh shape"
        )
    # Rank on PRE-activation scores: shard-local softmax normalization is not
    # comparable across shards, and every final activation is monotone per
    # element, so ranks are unchanged. (Caveat: activations that CREATE ties,
    # e.g. relu clamping negatives, tie differently than the single-chip
    # evaluator under the conservative/median modes.)
    # copy.copy, NOT dataclasses.replace: replace re-runs __post_init__
    # validation, which would spuriously warn about the internal
    # cross-entropy + linear combination (the scores are never logged here)
    import copy

    cfg = copy.copy(cfg)
    cfg.final_act = "linear"

    def chunk_body(params, H, in_c, out_c, valid_c, reset_c, rec, mrr, n, key,
                   step, item_idx=None):
        rows_total = params["Wy"].shape[0]
        # trailing per-shard kernel-scratch rows (training layout) own no
        # item: global id r0+j only exists for j < rows_local
        rows_local = rows_total - scratch_rows
        mi = jax.lax.axis_index("model")
        r0 = mi * rows_local
        # global ids of this shard's rows; padding/scratch rows masked out
        col_ids = r0 + jnp.arange(rows_total)
        col_valid = (jnp.arange(rows_total) < rows_local) & (col_ids < n_items)

        from gru4rec_tpu.parallel.dist_step import make_row_gather

        gather_rows = make_row_gather(r0, rows_local)

        if items_subset:
            # subset columns shard over `model` like the catalog: each shard
            # keeps only the rows it owns (others zero, masked from counts);
            # gathered ONCE per chunk, the scan reuses them every step
            sub_owned = (item_idx >= r0) & (item_idx < r0 + rows_local)
            loc_sub = jnp.where(sub_owned, item_idx - r0, rows_total)
            sub_rows = jnp.take(params["Wy"], loc_sub, axis=0, mode="fill",
                                fill_value=0)

        def step_fn(carry, xs):
            H, rec, mrr, n, step = carry
            in_idx, out_idx, valid, reset = xs
            H = tuple(jnp.where(reset[:, None], 0.0, h) for h in H)
            Xg = jnp.where(valid, in_idx, 0)
            if mode_in == "constrained":
                srows = {"WyS": gather_rows(params["Wy"], Xg)}
            elif mode_in == "embedding":
                srows = {"E": gather_rows(params["E"], Xg)}
            else:
                srows = {"Wx0": gather_rows(params["Wx"][0], Xg)}
            b = Xg.shape[0]
            out_v = jnp.where(valid, out_idx, 0)
            self_adj = 0.0
            if items_subset:
                # score [targets | subset] like the single-chip subset path;
                # target rows gathered per step (b rows), subset rows hoisted
                t_owned = (out_v >= r0) & (out_v < r0 + rows_local)
                # sentinel past the scratch rows (see gather_rows above):
                # rows_local itself addresses the first kernel-scratch row
                loc_t = jnp.where(t_owned, out_v - r0, rows_total)
                t_rows = jnp.take(params["Wy"], loc_t, axis=0, mode="fill",
                                  fill_value=0)
                srows["Wy"] = jnp.concatenate([t_rows, sub_rows], axis=0)
                H_new, yhat = gru.forward(
                    params, srows, list(H), cfg, M=b, training=False,
                    full_catalog=False,
                )
                owned_cols = jnp.concatenate([t_owned, sub_owned])
                if tie_mode == "tiebreaking":
                    nkey = jax.random.fold_in(jax.random.fold_in(key, step), mi)
                    u = jax.random.uniform(nkey, yhat.shape)
                    noise = u * (jnp.abs(yhat) * 1e-6 + 1e-12)
                    yhat = yhat + jnp.where(owned_cols[None, :], noise, 0.0)
                t_local = jnp.where(
                    t_owned, yhat[jnp.arange(b), jnp.arange(b)], 0.0)
                target = jax.lax.psum(t_local, "model")
                t = target[:, None]
                scores = yhat[:, b:]
                cnt_ok = sub_owned[None, :]
                if tie_mode == "tiebreaking":
                    # exclude the target's duplicate subset column: its
                    # independent dither draw would count as > target with
                    # probability ~1/2 (see make_eval_chunk_fn)
                    out_chk = jnp.where(valid, out_idx, -1)
                    dup = item_idx[None, :] == out_chk[:, None]
                    cnt_ok = cnt_ok & ~dup
                gt = jax.lax.psum(
                    jnp.sum((scores > t) & cnt_ok, axis=1), "model")
                second = None
                if tie_mode == "conservative":
                    second = jax.lax.psum(
                        jnp.sum((scores >= t) & cnt_ok, axis=1), "model")
                elif tie_mode == "median":
                    second = jax.lax.psum(
                        jnp.sum((scores == t) & cnt_ok, axis=1), "model")
                if tie_mode in ("conservative", "median"):
                    # single-chip self-comparison adjustment, unchanged (see
                    # make_eval_chunk_fn): count the self exactly once when
                    # the target is not among the subset columns
                    out_chk = jnp.where(valid, out_idx, -1)
                    in_sub = jnp.any(item_idx[None, :] == out_chk[:, None],
                                     axis=1)
                    self_adj = jnp.where(
                        in_sub, 0.0, 1.0 if tie_mode == "conservative" else 0.5
                    )
            else:
                # forward up to the hidden state; score against the LOCAL shard
                H_new, scores = gru.forward(
                    params, srows, list(H), cfg, M=b, training=False,
                    full_catalog=True, item_valid=col_valid,
                )
                scores = jnp.where(col_valid, scores, -jnp.inf)
                if tie_mode == "tiebreaking":
                    # RELATIVE dither: these are pre-activation logits of O(1)
                    # magnitude, where an absolute 1e-10 (the single-chip path's
                    # post-activation constant) is below one f32 ULP and would
                    # round away, silently degrading to 'standard'
                    nkey = jax.random.fold_in(jax.random.fold_in(key, step), mi)
                    u = jax.random.uniform(nkey, scores.shape)
                    noise = u * (jnp.abs(scores) * 1e-6 + 1e-12)
                    # padding columns hold -inf: |.|*eps would be inf -> NaN
                    scores = scores + jnp.where(col_valid, noise, 0.0)
                t_local = jnp.where(
                    (out_v >= r0) & (out_v < r0 + rows_local),
                    scores[jnp.arange(b), jnp.clip(out_v - r0, 0, rows_local - 1)],
                    0.0,
                )
                target = jax.lax.psum(t_local, "model")
                t = target[:, None]
                gt = jax.lax.psum(jnp.sum((scores > t) & col_valid, axis=1), "model")
                second = None
                if tie_mode == "conservative":
                    second = jax.lax.psum(
                        jnp.sum((scores >= t) & col_valid, axis=1), "model")
                elif tie_mode == "median":
                    second = jax.lax.psum(
                        jnp.sum((scores == t) & col_valid, axis=1), "model")
            ranks = ranks_from_counts(gt, second, tie_mode) + self_adj
            vf = valid.astype(jnp.float32)
            for k, c in enumerate(cutoffs):
                hit = (ranks <= c).astype(jnp.float32) * vf
                rec = rec.at[k].add(jnp.sum(hit))
                mrr = mrr.at[k].add(jnp.sum(hit / ranks))
            n = n + jnp.sum(vf)
            H_out = tuple(
                jnp.where(valid[:, None], hn, ho) for hn, ho in zip(H_new, H))
            return (H_out, rec, mrr, n, step + 1), None

        # accumulate this chunk's contribution from zero, then add the
        # replicated running totals once — psum-ing the (replicated) inputs
        # would count them data-axis times
        zero = jnp.zeros_like(rec)
        carry = (H, zero, zero, jnp.zeros_like(n), step)
        (H, d_rec, d_mrr, d_n, step), _ = jax.lax.scan(
            step_fn, carry, (in_c, out_c, valid_c, reset_c))
        rec = rec + jax.lax.psum(d_rec, "data")
        mrr = mrr + jax.lax.psum(d_mrr, "data")
        n = n + jax.lax.psum(d_n, "data")
        return H, rec, mrr, n, step

    h_spec = tuple(P("data", None) for _ in cfg.layers)
    sched_spec = P(None, "data")
    from gru4rec_tpu.parallel.mesh import param_pspecs

    pspec = param_pspecs(
        {"Wx": [None] * len(cfg.layers), "Wh": [None] * len(cfg.layers),
         "Wrz": [None] * len(cfg.layers), "Bh": [None] * len(cfg.layers),
         "Wy": None, **({"E": None} if mode_in == "embedding" else {})},
        mode_in,
    )
    in_specs = (pspec, h_spec, sched_spec, sched_spec, sched_spec, sched_spec,
                P(None), P(None), P(), P(), P())
    if items_subset:
        in_specs = in_specs + (P(None),)  # item list replicated on every shard
    out_specs = (h_spec, P(None), P(None), P(), P())
    body = jax.shard_map(chunk_body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    return jax.jit(body, donate_argnums=(1, 6, 7, 8))


def make_dist_topk_fn(cfg: GRU4RecConfig, n_items: int, k: int, mesh,
                      scratch_rows: int = 0):
    """Multi-chip full-catalog top-k serving step (beyond the reference,
    whose only serving API materializes the full items x events score frame
    on one device, gru4rec.py:665-728): lanes shard over ``data``, the item
    table rows over ``model`` — each shard scores and top-k's ONLY the rows
    it owns, then the per-shard candidates (k ids + scores per shard, tiny)
    are ``all_gather``-ed and re-top-k'd, so the full catalog never needs to
    fit one chip and only (batch, k) crosses between shards.

    Score parity with the single-chip :meth:`GRU4Rec.predict_topk`:

    * ``softmax`` / ``softmax_logit`` final activations need a full-row
      normalizer, which shard-local softmax cannot see — the forward runs
      with a linear head and the exact normalizer is rebuilt from two scalar
      collectives (``pmax`` of the row max, ``psum`` of the local exp-sums);
    * every other final activation is elementwise and monotone, so it is
      applied to the merged k candidate scores after selection — identical
      ids and scores (activations that CREATE ties, e.g. relu clamping, may
      order equal-score candidates differently than the single-chip path).

    ``scratch_rows`` accepts the training shard layout exactly like
    :func:`make_dist_eval_chunk_fn` (serving straight from a live sharded
    train state).
    """
    from jax.sharding import PartitionSpec as P

    from gru4rec_tpu.ops.activations import get_activation
    from gru4rec_tpu.parallel.mesh import param_pspecs

    mode_in = gru.input_mode(cfg)
    nm = mesh.shape["model"]
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    if n_pad % nm:
        raise ValueError(
            f"padded item count {n_pad} must divide over model axis {nm}; "
            f"adjust item_pad_multiple or the mesh shape"
        )
    # predict swaps softmax_logit for softmax (models/gru.py:253-255)
    act_name = ("softmax" if cfg.final_act == "softmax_logit"
                else cfg.final_act)
    softmax_head = act_name == "softmax"
    # copy.copy, not dataclasses.replace: see make_dist_eval_chunk_fn
    import copy

    cfg = copy.copy(cfg)
    cfg.final_act = "linear"

    def topk_body(params, H, in_idx):
        rows_total = params["Wy"].shape[0]
        rows_local = rows_total - scratch_rows
        mi = jax.lax.axis_index("model")
        r0 = mi * rows_local
        col_ids = r0 + jnp.arange(rows_total)
        col_valid = (jnp.arange(rows_total) < rows_local) & (col_ids < n_items)

        from gru4rec_tpu.parallel.dist_step import make_row_gather

        gather_rows = make_row_gather(r0, rows_local)

        if mode_in == "constrained":
            srows = {"WyS": gather_rows(params["Wy"], in_idx)}
        elif mode_in == "embedding":
            srows = {"E": gather_rows(params["E"], in_idx)}
        else:
            srows = {"Wx0": gather_rows(params["Wx"][0], in_idx)}
        b = in_idx.shape[0]
        H_new, s = gru.forward(
            params, srows, list(H), cfg, M=b, training=False,
            full_catalog=True, item_valid=col_valid,
        )
        s = jnp.where(col_valid, s, -jnp.inf)
        if softmax_head:
            m = jax.lax.pmax(jnp.max(s, axis=1), "model")
            z = jax.lax.psum(
                jnp.sum(jnp.where(col_valid, jnp.exp(s - m[:, None]), 0.0),
                        axis=1),
                "model")
        kk = min(k, rows_total)
        sc_l, idx_l = jax.lax.top_k(s, kk)
        ids_l = r0 + idx_l
        sc_g = jnp.moveaxis(jax.lax.all_gather(sc_l, "model"), 0, 1)
        ids_g = jnp.moveaxis(jax.lax.all_gather(ids_l, "model"), 0, 1)
        sc, pos = jax.lax.top_k(sc_g.reshape(b, nm * kk), k)
        ids = jnp.take_along_axis(ids_g.reshape(b, nm * kk), pos, axis=1)
        if softmax_head:
            sc = jnp.exp(sc - m[:, None]) / z[:, None]
        else:
            sc = get_activation(act_name)(sc)
        return tuple(H_new), ids, sc

    h_spec = tuple(P("data", None) for _ in cfg.layers)
    pspec = param_pspecs(
        {"Wx": [None] * len(cfg.layers), "Wh": [None] * len(cfg.layers),
         "Wrz": [None] * len(cfg.layers), "Bh": [None] * len(cfg.layers),
         "Wy": None, **({"E": None} if mode_in == "embedding" else {})},
        mode_in,
    )
    in_specs = (pspec, h_spec, P("data"))
    out_specs = (h_spec, P("data", None), P("data", None))
    # no donation: self.H is shared with the single-chip predict path, which
    # must stay readable if the caller mixes mesh and non-mesh calls
    body = jax.shard_map(topk_body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    return jax.jit(body)


def evaluate(gru_model, test_data, items=None, session_key="SessionId",
             item_key="ItemId", time_key="Time", cut_off=[20], batch_size=100,
             mode="standard", mesh=None, _sched_cache=None):
    """Measure Recall@N and MRR@N of a trained model (reference: evaluate_gpu,
    evaluation.py:15-147). Returns ``(recall_list, mrr_list)``; scalars are
    returned as one-element lists to match multi-cutoff handling.

    ``mesh`` (a ``jax.sharding.Mesh`` with ``data``/``model`` axes) evaluates
    multi-chip: lanes shard over ``data``, the item table over ``model`` —
    the full catalog never needs to fit one chip (see
    make_dist_eval_chunk_fn). ``items`` restricts rank competitors to the
    given item list (reference: evaluation.py:104-105) and combines with
    ``mesh`` (subset columns shard over ``model``).

    Tie modes match between the single-chip and mesh paths exactly for
    ``standard``/``conservative``/``median``. ``tiebreaking`` necessarily
    DIVERGES beyond shared-RNG reproducibility: the single-chip path adds an
    absolute 1e-10 uniform dither to post-activation scores, while the mesh
    path ranks on pre-activation logits (shard-local softmax normalization is
    not comparable across shards) and must use a RELATIVE dither (~1e-6·|x|)
    because 1e-10 is below one f32 ULP of an O(1) logit and would round away.
    Both draw different random streams; results agree in distribution (ties
    broken uniformly at random) but not event-for-event."""
    if gru_model.error_during_train:
        raise Exception("Training ended with an error; model is unusable.")
    multi = isinstance(cut_off, (list, tuple))
    cutoffs = list(cut_off) if multi else [cut_off]
    print("Measuring Recall@{} and MRR@{}".format(
        ",".join(str(c) for c in cutoffs), ",".join(str(c) for c in cutoffs)))

    cfg = gru_model.config
    if mesh is not None and batch_size % mesh.shape["data"]:
        # metrics average per EVENT, so the lane count does not change them
        # (only the session->lane packing) — round down rather than abort
        # (e.g. the default 512 on a 3-wide data axis)
        nd = mesh.shape["data"]
        adj = max(nd, batch_size - batch_size % nd)
        print(f"evaluate: batch_size {batch_size} -> {adj} "
              f"(must divide the {nd}-wide data axis)")
        batch_size = adj
    itemidmap = gru_model.itemidmap
    # ``_sched_cache`` (a caller-owned dict) memoizes the host-side
    # merge/sort/schedule prep across calls with the SAME test frame —
    # in-fit per-epoch validation otherwise repeats identical multi-second
    # host work every epoch while the device idles. Callers must drop the
    # dict when the frame may have changed (fit() keeps one per fit call).
    sched = None
    if _sched_cache is not None:
        # id() alone is unsafe (a GC'd frame's id can be recycled; an
        # in-place mutation keeps id and len) — key on a cheap content
        # fingerprint too, and pin the keyed frame inside the entry so its
        # id() cannot be reused while the cache holds it.
        n = len(test_data)
        fp = ()
        if n:
            _r0, _r1 = test_data.iloc[0], test_data.iloc[-1]
            fp = tuple(_r0[k] for k in (session_key, item_key, time_key))
            fp += tuple(_r1[k] for k in (session_key, item_key, time_key))
        _ck = (id(test_data), n, fp, int(batch_size),
               session_key, item_key, time_key)
        hit = _sched_cache.get(_ck)
        if hit is not None:
            _, sched = hit
    if sched is None:
        _keyed_frame = test_data  # pinned in the cache entry (id-recycle guard)
        test_data = pd.merge(
            test_data,
            pd.DataFrame({"ItemIdx": itemidmap.values,
                          item_key: itemidmap.index}),
            on=item_key,
            how="inner",
        )
        test_data.sort_values([session_key, time_key, item_key], inplace=True)
        offsets = compute_offset(test_data, session_key)
        order = np.arange(len(offsets) - 1, dtype=np.int64)
        sched = build_schedule(
            test_data["ItemIdx"].values.astype(np.int32), offsets, order,
            batch_size,
        )
        if _sched_cache is not None:
            _sched_cache[_ck] = (_keyed_frame, sched)

    item_idx = None
    items_subset = items is not None
    if items_subset:
        item_idx = jnp.asarray(itemidmap[items].values.astype(np.int32))

    dist_params = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gru4rec_tpu.parallel.mesh import param_pspecs

        # detect the training shard layout (per-shard kernel scratch rows
        # appended to every item-table shard, parallel/dist_step.py): in-fit
        # validation passes the live sharded train state unchanged
        from gru4rec_tpu.parallel.dist_step import detect_scratch_layout

        scratch = detect_scratch_layout(
            gru_model.params, gru_model.n_items, cfg, mesh)
        chunk_fn = _cached_dist_eval_chunk_fn(
            cfg, gru_model.n_items, cutoffs, mode, batch_size, mesh,
            items_subset, scratch_rows=scratch,
        )
        mode_in = gru.input_mode(cfg)
        pspec = param_pspecs(gru_model.params, mode_in)
        from gru4rec_tpu.parallel.mesh import put_global

        put = lambda x, s: put_global(x, NamedSharding(mesh, s))
        dist_params = jax.tree_util.tree_map(put, dict(gru_model.params), pspec)
        sched_shard = NamedSharding(mesh, P(None, "data"))
    else:
        chunk_fn = _cached_eval_chunk_fn(
            cfg, gru_model.n_items, cutoffs, mode, batch_size, items_subset
        )
    H = tuple(gru.init_hidden(cfg, batch_size))
    rec = jnp.zeros((len(cutoffs),), jnp.float32)
    mrr = jnp.zeros((len(cutoffs),), jnp.float32)
    n = jnp.zeros((), jnp.float32)
    key = jax.random.PRNGKey(cfg.seed + 1)
    step = jnp.zeros((), jnp.int32)

    C = cfg.chunk_size
    T = sched.n_steps
    # pad the TAIL chunk to a multiple of min(64, C) steps, not all the way
    # to C: short eval sets would otherwise burn up to C-1 fully-masked steps
    # (a 60k-event eval at batch 512 is ~110 real steps — padding to 512 was
    # 4.6x wasted device time). Full-size chunks are untouched, and each
    # distinct padded length compiles once (at most C/64 variants).
    quantum = min(64, C)
    for t0 in range(0, T, C):
        t1 = min(t0 + C, T)
        pad = -(t1 - t0) % quantum
        sl = lambda a: np.pad(a[t0:t1], ((0, pad), (0, 0)))
        raw = (sl(sched.in_idx), sl(sched.out_idx), sl(sched.valid),
               sl(sched.reset))
        if mesh is not None:
            # one host->sharded transfer (an intermediate jnp.asarray would
            # land on the default device first and reshard from there)
            args = tuple(put_global(a, sched_shard) for a in raw)
            extra = (item_idx,) if items_subset else ()
            H, rec, mrr, n, step = chunk_fn(
                dist_params, H, *args, rec, mrr, n, key, step, *extra
            )
        elif items_subset:
            args = tuple(jnp.asarray(a) for a in raw)
            H, rec, mrr, n, step = chunk_fn(
                gru_model.params, H, *args, rec, mrr, n, key, step, item_idx
            )
        else:
            args = tuple(jnp.asarray(a) for a in raw)
            H, rec, mrr, n, step = chunk_fn(
                gru_model.params, H, *args, rec, mrr, n, key, step
            )
    # ONE device->host transfer for all 2*len(cutoffs)+1 scalars: separate
    # float() pulls are separate RPCs, which on a tunneled backend cost a
    # round trip each — at rees46 scale that was a measurable fraction of
    # the whole evaluation (round-5 note).
    combo = np.asarray(jnp.concatenate([rec, mrr, n[None]]))
    k = len(cutoffs)
    n = float(combo[2 * k])
    if n == 0:
        raise ValueError(
            "test set produced no evaluable events: every session has fewer "
            "than two events after inner-joining items to the training "
            "vocabulary"
        )
    recall = [float(r) / n for r in combo[:k]]
    mrr_out = [float(m) / n for m in combo[k:2 * k]]
    return recall, mrr_out


# API-parity alias with the reference module name (evaluation.evaluate_gpu).
evaluate_gpu = evaluate


def evaluate_sessions_batch(pr, test_data, items=None, cut_off=20, batch_size=100,
                            mode="standard", session_key="SessionId",
                            item_key="ItemId", time_key="Time"):
    """Legacy batch evaluator driving the stateful ``predict_next_batch``
    serving path (reference: evaluation.py:149-245 — which is bit-rotted
    there, using the long-removed DataFrame.ix; modernized here). Slower than
    ``evaluate`` (host round-trip per step) but exercises the exact serving
    code path. Single cutoff only, like the reference."""
    print("Measuring Recall@{} and MRR@{}".format(cut_off, cut_off))
    if items is not None:
        # same semantics as the compiled evaluator, whose subset lookup
        # (``itemidmap[items]``, evaluate() above) KeyErrors on items the
        # model never saw — an out-of-vocab subset item used to be silently
        # scored 0 here via fillna, ranking it instead of erroring
        items_arr = np.asarray(items)
        miss = ~np.isin(items_arr, pr.itemidmap.index.values)
        if miss.any():
            missing = pd.unique(items_arr[miss])
            raise KeyError(
                f"items subset contains IDs not in the training vocabulary: "
                f"{list(missing[:5])}{'...' if len(missing) > 5 else ''}"
            )
    test_data = pd.merge(
        test_data,
        pd.DataFrame({"ItemIdx": pr.itemidmap.values, item_key: pr.itemidmap.index}),
        on=item_key, how="inner",
    )
    test_data.sort_values([session_key, time_key, item_key], inplace=True)
    offset_sessions = compute_offset(test_data, session_key)
    if len(offset_sessions) - 1 < batch_size:
        batch_size = len(offset_sessions) - 1
    if batch_size < 1:
        raise ValueError(
            "test set produced no evaluable sessions after inner-joining "
            "items to the training vocabulary"
        )
    iters = np.arange(batch_size).astype(np.int64)
    maxiter = iters.max()
    start = offset_sessions[iters].copy()
    end = offset_sessions[iters + 1].copy()
    item_vals = test_data[item_key].values
    rng = np.random.RandomState(pr.config.seed + 2)
    n_points, recall, mrr = 0, 0.0, 0.0
    in_ids = np.zeros(batch_size, dtype=object)
    while True:
        valid_mask = iters >= 0
        if valid_mask.sum() == 0:
            break
        start_valid = start[valid_mask]
        minlen = (end[valid_mask] - start_valid).min()
        in_ids[valid_mask] = item_vals[start_valid]
        for i in range(int(minlen) - 1):
            out_ids = item_vals[start_valid + i + 1]
            if items is not None:
                # score the item list plus any targets outside it
                # (reference: evaluation.py:207-208)
                uniq_out = np.unique(out_ids)
                predict_for = np.hstack([items, uniq_out[~np.isin(uniq_out, items)]])
                preds = pr.predict_next_batch(iters, in_ids, predict_for, batch_size)
            else:
                preds = pr.predict_next_batch(iters, in_ids, None, batch_size)
            in_ids[valid_mask] = out_ids
            scores = preds.values.T  # (batch, n_scored)
            if mode == "tiebreaking":
                scores = scores + 1e-10 * rng.rand(*scores.shape)
            tgt_pos = preds.index.get_indexer(out_ids)
            tgt = scores[valid_mask, :][np.arange(int(valid_mask.sum())), tgt_pos]
            if items is not None:
                others = scores[valid_mask, :][:, preds.index.get_indexer(items)]
            else:
                others = scores[valid_mask, :]
            if mode == "conservative":
                ranks = (others >= tgt[:, None]).sum(axis=1).astype(float)
            elif mode == "median":
                ranks = ((others > tgt[:, None]).sum(axis=1)
                         + 0.5 * ((others == tgt[:, None]).sum(axis=1) - 1) + 1)
            else:
                ranks = (others > tgt[:, None]).sum(axis=1) + 1
            if items is not None and mode in ("conservative", "median"):
                # count the self-comparison exactly once when the target is
                # outside the subset columns — same adjustment as the
                # compiled evaluator (see make_eval_chunk_fn); without it
                # 'conservative' yields rank 0 (inf MRR) whenever the target
                # outscores the whole subset
                in_sub = np.isin(out_ids, items)
                ranks = ranks + np.where(
                    in_sub, 0.0, 1.0 if mode == "conservative" else 0.5)
            ok = ranks <= cut_off
            recall += ok.sum()
            mrr += (1.0 / ranks * ok).sum()
            n_points += len(ranks)
        start = start + minlen - 1
        finished = np.arange(len(iters))[valid_mask & (end - start <= 1)]
        for idx in finished:
            maxiter += 1
            if maxiter >= len(offset_sessions) - 1:
                iters[idx] = -1
            else:
                iters[idx] = maxiter
                start[idx] = offset_sessions[maxiter]
                end[idx] = offset_sessions[maxiter + 1]
    if n_points == 0:
        raise ValueError(
            "test set produced no evaluable events: every session has fewer "
            "than two events after inner-joining items to the training "
            "vocabulary"
        )
    return recall / n_points, mrr / n_points


def evaluate_sessions(pr, test_data, train_data, items=None, cut_off=20,
                      session_key="SessionId", item_key="ItemId", time_key="Time",
                      rng=None):
    """Session-vectorized evaluator for baseline predictors (the protocol of
    reference evaluation.py:247-301, re-designed).

    Predictors exposing ``predict_session(session_id, session_items,
    predict_for_item_ids) -> (len(session_items)-1, n) score matrix`` (all
    shipped baselines do) are driven one call per session, with random
    tie-breaking and rank computation vectorized over the session's events —
    orders of magnitude fewer Python-level steps than the reference's
    per-event loop. Predictors implementing only
    ``predict_next(session_id, input_item_id, predict_for_item_ids)`` fall
    back to per-event calls. Ranks are strict-greater counts + 1 under a
    1e-8 uniform dither, scored as ``rank <= cut_off`` — the reference's
    strict ``<`` (evaluation.py:296) is a documented off-by-one that
    SURVEY.md §2.5 flags as not-to-replicate.

    When ``items`` is given, an event's rank competitors are ``items`` plus
    the target itself (reference: evaluation.py:288-291); the vectorized path
    scores each session's out-of-list targets as extra columns — under a
    strict ``>`` the target's self-comparison contributes nothing, so the
    extra columns never change the rank.
    """
    if rng is None:
        rng = np.random.RandomState(0)
    test_data = test_data.sort_values([session_key, time_key])
    vocab = train_data[item_key].unique()
    sids = test_data[session_key].values
    iids = test_data[item_key].values
    bounds = np.concatenate(
        [[0], np.nonzero(sids[1:] != sids[:-1])[0] + 1, [len(sids)]]
    )
    use_session_api = hasattr(pr, "predict_session")
    items_arr = np.asarray(items) if items is not None else None
    n_points, recall, mrr = 0, 0.0, 0.0
    for k in range(len(bounds) - 1):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        if hi - lo < 2:
            continue  # a 1-event session has nothing to predict
        sess = iids[lo:hi]
        targets = sess[1:]
        if use_session_api:
            if items_arr is None:
                cols, cand_mask = vocab, None
            else:
                extra = pd.unique(targets[~np.isin(targets, items_arr)])
                cols = np.hstack([items_arr, extra])
                cand_mask = np.zeros(len(cols), bool)
                cand_mask[: len(items_arr)] = True
            scores = np.asarray(
                pr.predict_session(sids[lo], sess, cols), dtype=np.float64
            )
            scores = np.nan_to_num(scores, nan=0.0)
            scores = scores + 1e-8 * rng.rand(*scores.shape)
            tcol = pd.Index(cols).get_indexer(targets)
            if (tcol < 0).any():
                # a -1 indexer would silently score the LAST column as the
                # target; the reference KeyErrors on unknown targets
                # (evaluation.py:294) — fail loudly the same way
                missing = pd.unique(targets[tcol < 0])
                raise KeyError(
                    f"test items not present in the training vocabulary: "
                    f"{list(missing[:5])}{'...' if len(missing) > 5 else ''}"
                )
            tscore = scores[np.arange(len(targets)), tcol]
            cand = scores if cand_mask is None else scores[:, cand_mask]
            ranks = (cand > tscore[:, None]).sum(axis=1) + 1.0
        else:
            ranks = np.empty(len(targets))
            prev = sess[0]
            for t, tgt in enumerate(targets):
                if items_arr is None:
                    predict_for = vocab
                elif (items_arr == tgt).any():
                    predict_for = items_arr
                else:
                    predict_for = np.hstack(([tgt], items_arr))
                preds = pr.predict_next(sids[lo], prev, predict_for)
                preds[np.isnan(preds)] = 0
                preds = preds + 1e-8 * rng.rand(len(preds))
                ranks[t] = (preds > preds[tgt]).sum() + 1
                prev = tgt
        ok = ranks <= cut_off
        recall += int(ok.sum())
        mrr += float((1.0 / ranks[ok]).sum())
        n_points += len(ranks)
    if n_points == 0:
        raise ValueError(
            "test set produced no evaluable events: every session has fewer "
            "than two events after inner-joining items to the training "
            "vocabulary"
        )
    return recall / n_points, mrr / n_points
