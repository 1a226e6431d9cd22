"""The user-facing GRU4Rec model: fit / predict / save / load.

API-compatible surface with the reference class (gru4rec.py:27-781): the same
constructor keyword set, ``set_params`` string coercion, ``fit(data)``,
stateful ``predict_next_batch``, and ``savemodel``/``loadmodel`` — but the
engine underneath is the TPU-native scan pipeline (train/step.py) instead of
a per-step host loop.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.data.loader import apply_itemidmap, build_itemidmap
from gru4rec_tpu.data.scheduler import build_schedule, session_order
from gru4rec_tpu.data.tools import compute_offset, sort_if_needed
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.sampling import build_alias_table, popularity_cdf
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn


def _chunk_schedule(sched, chunk_size):
    """Pre-split a schedule into zero-padded (chunk, B) step blocks; the last
    tuple element carries the cumulative real-step count for logging."""
    chunks = []
    T = sched.n_steps
    for t0 in range(0, T, chunk_size):
        t1 = min(t0 + chunk_size, T)
        pad = chunk_size - (t1 - t0)
        sl = lambda a: np.pad(a[t0:t1], ((0, pad), (0, 0)))
        chunks.append(
            (sl(sched.in_idx), sl(sched.out_idx), sl(sched.valid), sl(sched.reset), t1)
        )
    return chunks


def _stack_chunks(chunks):
    """Stack the per-chunk schedule blocks into four (n_chunks, C, B) arrays.

    The whole epoch schedule then crosses host->device as FOUR transfers
    instead of four per chunk. Each transfer to a tunneled device pays a
    fixed round-trip (and, cold, a ~0.3-0.5 s remote compile of the implicit
    convert/broadcast program), so the old per-chunk upload dominated
    epoch 1 — 183 chunks x 4 arrays ≈ 330 s at the flagship shape
    (PERF_NOTES "Cold-start anatomy")."""
    if not chunks:  # zero-step schedule: a valid, empty epoch
        return None, []
    stacks = tuple(
        np.stack([c[i] for c in chunks]) for i in range(4)
    )
    ends = [c[4] for c in chunks]
    return stacks, ends


# Device-HBM budget for the stacked epoch schedule (~10 bytes per
# step-lane). Above it, the stacks stay on host and the loop falls back to
# per-chunk uploads — slower cold-start, but a giant dataset can't crowd
# the item tables + optimizer state out of a 16 GB chip.
_SCHEDULE_DEVICE_BYTE_BUDGET = int(os.environ.get(
    "GRU4REC_TPU_SCHEDULE_DEVICE_BYTES", 1 << 30))


def _encode_stacks(stacks, n_items):
    """Wire-format the epoch schedule for the host->device upload: item
    indices as uint16 when the catalog fits (all published shapes except
    Rees46), valid/reset bit-packed 8 lanes/byte. 75 MB -> 34 MB at the
    flagship shape — epoch 1 through a tunneled device is BANDWIDTH-bound
    on this transfer (round-5 measurement: 9.5-479 s for the same program
    as tunnel throughput swung 0.15-8 MB/s; compiles were sub-second), so
    bytes on the wire are the cost. Decoded on device per chunk
    (_slice_chunk_packed); schedule VALUES are unchanged."""
    in_s, out_s, valid_s, reset_s = stacks
    idt = np.uint16 if n_items <= np.iinfo(np.uint16).max else np.int32
    return (in_s.astype(idt), out_s.astype(idt),
            np.packbits(valid_s, axis=-1), np.packbits(reset_s, axis=-1))


def _upload_stacks(stacks, mesh, n_items=None):
    if stacks is None:  # empty epoch (zero-step schedule)
        return None
    if sum(s.nbytes for s in stacks) > _SCHEDULE_DEVICE_BYTE_BUDGET:
        return stacks  # host fallback; _get_chunk slices numpy per chunk
    if mesh is None:
        B = stacks[0].shape[-1]
        enc = _encode_stacks(stacks, n_items if n_items is not None else 1 << 31)
        return ("packed", tuple(jnp.asarray(s) for s in enc), B)
    from jax.sharding import NamedSharding, PartitionSpec

    from gru4rec_tpu.parallel.mesh import put_global

    # lanes (B, last dim) ride the data axis, matching the dist chunk_fn's
    # P(None, "data") schedule specs so the per-chunk slices need no reshard.
    # The packed wire format is single-chip only: packing 8 lanes/byte would
    # couple the data-axis sharding to B/8 divisibility, and multi-chip
    # links are not the tunnel-bandwidth regime the packing targets.
    shard = NamedSharding(mesh, PartitionSpec(None, None, "data"))
    return tuple(put_global(s, shard) for s in stacks)


@jax.jit
def _slice_chunk(stacks, ci):
    """Device-side slice of chunk ``ci`` from the stacked epoch schedule.

    ``ci`` is a traced scalar: one compile serves every chunk index (a
    Python-int index would bake the constant in and retrace per chunk)."""
    return tuple(s[ci] for s in stacks)


@partial(jax.jit, static_argnames=("B",))
def _slice_chunk_packed(stacks, ci, B):
    """Slice + decode chunk ``ci`` of the packed wire format (see
    _encode_stacks): widen items to int32, unpack the lane bitmaps."""
    in_c = stacks[0][ci].astype(jnp.int32)
    out_c = stacks[1][ci].astype(jnp.int32)

    def unpack(p):
        bits = (p[..., :, None] >> (7 - jnp.arange(8, dtype=jnp.uint8))) & 1
        return bits.reshape(p.shape[:-1] + (-1,))[..., :B].astype(bool)

    return in_c, out_c, unpack(stacks[2][ci]), unpack(stacks[3][ci])


def _get_chunk(stacks, ci):
    if isinstance(stacks[0], str):  # ("packed", enc, B) wire format
        return _slice_chunk_packed(stacks[1], np.int32(ci), B=stacks[2])
    if isinstance(stacks[0], np.ndarray):  # over-budget host fallback
        return tuple(s[ci] for s in stacks)
    return _slice_chunk(stacks, np.int32(ci))


class GRU4Rec:
    """TPU-native GRU4Rec session-based recommender."""

    def __init__(self, config: Optional[GRU4RecConfig] = None, **kwargs):
        if config is None:
            config = GRU4RecConfig()
        self.config = config
        if kwargs:
            self.config.set_params(**{k: v for k, v in kwargs.items()})
        self.params = None
        self.n_items = 0
        self.itemidmap: Optional[pd.Series] = None
        self.H = None
        self.error_during_train = False
        self._train_state = None
        self._predict_fn = None
        self._predict_batch = None
        self._predict_n_items = None
        self._current_session = None
        self._topk_fn = None
        self._topk_k = None
        self._dist_topk = None
        self._completed_epochs = 0

    # Convenience passthroughs for reference-style attribute access.
    def set_params(self, **kwargs):
        self.config.set_params(**kwargs)
        return self

    def __getattr__(self, name):
        # Reference-style attribute access (gru.layers, gru.loss, ...) is
        # forwarded for CONFIG FIELDS ONLY: forwarding every cfg attribute
        # would make typos on model attributes resolve against config
        # methods and fail confusingly far from the call site.
        import dataclasses

        cfg = object.__getattribute__(self, "config")
        if name in {f.name for f in dataclasses.fields(cfg)}:
            return getattr(cfg, name)
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}"
        )

    # ------------------------------------------------------------------ #
    def fit(self, data: pd.DataFrame, sample_store: int = 10_000_000,
            store_type: str = "gpu", n_epochs: Optional[int] = None,
            retrain: bool = False, checkpoint_every: int = 0,
            checkpoint_path: Optional[str] = None, resume: Optional[str] = None,
            profile_dir: Optional[str] = None, mesh=None,
            eval_data: Optional[pd.DataFrame] = None, eval_every: int = 1,
            eval_cutoff: int = 20, eval_batch_size: int = 512,
            eval_mode: str = "standard", eval_metric: str = "recall",
            early_stop_patience: int = 0, keep_best: bool = True):
        """Train the network (reference: gru4rec.py:515-664).

        ``sample_store``/``store_type`` are accepted for CLI/API parity but
        the store itself is in-graph on TPU (ops/sampling.py): one
        uniform+searchsorted block per scan chunk, no host involvement.

        Beyond the reference:
        * ``retrain=True`` continues training an already-fit model on new
          data, growing the item tables for unseen items (the reference's
          unused ``extend_weights``, gru4rec.py:261-266).
        * ``checkpoint_every=k`` + ``checkpoint_path`` saves a full training
          checkpoint (params + optimizer state + RNG + epoch) every k epochs;
          ``resume=path`` continues an interrupted run exactly.
        * ``profile_dir`` captures a ``jax.profiler`` trace of the second
          epoch (the first is compile-dominated).
        * ``mesh`` (a ``jax.sharding.Mesh`` with axes ``data``/``model``,
          see parallel/mesh.py) trains multi-chip: lanes data-parallel, item
          tables row-sharded. Parameters are gathered back to host at the
          end so evaluation/serving work unchanged.
        * ``eval_data`` turns on validation during training: every
          ``eval_every`` epochs the held-out set is scored with the compiled
          evaluator (Recall@/MRR@``eval_cutoff``, ``eval_mode`` tie
          handling; cached compile, so per-epoch cost is one eval pass).
          With ``early_stop_patience=k`` training stops after k consecutive
          evaluations without improvement of ``eval_metric``
          ("recall"/"mrr"), and with ``keep_best`` (default) the parameters
          of the best evaluation are restored at the end — capabilities the
          reference lacks entirely. Validation results are collected in
          ``self.valid_stats``.
        """
        cfg = self.config
        self._predict_fn = None
        self._topk_fn = None
        self._dist_topk = None
        # invalidate serving lane state: fit() ends by pointing self.H at the
        # TRAINING hidden state (cfg.batch_size lanes) — a later predict call
        # with a matching batch width must not silently continue from it
        self._current_session = None
        self._predict_batch = None
        self._completed_epochs = 0  # resume= overrides with the saved epoch
        self.error_during_train = False
        self.epoch_stats = []  # per-epoch {loss, seconds, steps, events}
        self.valid_stats = []  # per-eval {epoch, recall, mrr}
        best_metric, best_params, stale = -np.inf, None, 0
        item_key, session_key, time_key = cfg.item_key, cfg.session_key, cfg.time_key

        from gru4rec_tpu.utils.logging import get_logger

        logger = get_logger()

        start_epoch = 0
        resumed_state = None
        if resume is not None:
            from gru4rec_tpu.io.checkpoint import load_train_checkpoint

            resumed_state, start_epoch = load_train_checkpoint(resume, self)
            # load_train_checkpoint replaced self.config with the archive's
            # config — everything below (schedule shapes, chunk fn, hidden
            # init, key names) must be built from THAT, not the pre-resume
            # object captured above
            cfg = self.config
            item_key, session_key, time_key = (
                cfg.item_key, cfg.session_key, cfg.time_key)
            print(f"Resuming training from {resume} at epoch {start_epoch + 1}")
            self._completed_epochs = start_epoch
            retrain = False
        if retrain:
            if self.params is None:
                raise ValueError("retrain=True requires a previously trained model")
            new_items = data[item_key].unique()
            unseen = new_items[~np.isin(new_items, self.itemidmap.index.values)]
            if len(unseen):
                print(f"Extending item tables with {len(unseen)} new items")
                self._extend_items(unseen)
        elif resume is None:
            self.itemidmap = build_itemidmap(data, item_key)
            self.n_items = len(self.itemidmap)
        data = apply_itemidmap(data, self.itemidmap, item_key)
        sort_if_needed(data, [session_key, time_key])
        offsets = compute_offset(data, session_key)

        n_pad = gru.pad_items(self.n_items, cfg.item_pad_multiple)
        pop = (
            data.groupby(item_key).size()
            .reindex(self.itemidmap.index.values, fill_value=0)
            .values
        )
        logp0 = np.zeros((n_pad,), dtype=np.float32)
        logp0[: self.n_items] = np.log(np.maximum(pop, 1).astype(np.float64))
        logp0 = jnp.asarray(logp0)
        if cfg.n_sample and cfg.sample_alpha != 0 and cfg.sampler == "alias":
            samp1 = build_alias_table(pop, cfg.sample_alpha).packed
        elif cfg.n_sample and cfg.sample_alpha != 0:
            samp1 = jnp.asarray(popularity_cdf(pop, cfg.sample_alpha))
        else:
            samp1 = jnp.zeros((1,), jnp.float32)

        if resumed_state is not None:
            state = resumed_state
        elif retrain:
            from gru4rec_tpu.train.step import TrainState

            if jnp.asarray(self.params["Wy"]).dtype != jnp.float32:
                # cast_for_serving narrowed the masters; training on them
                # would silently freeze (see config.py's param_dtype guard)
                raise NotImplementedError(
                    "retrain requires float32 master weights, but this "
                    "model's parameters are "
                    f"{jnp.asarray(self.params['Wy']).dtype} (cast for "
                    "serving?). Reload the float32 checkpoint to retrain."
                )
            if self._train_state is not None:
                prev = self._train_state
            else:
                # model restored via loadmodel() without optimizer entries:
                # fresh accumulators over the existing weights (a warm
                # restart; savemodel(include_optimizer=True) archives
                # restore the real state instead, io/checkpoint.py)
                print("retrain: no optimizer state on the model — "
                      "reinitializing accumulators")
                prev = init_train_state(cfg, self.n_items,
                                        jax.random.PRNGKey(cfg.seed))
            state = TrainState(
                self.params, prev.opt_state,
                tuple(gru.init_hidden(cfg, cfg.batch_size)),
                prev.key, prev.step,
            )
        else:
            key = jax.random.PRNGKey(cfg.seed)
            state = init_train_state(cfg, self.n_items, key)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gru4rec_tpu.parallel.dist_step import (
                make_dist_chunk_fn, shard_train_state)
            from gru4rec_tpu.parallel.mesh import put_global

            state = shard_train_state(state, cfg, mesh)
            dist_fn = make_dist_chunk_fn(cfg, self.n_items, mesh)
            sched_shard = NamedSharding(mesh, P(None, "data"))
            repl = NamedSharding(mesh, P(None))
            # loop-invariant inputs replicate ONCE, not per chunk (the alias
            # table is ~MBs at Rees46 scale x ~183 chunks/epoch otherwise)
            samp1 = put_global(samp1, repl)
            logp0 = put_global(logp0, repl)

            def chunk_fn(state, in_c, out_c, valid_c, reset_c, samp1, logp0):
                out = dist_fn(
                    state.params, state.opt_state, state.H, state.key, state.step,
                    put_global(in_c, sched_shard),
                    put_global(out_c, sched_shard),
                    put_global(valid_c, sched_shard),
                    put_global(reset_c, sched_shard),
                    samp1, logp0,
                )
                from gru4rec_tpu.train.step import TrainState

                return TrainState(*out[:5]), out[5], out[6]
        else:
            chunk_fn = make_chunk_fn(cfg, self.n_items)

        base_order = session_order(data, session_key, time_key, cfg.time_sort,
                                   len(offsets) - 1)
        data_items = data["ItemIdx"].values.astype(np.int32)
        C = cfg.chunk_size
        epochs = cfg.n_epochs if n_epochs is None else n_epochs
        # host-side eval-schedule memo for in-fit validation: the same
        # eval_data frame is prepped once, not once per epoch
        eval_sched_cache: dict = {}

        cached_chunks = None
        for epoch in range(start_epoch, epochs):
            profiling = profile_dir is not None and epoch == start_epoch + 1
            if profiling:
                jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            state = state._replace(H=tuple(gru.init_hidden(cfg, cfg.batch_size)))
            if cfg.train_random_order:
                # each epoch's permutation is a pure function of
                # (seed, epoch) — NOT a stream advanced across epochs — so a
                # resumed run (start_epoch > 0) replays exactly the orders an
                # uninterrupted run would have used (reference analogue:
                # gru4rec.py:593 reshuffles per epoch from global state,
                # which would break exact resume)
                order = np.random.default_rng(
                    (cfg.seed, epoch)).permutation(len(offsets) - 1)
                sched = build_schedule(
                    data_items, offsets, order, cfg.batch_size,
                    require_two_lanes=(cfg.n_sample == 0),
                )
                # release the previous epoch's device stacks BEFORE the new
                # upload: rebinding after would transiently hold 2x the
                # schedule byte budget on device
                stacks = None
                stacks, ends = _stack_chunks(_chunk_schedule(sched, C))
                stacks = _upload_stacks(stacks, mesh, self.n_items)
            else:
                # deterministic session order => the schedule is identical
                # every epoch; build, stack, and upload once (the reference
                # re-runs its host loop per epoch, gru4rec.py:587).
                # Re-transferring the same schedule every epoch costs
                # host->device bandwidth (and round trips on a tunneled
                # device).
                if cached_chunks is None:
                    sched = build_schedule(
                        data_items, offsets, base_order, cfg.batch_size,
                        require_two_lanes=(cfg.n_sample == 0),
                    )
                    cs, ce = _stack_chunks(_chunk_schedule(sched, C))
                    cached_chunks = (_upload_stacks(cs, mesh, self.n_items), ce)
                stacks, ends = cached_chunks
            T = ends[-1] if ends else 0
            loss_parts, ev_parts = [], []
            for ci in range(len(ends)):
                in_c, out_c, valid_c, reset_c = _get_chunk(stacks, ci)
                state, ls, ec = chunk_fn(
                    state, in_c, out_c, valid_c, reset_c, samp1, logp0,
                )
                loss_parts.append(ls)
                ev_parts.append(ec)
                # Fail-fast on divergence (the reference aborts per step,
                # gru4rec.py:626-629): check an already-completed chunk's
                # partial loss two dispatches behind, so the host sync never
                # stalls the device — two chunks stay in flight.
                if ci >= 2 and np.isnan(float(loss_parts[ci - 2])):
                    if profiling:
                        jax.profiler.stop_trace()
                    print(f"Epoch {epoch}: NaN error!")
                    logger.log("nan_abort", epoch=epoch, chunk=ci - 2)
                    self.error_during_train = True
                    self._dump_nan_state(state, epoch, mesh, checkpoint_path)
                    return self
            total_events = float(jnp.sum(jnp.stack(ev_parts))) if ev_parts else 0.0
            total_loss = float(jnp.sum(jnp.stack(loss_parts))) if loss_parts else 0.0
            if profiling:
                jax.profiler.stop_trace()
            avgc = total_loss / max(total_events, 1.0)
            if np.isnan(avgc):
                print(f"Epoch {epoch}: NaN error!")
                logger.log("nan_abort", epoch=epoch)
                self.error_during_train = True
                self._dump_nan_state(state, epoch, mesh, checkpoint_path)
                return self
            dt = time.time() - t0
            self.epoch_stats.append(
                {"loss": avgc, "seconds": dt, "steps": T, "events": total_events}
            )
            # cumulative count across resumes: save_checkpoint() must store
            # this, not len(epoch_stats) (which restarts at 0 per fit call)
            self._completed_epochs = epoch + 1
            logger.log("epoch", epoch=epoch + 1, loss=avgc, seconds=dt, steps=T,
                       events=total_events, mb_per_s=T / dt, e_per_s=total_events / dt)
            print(
                "Epoch{} --> loss: {:.6f} \t({:.2f}s) \t[{:.2f} mb/s | {:.0f} e/s]".format(
                    epoch + 1, avgc, dt, T / dt, total_events / dt
                )
            )
            if eval_data is not None and (epoch + 1) % max(eval_every, 1) == 0:
                from gru4rec_tpu.eval import evaluate as _evaluate

                # point the evaluator at the live parameters only for the
                # duration of the call: the next epoch's chunk dispatch
                # DONATES the state buffers, which would leave self.params
                # dangling for anyone touching the model mid-fit. Under a
                # mesh the LIVE SHARDED params go straight to the
                # distributed evaluator (it understands the training shard
                # layout incl. kernel scratch rows) — the full item table is
                # never gathered to one chip.
                prev_params = self.params
                self.params = state.params
                try:
                    rec, mrr = _evaluate(
                        self, eval_data, cut_off=[eval_cutoff],
                        batch_size=eval_batch_size, mode=eval_mode,
                        session_key=session_key, item_key=item_key,
                        time_key=time_key, mesh=mesh,
                        _sched_cache=eval_sched_cache,
                    )
                finally:
                    # even if evaluate() raises: never leave self.params
                    # pointing at the sharded scratch-row training layout
                    self.params = prev_params
                metric = rec[0] if eval_metric == "recall" else mrr[0]
                self.valid_stats.append(
                    {"epoch": epoch + 1, "recall": rec[0], "mrr": mrr[0]})
                logger.log("valid", epoch=epoch + 1, recall=rec[0], mrr=mrr[0])
                print("Validation Recall@{}: {:.6f} MRR@{}: {:.6f}".format(
                    eval_cutoff, rec[0], eval_cutoff, mrr[0]))
                if metric > best_metric:
                    best_metric, stale = metric, 0
                    if keep_best:
                        if mesh is not None:
                            # canonical-layout snapshot via per-shard host
                            # copies (no device-side gather)
                            from gru4rec_tpu.parallel.dist_step import (
                                unshard_params)

                            best_params = unshard_params(
                                state.params, cfg, mesh)
                        else:
                            best_params = jax.tree_util.tree_map(
                                np.asarray, state.params)
                else:
                    stale += 1
                    if early_stop_patience and stale >= early_stop_patience:
                        print(
                            f"Early stopping at epoch {epoch + 1} (no "
                            f"{eval_metric} improvement in {stale} evaluations)"
                        )
                        break
            if checkpoint_every and checkpoint_path and (epoch + 1) % checkpoint_every == 0:
                from gru4rec_tpu.io.checkpoint import save_train_checkpoint

                if mesh is not None:
                    # checkpoints always store the canonical single-device
                    # layout (per-shard kernel scratch rows stripped); resume
                    # re-shards and re-appends them via shard_train_state
                    from gru4rec_tpu.parallel.dist_step import unshard_train_state

                    ckpt_state = unshard_train_state(state, cfg, mesh)
                else:
                    ckpt_state = state
                self._train_state = ckpt_state
                self.params = ckpt_state.params
                save_train_checkpoint(self, ckpt_state, epoch + 1, checkpoint_path)
                from gru4rec_tpu.io.checkpoint import _is_primary_process

                if _is_primary_process():
                    # non-primary hosts did NOT write a local file — logging
                    # one would point a resume at a path that doesn't exist
                    print(f"Checkpoint saved to {checkpoint_path} "
                          f"(epoch {epoch + 1})")
        if mesh is not None:
            # gather sharded params back to host-local arrays in the canonical
            # layout so the single-device eval/serving paths work unchanged
            from gru4rec_tpu.parallel.dist_step import unshard_train_state

            state = unshard_train_state(state, cfg, mesh)
        if best_params is not None:
            # keep_best: serve/save the best-validation parameters (the
            # optimizer state stays at the last epoch for resumability).
            # Under a mesh the snapshot stays host numpy — the canonical
            # full-size tables must never be gathered onto one device
            # (same contract as unshard_train_state above)
            if mesh is None:
                best_params = jax.tree_util.tree_map(jnp.asarray, best_params)
            state = state._replace(params=best_params)
        self._train_state = state
        self.params = state.params
        self.H = state.H
        return self

    # ------------------------------------------------------------------ #
    def _dump_nan_state(self, state, epoch, mesh, checkpoint_path) -> None:
        """Best-effort diagnostic dump on NaN abort (SURVEY.md §5 "NaN abort
        with state dump"; the reference only sets a flag, gru4rec.py:626-629).

        Writes a full training checkpoint of the live state so divergence is
        debuggable offline. The chunk pipeline keeps two dispatches in
        flight and DONATES state buffers, so by detection time the dumped
        state is up to two chunks past the first NaN — diverged, but it
        carries the exact params/optimizer accumulators/RNG to replay from.
        Never masks the abort: any failure here is caught and reported.

        Path: ``<checkpoint_path>.nan.npz`` when checkpointing is
        configured, else ``$GRU4REC_TPU_NAN_DUMP`` (set to empty to
        disable), else ``gru4rec_nan_dump.npz`` in the working directory
        (``.npz`` suffix required — np.savez appends it otherwise)."""
        path = (f"{checkpoint_path}.nan.npz" if checkpoint_path
                else os.environ.get("GRU4REC_TPU_NAN_DUMP",
                                    "gru4rec_nan_dump.npz"))
        if not path:
            return
        try:
            if mesh is not None:
                from gru4rec_tpu.parallel.dist_step import unshard_train_state

                state = unshard_train_state(state, cfg=self.config, mesh=mesh)
            from gru4rec_tpu.io.checkpoint import (_is_primary_process,
                                                   save_train_checkpoint)

            save_train_checkpoint(self, state, epoch, path)
            if _is_primary_process():
                print(f"NaN abort: diverged training state dumped to {path}")
        except Exception as e:  # noqa: BLE001 — diagnostic only
            print(f"NaN abort: state dump failed ({e!r})")

    # ------------------------------------------------------------------ #
    def _extend_items(self, unseen_ids) -> None:
        """Grow all item-dimensioned tables (and their optimizer state) for
        new items seen at retrain time (reference extend_weights,
        gru4rec.py:261-266: new rows drawn with Glorot width computed over
        rows + cols + n_new)."""
        cfg = self.config
        n_old = self.n_items
        n_new = len(unseen_ids)
        n_total = n_old + n_new
        rng = np.random.RandomState(cfg.seed + 7)
        old_pad = gru.pad_items(n_old, cfg.item_pad_multiple)
        new_pad = gru.pad_items(n_total, cfg.item_pad_multiple)

        def new_rows(n_cols, old_rows):
            sigma = cfg.sigma if cfg.sigma != 0 else np.sqrt(6.0 / (old_rows + n_cols + n_new))
            if cfg.init_as_normal:
                m = rng.randn(n_new, n_cols) * sigma
            else:
                m = rng.rand(n_new, n_cols) * sigma * 2 - sigma
            return m.astype(cfg.param_dtype)

        def extend(table, init_fn):
            arr = np.asarray(table)
            body = arr[:n_old]
            grown = np.concatenate(
                [body, init_fn(arr.shape[1] if arr.ndim > 1 else None)], axis=0
            )
            pad = new_pad - n_total
            if pad:
                pad_block = np.zeros((pad,) + grown.shape[1:], dtype=grown.dtype)
                grown = np.concatenate([grown, pad_block], axis=0)
            return jnp.asarray(grown)

        params = dict(self.params)
        mode = gru.input_mode(cfg)

        def zeros_rows_like(dtype):
            # zero rows in the TARGET array's own dtype: np.concatenate
            # would otherwise promote a bf16 optimizer-state slot to f32
            # (silently turning narrow state storage off after a retrain)
            def f(c):
                shape = (n_new, c) if c is not None else (n_new,)
                return np.zeros(shape, dtype=dtype)

            return f
        # Wy carries the folded bias at column h + tile padding:
        # new rows = [glorot(h) | zeros]
        h_last = cfg.layers[-1]
        params["Wy"] = extend(
            params["Wy"],
            lambda c: np.concatenate(
                [new_rows(h_last, n_old),
                 np.zeros((n_new, c - h_last), dtype=cfg.param_dtype)],
                axis=1,
            ),
        )
        if mode == "embedding":
            params["E"] = extend(params["E"], lambda c: new_rows(c, n_old))
        if mode == "onehot":
            params["Wx"] = [extend(params["Wx"][0], lambda c: new_rows(c, n_old))] + list(
                params["Wx"][1:]
            )
        self.params = params

        if self._train_state is not None:
            opt_state = dict(self._train_state.opt_state)
            opt_state["sparse"] = {
                name: jax.tree_util.tree_map(
                    lambda a: extend(a, zeros_rows_like(np.asarray(a).dtype)),
                    st)
                for name, st in opt_state["sparse"].items()
            }
            self._train_state = self._train_state._replace(
                params=params, opt_state=opt_state
            )
        new_map = pd.Series(
            data=np.arange(n_old, n_total, dtype=np.int64), index=unseen_ids
        )
        self.itemidmap = pd.concat([self.itemidmap, new_map])
        self.n_items = n_total

    # ------------------------------------------------------------------ #
    def save_checkpoint(self, fname: str) -> None:
        """Save a full training checkpoint (params + optimizer state + RNG +
        step) for exact mid-training resume — capability the reference lacks
        entirely (its pickle stores weights only, gru4rec.py:742-767)."""
        from gru4rec_tpu.io.checkpoint import save_train_checkpoint

        if self._train_state is None:
            raise ValueError("no training state to checkpoint")
        save_train_checkpoint(self, self._train_state, self._completed_epochs,
                              fname)

    # ------------------------------------------------------------------ #
    def _build_predict_fn(self, subset: bool):
        cfg = self.config
        mode = gru.input_mode(cfg)
        n_items = self.n_items

        @jax.jit
        def predict_step(params, H, in_idx, item_idx=None):
            n_pad = params["Wy"].shape[0]
            if mode == "constrained":
                srows = {"WyS": jnp.take(params["Wy"], in_idx, axis=0)}
            elif mode == "embedding":
                srows = {"E": jnp.take(params["E"], in_idx, axis=0)}
            else:
                srows = {"Wx0": jnp.take(params["Wx"][0], in_idx, axis=0)}
            if subset:
                srows["Wy"] = jnp.take(params["Wy"], item_idx, axis=0)
                H_new, yhat = gru.forward(
                    params, srows, list(H), cfg, M=in_idx.shape[0], training=False,
                    full_catalog=False,
                )
            else:
                item_valid = jnp.arange(n_pad) < n_items
                H_new, yhat = gru.forward(
                    params, srows, list(H), cfg, M=in_idx.shape[0], training=False,
                    full_catalog=True, item_valid=item_valid,
                )
                yhat = yhat[:, :n_items]
            return tuple(H_new), yhat

        return predict_step

    def _reset_changed_lanes(self, session_ids):
        """Zero the hidden lanes whose session changed since the last predict
        call and record the new session map (reference: gru4rec.py:712-716).
        One definition serves all three serving paths."""
        session_ids = np.asarray(session_ids)
        changed = session_ids != self._current_session
        if changed.any():
            mask = jnp.asarray(~changed)[:, None]
            self.H = tuple(h * mask for h in self.H)
            self._current_session = session_ids.copy()

    def predict_next_batch(self, session_ids, input_item_ids,
                           predict_for_item_ids=None, batch: int = 100):
        """Stateful batch prediction (reference: gru4rec.py:665-728): hidden
        state persists across calls per lane; lanes whose session ID changed
        are reset. Returns a DataFrame of scores, items x events.

        Single-chip by design: materializing the full items x events frame
        is inherently catalog-sized. For catalogs that do not fit one chip,
        serve through :meth:`predict_topk` with ``mesh=`` (per-shard top-k,
        only k ids + scores per lane cross between chips or to the host)."""
        if self.error_during_train:
            raise Exception("Training ended with an error; model is unusable.")
        subset = predict_for_item_ids is not None
        n_sub = len(predict_for_item_ids) if subset else None
        if (
            self._predict_fn is None
            or (self._predict_n_items is None) != (n_sub is None)
        ):
            # full<->subset flips change the call arity; a DIFFERENT subset
            # length merely retraces the jitted fn (shape-polymorphic)
            self._predict_fn = self._build_predict_fn(subset)
        if self._predict_batch != batch or self._current_session is None:
            # ONLY a lane-width change resets the persistent lane state
            # (reference: recompile+reset on batch change, gru4rec.py:691-711
            # — NOT on a changed predict_for_item_ids, which
            # evaluate_sessions_batch varies every step mid-session)
            self.H = tuple(gru.init_hidden(self.config, batch))
            self._current_session = np.ones(batch) * -1
        self._predict_batch = batch
        self._predict_n_items = n_sub

        self._reset_changed_lanes(session_ids)

        in_idx = jnp.asarray(self.itemidmap[input_item_ids].values.astype(np.int32))
        if subset:
            item_idx = jnp.asarray(
                self.itemidmap[predict_for_item_ids].values.astype(np.int32)
            )
            self.H, preds = self._predict_fn(self.params, self.H, in_idx, item_idx)
            return pd.DataFrame(data=np.asarray(preds).T, index=predict_for_item_ids)
        self.H, preds = self._predict_fn(self.params, self.H, in_idx)
        return pd.DataFrame(data=np.asarray(preds).T, index=self.itemidmap.index)

    def predict_topk(self, session_ids, input_item_ids, k: int = 20,
                     batch: int = 100, mesh=None):
        """Serving-oriented top-k recommendation (beyond the reference, whose
        only serving API materializes the full items x events score frame):
        the top-k selection runs on device (``lax.top_k`` over the catalog
        scores), so only k ids + scores per lane cross back to the host.

        Same stateful semantics as :meth:`predict_next_batch` (persistent
        hidden state per lane, reset on session change — the two methods
        share the lane state). Returns ``(items, scores)``: an object array
        (batch, k) of raw item IDs, best first, and a float array (batch, k).

        ``mesh`` (a ``jax.sharding.Mesh`` with ``data``/``model`` axes)
        serves multi-chip: lanes shard over ``data``, catalog rows over
        ``model``, per-shard top-k candidates merged with one tiny
        ``all_gather`` — the item table never needs to fit one chip (see
        eval/evaluation.py::make_dist_topk_fn). Accepts both the canonical
        layout and a live sharded training-layout state.
        """
        if self.error_during_train:
            raise Exception("Training ended with an error; model is unusable.")
        k = min(int(k), self.n_items)
        if mesh is not None:
            return self._predict_topk_dist(session_ids, input_item_ids, k,
                                           batch, mesh)
        if self._topk_fn is None or self._topk_k != k or self._predict_batch != batch:
            base = self._build_predict_fn(subset=False)

            @jax.jit
            def topk_step(params, H, in_idx):
                H_new, yhat = base(params, H, in_idx)
                scores, idx = jax.lax.top_k(yhat, k)
                return H_new, idx, scores

            # share lane state with predict_next_batch: (re)initialize it the
            # same way its compile path does
            if self._predict_fn is None or self._predict_batch != batch:
                self._predict_fn = self._build_predict_fn(subset=False)
                self._predict_batch = batch
                self._predict_n_items = None
                self.H = tuple(gru.init_hidden(self.config, batch))
                self._current_session = np.ones(batch) * -1
            self._topk_fn = topk_step
            self._topk_k = k

        self._reset_changed_lanes(session_ids)

        in_idx = jnp.asarray(self.itemidmap[input_item_ids].values.astype(np.int32))
        self.H, idx, scores = self._topk_fn(self.params, self.H, in_idx)
        # Arrow-backed string indexes (pandas>=3) reject 2-D fancy indexing
        vocab = np.asarray(self.itemidmap.index.values, dtype=object)
        item_ids = vocab[np.asarray(idx)]
        return item_ids, np.asarray(scores)

    def _predict_topk_dist(self, session_ids, input_item_ids, k, batch, mesh):
        """Mesh-sharded :meth:`predict_topk` (k already clamped by the
        caller). Shares the host-side lane state (``self.H``,
        ``self._current_session``) with the single-chip predict paths."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gru4rec_tpu.eval.evaluation import make_dist_topk_fn
        from gru4rec_tpu.parallel.dist_step import detect_scratch_layout
        from gru4rec_tpu.parallel.mesh import param_pspecs, put_global

        cfg = self.config
        nd = mesh.shape["data"]
        if batch % nd:
            raise ValueError(
                f"batch {batch} must divide over data axis {nd}")
        scratch = detect_scratch_layout(self.params, self.n_items, cfg, mesh)
        # keyed on the mesh's device ids, not id(mesh): a dead mesh's id can
        # be reused by a new Mesh over different devices (same keying as
        # _cached_dist_eval_chunk_fn)
        key = (tuple(mesh.shape.items()),
               tuple(d.id for d in mesh.devices.flat),
               int(k), int(batch), scratch)
        put = lambda x, s: put_global(x, NamedSharding(mesh, s))
        cache = self._dist_topk
        if cache is None or cache["key"] != key:
            cache = {
                "key": key,
                "fn": make_dist_topk_fn(cfg, self.n_items, k, mesh,
                                        scratch_rows=scratch),
                "params_src": None, "params": None,
            }
            self._dist_topk = cache
        if cache["params_src"] is not self.params:
            # place (or re-place after a params swap) once, reuse per call;
            # a no-op when the params are already sharded this way (the live
            # train state)
            pspec = param_pspecs(dict(self.params), gru.input_mode(cfg))
            cache["params"] = jax.tree_util.tree_map(
                put, dict(self.params), pspec)
            cache["params_src"] = self.params
        if self.H is None or self._predict_batch != batch:
            self.H = tuple(gru.init_hidden(cfg, batch))
            self._current_session = np.ones(batch) * -1
            self._predict_batch = batch
            self._predict_fn = None  # single-chip fns are per-batch anyway
            self._topk_fn = None

        self._reset_changed_lanes(session_ids)

        in_idx = self.itemidmap[input_item_ids].values.astype(np.int32)
        H = tuple(put(h, P("data", None)) for h in self.H)
        self.H, ids, scores = cache["fn"](
            cache["params"], H, put(in_idx, P("data")))
        vocab = np.asarray(self.itemidmap.index.values, dtype=object)
        # fetch_to_host: the (batch, k) outputs are data-sharded, which in a
        # multi-host serve spans other processes' devices
        from gru4rec_tpu.parallel.mesh import fetch_to_host

        return vocab[fetch_to_host(ids)], fetch_to_host(scores)

    # ------------------------------------------------------------------ #
    def cast_for_serving(self, dtype="bfloat16") -> "GRU4Rec":
        """Cast the parameters to a narrower serving dtype in place and
        return self (the cast promised at config.py's param_dtype note).

        Halves the item tables' HBM footprint — the usual reason a serving
        replica needs a bigger chip than inference math requires. Scoring
        matmuls already run in ``compute_dtype`` with f32 accumulation, so
        the additional error is one storage rounding of the weights
        (~0.4% relative for bfloat16); top-k order can differ for
        near-tied candidates. Compiled predict/eval functions re-trace
        automatically (params are traced arguments) and the sharded top-k
        cache re-places on the params-identity change.

        Serving-only: a later ``fit()`` re-initializes fresh float32
        master weights (narrow masters would freeze under round-to-nearest
        updates — the param_dtype guard); keep the f32 checkpoint if you
        need to train again. ``savemodel`` round-trips the cast model
        (checkpoints tag per-array dtypes)."""
        dt = jnp.dtype(dtype)
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dt), self.params)
        if self._train_state is not None:
            # the live train state still holds the f32 tables; drop it so
            # serving paths that prefer it cannot resurrect stale weights
            self._train_state = None
        return self

    # ------------------------------------------------------------------ #
    def savemodel(self, fname: str, include_optimizer: bool = False):
        from gru4rec_tpu.io.checkpoint import save_model

        save_model(self, fname, include_optimizer=include_optimizer)

    @classmethod
    def loadmodel(cls, fname: str) -> "GRU4Rec":
        from gru4rec_tpu.io.checkpoint import load_model

        return load_model(fname, lambda cfg: cls(config=cfg))
