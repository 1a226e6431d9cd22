"""FULL-PIPELINE differential oracle: fit() + evaluate() end-to-end.

The composed oracle (test_composed_oracle.py) proves the *step*; this module
proves the *pipeline*: it drives the public ``GRU4Rec.fit`` (NOT
make_chunk_fn) on a real DataFrame and replays, on the host, everything the
production path does around the step — the same itemidmap / sort / offsets /
popularity prep, the same schedule builder and session orders (incl.
train_random_order's (seed, epoch) permutations), the same chunking with
zero-padded ragged tails, the same per-chunk negative-draw keys
(fold_in(fold_in(key, 1), chunk_start_step) with the step counter advancing
over padded steps too), per-epoch hidden re-init, and the in-fit validation
parameter swap — feeding each real step to tests/oracle_reference.py's
torch-float64 reference-step transcription.

Asserted per cell: per-epoch loss trajectories, final parameters, and
evaluate()'s Recall/MRR against a host reimplementation of the evaluation
protocol (reference: gru4rec.py:515-664 composed with evaluation.py:15-147).
This is the test that catches chunk-boundary / donation / caching bugs the
per-step oracle cannot see (e.g. the round-2 dangling-donated-buffer bug in
the in-fit eval path, commit 5045736).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import torch

from gru4rec_tpu import GRU4Rec
from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.data.loader import build_itemidmap
from gru4rec_tpu.data.scheduler import build_schedule, session_order
from gru4rec_tpu.data.tools import compute_offset, sort_if_needed
from gru4rec_tpu.eval import evaluate
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.sampling import (AliasTable, build_alias_table,
                                       popularity_cdf, sample_negatives,
                                       sample_negatives_alias)
from gru4rec_tpu.train.step import init_train_state

from oracle_reference import ReferenceStepOracle, gru_layer


def markov_frame(n_sessions=90, n_items=40, seed=0, mult=7, add=3):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 8)):
            rows.append((s, f"it{i}", t))
            t += 1
            i = (mult * i + add) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


# --------------------------------------------------------------------------- #
# host pipeline replay
class PipelineOracle:
    """Replays fit()'s epoch/chunk driving around ReferenceStepOracle."""

    def __init__(self, data: pd.DataFrame, cfg: GRU4RecConfig):
        self.cfg = cfg
        self.itemidmap = build_itemidmap(data, cfg.item_key)
        self.n_items = len(self.itemidmap)
        data = data.copy()
        data["ItemIdx"] = self.itemidmap[data[cfg.item_key].values].values
        sort_if_needed(data, [cfg.session_key, cfg.time_key])
        self.offsets = compute_offset(data, cfg.session_key)
        self.data_items = data["ItemIdx"].values.astype(np.int32)
        self.base_order = session_order(
            data, cfg.session_key, cfg.time_key, cfg.time_sort,
            len(self.offsets) - 1,
        )

        pop = (
            data.groupby(cfg.item_key).size()
            .reindex(self.itemidmap.index.values, fill_value=0)
            .values
        )
        n_pad = gru.pad_items(self.n_items, cfg.item_pad_multiple)
        logp0 = np.zeros((n_pad,), dtype=np.float32)
        logp0[: self.n_items] = np.log(np.maximum(pop, 1).astype(np.float64))
        self.logp0 = logp0
        if cfg.n_sample and cfg.sample_alpha != 0 and cfg.sampler == "alias":
            self.samp1 = build_alias_table(pop, cfg.sample_alpha).packed
        elif cfg.n_sample and cfg.sample_alpha != 0:
            self.samp1 = jnp.asarray(popularity_cdf(pop, cfg.sample_alpha))
        else:
            self.samp1 = jnp.zeros((1,), jnp.float32)

        state0 = init_train_state(cfg, self.n_items, jax.random.PRNGKey(cfg.seed))
        params0 = jax.tree_util.tree_map(np.asarray, state0.params)
        self.orc = ReferenceStepOracle(params0, cfg, self.n_items,
                                       logp0=self.logp0)
        self.key = jax.random.PRNGKey(cfg.seed)  # constant through training
        self.step_counter = 0                    # advances over padded steps too
        self.epoch_losses = []

    def _draw_chunk_negatives(self, chunk_len):
        cfg = self.cfg
        if cfg.n_sample == 0:
            return np.zeros((chunk_len, 0), np.int64)
        neg_key = jax.random.fold_in(
            jax.random.fold_in(self.key, 1), self.step_counter)
        if cfg.sample_alpha == 0.0:
            neg = jax.random.randint(neg_key, (chunk_len, cfg.n_sample), 0,
                                     self.n_items, dtype=jnp.int32)
        elif cfg.sampler == "alias":
            neg = sample_negatives_alias(neg_key, AliasTable(self.samp1),
                                         chunk_len, cfg.n_sample)
        else:
            neg = sample_negatives(neg_key, self.samp1, chunk_len,
                                   cfg.n_sample, self.n_items, cfg.sample_alpha)
        return np.asarray(neg).astype(np.int64)

    def run_epoch(self, epoch: int):
        cfg = self.cfg
        # per-epoch hidden re-init (gru4rec.py:591; models/gru4rec.py fit loop)
        self.orc.H = [np.zeros((cfg.batch_size, h)) for h in cfg.layers]
        if cfg.train_random_order:
            order = np.random.default_rng(
                (cfg.seed, epoch)).permutation(len(self.offsets) - 1)
        else:
            order = self.base_order
        sched = build_schedule(
            self.data_items, self.offsets, order, cfg.batch_size,
            require_two_lanes=(cfg.n_sample == 0),
        )
        C = cfg.chunk_size
        T = sched.n_steps
        loss_sum, events = 0.0, 0.0
        for t0 in range(0, T, C):
            t1 = min(t0 + C, T)
            pad = C - (t1 - t0)
            neg = self._draw_chunk_negatives(C)
            for k, t in enumerate(range(t0, t1)):
                valid = sched.valid[t]
                M = int(valid.sum())
                if M:
                    cost = self.orc.step(sched.in_idx[t], sched.out_idx[t],
                                         valid, sched.reset[t], neg[k])
                    loss_sum += cost * M
                    events += M
            # padded tail steps are complete no-ops but advance the global
            # step counter (they run through the device scan)
            self.step_counter += C
        self.epoch_losses.append(loss_sum / max(events, 1.0))
        return self.epoch_losses[-1]

    # ------------------------------------------------------------------ #
    def predict_scores(self, X_lanes, H_lanes):
        """Full-catalog scores for the given lanes (torch, no grad);
        returns (H_new per layer, scores (L, n_items))."""
        orc = self.orc
        h_dim = orc.layers[-1]
        with torch.no_grad():
            t = lambda a: torch.tensor(np.asarray(a, dtype=np.float64))
            H_in = [t(h) for h in H_lanes]
            H_new = []
            if orc.mode == "constrained":
                y = t(orc.Wy[X_lanes, :h_dim])
                start = 0
            elif orc.mode == "embedding":
                y = t(orc.E[X_lanes])
                start = 0
            else:
                vec = t(orc.Wx[0][X_lanes]) + t(orc.Bh[0])
                y = gru_layer(vec, H_in[0], t(orc.Wrz[0]), t(orc.Wh[0]),
                              orc.hidden_act, orc.layers[0])
                H_new.append(y)
                start = 1
            for i in range(start, len(orc.layers)):
                vec = y @ t(orc.Wx[i]) + t(orc.Bh[i])
                y = gru_layer(vec, H_in[i], t(orc.Wrz[i]), t(orc.Wh[i]),
                              orc.hidden_act, orc.layers[i])
                H_new.append(y)
            scores = y @ t(orc.Wy[:, :h_dim]).T + t(orc.Wy[:, h_dim])
            return ([h.numpy() for h in H_new], scores.numpy())

    def evaluate(self, test_data, cutoffs, batch_size):
        """Host replay of eval/evaluation.py::evaluate, standard tie mode:
        inner-join to vocab, (session,time,item) sort, the same schedule
        builder, pre-step H reset, per-event rank accumulation. Ranks on
        pre-activation scores (every final act is monotone per row)."""
        cfg = self.cfg
        test = pd.merge(
            test_data,
            pd.DataFrame({"ItemIdx": self.itemidmap.values,
                          cfg.item_key: self.itemidmap.index}),
            on=cfg.item_key, how="inner",
        )
        test.sort_values([cfg.session_key, cfg.time_key, cfg.item_key],
                         inplace=True)
        offsets = compute_offset(test, cfg.session_key)
        order = np.arange(len(offsets) - 1, dtype=np.int64)
        sched = build_schedule(test["ItemIdx"].values.astype(np.int32),
                               offsets, order, batch_size)
        H = [np.zeros((batch_size, h)) for h in cfg.layers]
        rec = np.zeros(len(cutoffs))
        mrr = np.zeros(len(cutoffs))
        n = 0
        for tstep in range(sched.n_steps):
            valid = sched.valid[tstep]
            reset = sched.reset[tstep]
            for i in range(len(H)):
                H[i][reset] = 0.0
            lanes = np.nonzero(valid)[0]
            if len(lanes) == 0:
                continue
            H_new, scores = self.predict_scores(
                sched.in_idx[tstep][lanes], [h[lanes] for h in H])
            targets = sched.out_idx[tstep][lanes]
            tsc = scores[np.arange(len(lanes)), targets]
            ranks = (scores > tsc[:, None]).sum(axis=1) + 1
            for k, c in enumerate(cutoffs):
                hit = ranks <= c
                rec[k] += hit.sum()
                mrr[k] += (1.0 / ranks[hit]).sum()
            n += len(lanes)
            for i in range(len(H)):
                H[i][lanes] = H_new[i]
        return list(rec / n), list(mrr / n)


# --------------------------------------------------------------------------- #
def run_pipeline_cell(cfg_kwargs, n_epochs=3, data_kwargs=None, fit_kwargs=None,
                      eval_seed=17, epoch_hook=None):
    cfg_kwargs = dict(
        batch_size=6, compute_dtype="float32", opt_state_dtype="float32",
        item_pad_multiple=16, seed=11, dropout_p_hidden=0.0,
        dropout_p_embed=0.0, n_epochs=n_epochs, **cfg_kwargs,
    )
    data = markov_frame(**(data_kwargs or {}))
    test = markov_frame(n_sessions=25, seed=eval_seed)

    m = GRU4Rec(GRU4RecConfig(**cfg_kwargs))
    m.fit(data, **(fit_kwargs or {}))

    po = PipelineOracle(data, GRU4RecConfig(**cfg_kwargs))
    for e in range(n_epochs):
        po.run_epoch(e)
        if epoch_hook is not None:
            # e.g. per-epoch validation snapshots (the in-fit eval replay)
            epoch_hook(po, e)
    return m, po, test


def assert_pipeline_matches(m, po, test, rtol=5e-4, atol=2e-5,
                            metric_atol=5e-3, cutoffs=(1, 5), batch_size=7):
    if jax.default_backend() == "tpu":
        atol = max(atol, 1e-3)
        # param drift up to atol can flip a rank where two scores are
        # closer than that; one flipped event moves Recall by one event
        # quantum (~1/n_events of the 25-session frame), so the metric
        # tolerance must cover at least a couple of flips
        metric_atol = max(metric_atol, 0.03)
    # 1) per-epoch loss trajectory through the REAL fit loop
    fw_losses = [e["loss"] for e in m.epoch_stats]
    np.testing.assert_allclose(fw_losses, po.epoch_losses, rtol=rtol, atol=atol,
                               err_msg="per-epoch loss trajectory")
    # 2) final parameters
    p = m.params
    orc = po.orc
    n_items = po.n_items
    np.testing.assert_allclose(np.asarray(p["Wy"])[:n_items], orc.Wy,
                               rtol=rtol, atol=atol, err_msg="Wy")
    if orc.mode == "embedding":
        np.testing.assert_allclose(np.asarray(p["E"])[:n_items], orc.E,
                                   rtol=rtol, atol=atol, err_msg="E")
    if orc.mode == "onehot":
        np.testing.assert_allclose(np.asarray(p["Wx"][0])[:n_items],
                                   orc.Wx[0], rtol=rtol, atol=atol,
                                   err_msg="Wx0")
    start_wx = 1 if orc.mode == "onehot" else 0  # Wx0 asserted above there
    for i in range(len(po.cfg.layers)):
        if i >= start_wx:
            np.testing.assert_allclose(np.asarray(p["Wx"][i]), orc.Wx[i],
                                       rtol=rtol, atol=atol, err_msg=f"Wx{i}")
        np.testing.assert_allclose(np.asarray(p["Wh"][i]), orc.Wh[i],
                                   rtol=rtol, atol=atol, err_msg=f"Wh{i}")
        np.testing.assert_allclose(np.asarray(p["Wrz"][i]), orc.Wrz[i],
                                   rtol=rtol, atol=atol, err_msg=f"Wrz{i}")
        np.testing.assert_allclose(np.asarray(p["Bh"][i]), orc.Bh[i],
                                   rtol=rtol, atol=atol, err_msg=f"Bh{i}")
    # 3) evaluate() against the protocol replay
    rec_fw, mrr_fw = evaluate(m, test, cut_off=list(cutoffs),
                              batch_size=batch_size)
    rec_or, mrr_or = po.evaluate(test, cutoffs, batch_size)
    np.testing.assert_allclose(rec_fw, rec_or, atol=metric_atol,
                               err_msg="Recall")
    np.testing.assert_allclose(mrr_fw, mrr_or, atol=metric_atol,
                               err_msg="MRR")


# --------------------------------------------------------------------------- #
def test_pipeline_default_constrained_ragged_tail():
    """Flagship-style cell: constrained embedding, bpr-max, adagrad, sampled
    negatives, chunk_size chosen so every epoch ends in a zero-padded ragged
    tail chunk (chunk-boundary + padded-step no-op semantics)."""
    m, po, test = run_pipeline_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[12], n_sample=6,
        sample_alpha=0.75, sampler="searchsorted", learning_rate=0.08,
        adapt="adagrad", constrained_embedding=True, chunk_size=16,
    ))
    assert_pipeline_matches(m, po, test)


def test_pipeline_random_order_with_logq_momentum():
    """train_random_order: per-epoch (seed, epoch) permutations must be the
    ones fit() uses; plus logq correction and rmsprop+momentum state carried
    across chunk boundaries."""
    m, po, test = run_pipeline_cell(dict(
        loss="cross-entropy", final_act="softmax", layers=[12], n_sample=6,
        sample_alpha=0.5, sampler="searchsorted", logq=1.0,
        learning_rate=0.05, adapt="rmsprop", momentum=0.3, embedding=9,
        train_random_order=True, chunk_size=16,
    ))
    # ~900 steps of f32-vs-f64 drift under rmsprop's 1/sqrt amplification:
    # a handful of elements accumulate to ~4e-5 abs (loss trajectory itself
    # holds the strict tolerance)
    assert_pipeline_matches(m, po, test, rtol=2e-3, atol=1e-4)


def test_pipeline_n_sample_zero_onehot():
    """n_sample=0: within-batch negatives only, require_two_lanes schedule
    termination, one-hot input mode."""
    m, po, test = run_pipeline_cell(dict(
        loss="cross-entropy", final_act="softmax", layers=[10], n_sample=0,
        learning_rate=0.1, adapt="adagrad", chunk_size=16,
    ))
    assert_pipeline_matches(m, po, test)


def test_pipeline_alias_sampler_adam():
    """Alias-table negative sampling (the production sampler) + textbook adam
    state threading through the pipeline."""
    m, po, test = run_pipeline_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[12], n_sample=8,
        sample_alpha=0.75, sampler="alias", learning_rate=0.05,
        adapt="adam", embedding=9, chunk_size=16,
    ), n_epochs=2)
    assert_pipeline_matches(m, po, test, rtol=1e-3, atol=5e-5)


def test_pipeline_uniform_negatives():
    """sample_alpha=0: the uniform fast path of the negative draw — its own
    dispatch branch in both the production step (ops/sampling.py
    draw_negatives) and the host replica; no other cell exercises it."""
    m, po, test = run_pipeline_cell(dict(
        loss="cross-entropy", final_act="softmax", layers=[10], n_sample=8,
        sample_alpha=0.0, learning_rate=0.1, adapt="adagrad", chunk_size=16,
    ), n_epochs=2)
    assert_pipeline_matches(m, po, test)


def test_pipeline_infit_validation_swap():
    """The in-fit validation path (params swap around evaluate(), donation
    two-chunks-in-flight) must not perturb training: epochs AFTER a
    validation pass still match the oracle, and each epoch's reported
    validation metrics equal the oracle protocol replay of that epoch's
    parameter snapshot. Would have caught the round-2 dangling-donated-buffer
    bug (commit 5045736)."""
    cfg_kwargs = dict(
        loss="bpr-max", final_act="elu-1", layers=[12], n_sample=6,
        sample_alpha=0.75, sampler="searchsorted", learning_rate=0.08,
        adapt="adagrad", constrained_embedding=True, chunk_size=16,
    )
    valid_df = markov_frame(n_sessions=20, seed=23)
    # oracle-side: the SAME epoch replay also snapshots each epoch's
    # validation metrics (one oracle run, not a duplicate)
    oracle_valid = []

    def snapshot(po, _e):
        rec, mrr = po.evaluate(valid_df, (5,), 7)
        oracle_valid.append((rec[0], mrr[0]))

    m, po, test = run_pipeline_cell(
        cfg_kwargs,
        fit_kwargs=dict(eval_data=valid_df, eval_every=1, eval_cutoff=5,
                        eval_batch_size=7, keep_best=False),
        epoch_hook=snapshot,
    )
    assert_pipeline_matches(m, po, test)
    assert len(m.valid_stats) == 3
    for vs, (orec, omrr) in zip(m.valid_stats, oracle_valid):
        np.testing.assert_allclose(vs["recall"], orec, atol=5e-3)
        np.testing.assert_allclose(vs["mrr"], omrr, atol=5e-3)


def test_pipeline_two_layer_adadelta():
    """Two stacked GRU layers through the WHOLE pipeline (scheduler, sampled
    scoring off the last layer, per-layer hidden resets) with adadelta —
    the one (depth, optimizer) region the e2e oracle did not yet pin; the
    composed oracle covers it only at single-chunk scope."""
    m, po, test = run_pipeline_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[10, 8], n_sample=6,
        sample_alpha=0.5, sampler="searchsorted", learning_rate=1.0,
        adapt="adadelta", embedding=7, chunk_size=16,
    ))
    assert_pipeline_matches(m, po, test)
