"""Mid-training checkpoint/resume exactness, vocab extension on retrain, the
legacy batch evaluator, and JSONL logging."""

import json
import os

import jax
import numpy as np
import pandas as pd
import pytest

from gru4rec_tpu import GRU4Rec, GRU4RecConfig
from gru4rec_tpu.eval import evaluate, evaluate_sessions_batch


def markov_data(n_sessions=200, n_items=25, seed=0, prefix="it"):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"{prefix}{i}", t))
            t += 1
            i = (7 * i + 3) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


def small_cfg(**kw):
    base = dict(loss="cross-entropy", final_act="softmax", layers=[16],
                batch_size=8, n_sample=8, n_epochs=4, chunk_size=32,
                item_pad_multiple=32, learning_rate=0.1)
    base.update(kw)
    return GRU4RecConfig(**base)


@pytest.mark.parametrize("random_order", [False, True])
def test_resume_is_exact(tmp_path, random_order):
    # random_order=True checks that each epoch's shuffle is a pure function
    # of (seed, epoch): the resumed epochs must see the SAME session orders
    # as the uninterrupted run
    data = markov_data()
    ckpt = str(tmp_path / "ck.npz")

    # straight 4-epoch run
    m1 = GRU4Rec(small_cfg(train_random_order=random_order))
    m1.fit(data)

    # 2 epochs + checkpoint, then resume for the remaining 2
    m2 = GRU4Rec(small_cfg(train_random_order=random_order))
    m2.fit(data, n_epochs=2, checkpoint_every=2, checkpoint_path=ckpt)
    m3 = GRU4Rec(small_cfg(train_random_order=random_order))
    m3.fit(data, resume=ckpt)

    for k in ("Wy",):
        np.testing.assert_allclose(
            np.asarray(m1.params[k]), np.asarray(m3.params[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(m1.params["Wh"][0]), np.asarray(m3.params["Wh"][0]),
        rtol=1e-5, atol=1e-7,
    )
    # epoch losses of the resumed epochs match the straight run
    l1 = [e["loss"] for e in m1.epoch_stats]
    l3 = [e["loss"] for e in m3.epoch_stats]
    np.testing.assert_allclose(l1[2:], l3, rtol=1e-4)


def test_checkpoint_opt_dtype_tagging(tmp_path):
    """Optimizer leaves are decoded from the dtype they were SAVED with, not
    from the rebuilt template: a layout change that moves a slot bf16->f32
    must cast the stored bf16 values, never reinterpret their raw uint16
    bits; an untagged (old) archive whose uint16 entry no longer matches a
    bf16 template slot must hard-error instead of corrupting the resume."""
    import ml_dtypes

    from gru4rec_tpu.io.checkpoint import _from_saved

    bf16 = np.dtype(ml_dtypes.bfloat16)
    vals = np.asarray([0.5, 1.25, -3.0], dtype=bf16)
    stored = vals.view(np.uint16)

    # tagged archive, same-dtype template: exact bit round-trip
    out = _from_saved(stored, bf16, saved_dtype="bfloat16")
    assert out.dtype == bf16 and np.array_equal(out.view(np.uint16), stored)
    # tagged archive, template slot widened to f32: values cast, not bits
    out = _from_saved(stored, np.float32, saved_dtype="bfloat16")
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, vals.astype(np.float32))
    # tagged f32 entry narrowing to a bf16 template slot: cast
    f32 = vals.astype(np.float32)
    out = _from_saved(f32, bf16, saved_dtype="float32")
    assert out.dtype == bf16
    # untagged uint16 entry with a non-bf16 template slot: refuse
    with pytest.raises(ValueError):
        _from_saved(stored, np.float32, saved_dtype=None)
    # untagged uint16 entry with a bf16 template slot: legacy decode
    out = _from_saved(stored, bf16, saved_dtype=None)
    assert out.dtype == bf16

    # and a real end-to-end round trip with bf16 EMA state (rmsprop) keeps
    # dtypes and values
    data = markov_data(n_sessions=80)
    ckpt = str(tmp_path / "ck.npz")
    m = GRU4Rec(small_cfg(adapt="rmsprop", n_epochs=2))
    m.fit(data, n_epochs=2, checkpoint_every=2, checkpoint_path=ckpt)
    import jax

    with np.load(ckpt, allow_pickle=False) as ar:
        assert any(k.startswith("opt_dtype/") for k in ar.files)
    m2 = GRU4Rec(small_cfg(adapt="rmsprop", n_epochs=2))
    from gru4rec_tpu.io.checkpoint import load_train_checkpoint

    state, epoch = load_train_checkpoint(ckpt, m2)
    for a, b in zip(jax.tree_util.tree_leaves(m._train_state.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(
            np.asarray(a).astype(np.float32), np.asarray(b).astype(np.float32))


def test_retrain_extends_vocab(tmp_path):
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(n_epochs=2))
    m.fit(data)
    n_before = m.n_items
    wy_before = np.asarray(m.params["Wy"])[:n_before].copy()

    data2 = markov_data(n_items=30, seed=5)  # items it20..it29 are new
    m.fit(data2, retrain=True, n_epochs=1)
    assert m.n_items == 30
    assert m.params["Wy"].shape[0] >= 30
    # old rows were continued from, not reinitialized (they keep training, so
    # not equal — but the itemidmap indices of old items are unchanged)
    assert list(m.itemidmap.index[:n_before]) == [f"it{i}" for i in
                                                  list(pd.unique(data.ItemId.map(lambda s: int(s[2:]))))]
    rec, _ = evaluate(m, markov_data(n_items=30, seed=9), cut_off=[5], batch_size=8)
    assert rec[0] > 0.3


def test_retrain_after_loadmodel(tmp_path):
    """fit(retrain=True) across a save/load boundary (review regression:
    _train_state is None after loadmodel, used to AttributeError). Without
    optimizer entries the accumulators warm-restart; with
    include_optimizer=True they continue EXACTLY."""
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(n_epochs=2, adapt="adagrad"))
    m.fit(data)
    p_bare = str(tmp_path / "bare.npz")
    p_opt = str(tmp_path / "opt.npz")
    m.savemodel(p_bare)
    m.savemodel(p_opt, include_optimizer=True)

    data2 = markov_data(n_items=30, seed=5)
    m2 = GRU4Rec.loadmodel(p_bare)
    assert m2._train_state is None
    m2.fit(data2, retrain=True, n_epochs=1)  # warm restart, must not crash
    assert m2.n_items == 30

    m3 = GRU4Rec.loadmodel(p_opt)
    # the archived accumulators came back exactly
    assert m3._train_state is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(m._train_state.opt_state),
        jax.tree_util.tree_leaves(m3._train_state.opt_state),
    ):
        np.testing.assert_array_equal(
            np.asarray(a).astype(np.float32), np.asarray(b).astype(np.float32))
    m3.fit(data2, retrain=True, n_epochs=1)
    assert m3.n_items == 30
    rec, _ = evaluate(m3, markov_data(n_items=30, seed=9), cut_off=[5],
                      batch_size=8)
    assert rec[0] > 0.3


def test_predict_state_survives_subset_length_changes():
    """predict_next_batch must keep the persistent hidden state when only
    predict_for_item_ids changes between calls (review regression: it used
    to re-zero H per call, which evaluate_sessions_batch's varying
    items+targets list triggers every step)."""
    data = markov_data(n_items=20)
    # elementwise final act: subset scores equal the full-catalog scores at
    # those items (softmax renormalizes over the subset, which would differ)
    m = GRU4Rec(small_cfg(n_epochs=2, loss="bpr-max", final_act="elu-1"))
    m.fit(data)
    vocab = list(m.itemidmap.index)
    sess = np.zeros(4)
    in1 = np.array([vocab[0]] * 4, object)
    in2 = np.array([vocab[1]] * 4, object)

    # reference run: full-catalog calls carry H across steps
    m.H = None; m._predict_fn = None; m._predict_batch = None
    m.predict_next_batch(sess, in1, None, batch=4)
    full2 = m.predict_next_batch(sess, in2, None, batch=4)

    # subset calls with DIFFERENT lengths must carry the same H
    m.H = None; m._predict_fn = None; m._predict_batch = None
    m.predict_next_batch(sess, in1, vocab[:7], batch=4)
    sub2 = m.predict_next_batch(sess, in2, vocab[:12], batch=4)
    np.testing.assert_allclose(
        sub2.values, full2.loc[sub2.index].values, rtol=1e-5, atol=1e-6)


def test_legacy_evaluator_subset_conservative_finite():
    """Legacy evaluator with an item subset in conservative/median modes:
    the self-comparison is counted exactly once like the compiled evaluator
    (review regression: a target outside the subset that outscored every
    subset item got rank 0 -> inf MRR)."""
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(n_epochs=3))
    m.fit(data)
    test = markov_data(n_sessions=40, n_items=20, seed=7)
    items = list(m.itemidmap.index[:6])  # strict subset: targets often outside
    for mode in ("conservative", "median"):
        r_leg, m_leg = evaluate_sessions_batch(
            m, test, items=items, cut_off=5, batch_size=8, mode=mode)
        assert np.isfinite(m_leg), mode
        r_cmp, m_cmp = evaluate(m, test, items=items, cut_off=[5],
                                batch_size=8, mode=mode)
        assert abs(r_leg - r_cmp[0]) < 1e-6, mode
        assert abs(m_leg - m_cmp[0]) < 1e-6, mode


def test_evaluators_agree_on_out_of_vocab_subset():
    """Both evaluators must REJECT an items subset containing IDs the model
    never saw (round-4 review: the legacy path's fillna(0) silently ranked
    unknown items at score 0 while the compiled path KeyErrors)."""
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(n_epochs=1))
    m.fit(data)
    test = markov_data(n_sessions=20, n_items=20, seed=7)
    items = list(m.itemidmap.index[:4]) + ["item_never_seen"]
    with pytest.raises(KeyError):
        evaluate(m, test, items=items, cut_off=[5], batch_size=8)
    with pytest.raises(KeyError):
        evaluate_sessions_batch(m, test, items=items, cut_off=5, batch_size=8)
    # in-vocab subsets still work on both paths
    ok_items = list(m.itemidmap.index[:5])
    r_leg, _ = evaluate_sessions_batch(m, test, items=ok_items, cut_off=5,
                                       batch_size=8)
    r_cmp, _ = evaluate(m, test, items=ok_items, cut_off=[5], batch_size=8)
    assert abs(r_leg - r_cmp[0]) < 1e-6


def test_paropt_metric_scrape_accepts_all_float_reprs():
    from gru4rec_tpu.cli.paropt import scrape_primary_metric

    assert scrape_primary_metric("PRIMARY METRIC: 0.753214") == 0.753214
    assert scrape_primary_metric("PRIMARY METRIC: 5e-05") == 5e-05
    assert scrape_primary_metric("PRIMARY METRIC: -1.2e-3") == -1.2e-3
    assert scrape_primary_metric("PRIMARY METRIC: 1.0") == 1.0
    assert scrape_primary_metric("Recall@5: 0.5") is None


def test_legacy_batch_evaluator_agrees(tmp_path):
    data = markov_data()
    m = GRU4Rec(small_cfg())
    m.fit(data)
    test = markov_data(n_sessions=40, seed=11)
    rec_fast, mrr_fast = evaluate(m, test, cut_off=[10], batch_size=16)
    rec_slow, mrr_slow = evaluate_sessions_batch(m, test, cut_off=10, batch_size=16)
    # same model, same protocol; the slow path walks sessions in a slightly
    # different refill order, so allow a small tolerance
    assert abs(rec_fast[0] - rec_slow) < 0.03
    assert abs(mrr_fast[0] - mrr_slow) < 0.03


def test_jsonl_logging(tmp_path, monkeypatch):
    import gru4rec_tpu.utils.logging as L

    log_path = str(tmp_path / "events.jsonl")
    monkeypatch.setattr(L, "_default", L.EventLogger(log_path))
    m = GRU4Rec(small_cfg(n_epochs=2))
    m.fit(markov_data(n_sessions=60))
    events = [json.loads(l) for l in open(log_path)]
    epochs = [e for e in events if e["event"] == "epoch"]
    assert len(epochs) == 2
    assert {"loss", "seconds", "events", "e_per_s"} <= set(epochs[0])


def test_resume_uses_checkpoint_config(tmp_path):
    """fit(resume=...) on a model whose own config differs from the
    checkpoint's must rebuild everything from the CHECKPOINT config (the
    captured pre-resume config once drove schedule/chunk shapes, crashing
    or silently training with the wrong hyperparameters)."""
    data = markov_data()
    ckpt = str(tmp_path / "ck.npz")
    m1 = GRU4Rec(small_cfg(layers=[24], batch_size=16, n_epochs=2))
    m1.fit(data, checkpoint_every=2, checkpoint_path=ckpt)

    # fresh model with a DIFFERENT (default-ish) config; resume must win
    m2 = GRU4Rec(small_cfg(layers=[16], batch_size=8, n_epochs=2))
    m2.fit(data, resume=ckpt, n_epochs=4)
    assert m2.config.layers == [24]
    assert m2.config.batch_size == 16
    assert np.asarray(m2.params["Wh"][0]).shape[-1] == 24
    assert len(m2.epoch_stats) == 2  # epochs 3-4 only


def test_save_checkpoint_counts_cumulative_epochs(tmp_path):
    """save_checkpoint() after a resumed fit must store the CUMULATIVE
    epoch, not the number of epochs run in the current fit() call."""
    data = markov_data(n_sessions=80)
    ck1 = str(tmp_path / "a.npz")
    ck2 = str(tmp_path / "b.npz")
    m1 = GRU4Rec(small_cfg(n_epochs=2))
    m1.fit(data, checkpoint_every=2, checkpoint_path=ck1)
    m2 = GRU4Rec(small_cfg())
    m2.fit(data, resume=ck1, n_epochs=4)  # runs epochs 3-4
    m2.save_checkpoint(ck2)
    m3 = GRU4Rec(small_cfg())
    m3.fit(data, resume=ck2, n_epochs=4)  # nothing left to do
    assert len(m3.epoch_stats) == 0


def test_predict_state_invalidated_by_refit():
    """A fit() between predict calls leaves self.H pointing at the TRAINING
    hidden state; the next predict must re-initialize its lane state even
    when the batch width happens to match."""
    cfg_bs = 8
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(batch_size=cfg_bs, n_epochs=1))
    m.fit(data)
    sids = np.arange(cfg_bs)
    iids = np.array([f"it{i}" for i in range(cfg_bs)], dtype=object)
    m.predict_next_batch(sids, iids, batch=cfg_bs)
    H_before = [np.asarray(h).copy() for h in m.H]
    m.fit(data, retrain=True)   # self.H now = training hidden state
    assert m._current_session is None  # serving state invalidated
    preds = m.predict_next_batch(sids, iids, batch=cfg_bs)
    assert preds.shape[1] == cfg_bs
    # lane state was re-initialized from zeros, not continued from training
    # H: feeding the same first inputs again must give the same fresh-state
    # hidden rows a brand-new model-serving session would
    m2_H = [np.asarray(h) for h in m.H]
    assert all(np.isfinite(h).all() for h in m2_H)


def test_bf16_cast_model_archive_roundtrip(tmp_path):
    """A model whose parameters were CAST to bf16 (serving memory savings)
    must survive savemodel/loadmodel bit-for-bit: npz cannot hold bf16
    natively (reloads as void) — the archive stores uint16 bits + dtype
    tags. (Training itself requires f32 master weights; config.validate
    rejects param_dtype='bfloat16'.)"""
    import jax.numpy as jnp

    data = markov_data(n_sessions=60)
    m = GRU4Rec(small_cfg(n_epochs=1))
    m.fit(data)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), t)
    m.params = dict(m.params)
    m.params["Wy"] = cast(m.params["Wy"])
    m.H = tuple(cast(h) for h in m.H)
    fname = str(tmp_path / "m_bf16.npz")
    m.savemodel(fname)
    m2 = GRU4Rec.loadmodel(fname)
    a, b = np.asarray(m.params["Wy"]), np.asarray(m2.params["Wy"])
    assert b.dtype == a.dtype == jnp.bfloat16
    # Wy loses only its zero padding columns through the reference-layout
    # archive; the stored region must round-trip bitwise
    assert np.array_equal(a.view(np.uint16), b.view(np.uint16))
    for h1, h2 in zip(m.H, m2.H):
        assert np.asarray(h2).dtype == jnp.bfloat16
        assert np.array_equal(np.asarray(h1).view(np.uint16),
                              np.asarray(h2).view(np.uint16))


def test_config_rejects_bf16_master_weights():
    with pytest.raises(NotImplementedError, match="master weights"):
        GRU4RecConfig(param_dtype="bfloat16")


def test_retrain_preserves_narrow_opt_state_dtype():
    """_extend_items must grow bf16 optimizer-state slots with bf16 zero
    rows: np.concatenate with f32 zeros silently promoted the whole slot
    to f32, turning narrow state storage off after a retrain."""
    data = markov_data(n_items=20)
    m = GRU4Rec(small_cfg(adapt="rmsprop", opt_state_dtype="bfloat16",
                          n_epochs=1))
    m.fit(data)
    st = m._train_state.opt_state["sparse"]
    before = {n: {k: v.dtype for k, v in leaves.items()}
              for n, leaves in st.items()}
    assert any(d == jax.numpy.bfloat16 for leaves in before.values()
               for d in leaves.values())
    m.fit(markov_data(n_items=30, seed=5), retrain=True)
    st2 = m._train_state.opt_state["sparse"]
    after = {n: {k: v.dtype for k, v in leaves.items()}
             for n, leaves in st2.items()}
    assert before == after


# --------------------------------------------------------------------------- #
def test_cast_for_serving(tmp_path):
    """cast_for_serving halves table storage, keeps serving working (top-k
    near-identical, metrics close), round-trips through checkpoints, and
    refuses a retrain on the narrowed masters."""
    import jax.numpy as jnp
    import pytest as _pytest

    from gru4rec_tpu.eval import evaluate

    data = markov_data(n_sessions=150)
    test = markov_data(n_sessions=30, seed=9)
    m = GRU4Rec(small_cfg(n_epochs=2))
    m.fit(data)
    rec_f32, _ = evaluate(m, test, cut_off=[5], batch_size=8)
    ids_f32, sc_f32 = m.predict_topk(list(range(8)),
                                     test.ItemId.values[:8], k=5, batch=8)

    m.cast_for_serving()
    assert jnp.asarray(m.params["Wy"]).dtype == jnp.bfloat16
    assert all(jnp.asarray(w).dtype == jnp.bfloat16 for w in m.params["Wh"])

    # deliberately WARM: the docstring promises compiled predict fns
    # re-trace on the dtype change mid-session (no cache resets here).
    # Fresh session ids force lane resets so the comparison is
    # like-for-like (same session ids would CONTINUE from the f32 call's
    # advanced hidden state — a different step, not a cast effect)
    ids_bf, sc_bf = m.predict_topk(list(range(100, 108)),
                                   test.ItemId.values[:8], k=5, batch=8)
    # one storage rounding: near-tied candidates may swap, most must agree
    agree = np.mean([len(set(a) & set(b)) / 5.0
                     for a, b in zip(ids_f32, ids_bf)])
    assert agree >= 0.8, (agree, ids_f32[:2], ids_bf[:2])
    rec_bf, _ = evaluate(m, test, cut_off=[5], batch_size=8)
    assert abs(rec_bf[0] - rec_f32[0]) < 0.05, (rec_f32, rec_bf)

    # checkpoint round-trip preserves the narrow dtype
    p = str(tmp_path / "bf16.npz")
    m.savemodel(p)
    m2 = type(m).loadmodel(p)
    assert jnp.asarray(m2.params["Wy"]).dtype == jnp.bfloat16
    rec_l, _ = evaluate(m2, test, cut_off=[5], batch_size=8)
    np.testing.assert_allclose(rec_l, rec_bf, atol=1e-6)

    # retrain on narrowed masters must refuse
    with _pytest.raises(NotImplementedError, match="float32 master"):
        m.fit(data, retrain=True)
