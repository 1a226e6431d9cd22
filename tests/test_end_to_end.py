"""End-to-end: the model must learn synthetic sequential structure, beat the
popularity baseline by a wide margin, round-trip through checkpoints, and
serve predictions consistent with training."""

import os

import numpy as np
import pandas as pd
import pytest

from gru4rec_tpu import GRU4Rec, GRU4RecConfig
from gru4rec_tpu.eval import evaluate


def markov_data(n_sessions=300, n_items=30, seed=0):
    """Deterministic first-order transitions: next = (7*i + 3) mod n."""
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 8)):
            rows.append((s, f"item_{i}", t))
            t += 1
            i = (7 * i + 3) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


@pytest.fixture(scope="module")
def trained():
    data = markov_data()
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", hidden_act="tanh",
        layers=[32], batch_size=16, n_sample=16, sample_alpha=0.5,
        learning_rate=0.1, momentum=0.1, n_epochs=5, chunk_size=64,
        item_pad_multiple=32, logq=0.0,
    )
    m = GRU4Rec(cfg)
    m.fit(data)
    return m, data


def test_learns_markov_structure(trained):
    m, data = trained
    assert not m.error_during_train
    test = markov_data(n_sessions=50, seed=99)
    rec, mrr = evaluate(m, test, cut_off=[1, 5], batch_size=16, mode="standard")
    # deterministic transitions: recall@1 should be near-perfect;
    # popularity baseline would score ~1/30.
    assert rec[0] > 0.8, f"recall@1 = {rec[0]}"
    assert mrr[1] > 0.8


def test_eval_tie_modes_close(trained):
    m, _ = trained
    test = markov_data(n_sessions=30, seed=123)
    res = {}
    for mode in ("standard", "conservative", "median", "tiebreaking"):
        rec, mrr = evaluate(m, test, cut_off=[5], batch_size=16, mode=mode)
        res[mode] = rec[0]
    # a well-trained continuous-score model should rarely tie
    assert abs(res["standard"] - res["conservative"]) < 0.05
    assert abs(res["standard"] - res["median"]) < 0.05
    assert abs(res["standard"] - res["tiebreaking"]) < 0.05


def test_rank_on_logits_matches_activated_path(trained, monkeypatch):
    """The compiled evaluator ranks on pre-activation logits whenever the
    final activation is strictly monotone (round-5 eval optimization: the
    softmax normalize/mask passes dominate big-catalog eval). Forcing the
    activated fallback must give the same metrics in every deterministic tie
    mode — ranks are provably invariant under strictly monotone maps."""
    m, _ = trained
    test = markov_data(n_sessions=40, seed=77)
    from gru4rec_tpu.eval import evaluation

    kw = dict(cut_off=[1, 4, 9], batch_size=12)  # miss the chunk-fn cache
    fast = {mode: evaluate(m, test, mode=mode, **kw)
            for mode in ("standard", "conservative", "median")}
    monkeypatch.setattr(evaluation, "rank_invariant", lambda name: False)
    evaluation._CHUNK_FN_CACHE.clear()  # force rebuild under the patch
    for mode, (rec_f, mrr_f) in fast.items():
        rec_a, mrr_a = evaluate(m, test, mode=mode, **kw)
        np.testing.assert_allclose(rec_f, rec_a, atol=1e-6, err_msg=mode)
        np.testing.assert_allclose(mrr_f, mrr_a, atol=1e-6, err_msg=mode)


def test_save_load_roundtrip(tmp_path, trained):
    m, data = trained
    fname = str(tmp_path / "model.npz")
    m.savemodel(fname)
    m2 = GRU4Rec.loadmodel(fname)
    test = markov_data(n_sessions=20, seed=7)
    r1, _ = evaluate(m, test, cut_off=[5], batch_size=16)
    r2, _ = evaluate(m2, test, cut_off=[5], batch_size=16)
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    assert m2.config.layers == m.config.layers
    assert (m2.itemidmap.values == m.itemidmap.values).all()


def test_predict_next_batch(trained):
    m, _ = trained
    sessions = np.array([1, 2, 3])
    items = np.array(["item_0", "item_3", "item_10"])
    preds = m.predict_next_batch(sessions, items, None, batch=3)
    assert preds.shape == (m.n_items, 3)
    # deterministic chain: argmax should be the known next item
    top = preds.idxmax(axis=0)
    assert top[0] == "item_3"        # (7*0+3) % 30
    assert top[1] == "item_24"       # (7*3+3) % 30
    # item-subset scoring agrees with full-catalog ranking
    m._predict_fn = None  # force rebuild for the subset shape
    subset = np.array(["item_3", "item_24", "item_5"])
    preds_sub = m.predict_next_batch(sessions, items, subset, batch=3)
    assert preds_sub.shape == (3, 3)


def test_nan_abort_sets_error_flag():
    data = markov_data(n_sessions=30)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=8, learning_rate=1e6, n_epochs=1, chunk_size=32,
        item_pad_multiple=32,
    )
    m = GRU4Rec(cfg)
    m.fit(data)
    # a diverged run must be flagged and unusable (gru4rec.py:626-629)
    if m.error_during_train:
        with pytest.raises(Exception):
            evaluate(m, data, cut_off=[5], batch_size=8)


def test_nan_abort_dumps_state(tmp_path):
    """On NaN abort fit() writes a best-effort training-state dump next to
    the configured checkpoint path (SURVEY.md §5 "NaN abort with state
    dump") — the file must exist and load as a full training checkpoint."""
    from gru4rec_tpu.io.checkpoint import load_train_checkpoint

    data = markov_data(n_sessions=300)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=8, learning_rate=float("nan"), n_epochs=1, chunk_size=8,
        item_pad_multiple=32,
    )
    m = GRU4Rec(cfg)
    ckpt = str(tmp_path / "run.npz")
    m.fit(data, checkpoint_every=1, checkpoint_path=ckpt)
    assert m.error_during_train
    dump = ckpt + ".nan.npz"
    assert os.path.exists(dump), "NaN abort did not write the state dump"
    m2 = GRU4Rec(GRU4RecConfig())
    state, epoch = load_train_checkpoint(dump, m2)
    assert epoch == 0  # diverged in the first epoch
    # the dump carries the diverged-but-diagnosable parameters: NaNs and all
    assert np.isnan(np.asarray(state.params["Wy"])).any()
    assert m2.n_items == m.n_items


def test_validation_early_stopping_and_keep_best():
    """fit(eval_data=...) evaluates every epoch, stops after `patience`
    evaluations without improvement, and restores the best parameters."""
    data = markov_data(n_sessions=250)
    valid = markov_data(n_sessions=60, seed=77)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[32], batch_size=16,
        n_sample=16, learning_rate=0.1, n_epochs=30, chunk_size=64,
        item_pad_multiple=32,
    )
    m = GRU4Rec(cfg)
    m.fit(data, eval_data=valid, eval_every=1, eval_cutoff=1,
          eval_batch_size=16, early_stop_patience=2)
    # a deterministic chain saturates recall@1 quickly: the run must stop
    # well before 30 epochs and record one validation row per epoch run
    assert len(m.epoch_stats) < 30
    assert len(m.valid_stats) == len(m.epoch_stats)
    best = max(v["recall"] for v in m.valid_stats)
    assert best > 0.9
    # keep_best: the served parameters reproduce the best validation recall
    rec, _ = evaluate(m, valid, cut_off=[1], batch_size=16)
    np.testing.assert_allclose(rec[0], best, atol=1e-6)


def test_train_random_order():
    """train_random_order=True shuffles sessions per epoch (reference:
    gru4rec.py:593): schedules must differ across epochs (no chunk caching)
    and the model must still learn the chain."""
    data = markov_data(n_sessions=250)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[32], batch_size=16,
        n_sample=16, learning_rate=0.1, n_epochs=4, chunk_size=64,
        item_pad_multiple=32, train_random_order=True,
    )
    m = GRU4Rec(cfg)
    m.fit(data)
    assert not m.error_during_train
    rec, _ = evaluate(m, markov_data(40, seed=3), cut_off=[1], batch_size=16)
    assert rec[0] > 0.7, f"recall@1 = {rec[0]}"


def test_train_with_no_extra_negatives():
    """n_sample=0 trains on within-batch negatives only: the empty-negatives
    branch of the step (train/step.py) plus the scheduler's >=2-live-lanes
    rule (reference: gru4rec.py:637) must produce a model that learns."""
    data = markov_data(n_sessions=300)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[32], batch_size=16,
        n_sample=0, learning_rate=0.1, n_epochs=5, chunk_size=64,
        item_pad_multiple=32,
    )
    m = GRU4Rec(cfg)
    m.fit(data)
    assert not m.error_during_train
    rec, _ = evaluate(m, markov_data(50, seed=9), cut_off=[1], batch_size=16)
    assert rec[0] > 0.5, f"recall@1 = {rec[0]}"


def test_nan_abort_fails_fast(monkeypatch):
    """Divergence must abort the epoch a bounded number of chunks after it
    happens — not at epoch end (the reference aborts per step,
    gru4rec.py:626-629; we check completed chunks two dispatches behind)."""
    import gru4rec_tpu.models.gru4rec as g4r_mod

    data = markov_data(n_sessions=300)
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=8, learning_rate=float("nan"), n_epochs=1, chunk_size=8,
        item_pad_multiple=32,
    )
    calls = []
    real = g4r_mod.make_chunk_fn

    def counting(cfg, n_items):
        fn = real(cfg, n_items)

        def wrapped(*a, **k):
            calls.append(1)
            return fn(*a, **k)

        return wrapped

    monkeypatch.setattr(g4r_mod, "make_chunk_fn", counting)
    m = GRU4Rec(cfg)
    m.fit(data)
    assert m.error_during_train
    # NaN params after chunk 0's first update => chunk 0's loss sum is NaN;
    # the lag-2 check sees it at the third dispatch. ~150 chunks exist.
    assert len(calls) <= 4, f"abort not fail-fast: {len(calls)} chunks dispatched"


def test_item_subset_evaluation_and_prediction(trained):
    """Item-subset scoring (reference: evaluate_gpu's `items` arg,
    evaluation.py:104-105, and predict_next_batch's predict_for_item_ids):
    ranks are computed against target + subset only."""
    m, _ = trained
    test = markov_data(n_sessions=40, seed=11)
    items_all = [f"item_{i}" for i in range(30)]

    # subset containing the whole vocabulary must match full-catalog results
    # in every tie mode (subset ranks include the target's self-comparison,
    # unlike the reference's subset path — see eval/evaluation.py)
    for tie_mode in ("standard", "conservative", "median"):
        rec_full, mrr_full = evaluate(m, test, cut_off=[5], batch_size=16,
                                      mode=tie_mode)
        rec_all, mrr_all = evaluate(m, test, items=items_all, cut_off=[5],
                                    batch_size=16, mode=tie_mode)
        assert abs(rec_full[0] - rec_all[0]) < 1e-6, tie_mode
        assert abs(mrr_full[0] - mrr_all[0]) < 1e-6, tie_mode

    # a smaller competitor pool can only improve the target's rank, and a
    # target that beats the whole subset must rank 1, never 0 (finite MRR)
    rec_full, _ = evaluate(m, test, cut_off=[5], batch_size=16)
    rec_sub, mrr_sub = evaluate(m, test, items=items_all[:10], cut_off=[5],
                                batch_size=16, mode="conservative")
    assert rec_sub[0] >= rec_full[0] - 1e-6
    assert np.isfinite(mrr_sub[0]) and mrr_sub[0] <= 1.0 + 1e-6

    # predict_next_batch with predict_for_item_ids returns only those rows
    preds = m.predict_next_batch(
        np.array([901, 902]), np.array(["item_3", "item_10"]),
        predict_for_item_ids=np.array(items_all[:7]), batch=2,
    )
    assert list(preds.index) == items_all[:7]
    assert preds.shape == (7, 2)


def test_predict_topk(trained):
    """Device-side top-k serving must agree with the full score frame."""
    m, _ = trained
    sess = np.array([501, 502, 503])
    inputs = np.array(["item_3", "item_10", "item_20"])
    items, scores = m.predict_topk(sess, inputs, k=5, batch=3)
    assert items.shape == (3, 5) and scores.shape == (3, 5)
    # best-first ordering
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # fresh lanes, same inputs: full-frame argmax must match top-1
    m2, _ = trained
    preds = m2.predict_next_batch(np.array([601, 602, 603]), inputs, batch=3)
    top1_full = preds.idxmax(axis=0).values
    items2, _ = m2.predict_topk(np.array([601, 602, 603]), inputs, k=5, batch=3)
    # note: predict_topk shares lane state; using the same session ids keeps
    # H consistent with the frame call above (session unchanged -> no reset)
    np.testing.assert_array_equal(items2[:, 0], top1_full)


def test_fit_with_zero_step_schedule():
    """All-singleton sessions produce a zero-step schedule; fit() must
    complete the epoch cleanly (regression: the stacked-schedule upload
    crashed on np.stack([]))."""
    data = pd.DataFrame({
        "SessionId": np.arange(10),
        "ItemId": [f"i{j % 3}" for j in range(10)],
        "Time": np.arange(10),
    })
    cfg = GRU4RecConfig(layers=[8], batch_size=4, n_sample=4, n_epochs=1,
                        chunk_size=8, item_pad_multiple=8)
    m = GRU4Rec(cfg)
    m.fit(data)
    assert not m.error_during_train
    assert m.epoch_stats[0]["steps"] == 0


def test_fit_with_host_schedule_fallback(monkeypatch):
    """Over-budget epoch schedules stay host-side (per-chunk upload path);
    training must produce the same results as the device-resident path."""
    import gru4rec_tpu.models.gru4rec as g4r

    data = markov_data(n_sessions=80, n_items=12, seed=3)
    cfg = GRU4RecConfig(loss="cross-entropy", final_act="softmax",
                        layers=[16], batch_size=8, n_sample=8, n_epochs=2,
                        chunk_size=16, item_pad_multiple=16)
    m_dev = GRU4Rec(cfg)
    m_dev.fit(data)
    monkeypatch.setattr(g4r, "_SCHEDULE_DEVICE_BYTE_BUDGET", 0)
    m_host = GRU4Rec(cfg)
    m_host.fit(data)
    np.testing.assert_allclose(np.asarray(m_host.params["Wy"]),
                               np.asarray(m_dev.params["Wy"]),
                               rtol=1e-5, atol=1e-6)
