"""Seeded config-combination fuzz: random valid configs through the whole
user surface (fit, evaluate, save/load) on tiny data.

The fixed tests pin representative configs; this sweep samples the
combination space (loss x input mode x optimizer x momentum x sampler x
n_sample x logq/smoothing/grad_cap/dropout x state dtype x dedup impl x
ordering) to catch interaction bugs none of the hand-picked cells hit.
Seeded, so a failure reproduces exactly; add the failing draw as a fixed
regression cell when one appears."""

import numpy as np
import pandas as pd
import pytest

from gru4rec_tpu import GRU4Rec, GRU4RecConfig
from gru4rec_tpu.eval import evaluate

FINAL_ACT = {
    "cross-entropy": "softmax",
    "xe_logit": "softmax_logit",
    "bpr": "elu-0.5",
    "bpr-max": "elu-1",
    "top1": "tanh",
    "top1-max": "leaky-0.1",
}


def draw_config(rng):
    loss = rng.choice(list(FINAL_ACT))
    n_sample = int(rng.choice([0, 8, 24]))
    if loss in ("bpr", "bpr-max", "top1", "top1-max") and n_sample == 0:
        # ranking losses need negatives; with n_sample=0 the only negatives
        # are the other in-batch positives, which is valid but degenerate
        # with tiny vocab/batch — keep them sampled
        n_sample = 8
    mode = rng.choice(["onehot", "embedding", "constrained"])
    kw = dict(
        loss=str(loss), final_act=FINAL_ACT[loss],
        hidden_act=str(rng.choice(["tanh", "relu"])),
        layers=[int(rng.choice([8, 12]))] * int(rng.choice([1, 2])),
        batch_size=8, n_sample=n_sample,
        sample_alpha=float(rng.choice([0.0, 0.5, 0.75])),
        sampler=str(rng.choice(["alias", "searchsorted"])),
        learning_rate=0.06, n_epochs=2, chunk_size=int(rng.choice([8, 16])),
        item_pad_multiple=32,
        adapt=rng.choice([None, "adagrad", "rmsprop", "adadelta", "adam"]),
        momentum=float(rng.choice([0.0, 0.3])),
        lmbd=float(rng.choice([0.0, 1e-4])),
        grad_cap=float(rng.choice([0.0, 5.0])),
        logq=float(rng.choice([0.0, 1.0])),
        dropout_p_hidden=float(rng.choice([0.0, 0.2])),
        dropout_p_embed=float(rng.choice([0.0, 0.1])),
        time_sort=bool(rng.choice([True, False])),
        train_random_order=bool(rng.choice([True, False])),
        opt_state_dtype=str(rng.choice(["float32", "bfloat16",
                                        "bfloat16_sr"])),
        dedup_impl=str(rng.choice(["sort", "matmul"])),
        seed=int(rng.randint(1000)),
    )
    if loss in ("cross-entropy", "xe_logit"):
        kw["smoothing"] = float(rng.choice([0.0, 0.2]))
    if mode == "embedding":
        kw["embedding"] = int(rng.choice([7, 9]))
    elif mode == "constrained":
        kw["constrained_embedding"] = True
    if kw["adapt"] == "adadelta":
        kw["learning_rate"] = 1.0
    return kw


def sessions(n, seed, n_items=40):
    r = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n):
        i = r.randint(n_items)
        for _ in range(r.randint(3, 7)):
            rows.append((s, f"it{i}", t))
            t += 1
            i = (11 * i + 5) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


@pytest.mark.parametrize("draw", range(10))
def test_random_config_full_surface(draw, tmp_path):
    rng = np.random.RandomState(1000 + draw)
    kw = draw_config(rng)
    data = sessions(120, seed=draw)
    test = sessions(25, seed=100 + draw)

    m = GRU4Rec(GRU4RecConfig(**kw))
    m.fit(data)
    assert not m.error_during_train, kw
    assert np.isfinite(m.epoch_stats[-1]["loss"]), kw

    rec, mrr = evaluate(m, test, cut_off=[1, 5], batch_size=8)
    for v in rec + mrr:
        assert 0.0 <= v <= 1.0, (kw, rec, mrr)
    # the markov structure is learnable by every sane config; plain SGD at
    # this lr/epoch budget only clears a weaker bar (random recall@5 on a
    # 40-item catalog is ~0.125 — adaptive configs must beat it clearly)
    assert rec[1] > (0.05 if kw["adapt"] is None else 0.2), (kw, rec)

    p = str(tmp_path / "m.npz")
    m.savemodel(p)
    m2 = GRU4Rec.loadmodel(p)
    rec2, _ = evaluate(m2, test, cut_off=[1, 5], batch_size=8)
    np.testing.assert_allclose(rec2, rec, atol=1e-6, err_msg=str(kw))
