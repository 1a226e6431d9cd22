"""Self-golden accuracy regression tests.

The reference's quality culture is golden-number reproduction
(examples/rsc15/run_rsc15.py:24-38 states expected R@20/MRR@20 in comments;
README.md:358-368 publishes a results table). Its public datasets cannot be
downloaded here, so these cells freeze EXACT metrics on a frozen synthetic
dataset instead: a noisy Markov chain (75% deterministic successor, 25%
uniform jump) that yields mid-range Recall/MRR values sensitive to small
accuracy regressions — a perf "optimization" that costs a fraction of a
percent of accuracy fails these cells, where a loose learnability threshold
(test_end_to_end.py) would not.

The numbers were produced by this exact code on the CPU backend (XLA:CPU is
run-to-run deterministic). If a DELIBERATE semantic change shifts them,
regenerate with scripts in the docstring below and say why in the commit.
TPU transcendentals round differently; the TPU backend gets a wider (but
still sub-percent) tolerance.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from gru4rec_tpu import GRU4Rec, GRU4RecConfig
from gru4rec_tpu.eval import evaluate


def noisy_markov(n_sessions, n_items=60, seed=0, p_noise=0.25):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 9)):
            rows.append((s, f"it{i}", t)); t += 1
            i = rng.randint(n_items) if rng.rand() < p_noise else (7 * i + 3) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


CUTOFFS = [1, 5, 10, 20]

# cell name -> (config kwargs, golden losses, golden recall, golden mrr)
GOLDEN = {
    "flagship_bprmax": (
        dict(loss="bpr-max", final_act="elu-0.5", layers=[32],
             batch_size=16, n_sample=32, sample_alpha=0.5, learning_rate=0.1,
             momentum=0.1, bpreg=1.0, adapt="adagrad",
             constrained_embedding=True, n_epochs=3, chunk_size=64,
             item_pad_multiple=32, seed=42),
        # regenerated for the dedup_impl="matmul" default (round 4): the
        # MXU equality-matmul sums duplicate-row gradients in tree order
        # instead of segment_sum's sequential order — same summand sets,
        # different f32 association, diverging trajectory after many steps
        [0.528231, 0.477287, 0.468438],
        [0.754054, 0.770270, 0.805405, 0.843243],
        [0.754054, 0.758378, 0.763032, 0.765511],
    ),
    "xe_logq": (
        dict(loss="cross-entropy", final_act="softmax", layers=[32],
             batch_size=16, n_sample=32, sample_alpha=0.75, logq=1.0,
             learning_rate=0.08, adapt="adam", embedding=16, n_epochs=3,
             chunk_size=64, item_pad_multiple=32, seed=42),
        # regenerated twice this round for deliberate adam changes: (1) the
        # bias-correction expm1 fix (1 - v^t as -expm1(t ln v); the naive
        # form cancels catastrophically for v2=0.999 at small t), (2) the
        # merged sparse-state layout stores meang in f32 (was bf16) — less
        # storage rounding, slightly different trajectory
        # ... and (3) regenerated for the dedup_impl="matmul" default
        # (round 4, same reassociation note as flagship_bprmax above)
        [3.408175, 2.924910, 2.902679],
        [0.605405, 0.743243, 0.791892, 0.848649],
        [0.605405, 0.655495, 0.662001, 0.665801],
    ),
    # a third loss family AND the stochastically-rounded bf16 state mode:
    # SR is deterministic given the keys (stateless dither), so its
    # accuracy is golden-freezable like any other config — this cell
    # guards both top1-max semantics and SR-state training quality
    "top1max_sr": (
        dict(loss="top1-max", final_act="elu-1", layers=[32],
             batch_size=16, n_sample=32, sample_alpha=0.5, learning_rate=0.1,
             adapt="adagrad", opt_state_dtype="bfloat16_sr",
             constrained_embedding=True, n_epochs=3, chunk_size=64,
             item_pad_multiple=32, seed=42),
        # regenerated for the SR_TABLE_SALT move out of the small-int
        # fold_in domain (dropout-key collision fix, train/step.py:95-110):
        # new salts => new (equally valid) dither stream
        [0.851024, 0.813058, 0.806870],
        [0.754054, 0.783784, 0.805405, 0.848649],
        [0.754054, 0.763198, 0.765817, 0.768780],
    ),
}


@pytest.mark.parametrize("cell", list(GOLDEN))
def test_golden_metrics(cell):
    cfg_kwargs, g_losses, g_recall, g_mrr = GOLDEN[cell]
    train = noisy_markov(500, seed=1)
    test = noisy_markov(80, seed=2)
    m = GRU4Rec(GRU4RecConfig(**cfg_kwargs))
    m.fit(train)
    rec, mrr = evaluate(m, test, cut_off=CUTOFFS, batch_size=16)
    losses = [e["loss"] for e in m.epoch_stats]

    if jax.default_backend() == "tpu":
        # TPU transcendental/matmul rounding shifts trajectories slightly;
        # still guards against >0.5% accuracy regressions
        loss_rtol, metric_atol = 2e-3, 5e-3
    else:
        loss_rtol, metric_atol = 1e-4, 1e-6
    np.testing.assert_allclose(losses, g_losses, rtol=loss_rtol,
                               err_msg=f"{cell}: loss trajectory drifted")
    np.testing.assert_allclose(rec, g_recall, atol=metric_atol,
                               err_msg=f"{cell}: Recall@{CUTOFFS} drifted")
    np.testing.assert_allclose(mrr, g_mrr, atol=metric_atol,
                               err_msg=f"{cell}: MRR@{CUTOFFS} drifted")
