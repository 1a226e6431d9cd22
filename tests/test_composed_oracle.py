"""Composed full-train-step differential tests.

Each cell runs the framework's jitted chunk function (train/step.py
make_chunk_fn, compute_dtype=float32) step-by-step against
tests/oracle_reference.py — a torch-float64 transcription of the reference's
ENTIRE compiled step (/root/reference/gru4rec.py:572-584): model forward ->
loss / static_batch_size -> per-occurrence gradients -> global-norm clip ->
optimizer (dense + row-sparse) -> hidden-state update. Loss and parameter
TRAJECTORIES must agree to float32 tolerance across
{losses} x {optimizers +- momentum} x {input modes} x {logq, smoothing,
grad_cap, masked lanes, n_sample=0, 2-layer} cells; the repo's two documented
optimizer divergences (summed-duplicate dedup, textbook Adam) are asserted as
EXPECTED differences.

Negatives are replicated exactly: the same sampler functions are called on
the host with the same fold_in keys the chunk function derives, so both
sides train on identical negative draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.sampling import (AliasTable, build_alias_table,
                                       popularity_cdf, sample_negatives,
                                       sample_negatives_alias)
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

from oracle_reference import ReferenceStepOracle  # tests/ is on sys.path (rootdir conftest)

FINAL_ACT = {
    "cross-entropy": "softmax",
    "xe_logit": "softmax_logit",
    "bpr": "elu-0.5",
    "bpr-max": "elu-1",
    "top1": "tanh",
    "top1-max": "leaky-0.1",
}
MODES = {
    "onehot": {},
    "embedding": {"embedding": 7},
    "constrained": {"constrained_embedding": True},
}


def run_cell(cfg_kwargs, n_steps=12, B=5, n_items=48, seed=0, masked=False,
             adam_variant="textbook"):
    cfg = GRU4RecConfig(
        batch_size=B, chunk_size=1, compute_dtype="float32",
        opt_state_dtype="float32", item_pad_multiple=16, seed=3,
        dropout_p_hidden=0.0, dropout_p_embed=0.0, **cfg_kwargs,
    )
    state = init_train_state(cfg, n_items, jax.random.PRNGKey(cfg.seed))
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    rng = np.random.RandomState(seed)
    in_c = rng.randint(0, n_items, (n_steps, B)).astype(np.int32)
    out_c = rng.randint(0, n_items, (n_steps, B)).astype(np.int32)
    valid = np.ones((n_steps, B), bool)
    if masked:
        valid[n_steps // 2:, B // 2:] = False  # lanes die mid-schedule
    reset = rng.rand(n_steps, B) < 0.15

    pop = rng.randint(1, 50, n_items).astype(np.int64)
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    logp0 = np.zeros(n_pad, np.float32)
    logp0[:n_items] = np.log(pop.astype(np.float64))
    if cfg.n_sample and cfg.sample_alpha != 0 and cfg.sampler == "alias":
        samp1 = build_alias_table(pop, cfg.sample_alpha).packed
    elif cfg.n_sample and cfg.sample_alpha != 0:
        samp1 = jnp.asarray(popularity_cdf(pop, cfg.sample_alpha))
    else:
        samp1 = jnp.zeros((1,), jnp.float32)
    logp0_j = jnp.asarray(logp0)

    chunk_fn = make_chunk_fn(cfg, n_items)
    oracle = ReferenceStepOracle(params0, cfg, n_items, logp0=logp0,
                                 adam_variant=adam_variant)

    costs_fw, costs_or = [], []
    for t in range(n_steps):
        # replicate the chunk's in-graph negative draw on the host
        if cfg.n_sample > 0:
            neg_key = jax.random.fold_in(
                jax.random.fold_in(state.key, 1), int(state.step))
            if cfg.sample_alpha == 0.0:
                neg = jax.random.randint(neg_key, (1, cfg.n_sample), 0,
                                         n_items, dtype=jnp.int32)
            elif cfg.sampler == "alias":
                neg = sample_negatives_alias(neg_key, AliasTable(samp1), 1,
                                             cfg.n_sample)
            else:
                neg = sample_negatives(neg_key, samp1, 1, cfg.n_sample,
                                       n_items, cfg.sample_alpha)
            neg_np = np.asarray(neg)[0].astype(np.int64)
        else:
            neg_np = np.zeros((0,), np.int64)

        state, ls, ec = chunk_fn(
            state, jnp.asarray(in_c[t:t + 1]), jnp.asarray(out_c[t:t + 1]),
            jnp.asarray(valid[t:t + 1]), jnp.asarray(reset[t:t + 1]),
            samp1, logp0_j,
        )
        M = valid[t].sum()
        costs_fw.append(float(ls) / M)
        costs_or.append(oracle.step(in_c[t], out_c[t], valid[t], reset[t],
                                    neg_np))
    return cfg, state, oracle, np.array(costs_fw), np.array(costs_or)


def assert_cell_matches(cfg, state, oracle, costs_fw, costs_or,
                        rtol=5e-4, atol=2e-5, tpu_atol=1e-3):
    # XLA:TPU's transcendentals (exp/log/pow/rsqrt inside losses and
    # adaptive scalings) differ from CPU libm by a couple of ulps; over a
    # 12-step trajectory a borderline element drifts to ~1e-4 absolute
    # (observed: <=1 element per table). Keep the CPU tolerance strict;
    # widen atol on the TPU backend only. Adam cells pass a larger
    # ``tpu_atol``: 1/sqrt(acc) over a freshly-initialized second moment is
    # near-chaotic in the first steps and amplifies those ulps to ~2e-3.
    if jax.default_backend() == "tpu":
        atol = max(atol, tpu_atol)
    n_items = oracle.n_items
    np.testing.assert_allclose(costs_fw, costs_or, rtol=rtol, atol=atol,
                               err_msg="loss trajectory")
    p = state.params
    np.testing.assert_allclose(np.asarray(p["Wy"])[:n_items], oracle.Wy,
                               rtol=rtol, atol=atol, err_msg="Wy")
    start = 1 if gru.input_mode(cfg) == "onehot" else 0
    if gru.input_mode(cfg) == "onehot":
        np.testing.assert_allclose(np.asarray(p["Wx"][0])[:n_items],
                                   oracle.Wx[0], rtol=rtol, atol=atol,
                                   err_msg="Wx0")
    if gru.input_mode(cfg) == "embedding":
        np.testing.assert_allclose(np.asarray(p["E"])[:n_items], oracle.E,
                                   rtol=rtol, atol=atol, err_msg="E")
    for i in range(len(cfg.layers)):
        if i >= start:  # start = 1 only for onehot, whose Wx0 is asserted above
            np.testing.assert_allclose(np.asarray(p["Wx"][i]), oracle.Wx[i],
                                       rtol=rtol, atol=atol, err_msg=f"Wx{i}")
        np.testing.assert_allclose(np.asarray(p["Wh"][i]), oracle.Wh[i],
                                   rtol=rtol, atol=atol, err_msg=f"Wh{i}")
        np.testing.assert_allclose(np.asarray(p["Wrz"][i]), oracle.Wrz[i],
                                   rtol=rtol, atol=atol, err_msg=f"Wrz{i}")
        np.testing.assert_allclose(np.asarray(p["Bh"][i]), oracle.Bh[i],
                                   rtol=rtol, atol=atol, err_msg=f"Bh{i}")
        np.testing.assert_allclose(np.asarray(state.H[i]), oracle.H[i],
                                   rtol=rtol, atol=atol, err_msg=f"H{i}")


@pytest.mark.parametrize("mode", list(MODES))
@pytest.mark.parametrize("loss", list(FINAL_ACT))
def test_composed_losses_by_mode(loss, mode):
    cell = run_cell(dict(
        loss=loss, final_act=FINAL_ACT[loss], layers=[7], n_sample=6,
        sample_alpha=0.75, learning_rate=0.08, adapt="adagrad",
        **MODES[mode],
    ))
    assert_cell_matches(*cell)


@pytest.mark.parametrize("momentum", [0.0, 0.3])
@pytest.mark.parametrize("adapt", [None, "adagrad", "rmsprop", "adadelta",
                                   "adam"])
def test_composed_optimizers(adapt, momentum):
    cell = run_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[7], n_sample=6,
        sample_alpha=0.75, learning_rate=0.08, adapt=adapt,
        momentum=momentum, lmbd=1e-3, embedding=7,
    ))
    assert_cell_matches(*cell, tpu_atol=3e-3 if adapt == "adam" else 1e-3)


def test_composed_adam_reference_variant_differs():
    """The reference's Adam bugs (squared-grad sparse first moment,
    v1-based second-moment correction — gru4rec.py:325,329) are REAL: the
    same run compared against a faithful reference-Adam oracle must NOT
    match, while the textbook oracle does (test above)."""
    cell = run_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[7], n_sample=6,
        sample_alpha=0.75, learning_rate=0.08, adapt="adam", embedding=7,
    ), adam_variant="reference")
    with pytest.raises(AssertionError):
        assert_cell_matches(*cell)


@pytest.mark.parametrize("mode", ["onehot", "constrained"])
def test_composed_logq(mode):
    cell = run_cell(dict(
        loss="cross-entropy", final_act="softmax", layers=[7], n_sample=6,
        sample_alpha=0.75, sampler="searchsorted", logq=1.0,
        learning_rate=0.08, adapt="adagrad", **MODES[mode],
    ))
    assert_cell_matches(*cell)


def test_composed_grad_cap():
    cell = run_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[7], n_sample=6,
        sample_alpha=0.75, learning_rate=0.08, adapt="adagrad",
        grad_cap=0.05, constrained_embedding=True,
    ))
    assert_cell_matches(*cell)


@pytest.mark.parametrize("loss", ["cross-entropy", "xe_logit"])
def test_composed_smoothing(loss):
    cell = run_cell(dict(
        loss=loss, final_act=FINAL_ACT[loss], layers=[7], n_sample=6,
        sample_alpha=0.75, smoothing=0.2, learning_rate=0.08,
        adapt="adagrad", embedding=7,
    ))
    assert_cell_matches(*cell)


def test_composed_masked_lanes():
    """Dead lanes: the framework masks static lanes; the oracle runs the
    reference's physically-shrunk batch. Same math, including the
    loss/static-B scaling quirk (gru4rec.py:577)."""
    cell = run_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[7], n_sample=6,
        sample_alpha=0.75, learning_rate=0.08, adapt="adagrad",
        constrained_embedding=True,
    ), masked=True)
    assert_cell_matches(*cell)


def test_composed_n_sample_zero():
    cell = run_cell(dict(
        loss="cross-entropy", final_act="softmax", layers=[7], n_sample=0,
        learning_rate=0.08, adapt="adagrad", embedding=7,
    ))
    assert_cell_matches(*cell)


@pytest.mark.parametrize("mode", ["onehot", "constrained"])
def test_composed_two_layers(mode):
    cell = run_cell(dict(
        loss="bpr-max", final_act="elu-1", layers=[7, 6], n_sample=6,
        sample_alpha=0.75, bpreg=2.0, learning_rate=0.08, adapt="adagrad",
        **MODES[mode],
    ))
    assert_cell_matches(*cell)


def test_composed_selu_activations():
    """Parameterized selu-<l>-<a> final act + leaky hidden act through the
    full composed step (the string-parsed activation grammar end-to-end)."""
    cell = run_cell(dict(
        loss="top1", final_act="selu-1.0507-1.6733", hidden_act="leaky-0.2",
        layers=[7], n_sample=6, sample_alpha=0.75, learning_rate=0.08,
        adapt="adagrad", embedding=7,
    ))
    assert_cell_matches(*cell)
