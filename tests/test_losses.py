"""Loss-function tests: closed-form small cases (reference math,
gru4rec.py:225-248) and lane-mask invariance — masking dead lanes out of a
static-width batch must equal the reference's physically shrunken batch."""

import jax.numpy as jnp
import numpy as np
import pytest

from gru4rec_tpu.ops.losses import get_loss

LOSSES = ["cross-entropy", "xe_logit", "bpr", "bpr-max", "top1", "top1-max"]


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_loss(name, yhat, n_sample, smoothing=0.0, bpreg=1.0):
    """Direct NumPy transcription of gru4rec.py:225-248 (all lanes valid)."""
    M = yhat.shape[0]
    d = np.diag(yhat)
    if name == "cross-entropy":
        if smoothing:
            n_out = M + n_sample
            return np.sum(
                (1.0 - (n_out / (n_out - 1)) * smoothing) * (-np.log(d + 1e-24))
                + (smoothing / (n_out - 1)) * np.sum(-np.log(yhat + 1e-24), axis=1)
            )
        return np.sum(-np.log(d + 1e-24))
    if name == "xe_logit":
        if smoothing:
            n_out = M + n_sample
            return np.sum(
                (1.0 - (n_out / (n_out - 1)) * smoothing) * d
                + (smoothing / (n_out - 1)) * np.sum(yhat, axis=1)
            )
        return np.sum(d)
    if name == "bpr":
        return np.sum(-np.log(np_sigmoid(d[:, None] - yhat)))
    if name == "top1":
        return np.sum(
            np.mean(np_sigmoid(-d[:, None] + yhat) + np_sigmoid(yhat**2), axis=1)
            - np_sigmoid(d**2) / (M + n_sample)
        )
    # softmax over negatives with diagonal masked
    hm = 1.0 - np.eye(M, yhat.shape[1])
    x = yhat * hm
    e_x = np.exp(x - x.max(axis=1, keepdims=True)) * hm
    ss = e_x / e_x.sum(axis=1, keepdims=True)
    if name == "bpr-max":
        return np.sum(
            -np.log(np.sum(np_sigmoid(d[:, None] - yhat) * ss, axis=1) + 1e-24)
            + bpreg * np.sum((yhat**2) * ss, axis=1)
        )
    if name == "top1-max":
        return np.sum(
            np.sum(ss * (np_sigmoid(-d[:, None] + yhat) + np_sigmoid(yhat**2)), axis=1)
        )
    raise KeyError(name)


@pytest.mark.parametrize("name", LOSSES)
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_matches_oracle_all_valid(name, smoothing):
    if smoothing and name not in ("cross-entropy", "xe_logit"):
        pytest.skip("smoothing only applies to xe losses")
    rng = np.random.RandomState(0)
    B, n_sample = 5, 7
    yhat = rng.rand(B, B + n_sample).astype(np.float32) * 0.9 + 0.05
    fn = get_loss(name, n_sample, smoothing=smoothing, bpreg=1.3)
    got = float(
        fn(
            jnp.asarray(yhat),
            jnp.float32(B),
            jnp.ones(B, bool),
            jnp.ones(B + n_sample, bool),
        )
    )
    want = oracle_loss(name, yhat.astype(np.float64), n_sample, smoothing, bpreg=1.3)
    np.testing.assert_allclose(got, want, rtol=2e-4)


@pytest.mark.parametrize("name", LOSSES)
def test_mask_invariance(name):
    """Loss over a static 6-lane batch with 2 dead lanes == loss over the
    compacted 4-lane batch (what the reference would compute)."""
    rng = np.random.RandomState(1)
    B, n_sample = 6, 5
    valid = np.array([True, False, True, True, False, True])
    yhat_full = (rng.rand(B, B + n_sample) * 0.9 + 0.05).astype(np.float32)
    idx = np.where(valid)[0]
    cols = np.concatenate([idx, np.arange(B, B + n_sample)])
    yhat_compact = yhat_full[np.ix_(idx, cols)]

    fn = get_loss(name, n_sample, bpreg=0.7)
    got_masked = float(
        fn(
            jnp.asarray(yhat_full),
            jnp.float32(valid.sum()),
            jnp.asarray(valid),
            jnp.asarray(np.concatenate([valid, np.ones(n_sample, bool)])),
        )
    )
    got_compact = float(
        fn(
            jnp.asarray(yhat_compact),
            jnp.float32(valid.sum()),
            jnp.ones(len(idx), bool),
            jnp.ones(len(cols), bool),
        )
    )
    np.testing.assert_allclose(got_masked, got_compact, rtol=1e-5)


def test_masked_softmax_matches_compact():
    from gru4rec_tpu.ops.activations import masked_softmax

    rng = np.random.RandomState(2)
    scores = rng.randn(4, 9).astype(np.float32)
    col_valid = np.array([True, True, False, True, True, True, False, True, True])
    full = np.asarray(masked_softmax(jnp.asarray(scores), jnp.asarray(col_valid)))
    compact = np.asarray(masked_softmax(jnp.asarray(scores[:, col_valid]), None))
    np.testing.assert_allclose(full[:, col_valid], compact, rtol=1e-5)
    assert np.all(full[:, ~col_valid] == 0)


def test_top1_reference_broadcast_relationship():
    """Pin the ONE deliberate loss divergence (ops/losses.py top1 note): the
    reference's top1 subtracts a broadcastable (M,1) self-penalty from the
    (M,) row means, broadcasting to (M,M) before the final sum — exactly M
    times the intended 1-D form this repo (and the oracle) implement."""
    rng = np.random.RandomState(5)
    M, n_sample = 6, 10
    yhat = np_sigmoid(rng.randn(M, M + n_sample))
    d = np.diag(yhat)
    means = np.mean(np_sigmoid(-d[:, None] + yhat) + np_sigmoid(yhat**2), axis=1)
    penalty = np_sigmoid(d**2) / (M + n_sample)
    # reference expression: (M,) minus broadcastable (M,1) -> (M,M) sum
    ref_broadcast = np.sum(means[None, :] - penalty[:, None])
    ours = float(
        get_loss("top1", n_sample, 0.0, 1.0)(
            jnp.asarray(yhat, jnp.float32), jnp.float32(M),
            jnp.ones(M, bool), jnp.ones(M + n_sample, bool),
        )
    )
    np.testing.assert_allclose(ref_broadcast, M * ours, rtol=1e-5)
