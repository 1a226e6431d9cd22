"""Forward-pass parity against a NumPy oracle of the reference math.

The oracle transcribes the reference's symbolic graph (gru4rec.py:433-506)
directly in NumPy: fused layer-0 one-hot cell, embedding and constrained
input modes, multi-layer GRU recurrence, sampled scoring with bias, logq
correction, and final activation.
"""

import numpy as np
import pytest

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_elu(x, a=1.0):
    return np.where(x >= 0, x, a * (np.exp(np.minimum(x, 0)) - 1.0))


def oracle_forward(params, H, X, Y, cfg, n_items, logq_pop=None, neg=None):
    """Reference-math forward (no dropout, all lanes valid)."""
    p = {k: (list(map(np.asarray, v)) if isinstance(v, (list, tuple)) else np.asarray(v))
         for k, v in params.items()}
    # the framework folds By into Wy at column h with tile padding beyond
    # (models/gru.py); the oracle keeps the reference's separate layout
    h_last = cfg.layers[-1]
    p["By"] = p["Wy"][:, h_last]
    p["Wy"] = p["Wy"][:, :h_last]
    layers = cfg.layers
    B = len(X)
    Yfull = np.concatenate([Y, neg]) if neg is not None else Y
    H = [np.asarray(h).copy() for h in H]
    Hn = []
    if cfg.constrained_embedding:
        S = p["Wy"][np.concatenate([X, Yfull])]
        Sx, Sy = S[:B], S[B:]
        y = Sx
        start = 0
    elif cfg.embedding:
        Sx = p["E"][X]
        y = Sx
        start = 0
    else:
        Sx = p["Wx"][0][X]
        vec = Sx + p["Bh"][0]
        h0 = layers[0]
        rz = np_sigmoid(vec[:, h0:] + H[0] @ p["Wrz"][0])
        h = np.tanh((H[0] * rz[:, :h0]) @ p["Wh"][0] + vec[:, :h0])
        z = rz[:, h0:]
        h = (1.0 - z) * H[0] + z * h
        y = h
        Hn.append(h)
        start = 1
    for i in range(start, len(layers)):
        hd = layers[i]
        vec = y @ p["Wx"][i] + p["Bh"][i]
        rz = np_sigmoid(vec[:, hd:] + H[i] @ p["Wrz"][i])
        h = np.tanh((H[i] * rz[:, :hd]) @ p["Wh"][i] + vec[:, :hd])
        z = rz[:, hd:]
        h = (1.0 - z) * H[i] + z * h
        y = h
        Hn.append(h)
    if not cfg.constrained_embedding:
        Sy = p["Wy"][Yfull]
    SBy = p["By"][Yfull]
    scores = y @ Sy.T + SBy
    if logq_pop is not None and cfg.logq:
        corr = np.concatenate(
            [logq_pop[Y], logq_pop[neg] ** cfg.sample_alpha]
            if neg is not None
            else [logq_pop[Y]]
        )
        scores = scores - cfg.logq * np.log(corr)
    yhat = np_elu(scores) if cfg.final_act == "elu-1" else scores
    return Hn, yhat


@pytest.mark.parametrize(
    "mode_kwargs",
    [
        {},  # one-hot
        {"embedding": 24},
        {"constrained_embedding": True},
    ],
)
@pytest.mark.parametrize("n_layers", [1, 2])
def test_forward_matches_oracle(mode_kwargs, n_layers):
    n_items, B, n_neg = 40, 6, 10
    cfg = GRU4RecConfig(
        layers=[16] * n_layers, batch_size=B, n_sample=n_neg, final_act="elu-1",
        item_pad_multiple=8, dropout_p_hidden=0.0, dropout_p_embed=0.0,
        compute_dtype="float32",  # bit-exact parity against the f32 oracle
        **mode_kwargs
    )
    params = gru.init_params(cfg, n_items)
    rng = np.random.RandomState(0)
    X = rng.randint(0, n_items, B)
    Y = rng.randint(0, n_items, B)
    neg = rng.randint(0, n_items, n_neg)
    H = [rng.randn(B, 16).astype(np.float32) * 0.1 for _ in range(n_layers)]

    import jax.numpy as jnp

    Yfull = np.concatenate([Y, neg])
    if cfg.constrained_embedding:
        srows = {
            "WyS": jnp.asarray(np.asarray(params["Wy"])[np.concatenate([X, Yfull])]),
        }
    elif cfg.embedding:
        srows = {
            "E": jnp.asarray(np.asarray(params["E"])[X]),
            "Wy": jnp.asarray(np.asarray(params["Wy"])[Yfull]),
        }
    else:
        srows = {
            "Wx0": jnp.asarray(np.asarray(params["Wx"][0])[X]),
            "Wy": jnp.asarray(np.asarray(params["Wy"])[Yfull]),
        }
    H_new, yhat = gru.forward(
        params, srows, [jnp.asarray(h) for h in H], cfg, M=B, training=False,
    )
    Hn_o, yhat_o = oracle_forward(params, H, X, Y, cfg, n_items, neg=neg)
    np.testing.assert_allclose(np.asarray(yhat), yhat_o, rtol=2e-5, atol=2e-5)
    for a, b in zip(H_new, Hn_o):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=2e-5)


def test_forward_softmax_final_act():
    cfg = GRU4RecConfig(layers=[8], batch_size=4, n_sample=6, final_act="softmax",
                        item_pad_multiple=8)
    n_items = 20
    params = gru.init_params(cfg, n_items)
    rng = np.random.RandomState(1)
    X = rng.randint(0, n_items, 4)
    Yfull = rng.randint(0, n_items, 10)
    import jax.numpy as jnp

    srows = {
        "Wx0": jnp.asarray(np.asarray(params["Wx"][0])[X]),
        "Wy": jnp.asarray(np.asarray(params["Wy"])[Yfull]),
    }
    H = [jnp.zeros((4, 8))]
    _, yhat = gru.forward(params, srows, H, cfg, M=4, training=False)
    s = np.asarray(yhat).sum(axis=1)
    np.testing.assert_allclose(s, np.ones(4), rtol=1e-5)
