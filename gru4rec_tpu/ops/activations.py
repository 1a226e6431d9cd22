"""Activation registry with the reference's string-parameterized grammar.

Supports: linear, tanh, relu, sigmoid, softmax, softmax_logit, and the
parameterized ``leaky-<X>``, ``elu-<X>``, ``selu-<X>-<Y>`` names whose
parameters are parsed out of the string (reference: gru4rec.py:144-161,
188-223).

Softmax-family activations take an optional column-validity mask so that
masked (dead) lanes are excluded from the normalization — the TPU build keeps
batch shapes static and masks lanes instead of shrinking the batch.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

NEG_INF = -1e30


def masked_softmax(x, col_valid=None, axis=-1):
    """Numerically-stable softmax excluding masked columns (reference softmax: gru4rec.py:193-195)."""
    if col_valid is not None:
        x = jnp.where(col_valid, x, NEG_INF)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e_x = jnp.exp(x)
    if col_valid is not None:
        e_x = jnp.where(col_valid, e_x, 0.0)
    return e_x / jnp.sum(e_x, axis=axis, keepdims=True)


def masked_softmax_logit(x, col_valid=None, axis=-1):
    """-log softmax(x) (reference softmax_logit: gru4rec.py:196-198)."""
    if col_valid is not None:
        x = jnp.where(col_valid, x, NEG_INF)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e_x = jnp.exp(x)
    if col_valid is not None:
        e_x = jnp.where(col_valid, e_x, 0.0)
    return jnp.log(jnp.sum(e_x, axis=axis, keepdims=True)) - x


def softmax_neg(x, col_valid=None, diag_offset=0):
    """Softmax over each row's *negatives*: the entry holding the row's own
    positive is masked out (reference softmax_neg: gru4rec.py:199-203).
    2D input only; under data-parallel sharding the positive of local row i
    sits at column i + diag_offset."""
    import jax

    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    hm = (cols != rows + diag_offset).astype(x.dtype)
    if col_valid is not None:
        hm = hm * col_valid.astype(x.dtype)
    x = x * hm
    e_x = jnp.exp(x - jnp.max(x, axis=1, keepdims=True)) * hm
    return e_x / jnp.sum(e_x, axis=1, keepdims=True)


def _linear(x, col_valid=None):
    return x


def _tanh(x, col_valid=None):
    return jnp.tanh(x)


def _relu(x, col_valid=None):
    return jnp.maximum(x, 0)


def _sigmoid(x, col_valid=None):
    return 1.0 / (1.0 + jnp.exp(-x))


def _leaky(leak, x, col_valid=None):
    return jnp.where(x >= 0, x, leak * x)


def _elu(alpha, x, col_valid=None):
    return jnp.where(x >= 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def _selu(lmbd, alpha, x, col_valid=None):
    return lmbd * jnp.where(x >= 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def rank_invariant(name: str) -> bool:
    """True when the activation is strictly increasing per element, i.e.
    ranking on PRE-activation scores provably yields the same ranks (and the
    same ties, for the conservative/median modes) as ranking on activated
    scores. Softmax-family activations qualify row-wise: the shared
    max-subtraction/normalization preserves within-row order, and eval swaps
    ``softmax_logit`` for ``softmax`` anyway (models/gru.py predict path).

    Used by the compiled evaluators to skip the activation over the
    (batch, n_items) score matrix — at Rees46 scale the softmax normalize +
    mask passes cost more device time than the scoring matmul itself
    (PERF_NOTES round-5 eval profile). Activations that CREATE ties (relu;
    leaky/elu/selu with a zero parameter) return False and keep the
    activated ranking path.
    """
    if name in ("linear", "tanh", "sigmoid", "softmax", "softmax_logit"):
        return True
    try:
        if name.startswith("leaky-"):
            return float(name.split("-")[1]) > 0
        if name.startswith("elu-"):
            return float(name.split("-")[1]) > 0
        if name.startswith("selu-"):
            parts = [float(x) for x in name.split("-")[1:]]
            return len(parts) == 2 and parts[0] > 0 and parts[1] > 0
    except ValueError:
        return False
    return False


def get_activation(name: str):
    """Resolve an activation by its (possibly parameterized) string name."""
    if name == "linear":
        return _linear
    if name == "tanh":
        return _tanh
    if name == "relu":
        return _relu
    if name == "sigmoid":
        return _sigmoid
    if name == "softmax":
        return masked_softmax
    if name == "softmax_logit":
        return masked_softmax_logit
    if name.startswith("leaky-"):
        return partial(_leaky, float(name.split("-")[1]))
    if name.startswith("elu-"):
        return partial(_elu, float(name.split("-")[1]))
    if name.startswith("selu-"):
        parts = [float(x) for x in name.split("-")[1:]]
        return partial(_selu, *parts)
    raise NotImplementedError(f"Unknown activation: {name!r}")
