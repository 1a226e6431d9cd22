"""The six ranking losses of GRU4Rec, with static-shape lane masking.

Reference: gru4rec.py:225-248. All losses consume a score matrix
``yhat (B, B + n_sample)`` whose *diagonal* holds each row's positive item
score (the reference's diagonal trick, served there by a custom CUDA diag
kernel — here a plain gather; XLA fuses it). They return the *sum* over valid
rows; the caller divides by the static batch size exactly like the reference
(gru4rec.py:577 divides by ``batch_size`` even when fewer lanes are alive).

Masking: the TPU build keeps ``B`` static and masks dead lanes. ``row_valid``
removes dead rows from the sum; ``col_valid`` (= concat(row_valid,
ones(n_sample))) removes dead lanes' targets from every within-batch negative
term, so the math is identical to the reference's shrunken batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gru4rec_tpu.ops.activations import softmax_neg

_EPS = 1e-24


def _diag(yhat, offset=0):
    """Each row's positive score. Under data-parallel sharding the local
    score block's positives sit at column ``row + offset`` (offset =
    data_shard_index * local_batch).

    Mask-reduce instead of gather: the gather's gradient is a row scatter-add
    (~10us/step on v5e), while the mask's gradient fuses into the surrounding
    elementwise ops for free."""
    b = yhat.shape[0]
    mask = jnp.arange(yhat.shape[1])[None, :] == (jnp.arange(b) + offset)[:, None]
    return jnp.sum(jnp.where(mask, yhat, 0.0), axis=1)


def _sanitize(yhat, row_valid, col_valid):
    mask2d = row_valid[:, None] & col_valid[None, :]
    return jnp.where(mask2d, yhat, 0.0), mask2d


def get_loss(loss: str, n_sample: int, smoothing: float = 0.0, bpreg: float = 1.0):
    """Resolve a loss by name (reference: set_loss_function, gru4rec.py:136-143).

    Returns ``fn(yhat, M, row_valid, col_valid) -> scalar`` where ``M`` is the
    (traced) number of valid rows.
    """
    if loss == "cross-entropy":

        def cross_entropy(yhat, M, row_valid, col_valid, diag_offset=0):
            yhat, mask2d = _sanitize(yhat, row_valid, col_valid)
            d = _diag(yhat, diag_offset)
            core = -jnp.log(d + _EPS)
            if smoothing:
                n_out = M + n_sample
                colsum = jnp.sum(jnp.where(mask2d, -jnp.log(yhat + _EPS), 0.0), axis=1)
                per_row = (1.0 - (n_out / (n_out - 1)) * smoothing) * core + (
                    smoothing / (n_out - 1)
                ) * colsum
            else:
                per_row = core
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return cross_entropy

    if loss == "xe_logit":
        # Expects yhat = softmax_logit output, i.e. -log softmax (gru4rec.py:231-236).
        def cross_entropy_logits(yhat, M, row_valid, col_valid, diag_offset=0):
            mask2d = row_valid[:, None] & col_valid[None, :]
            d = _diag(jnp.where(mask2d, yhat, 0.0), diag_offset)
            if smoothing:
                n_out = M + n_sample
                colsum = jnp.sum(jnp.where(mask2d, yhat, 0.0), axis=1)
                per_row = (1.0 - (n_out / (n_out - 1)) * smoothing) * d + (
                    smoothing / (n_out - 1)
                ) * colsum
            else:
                per_row = d
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return cross_entropy_logits

    if loss == "bpr":

        def bpr(yhat, M, row_valid, col_valid, diag_offset=0):
            yhat, mask2d = _sanitize(yhat, row_valid, col_valid)
            d = _diag(yhat, diag_offset)[:, None]
            term = -jnp.log(jax.nn.sigmoid(d - yhat))
            per_row = jnp.sum(jnp.where(mask2d, term, 0.0), axis=1)
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return bpr

    if loss == "bpr-max":

        def bpr_max(yhat, M, row_valid, col_valid, diag_offset=0):
            yhat, mask2d = _sanitize(yhat, row_valid, col_valid)
            ss = softmax_neg(yhat, col_valid, diag_offset)  # zeroes positives and dead columns
            d = _diag(yhat, diag_offset)[:, None]
            pairwise = jax.nn.sigmoid(d - yhat) * ss
            per_row = -jnp.log(jnp.sum(pairwise, axis=1) + _EPS) + bpreg * jnp.sum(
                (yhat**2) * ss, axis=1
            )
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return bpr_max

    if loss == "top1":

        def top1(yhat, M, row_valid, col_valid, diag_offset=0):
            # DELIBERATE DIVERGENCE from the reference (gru4rec.py:242-244):
            # there, the (M,)-shaped row means minus the broadcastable
            # (M,1) self-penalty broadcast to an (M,M) matrix before T.sum,
            # silently multiplying the whole top1 cost AND its gradients by
            # M — a broadcasting accident, not the published TOP1 loss.
            # This is the intended 1-D form (paper eq. per-sample mean);
            # tests/test_losses.py pins the exact xM relationship. To
            # replicate a reference-tuned top1 run, scale learning_rate by
            # ~batch_size.
            yhat, mask2d = _sanitize(yhat, row_valid, col_valid)
            d = _diag(yhat, diag_offset)[:, None]
            n_cols = M + n_sample  # valid column count (traced scalar)
            term = jax.nn.sigmoid(-d + yhat) + jax.nn.sigmoid(yhat**2)
            per_row = (
                jnp.sum(jnp.where(mask2d, term, 0.0), axis=1) / n_cols
                - jax.nn.sigmoid(d[:, 0] ** 2) / n_cols
            )
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return top1

    if loss == "top1-max":

        def top1_max(yhat, M, row_valid, col_valid, diag_offset=0):
            yhat, mask2d = _sanitize(yhat, row_valid, col_valid)
            ss = softmax_neg(yhat, col_valid, diag_offset)
            d = _diag(yhat, diag_offset)[:, None]
            term = ss * (jax.nn.sigmoid(-d + yhat) + jax.nn.sigmoid(yhat**2))
            per_row = jnp.sum(term, axis=1)
            return jnp.sum(jnp.where(row_valid, per_row, 0.0)).astype(jnp.float32)

        return top1_max

    raise NotImplementedError(f"Unknown loss: {loss!r}")
