"""Exact oracle tests for the four tie-break rank modes (reference:
evaluation.py:62-66) on engineered score ties."""

import numpy as np
import jax.numpy as jnp

from gru4rec_tpu.ops.ranking import compute_ranks


def test_rank_modes_on_engineered_ties():
    # row 0: target 5.0; others contain the target itself (self-comparison),
    #        two larger, two equal (besides self), three smaller
    # row 1: unique maximum -> rank 1 in every mode
    others = jnp.asarray(np.array([
        [7.0, 6.0, 5.0, 5.0, 5.0, 4.0, 3.0, 2.0],
        [9.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    ], np.float32))
    target = jnp.asarray(np.array([5.0, 9.0], np.float32))

    # standard: strictly-greater + 1
    np.testing.assert_array_equal(
        np.asarray(compute_ranks(others, target, "standard")), [3.0, 1.0])
    # conservative: greater-or-equal (self included)
    np.testing.assert_array_equal(
        np.asarray(compute_ranks(others, target, "conservative")), [5.0, 1.0])
    # median: greater + half the non-self ties + 1
    np.testing.assert_array_equal(
        np.asarray(compute_ranks(others, target, "median")), [4.0, 1.0])
    # tiebreaking reduces to standard once the caller has dithered the scores
    np.testing.assert_array_equal(
        np.asarray(compute_ranks(others, target, "tiebreaking")), [3.0, 1.0])


def test_rank_invariant_classification():
    """Strictly increasing activations admit pre-activation ranking; tie
    creators (relu and zero-parameter leaky/elu/selu) do not."""
    from gru4rec_tpu.ops.activations import rank_invariant

    for name in ("linear", "tanh", "sigmoid", "softmax", "softmax_logit",
                 "leaky-0.01", "elu-0.5", "elu-1.0", "selu-1.05-1.67"):
        assert rank_invariant(name), name
    for name in ("relu", "leaky-0", "elu-0", "selu-0-1", "selu-1.0-0",
                 "selu-1.0", "leaky--0.1", "not-a-real-act"):
        assert not rank_invariant(name), name


def test_rank_modes_agree_without_ties():
    # as in the real evaluator, `others` includes the target's own score;
    # with all scores distinct every mode must agree
    rng = np.random.RandomState(0)
    others = rng.permutation(100).astype(np.float32).reshape(4, 25)
    target = others[:, 0]  # self-comparison present
    expected = (others > target[:, None]).sum(axis=1) + 1
    for mode in ("standard", "conservative", "median", "tiebreaking"):
        r = np.asarray(compute_ranks(jnp.asarray(others), jnp.asarray(target), mode))
        np.testing.assert_array_equal(r, expected.astype(np.float32), err_msg=mode)
