"""Rank computation with the four tie-break modes of the reference evaluator.

Reference: evaluation.py:62-66. ``others`` are the scores the target competes
against (may include the target's own score — self-comparisons are strict and
contribute nothing under 'standard'); ``target`` is the positive item's score
per row. Returns float ranks (median mode is fractional).
"""

from __future__ import annotations

import jax.numpy as jnp

TIE_MODES = ("standard", "conservative", "median", "tiebreaking")


def compute_ranks(others, target, mode: str):
    """ranks[i] of target[i] among others[i, :] under the given tie mode."""
    t = target[:, None]
    if mode == "conservative":
        return jnp.sum(others >= t, axis=1).astype(jnp.float32)
    if mode == "median":
        return (
            jnp.sum(others > t, axis=1)
            + 0.5 * (jnp.sum(others == t, axis=1) - 1)
            + 1
        ).astype(jnp.float32)
    if mode in ("standard", "tiebreaking"):
        # 'tiebreaking' expects the caller to have added tiny noise to the scores
        return (jnp.sum(others > t, axis=1) + 1).astype(jnp.float32)
    raise NotImplementedError(f"Unknown tie mode: {mode!r}")
