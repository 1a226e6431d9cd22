"""Rank computation with the four tie-break modes of the reference evaluator.

Reference: evaluation.py:62-66. ``others`` are the scores the target competes
against (may include the target's own score — self-comparisons are strict and
contribute nothing under 'standard'); ``target`` is the positive item's score
per row. Returns float ranks (median mode is fractional).
"""

from __future__ import annotations

import jax.numpy as jnp

TIE_MODES = ("standard", "conservative", "median", "tiebreaking")


def ranks_from_counts(gt, ge_or_eq, mode: str):
    """Rank from per-row comparison counts — the shared formula for the
    local evaluator and the distributed one (whose counts are psum-reduced
    across table shards before calling this).

    ``gt`` is the greater-than count; the second argument is the
    greater-or-equal count for 'conservative' and the equal count for
    'median' (unused otherwise, may be None).
    """
    if mode == "conservative":
        return ge_or_eq.astype(jnp.float32)
    if mode == "median":
        return (gt + 0.5 * (ge_or_eq - 1) + 1).astype(jnp.float32)
    if mode in ("standard", "tiebreaking"):
        # 'tiebreaking' expects the caller to have dithered the scores
        return (gt + 1).astype(jnp.float32)
    raise NotImplementedError(f"Unknown tie mode: {mode!r}")


def compute_ranks(others, target, mode: str):
    """ranks[i] of target[i] among others[i, :] under the given tie mode."""
    t = target[:, None]
    gt = jnp.sum(others > t, axis=1)
    second = None
    if mode == "conservative":
        second = jnp.sum(others >= t, axis=1)
    elif mode == "median":
        second = jnp.sum(others == t, axis=1)
    return ranks_from_counts(gt, second, mode)
