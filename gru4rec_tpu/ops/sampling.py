"""Popularity^alpha negative sampling, fully on-device.

The reference keeps a device-resident sample store refilled by a dedicated
compiled function (uniform draws + a custom CUDA binary-search kernel,
gru4rec.py:542-566, custom_theano_ops.py:275-407). The first TPU equivalent
— in-graph ``jnp.searchsorted`` — turned out to dominate the step time (XLA
lowers it to a 16-iteration gather loop over the whole query block), so the
default sampler here is the **alias method** (Walker/Vose): O(1) per sample
— one table gather, one compare, one select — drawing from *exactly* the
same pop^alpha distribution. The searchsorted path is kept as a fallback and
as the differential-test oracle (``sampler='searchsorted'``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def popularity_cdf(pop_counts: np.ndarray, sample_alpha: float) -> np.ndarray:
    """Cumulative pop^alpha distribution over dense item ids (gru4rec.py:543-545)."""
    pop = pop_counts.astype(np.float64) ** sample_alpha
    cdf = np.cumsum(pop) / pop.sum()
    cdf[-1] = 1.0
    return cdf.astype(np.float32)


class AliasTable(NamedTuple):
    """Vose alias tables for O(1) categorical sampling.

    ``prob`` (f32, bitcast to int32) and ``alias`` (int32) are packed side by
    side into one (n, 2) int32 array so each sample costs ONE row gather
    instead of two scalar gathers (the two-gather form was ~30us/step at
    n_sample=2048 on v5e; packing halves it)."""

    packed: jnp.ndarray  # (n, 2) int32: [:, 0] = prob f32 bits, [:, 1] = alias

    @property
    def prob(self):
        return jax.lax.bitcast_convert_type(self.packed[:, 0], jnp.float32)

    @property
    def alias(self):
        return self.packed[:, 1]


def build_alias_table(pop_counts: np.ndarray, sample_alpha: float) -> AliasTable:
    """Vose's O(n) alias-table construction for the pop^alpha distribution."""
    w = pop_counts.astype(np.float64) ** sample_alpha
    n = len(w)
    p = w * (n / w.sum())
    prob = np.ones(n, dtype=np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    # leftovers are 1.0 due to float error
    packed = np.stack(
        [prob.astype(np.float32).view(np.int32), alias.astype(np.int32)], axis=1
    )
    return AliasTable(jnp.asarray(packed))


def sample_negatives_alias(key, table: AliasTable, n_steps: int, n_sample: int):
    """Draw a (n_steps, n_sample) block via the alias method (one row gather)."""
    n = table.packed.shape[0]
    k1, k2 = jax.random.split(key)
    slot = jax.random.randint(k1, (n_steps * n_sample,), 0, n, dtype=jnp.int32)
    u = jax.random.uniform(k2, (n_steps * n_sample,), dtype=jnp.float32)
    rows = jnp.take(table.packed, slot, axis=0)
    prob = jax.lax.bitcast_convert_type(rows[:, 0], jnp.float32)
    accept = u < prob
    idx = jnp.where(accept, slot, rows[:, 1])
    return idx.reshape(n_steps, n_sample)


def sample_negatives(key, cdf, n_steps: int, n_sample: int, n_items: int,
                     sample_alpha: float):
    """Inverse-CDF sampling via searchsorted (the reference's scheme,
    gru4rec.py:555-566). Kept as the oracle/fallback; slow on TPU.

    ``sample_alpha == 0`` degenerates to uniform sampling, matching the
    reference's fast path (gru4rec.py:507-511).
    """
    if sample_alpha == 0.0:
        return jax.random.randint(key, (n_steps, n_sample), 0, n_items, dtype=jnp.int32)
    u = jax.random.uniform(key, (n_steps * n_sample,), dtype=jnp.float32)
    idx = jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, n_items - 1)
    return idx.reshape(n_steps, n_sample)


def draw_negatives(key, samp1, n_steps: int, n_sample: int, n_items: int,
                   sample_alpha: float, sampler: str):
    """The per-chunk negative draw: ONE dispatch over (sample_alpha,
    sampler) shared by the single-chip and distributed train steps.
    ``samp1`` is the packed alias table for ``sampler="alias"``, the CDF
    otherwise (ignored when ``sample_alpha == 0`` — uniform fast path,
    reference gru4rec.py:507-511)."""
    if sample_alpha == 0.0:
        return jax.random.randint(key, (n_steps, n_sample), 0, n_items,
                                  dtype=jnp.int32)
    if sampler == "alias":
        return sample_negatives_alias(key, AliasTable(samp1), n_steps, n_sample)
    return sample_negatives(key, samp1, n_steps, n_sample, n_items,
                            sample_alpha)
