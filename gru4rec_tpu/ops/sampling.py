"""Popularity^alpha negative sampling, fully on-device.

The reference keeps a device-resident sample store refilled by a dedicated
compiled function (uniform draws + a custom CUDA binary-search kernel,
gru4rec.py:542-566, custom_theano_ops.py:275-407). On TPU the equivalent is
simply in-graph ``jax.random.uniform`` + ``jnp.searchsorted`` (XLA-native,
vectorized) executed once per scan chunk — the store and its cursor become
data flowing through the step scan, with no host involvement at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def popularity_cdf(pop_counts: np.ndarray, sample_alpha: float) -> np.ndarray:
    """Cumulative pop^alpha distribution over dense item ids (gru4rec.py:543-545)."""
    pop = pop_counts.astype(np.float64) ** sample_alpha
    cdf = np.cumsum(pop) / pop.sum()
    cdf[-1] = 1.0
    return cdf.astype(np.float32)


def sample_negatives(key, cdf, n_steps: int, n_sample: int, n_items: int,
                     sample_alpha: float):
    """Draw a (n_steps, n_sample) block of negative item ids on device.

    ``sample_alpha == 0`` degenerates to uniform sampling, matching the
    reference's fast path (gru4rec.py:507-511).
    """
    if sample_alpha == 0.0:
        return jax.random.randint(key, (n_steps, n_sample), 0, n_items, dtype=jnp.int32)
    u = jax.random.uniform(key, (n_steps * n_sample,), dtype=jnp.float32)
    idx = jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, n_items - 1)
    return idx.reshape(n_steps, n_sample)
