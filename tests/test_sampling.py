"""Negative-sampler distribution tests: the alias method must draw from the
same pop^alpha distribution as the reference's inverse-CDF scheme."""

import jax
import jax.numpy as jnp
import numpy as np

from gru4rec_tpu.ops.sampling import (build_alias_table, popularity_cdf,
                                      sample_negatives, sample_negatives_alias)


def test_alias_matches_target_distribution():
    rng = np.random.RandomState(0)
    n_items = 50
    pop = rng.randint(1, 200, n_items)
    alpha = 0.75
    p_target = pop.astype(np.float64) ** alpha
    p_target /= p_target.sum()

    tbl = build_alias_table(pop, alpha)
    draws = np.asarray(
        sample_negatives_alias(jax.random.PRNGKey(0), tbl, 200, 1000)
    ).ravel()
    emp = np.bincount(draws, minlength=n_items) / len(draws)
    # chi-square-ish: relative error small for well-supported items
    np.testing.assert_allclose(emp, p_target, atol=0.004)


def test_searchsorted_matches_target_distribution():
    rng = np.random.RandomState(1)
    n_items = 50
    pop = rng.randint(1, 200, n_items)
    alpha = 0.5
    p_target = pop.astype(np.float64) ** alpha
    p_target /= p_target.sum()
    cdf = jnp.asarray(popularity_cdf(pop, alpha))
    draws = np.asarray(
        sample_negatives(jax.random.PRNGKey(0), cdf, 200, 1000, n_items, alpha)
    ).ravel()
    emp = np.bincount(draws, minlength=n_items) / len(draws)
    np.testing.assert_allclose(emp, p_target, atol=0.004)


def test_alias_probabilities_are_exact():
    """Alias tables encode the target pmf exactly: sum over slots of the
    mass routed to each item equals pop^alpha / sum."""
    rng = np.random.RandomState(2)
    n_items = 64
    pop = rng.randint(1, 100, n_items)
    alpha = 0.6
    tbl = build_alias_table(pop, alpha)
    prob = np.asarray(tbl.prob, dtype=np.float64)
    alias = np.asarray(tbl.alias)
    mass = prob / n_items
    np.add.at(mass, alias, (1.0 - prob) / n_items)
    p_target = pop.astype(np.float64) ** alpha
    p_target /= p_target.sum()
    np.testing.assert_allclose(mass, p_target, rtol=1e-5)
