"""Bootstrap resampling and split support."""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.sankoff import sankoff_score
from trex_tpu.search.bootstrap import (
    bootstrap_analysis,
    bootstrap_scores,
    bootstrap_site_weights,
    split_support,
    subtree_leaf_sets,
)
from trex_tpu.topology import balanced_topology, random_topologies
from trex_tpu.types import CostModel


def test_weights_are_multinomial():
    w = bootstrap_site_weights(jax.random.PRNGKey(0), 50, 8)
    assert w.shape == (8, 50)
    np.testing.assert_array_equal(np.asarray(w.sum(axis=1)), np.full(8, 50))
    assert int(w.min()) >= 0


def test_all_ones_weights_reproduce_plain_score():
    topo = balanced_topology(8)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (8, 40), 0, 4)
    cost = CostModel.hamming(4).matrix
    plain = float(sankoff_score(topo, cost, leaf))
    ones = jnp.ones((3, 40), jnp.int32)
    for use_fitch in (True, False):
        scores = bootstrap_scores(topo, cost, leaf, ones, use_fitch=use_fitch)
        np.testing.assert_allclose(np.asarray(scores), plain)


def test_weighted_score_equals_resampled_alignment():
    """Weighting sites == physically duplicating them."""
    topo = balanced_topology(4)
    cost = CostModel.hamming(4).matrix
    leaf = jax.random.randint(jax.random.PRNGKey(2), (4, 10), 0, 4)
    w = bootstrap_site_weights(jax.random.PRNGKey(3), 10, 1)[0]
    weighted = float(
        sankoff_score(topo, cost, leaf, site_mask=w.astype(jnp.float32))
    )
    resampled = np.repeat(np.asarray(leaf), np.asarray(w), axis=1)
    physical = float(sankoff_score(topo, cost, jnp.asarray(resampled)))
    assert weighted == physical


def test_subtree_leaf_sets():
    topo = balanced_topology(4)
    sets = subtree_leaf_sets(topo)
    assert sets[0] == {0, 1}
    assert sets[1] == {2, 3}
    assert sets[2] == {0, 1, 2, 3}


def test_split_support_self_is_one():
    topo = balanced_topology(8)
    support = split_support(topo, [topo, topo, topo])
    np.testing.assert_array_equal(support, np.ones(7))


def test_split_support_discriminates():
    ref = balanced_topology(8)
    others = [
        jax.tree_util.tree_map(lambda x: x[b], random_topologies(jax.random.PRNGKey(4), 8, 4))
        for b in range(4)
    ]
    support = split_support(ref, others)
    assert support.shape == (7,)
    assert support[-1] == 1.0  # root split always present
    assert support.min() < 1.0


def test_bootstrap_analysis_on_clean_signal():
    """Strongly tree-like data should give high support for the true tree."""
    gt = generate_groundtruth(8, 4, 4, 80, seed=5)
    leaf = gt.all_sequences[:8].astype(jnp.int32)
    cost = CostModel.hamming(4).matrix
    support, best = bootstrap_analysis(
        jax.random.PRNGKey(6),
        balanced_topology(8),
        cost,
        leaf,
        n_replicates=8,
        search_rounds=5,
    )
    assert support.shape == (7,)
    assert support.mean() > 0.5


def test_bootstrap_log_likelihoods():
    from trex_tpu.search.bootstrap import bootstrap_log_likelihoods

    topo = balanced_topology(8)
    leaf = jax.random.randint(jax.random.PRNGKey(7), (8, 40), 0, 4)
    blens = jnp.full((15,), 0.3)
    weights = bootstrap_site_weights(jax.random.PRNGKey(8), 40, 5).astype(
        jnp.float32
    )
    lls = bootstrap_log_likelihoods(topo, blens, leaf, 4, weights)
    assert lls.shape == (5,)
    assert bool(jnp.all(jnp.isfinite(lls)))
    # All-ones weights reproduce the plain log-likelihood.
    from trex_tpu.ops.likelihood import tree_log_likelihood

    ones = jnp.ones((1, 40), jnp.float32)
    plain = float(tree_log_likelihood(topo, blens, leaf, 4))
    np.testing.assert_allclose(
        float(bootstrap_log_likelihoods(topo, blens, leaf, 4, ones)[0]),
        plain, rtol=1e-6,
    )
