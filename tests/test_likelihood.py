"""Felsenstein pruning likelihood: oracles, gradients, ML optimization."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.likelihood import (
    batched_tree_log_likelihood,
    jc69_transition,
    optimize_branch_lengths,
    tree_log_likelihood,
)
from trex_tpu.topology import balanced_topology, random_topologies


def test_jc69_properties():
    for q in (2, 4, 20):
        for t in (0.01, 0.5, 5.0):
            p = np.asarray(jc69_transition(jnp.asarray(t), q))
            np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-6)
            assert (p >= 0).all()
    # t -> 0: identity; t -> inf: uniform.
    np.testing.assert_allclose(
        np.asarray(jc69_transition(jnp.asarray(0.0), 4)), np.eye(4), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jc69_transition(jnp.asarray(50.0), 4)),
        np.full((4, 4), 0.25),
        atol=1e-4,
    )


def brute_force_loglik(children, blens, leaf_seqs, q):
    """Enumerate ancestor states exactly (oracle for tiny trees)."""
    n_anc = len(children)
    n_leaves = leaf_seqs.shape[0]
    mats = [np.asarray(jc69_transition(jnp.asarray(t), q)) for t in blens]
    total = 0.0
    for site in range(leaf_seqs.shape[1]):
        lik = 0.0
        for labels in itertools.product(range(q), repeat=n_anc):
            full = list(leaf_seqs[:, site]) + list(labels)
            p = 1.0 / q  # root prior
            for a in range(n_anc):
                parent_state = full[n_leaves + a]
                for c in children[a]:
                    p *= mats[c][parent_state, full[c]]
            lik += p
        total += np.log(lik)
    return total


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 6), (4, 2, 8)])
def test_matches_brute_force(n_leaves, q, length):
    topo = balanced_topology(n_leaves)
    key = jax.random.PRNGKey(0)
    leaf = jax.random.randint(key, (n_leaves, length), 0, q)
    blens = jnp.asarray(
        np.random.default_rng(1).uniform(0.05, 1.0, 2 * n_leaves - 1)
    )
    got = float(tree_log_likelihood(topo, blens, leaf, q))
    want = brute_force_loglik(
        np.asarray(topo.children), np.asarray(blens), np.asarray(leaf), q
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_gradient_flows_and_is_finite():
    topo = balanced_topology(8)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (8, 50), 0, 4)
    blens = jnp.full((15,), 0.2)
    grad = jax.grad(
        lambda b: tree_log_likelihood(topo, b, leaf, 4)
    )(blens)
    assert grad.shape == (15,)
    assert bool(jnp.all(jnp.isfinite(grad)))


def test_optimize_branch_lengths_improves():
    gt = generate_groundtruth(8, 4, 3, 100, seed=3)
    leaf = gt.all_sequences[:8].astype(jnp.int32)
    topo = balanced_topology(8)
    lengths, losses = optimize_branch_lengths(
        topo, leaf, 4, n_iterations=300
    )
    assert float(losses[-1]) < float(losses[0])
    assert bool(jnp.all(lengths > 0))
    # The true generating tree should fit better than a wrong random one
    # after the same optimization budget.
    wrong = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(9), 8, 1)
    )
    _, losses_wrong = optimize_branch_lengths(wrong, leaf, 4, n_iterations=300)
    assert float(losses[-1]) < float(losses_wrong[-1])


def test_batched_likelihood():
    topos = random_topologies(jax.random.PRNGKey(2), 8, 4)
    leaf = jax.random.randint(jax.random.PRNGKey(3), (8, 30), 0, 4)
    blens = jnp.full((4, 15), 0.3)
    lls = batched_tree_log_likelihood(topos, blens, leaf, 4)
    assert lls.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(lls)))
    assert bool(jnp.all(lls < 0))


def test_underflow_scaling_long_alignment():
    """1e4 sites would underflow without per-node scaling."""
    topo = balanced_topology(16)
    leaf = jax.random.randint(jax.random.PRNGKey(4), (16, 10000), 0, 4)
    ll = tree_log_likelihood(topo, jnp.full((31,), 0.4), leaf, 4)
    assert bool(jnp.isfinite(ll))
    assert float(ll) < -1e4  # large negative, not -inf/nan


def test_gtr_uniform_equals_jc69():
    topo = balanced_topology(4)
    leaf = jax.random.randint(jax.random.PRNGKey(5), (4, 20), 0, 4)
    blens = jnp.asarray(np.random.default_rng(6).uniform(0.05, 0.8, 7))
    jc = float(tree_log_likelihood(topo, blens, leaf, 4))
    gtr = float(
        tree_log_likelihood(
            topo, blens, leaf, 4,
            rates=jnp.ones((4, 4)), freqs=jnp.full((4,), 0.25),
        )
    )
    assert gtr == pytest.approx(jc, rel=1e-5)


def test_gtr_transition_rows_stochastic():
    from trex_tpu.ops.likelihood import gtr_eigensystem, gtr_transition

    rng = np.random.default_rng(7)
    rates = np.abs(rng.normal(1.0, 0.3, (4, 4)))
    rates = (rates + rates.T) / 2
    freqs = rng.dirichlet(np.ones(4))
    ev, left, right = gtr_eigensystem(jnp.asarray(rates), jnp.asarray(freqs))
    for t in (0.01, 0.3, 2.0):
        p = np.asarray(gtr_transition(jnp.asarray(t), ev, left, right))
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
        assert (p >= -1e-7).all()
    # Stationarity: pi P(t) == pi.
    p = np.asarray(gtr_transition(jnp.asarray(0.7), ev, left, right))
    np.testing.assert_allclose(freqs @ p, freqs, atol=1e-6)


def test_gtr_brute_force_parity():
    from trex_tpu.ops.likelihood import gtr_eigensystem, gtr_transition

    rng = np.random.default_rng(8)
    q, n_leaves, length = 3, 4, 5
    rates = np.abs(rng.normal(1.0, 0.4, (q, q)))
    rates = (rates + rates.T) / 2
    freqs = rng.dirichlet(np.ones(q))
    topo = balanced_topology(n_leaves)
    leaf = jax.random.randint(jax.random.PRNGKey(9), (n_leaves, length), 0, q)
    blens = rng.uniform(0.05, 1.0, 2 * n_leaves - 1)
    got = float(
        tree_log_likelihood(
            topo, jnp.asarray(blens), leaf, q,
            rates=jnp.asarray(rates), freqs=jnp.asarray(freqs),
        )
    )
    ev, left, right = gtr_eigensystem(jnp.asarray(rates), jnp.asarray(freqs))
    mats = [
        np.asarray(gtr_transition(jnp.asarray(t), ev, left, right))
        for t in blens
    ]
    children = np.asarray(topo.children)
    total = 0.0
    for site in range(length):
        lik = 0.0
        for labels in itertools.product(range(q), repeat=n_leaves - 1):
            full = list(np.asarray(leaf)[:, site]) + list(labels)
            p = freqs[full[-1]]
            for a in range(n_leaves - 1):
                for c in children[a]:
                    p *= mats[c][full[n_leaves + a], full[c]]
            lik += p
        total += np.log(lik)
    assert got == pytest.approx(total, rel=1e-5)


def test_ml_hill_climb_recovers_structure():
    from trex_tpu.io import sample_topologies
    from trex_tpu.search.ml import ml_hill_climb
    from trex_tpu.search.ratchet import robinson_foulds

    gt = generate_groundtruth(8, 4, 4, 120, seed=13)
    leaf = gt.all_sequences[:8].astype(jnp.int32)
    start = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(21, 8, 1)
    )
    result, lengths, losses = ml_hill_climb(
        start, leaf, 4, max_rounds=30, n_length_iterations=200
    )
    # Likelihood improved over the random start and lengths optimized.
    assert result.score <= result.trace[0]
    assert float(losses[-1]) < float(losses[0])
    assert bool(jnp.all(lengths > 0))
    # Should land close (in RF) to the generating balanced tree.
    truth = balanced_topology(8)
    start_rf = robinson_foulds(start, truth)
    final_rf = robinson_foulds(result.topology, truth)
    assert final_rf <= start_rf


def test_gamma_rates_properties():
    from trex_tpu.ops.likelihood import discrete_gamma_rates

    for shape in (0.3, 1.0, 5.0):
        r = np.asarray(discrete_gamma_rates(shape, 4))
        assert r.shape == (4,)
        assert (r > 0).all()
        assert np.isclose(r.mean(), 1.0, rtol=1e-6)
        assert (np.diff(r) > 0).all()  # increasing categories
    # Large shape -> nearly homogeneous rates.
    r = np.asarray(discrete_gamma_rates(200.0, 4))
    assert r.max() - r.min() < 0.3


def test_gamma_likelihood_vs_manual_mixture():
    from trex_tpu.ops.likelihood import (
        discrete_gamma_rates,
        tree_log_likelihood_gamma,
    )

    topo = balanced_topology(4)
    leaf = jax.random.randint(jax.random.PRNGKey(20), (4, 12), 0, 4)
    blens = jnp.asarray(np.random.default_rng(21).uniform(0.05, 0.8, 7))
    got = float(tree_log_likelihood_gamma(topo, blens, leaf, 4, 0.7, 4))
    # Manual mixture over categories via per-site likelihood exponentials.
    from trex_tpu.ops.likelihood import _per_site_log_likelihood

    rates = discrete_gamma_rates(0.7, 4)
    per_cat = np.stack(
        [
            np.asarray(_per_site_log_likelihood(topo, blens * r, leaf, 4))
            for r in np.asarray(rates)
        ]
    )
    want = float(
        np.sum(
            np.log(np.mean(np.exp(per_cat), axis=0))
        )
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_gamma_shape_gradient():
    from trex_tpu.ops.likelihood import tree_log_likelihood_gamma

    topo = balanced_topology(8)
    leaf = jax.random.randint(jax.random.PRNGKey(22), (8, 40), 0, 4)
    blens = jnp.full((15,), 0.3)
    grad = jax.grad(
        lambda a: tree_log_likelihood_gamma(topo, blens, leaf, 4, a, 4)
    )(jnp.asarray(0.8))
    assert bool(jnp.isfinite(grad))
    assert float(jnp.abs(grad)) > 0


def test_gamma_invariant_model():
    from trex_tpu.ops.likelihood import (
        tree_log_likelihood_gamma,
        tree_log_likelihood_gamma_invariant,
    )

    topo = balanced_topology(4)
    # Mix of constant and variable sites.
    leaf = jnp.array(
        [[0, 1, 2, 0], [0, 1, 3, 0], [0, 1, 2, 1], [0, 1, 0, 2]],
        dtype=jnp.int32,
    )
    blens = jnp.full((7,), 0.4)
    # p_inv -> 0 reduces to the pure +G model.
    g = float(tree_log_likelihood_gamma(topo, blens, leaf, 4, 0.8, 4))
    gi0 = float(
        tree_log_likelihood_gamma_invariant(topo, blens, leaf, 4, 0.8, 1e-9, 4)
    )
    assert gi0 == pytest.approx(g, abs=1e-3)
    # With many constant sites, moderate p_inv increases the likelihood.
    const_leaf = jnp.zeros((4, 20), dtype=jnp.int32).at[:, :2].set(
        jnp.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    )
    lo = float(
        tree_log_likelihood_gamma_invariant(
            topo, blens, const_leaf, 4, 0.8, 1e-6, 4
        )
    )
    hi = float(
        tree_log_likelihood_gamma_invariant(
            topo, blens, const_leaf, 4, 0.8, 0.5, 4
        )
    )
    assert hi > lo
    # Gradients w.r.t. p_invariant flow.
    grad = jax.grad(
        lambda p: tree_log_likelihood_gamma_invariant(
            topo, blens, const_leaf, 4, 0.8, p, 4
        )
    )(jnp.asarray(0.3))
    assert bool(jnp.isfinite(grad))
