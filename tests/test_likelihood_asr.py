"""ML ancestral reconstruction (inside-outside) + analytic branch gradients.

Oracles: brute-force enumeration of all ancestor state assignments for the
posteriors; ``jax.grad`` of the pruning log-likelihood for the gradients.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.likelihood import (
    gtr_generator,
    jc69_transition,
    tree_log_likelihood,
)
from trex_tpu.ops.likelihood_asr import (
    branch_length_gradients,
    marginal_ancestral_posteriors,
)
from trex_tpu.topology import Topology, random_topologies

Q = 4


def _case(seed: int, n_leaves: int = 4, length: int = 6):
    rng = np.random.default_rng(seed)
    topo = jax.tree.map(
        lambda a: a[0], random_topologies(jax.random.key(seed), n_leaves, 1)
    )
    seqs = rng.integers(0, Q, size=(n_leaves, length)).astype(np.int32)
    blens = rng.uniform(0.05, 0.6, size=topo.n_all)
    return topo, seqs, jnp.asarray(blens)


def _brute_posteriors(topo: Topology, seqs, blens, rates=None, freqs=None):
    """Enumerate every ancestor labeling; exact marginals per site."""
    n_leaves = topo.n_leaves
    n_all = topo.n_all
    n_anc = n_all - n_leaves
    parents = np.asarray(topo.parents)
    if rates is None:
        pmats = np.stack([np.asarray(jc69_transition(t, Q)) for t in blens])
        prior = np.full(Q, 0.25)
    else:
        gen = np.asarray(gtr_generator(jnp.asarray(rates), jnp.asarray(freqs)))
        import scipy.linalg as sla

        pmats = np.stack([sla.expm(gen * float(t)) for t in blens])
        prior = np.asarray(freqs)

    length = seqs.shape[1]
    post = np.zeros((n_all, Q, length))
    for site in range(length):
        for combo in itertools.product(range(Q), repeat=n_anc):
            states = np.concatenate([seqs[:, site], np.asarray(combo)])
            p = prior[states[-1]]
            for child in range(n_all - 1):
                p *= pmats[child][states[parents[child]], states[child]]
            for node in range(n_all):
                post[node, states[node], site] += p
        post[:, :, site] /= post[:, :, site].sum(axis=1, keepdims=True)
    return post


@pytest.mark.parametrize("seed", [0, 1])
def test_posteriors_match_enumeration_jc(seed):
    topo, seqs, blens = _case(seed)
    posts, maps = marginal_ancestral_posteriors(
        topo, blens, jnp.asarray(seqs), Q
    )
    oracle = _brute_posteriors(topo, seqs, np.asarray(blens))
    np.testing.assert_allclose(np.asarray(posts), oracle, atol=2e-5)
    # Leaves: observed states get posterior 1.
    np.testing.assert_array_equal(np.asarray(maps)[: seqs.shape[0]], seqs)


def test_posteriors_match_enumeration_gtr():
    topo, seqs, blens = _case(3)
    rng = np.random.default_rng(3)
    rates = rng.uniform(0.5, 2.0, size=(Q, Q))
    rates = (rates + rates.T) / 2
    freqs = rng.dirichlet(np.ones(Q) * 5)
    posts, _ = marginal_ancestral_posteriors(
        topo, blens, jnp.asarray(seqs), Q,
        rates=jnp.asarray(rates), freqs=jnp.asarray(freqs),
    )
    oracle = _brute_posteriors(topo, seqs, np.asarray(blens), rates, freqs)
    np.testing.assert_allclose(np.asarray(posts), oracle, atol=2e-5)


def test_posteriors_with_ambiguous_leaf():
    topo, seqs, blens = _case(5)
    masks = (1 << seqs).astype(np.int32)
    masks[1, :] = 0b0110  # leaf 1: C or G everywhere
    posts, maps = marginal_ancestral_posteriors(
        topo, blens, jnp.asarray(masks), Q, sequences_are_masks=True
    )
    posts = np.asarray(posts)
    # Disallowed states get zero posterior at the ambiguous leaf; the
    # posterior over {C, G} is data-informed (sums to 1).
    assert np.allclose(posts[1, 0], 0) and np.allclose(posts[1, 3], 0)
    np.testing.assert_allclose(posts[1].sum(axis=0), 1.0, atol=1e-5)
    assert set(np.asarray(maps)[1].tolist()) <= {1, 2}


@pytest.mark.parametrize("use_gtr", [False, True])
def test_analytic_gradients_match_autodiff(use_gtr):
    topo, seqs, blens = _case(7, n_leaves=8, length=20)
    rng = np.random.default_rng(7)
    if use_gtr:
        rates = rng.uniform(0.5, 2.0, size=(Q, Q))
        rates = jnp.asarray((rates + rates.T) / 2)
        freqs = jnp.asarray(rng.dirichlet(np.ones(Q) * 5))
    else:
        rates = freqs = None
    weights = jnp.asarray(rng.integers(1, 3, size=seqs.shape[1]), jnp.float32)

    analytic = branch_length_gradients(
        topo, blens, jnp.asarray(seqs), Q,
        rates=rates, freqs=freqs, site_weights=weights,
    )
    autodiff = jax.grad(
        lambda b: tree_log_likelihood(
            topo, b, jnp.asarray(seqs), Q,
            site_mask=weights, rates=rates, freqs=freqs,
        )
    )(blens)
    np.testing.assert_allclose(
        np.asarray(analytic)[:-1], np.asarray(autodiff)[:-1],
        rtol=2e-3, atol=2e-4,
    )
    assert float(analytic[-1]) == 0.0


@pytest.mark.parametrize("use_gtr", [False, True])
def test_newton_matches_adam_optimum(use_gtr):
    from trex_tpu.ops.likelihood import optimize_branch_lengths
    from trex_tpu.ops.likelihood_asr import optimize_branch_lengths_newton

    topo, seqs, _ = _case(11, n_leaves=8, length=60)
    rng = np.random.default_rng(11)
    if use_gtr:
        rates = rng.uniform(0.5, 2.0, size=(Q, Q))
        rates = jnp.asarray((rates + rates.T) / 2)
        freqs = jnp.asarray(rng.dirichlet(np.ones(Q) * 5))
    else:
        rates = freqs = None
    lengths, curve = optimize_branch_lengths_newton(
        topo, jnp.asarray(seqs), Q, rates=rates, freqs=freqs, n_sweeps=12
    )
    curve = np.asarray(curve)
    assert (np.diff(curve) <= 1e-4).all()  # monotone non-increasing
    assert np.all(np.asarray(lengths)[:-1] > 0)
    if not use_gtr:
        _, adam_curve = optimize_branch_lengths(
            topo, jnp.asarray(seqs), Q, n_iterations=500
        )
        # 12 Newton sweeps reach (or beat) 500 Adam steps.
        assert curve[-1] <= float(adam_curve[-1]) + 0.05


def test_newton_with_masks_and_weights():
    from trex_tpu.alignment import compress_alignment
    from trex_tpu.ops.likelihood import tree_log_likelihood
    from trex_tpu.ops.likelihood_asr import optimize_branch_lengths_newton

    topo, seqs, _ = _case(13, n_leaves=6, length=50)
    masks = (1 << seqs).astype(np.int32)
    masks[2, :8] = 0b1111
    patterns, weights = compress_alignment(masks)
    lengths, curve = optimize_branch_lengths_newton(
        topo, jnp.asarray(patterns), Q,
        site_weights=jnp.asarray(weights, jnp.float32),
        sequences_are_masks=True, n_sweeps=10,
    )
    # Final curve value is the real (weighted) nll of the final lengths.
    nll = -tree_log_likelihood(
        topo, lengths, jnp.asarray(patterns), Q,
        site_mask=jnp.asarray(weights, jnp.float32), sequences_are_masks=True,
    )
    np.testing.assert_allclose(float(nll), float(curve[-1]), rtol=1e-5)


def test_analytic_gradients_with_masks():
    topo, seqs, blens = _case(9, n_leaves=6, length=12)
    masks = (1 << seqs).astype(np.int32)
    masks[0, :4] = 0b1111
    analytic = branch_length_gradients(
        topo, blens, jnp.asarray(masks), Q, sequences_are_masks=True
    )
    autodiff = jax.grad(
        lambda b: tree_log_likelihood(
            topo, b, jnp.asarray(masks), Q, sequences_are_masks=True
        )
    )(blens)
    np.testing.assert_allclose(
        np.asarray(analytic)[:-1], np.asarray(autodiff)[:-1],
        rtol=2e-3, atol=2e-4,
    )


def test_joint_reconstruction_matches_enumeration():
    """Joint ML assignment == exhaustive max over all ancestor states."""
    import itertools

    from trex_tpu.ops.likelihood import gtr_generator
    from trex_tpu.ops.likelihood_asr import joint_ancestral_reconstruction
    from trex_tpu.topology import parents_to_topology
    import scipy.linalg

    # 4 leaves, 3 ancestors: caterpillar ((0,1)4,(2,3)5)6.
    topo = parents_to_topology(jnp.asarray([4, 4, 5, 5, 6, 6, 6]), 4)
    rng = np.random.default_rng(0)
    blens = rng.uniform(0.05, 0.6, size=(7,))
    blens[-1] = 0.0
    rates = np.ones((4, 4)) - np.eye(4)
    rates[0, 2] = rates[2, 0] = 5.0
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    leaves = rng.integers(0, 4, size=(4, 6)).astype(np.int32)
    leaves[2, 0] = -1  # one missing entry

    states, joint_lp = joint_ancestral_reconstruction(
        topo, jnp.asarray(blens, jnp.float32), jnp.asarray(leaves), 4,
        rates=jnp.asarray(rates, jnp.float32),
        freqs=jnp.asarray(freqs, jnp.float32),
    )
    states = np.asarray(states)
    joint_lp = np.asarray(joint_lp)

    gen = np.asarray(
        gtr_generator(jnp.asarray(rates, jnp.float32),
                      jnp.asarray(freqs, jnp.float32)), np.float64
    )
    pmat = {n: scipy.linalg.expm(gen * blens[n]) for n in range(6)}
    parents = [4, 4, 5, 5, 6, 6]

    for site in range(6):
        best_lp, best_assign = -np.inf, None
        leaf_choices = [
            range(4) if leaves[i, site] < 0 else [int(leaves[i, site])]
            for i in range(4)
        ]
        for leaf_states in itertools.product(*leaf_choices):
            for anc in itertools.product(range(4), repeat=3):
                full = list(leaf_states) + list(anc)
                lp = np.log(freqs[full[6]])
                for n in range(6):
                    lp += np.log(pmat[n][full[parents[n]], full[n]])
                if lp > best_lp:
                    best_lp, best_assign = lp, full
        np.testing.assert_allclose(joint_lp[site], best_lp, rtol=1e-5)
        np.testing.assert_array_equal(states[:, site], best_assign)


def test_joint_vs_marginal_consistency():
    """Joint log-prob <= total log-likelihood; observed leaves unchanged."""
    from trex_tpu.ops.likelihood import tree_log_likelihood
    from trex_tpu.ops.likelihood_asr import joint_ancestral_reconstruction
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(0), 10, 1)
    )
    rng = np.random.default_rng(1)
    leaves = rng.integers(0, 4, size=(10, 40)).astype(np.int32)
    blens = jnp.full((topo.n_all,), 0.2)
    states, joint_lp = joint_ancestral_reconstruction(
        topo, blens, jnp.asarray(leaves), 4
    )
    per_site = np.asarray(
        jnp.exp(joint_lp)
    )
    assert (np.asarray(states)[:10] == leaves).all()
    total_ll = float(tree_log_likelihood(topo, blens, jnp.asarray(leaves), 4))
    # The single best assignment cannot exceed the sum over assignments.
    assert float(np.asarray(joint_lp).sum()) <= total_ll + 1e-3


def test_marginal_posteriors_with_missing_leaves():
    """Regression: a -1 (missing) leaf must marginalize out, not collapse
    every posterior at that site to zero (all-zero tip partial)."""
    import jax.tree_util as jtu

    from trex_tpu.io import sample_topologies

    topo = jtu.tree_map(lambda x: x[0], sample_topologies(5, 6, 1))
    lens = jnp.full((11,), 0.1)
    col = jnp.asarray(
        np.array([[1], [1], [-1], [0], [0], [-1]], np.int32)
    )
    post, _ = marginal_ancestral_posteriors(topo, lens, col, 4)
    sums = np.asarray(post).sum(axis=1)[:, 0]
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # The missing leaves get data-informed (not degenerate) posteriors.
    p2 = np.asarray(post)[2, :, 0]
    assert 0 < p2.max() < 1
