"""Smoothed-min Sankoff: exact limit, bounds, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.sankoff import sankoff_score
from trex_tpu.ops.soft_dp import (
    batched_soft_sankoff_score,
    soft_sankoff_score_from_sequences,
    softmin,
)
from trex_tpu.topology import balanced_topology, random_topologies
from trex_tpu.types import CostModel


def test_softmin_limits():
    x = jnp.array([[3.0, 1.0, 2.0]])
    cold = softmin(x, axis=1, temperature=1e-3)
    assert float(cold[0]) == pytest.approx(1.0, abs=1e-2)
    # softmin is a lower bound of min and monotone in T.
    warm = softmin(x, axis=1, temperature=1.0)
    assert float(warm[0]) <= 1.0


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 12), (8, 4, 20)])
def test_cold_limit_matches_exact(n_leaves, q, length):
    topo = balanced_topology(n_leaves)
    leaf = jax.random.randint(jax.random.PRNGKey(0), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    exact = float(sankoff_score(topo, cost, leaf))
    soft = float(
        soft_sankoff_score_from_sequences(topo, cost, leaf, temperature=1e-3)
    )
    assert soft == pytest.approx(exact, abs=0.05)
    # Soft-min underestimates: score <= exact, within the stated bound.
    warm = float(
        soft_sankoff_score_from_sequences(topo, cost, leaf, temperature=0.5)
    )
    bound = 0.5 * np.log(q) * (2 * (n_leaves - 1) + 1) * length
    assert warm <= exact + 1e-4
    assert warm >= exact - bound


def test_gradient_wrt_cost_matrix():
    """Learnable substitution weights: gradients are finite and meaningful."""
    topo = balanced_topology(8)
    q, length = 4, 30
    leaf = jax.random.randint(jax.random.PRNGKey(1), (8, length), 0, q)
    cost = CostModel.hamming(q).matrix

    grad = jax.grad(
        lambda c: soft_sankoff_score_from_sequences(topo, c, leaf, 0.2)
    )(cost)
    assert grad.shape == (q, q)
    assert bool(jnp.all(jnp.isfinite(grad)))
    # Raising any substitution cost cannot decrease the (soft) score.
    assert bool(jnp.all(grad >= -1e-5))
    assert float(jnp.abs(grad).sum()) > 0


def test_batched_and_jit():
    topos = random_topologies(jax.random.PRNGKey(2), 8, 4)
    leaf = jax.random.randint(jax.random.PRNGKey(3), (8, 16), 0, 4)
    cost = CostModel.hamming(4).matrix
    fn = jax.jit(batched_soft_sankoff_score)
    scores = fn(topos, cost, leaf, 1e-3)
    exact = [
        float(
            sankoff_score(
                jax.tree_util.tree_map(lambda x: x[b], topos), cost, leaf
            )
        )
        for b in range(4)
    ]
    np.testing.assert_allclose(np.asarray(scores), exact, atol=0.05)
