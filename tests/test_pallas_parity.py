"""Pallas kernel parity vs the lax oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.sankoff import batched_sankoff_score
from trex_tpu.ops.sankoff_pallas import batched_sankoff_score_pallas
from trex_tpu.topology import balanced_topology, random_topologies
from trex_tpu.types import CostModel


def _stack(topo, batch):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), topo
    )


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 128), (8, 4, 128), (16, 2, 256)])
def test_hamming_path_matches_lax(n_leaves, q, length):
    batch = 4
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    want = batched_sankoff_score(topos, cost, leaf)
    got = batched_sankoff_score_pallas(
        topos, cost, leaf, hamming=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_general_cost_path_matches_lax():
    n_leaves, q, length, batch = 8, 4, 128, 4
    topos = random_topologies(jax.random.PRNGKey(2), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(3), (n_leaves, length), 0, q)
    # Asymmetric integer cost matrix (transversion-style weighting).
    cost = jnp.asarray(
        np.random.default_rng(0).integers(0, 5, size=(q, q)).astype(np.float32)
    )
    cost = cost.at[jnp.arange(q), jnp.arange(q)].set(0.0)
    want = batched_sankoff_score(topos, cost, leaf)
    got = batched_sankoff_score_pallas(
        topos, cost, leaf, hamming=False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_site_blocking_equivalent():
    n_leaves, q, length = 8, 4, 512
    topos = random_topologies(jax.random.PRNGKey(4), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(5), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    a = batched_sankoff_score_pallas(
        topos, cost, leaf, hamming=True, site_block=128, interpret=True
    )
    b = batched_sankoff_score_pallas(
        topos, cost, leaf, hamming=True, site_block=512, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hamming_autodetect():
    n_leaves, q, length = 4, 4, 128
    topos = _stack(balanced_topology(n_leaves), 2)
    leaf = jax.random.randint(jax.random.PRNGKey(6), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    got = batched_sankoff_score_pallas(topos, cost, leaf, interpret=True)
    want = batched_sankoff_score(topos, cost, leaf)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unaligned_length_zero_padded():
    """Arbitrary L works: zero padding contributes no score."""
    n_leaves, q, length = 8, 4, 777
    topos = random_topologies(jax.random.PRNGKey(7), n_leaves, 3)
    leaf = jax.random.randint(jax.random.PRNGKey(8), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    want = batched_sankoff_score(topos, cost, leaf)
    got = batched_sankoff_score_pallas(topos, cost, leaf, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_general_cost_fuzz_vs_brute_force():
    """Random non-Hamming cost matrices: kernel == lax == brute force."""
    import itertools

    rng = np.random.default_rng(7)
    n_leaves, q, length = 4, 3, 6
    topos = random_topologies(jax.random.PRNGKey(20), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(21), (n_leaves, length), 0, q)
    for trial in range(3):
        cost_np = rng.integers(0, 6, size=(q, q)).astype(np.float32)
        np.fill_diagonal(cost_np, 0)
        cost = jnp.asarray(cost_np)
        lax_scores = batched_sankoff_score(topos, cost, leaf)
        pallas_scores = batched_sankoff_score_pallas(
            topos, cost, leaf, hamming=False, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(pallas_scores), np.asarray(lax_scores)
        )
        # brute force per tree
        for b in range(2):
            children = np.asarray(topos.children[b])
            total = 0.0
            for site in range(length):
                best = np.inf
                for labels in itertools.product(range(q), repeat=n_leaves - 1):
                    full = list(np.asarray(leaf)[:, site]) + list(labels)
                    s = sum(
                        cost_np[full[n_leaves + a], full[c]]
                        for a in range(n_leaves - 1)
                        for c in children[a]
                    )
                    best = min(best, s)
                total += best
            assert float(lax_scores[b]) == total


def test_minplus_weighted_compressed_patterns():
    """Weighted min-plus kernel == plain scoring on compressed patterns."""
    from trex_tpu.alignment import compress_alignment

    n_leaves, q, length = 8, 3, 200
    topos = random_topologies(jax.random.PRNGKey(30), n_leaves, 3)
    leaf = jax.random.randint(jax.random.PRNGKey(31), (n_leaves, length), 0, 2)
    cost = CostModel.hamming(q).matrix
    patterns, weights = compress_alignment(np.asarray(leaf))
    assert patterns.shape[1] < length
    full = batched_sankoff_score_pallas(topos, cost, leaf, interpret=True)
    comp = batched_sankoff_score_pallas(
        topos, cost, jnp.asarray(patterns),
        site_weights=jnp.asarray(weights, jnp.float32), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(full))
