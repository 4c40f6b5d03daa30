"""Exact Sankoff DP: hand-checked fixtures, invariants, batch scoring.

Ports the reference's test intent (``/root/reference/tests/test_sankoff.py``):
leaf DP cells are 0 at observed states, shapes are right, costs non-negative,
leaves pass through reconstruction — plus brute-force oracle checks the
reference lacks.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.costs import exact_cost
from trex_tpu.ops.sankoff import (
    batched_sankoff_score,
    leaf_dp_table,
    run_sankoff,
    sankoff_reconstruct,
    sankoff_score,
    sankoff_tables,
)
from trex_tpu.topology import balanced_topology, random_topologies
from trex_tpu.types import BIG_COST, CostModel


def brute_force_score(children, leaf_seqs, cost, n_leaves):
    """Enumerate all ancestor labelings per site (oracle for tiny trees)."""
    n_anc = len(children)
    n_all = n_leaves + n_anc
    q = cost.shape[0]
    total = 0.0
    for site in range(leaf_seqs.shape[1]):
        best = np.inf
        for labels in itertools.product(range(q), repeat=n_anc):
            full = list(leaf_seqs[:, site]) + list(labels)
            s = 0.0
            for a in range(n_anc):
                for c in children[a]:
                    s += cost[full[n_leaves + a], full[c]]
            best = min(best, s)
        total += best
    return total


def test_three_leaf_hand_case():
    """4-leaf Hamming tree with known parsimony score."""
    n_leaves, q = 4, 4
    topo = balanced_topology(n_leaves)
    cost = np.ones((q, q)) - np.eye(q)
    # Sites: identical / one divergent / all distinct.
    leaf_seqs = np.array(
        [[0, 0, 0], [0, 1, 1], [0, 0, 2], [0, 0, 3]], dtype=np.int32
    )
    score = sankoff_score(topo, jnp.asarray(cost, jnp.float32), jnp.asarray(leaf_seqs))
    expected = brute_force_score(
        np.asarray(topo.children), leaf_seqs, cost, n_leaves
    )
    assert float(score) == expected


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 7), (8, 2, 5), (8, 4, 6)])
def test_matches_brute_force(n_leaves, q, length):
    key = jax.random.PRNGKey(0)
    leaf_seqs = jax.random.randint(key, (n_leaves, length), 0, q)
    topo = balanced_topology(n_leaves)
    cost = CostModel.hamming(q).matrix
    score = sankoff_score(topo, cost, leaf_seqs)
    expected = brute_force_score(
        np.asarray(topo.children), np.asarray(leaf_seqs), np.asarray(cost), n_leaves
    )
    assert float(score) == expected


def test_random_topology_matches_brute_force():
    n_leaves, q, length = 6, 3, 5
    topos = random_topologies(jax.random.PRNGKey(3), n_leaves, 4)
    leaf_seqs = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    scores = batched_sankoff_score(topos, cost, leaf_seqs)
    for b in range(4):
        children = np.asarray(topos.children)[b]
        expected = brute_force_score(
            children, np.asarray(leaf_seqs), np.asarray(cost), n_leaves
        )
        assert float(scores[b]) == expected


def test_leaf_dp_initialization():
    """Observed leaf state costs 0, others BIG_COST (sankoff.py:49-52,152)."""
    seqs = jnp.array([[0, 1], [2, 3]], dtype=jnp.int32)
    table = leaf_dp_table(seqs, 4)
    assert table.shape == (2, 4, 2)
    assert table[0, 0, 0] == 0 and table[0, 1, 1] == 0
    assert table[1, 2, 0] == 0 and table[1, 3, 1] == 0
    assert float(jnp.sum(table == 0)) == 4
    assert float(table[0, 1, 0]) == BIG_COST


def test_reconstruction_achieves_reported_score():
    """Reconstruction consistency: exact_cost(recon) == DP score.

    The reference uses this as its internal oracle
    (tests/test_convergence.py:69-73).
    """
    gt = generate_groundtruth(8, 4, 3, 20, seed=42)
    n_leaves = 8
    cost = CostModel.hamming(4).matrix
    topo = balanced_topology(n_leaves)
    leaf_seqs = gt.all_sequences[:n_leaves].astype(jnp.int32)
    recon, dp, score = sankoff_reconstruct(topo, cost, leaf_seqs)

    assert recon.shape == (15, 20)
    # Leaves pass through verbatim.
    np.testing.assert_array_equal(np.asarray(recon[:n_leaves]), np.asarray(leaf_seqs))
    realized = exact_cost(jax.nn.one_hot(recon, 4), gt.adjacency, cost)
    assert float(realized) == pytest.approx(float(score), abs=1e-3)
    # Score can't beat the (known) ground truth edge count upper bound... at
    # minimum it is non-negative and finite.
    assert 0 <= float(score) < BIG_COST


def test_run_sankoff_adjacency_api():
    """The adjacency-matrix API mirrors the reference signature/outputs."""
    gt = generate_groundtruth(4, 4, 3, 20, seed=42)
    cost = CostModel.hamming(4).matrix
    leaf_seqs = gt.all_sequences[:4].astype(jnp.int32)
    recon, dp, score = run_sankoff(
        gt.adjacency.astype(jnp.int32), cost, leaf_seqs, 7, 4, 4, return_path=True
    )
    assert dp.shape == (20, 7, 4)  # reference layout (L, n_all, Q)
    assert recon.shape == (7, 20)
    # Same score through the Topology API.
    topo = balanced_topology(4)
    assert float(score) == float(sankoff_score(topo, cost, leaf_seqs))
    # Root self-loop in input must not change anything (sankoff.py:141).
    adj_loop = gt.adjacency.at[-1, -1].set(1)
    _, _, score2 = run_sankoff(
        adj_loop.astype(jnp.int32), cost, leaf_seqs, 7, 4, 4
    )
    assert float(score) == float(score2)


def test_batched_scoring_shapes_and_variation():
    n_leaves, q, length, batch = 8, 4, 32, 16
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    leaf_seqs = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    scores = batched_sankoff_score(topos, cost, leaf_seqs)
    assert scores.shape == (batch,)
    assert jnp.all(scores >= 0)
    assert len(set(np.asarray(scores).tolist())) > 1  # topologies matter


def test_site_mask_zeroes_padded_sites():
    n_leaves, q = 4, 4
    topo = balanced_topology(n_leaves)
    cost = CostModel.hamming(q).matrix
    seqs = jax.random.randint(jax.random.PRNGKey(0), (n_leaves, 10), 0, q)
    padded = jnp.pad(seqs, ((0, 0), (0, 6)))
    mask = jnp.arange(16) < 10
    full = sankoff_score(topo, cost, seqs)
    masked = sankoff_score(topo, cost, padded, site_mask=mask)
    assert float(full) == float(masked)


def test_dp_table_layout():
    topo = balanced_topology(4)
    cost = CostModel.hamming(4).matrix
    seqs = jnp.zeros((4, 12), dtype=jnp.int32)
    dp, back = sankoff_tables(topo, cost, seqs)
    assert dp.shape == (7, 4, 12)  # (nodes, states, sites)
    assert back.shape == (3, 2, 4, 12)  # (ancestors, child, state, sites)
    # All-identical leaves: zero cost at state 0 everywhere up the tree.
    assert float(jnp.min(dp[-1], axis=0).sum()) == 0.0


def test_hamming_fast_path_matches_general():
    """Closed-form Hamming messages give identical scores to the O(Q^2) path."""
    from trex_tpu.ops.sankoff import batched_sankoff_score_hamming

    n_leaves, q, length, batch = 8, 4, 33, 8
    topos = random_topologies(jax.random.PRNGKey(10), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(11), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    general = batched_sankoff_score(topos, cost, leaf)
    fast = batched_sankoff_score_hamming(topos, cost, leaf)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(general))
