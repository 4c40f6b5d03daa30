"""Topology representation: conversions, balanced trees, random sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.topology import (
    Topology,
    balanced_adjacency,
    balanced_topology,
    parents_to_topology,
    random_topologies,
    topology_from_adjacency,
    topology_to_adjacency,
)


@pytest.mark.parametrize("n_leaves", [2, 4, 8, 16])
def test_balanced_matches_reference_formula(n_leaves):
    """Node j's parent is n_leaves + j // 2 (ground_truth.py:183-191)."""
    topo = balanced_topology(n_leaves)
    n_all = 2 * n_leaves - 1
    parents = np.asarray(topo.parents)
    for j in range(n_all - 1):
        assert parents[j] == n_leaves + j // 2
    assert parents[n_all - 1] == n_all - 1  # root self-referential
    children = np.asarray(topo.children)
    for a in range(n_leaves - 1):
        assert tuple(children[a]) == (2 * a, 2 * a + 1)


@pytest.mark.parametrize("n_leaves", [2, 4, 8])
def test_adjacency_roundtrip(n_leaves):
    topo = balanced_topology(n_leaves)
    adj = topology_to_adjacency(topo)
    # Column j = children set of node j; binary; no root self-loop.
    assert set(np.unique(np.asarray(adj))) <= {0.0, 1.0}
    assert adj[-1, -1] == 0
    back = topology_from_adjacency(adj, n_leaves)
    np.testing.assert_array_equal(np.asarray(back.children), np.asarray(topo.children))
    np.testing.assert_array_equal(np.asarray(back.parents), np.asarray(topo.parents))


def test_from_adjacency_tolerates_root_self_loop():
    """The reference strips a root self-loop before the DP (sankoff.py:141)."""
    n_leaves = 4
    adj = balanced_adjacency(n_leaves).at[-1, -1].set(1)
    topo = topology_from_adjacency(adj, n_leaves)
    ref = balanced_topology(n_leaves)
    np.testing.assert_array_equal(np.asarray(topo.children), np.asarray(ref.children))


def test_parents_to_topology_roundtrip():
    topo = balanced_topology(8)
    rebuilt = parents_to_topology(topo.parents, 8)
    np.testing.assert_array_equal(np.asarray(rebuilt.children), np.asarray(topo.children))


@pytest.mark.parametrize("n_leaves", [4, 8, 16])
def test_random_topologies_are_valid_binary_trees(n_leaves):
    batch = 16
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    n_all = 2 * n_leaves - 1
    children = np.asarray(topos.children)
    parents = np.asarray(topos.parents)
    assert children.shape == (batch, n_leaves - 1, 2)
    for b in range(batch):
        # Every non-root node appears exactly once as someone's child.
        flat = children[b].ravel()
        assert sorted(flat) == list(range(n_all - 1))
        # Children have smaller indices than their parent (topological order).
        for a in range(n_leaves - 1):
            node = n_leaves + a
            assert children[b, a, 0] < children[b, a, 1] < node
        # parents is consistent with children.
        for a in range(n_leaves - 1):
            assert parents[b, children[b, a, 0]] == n_leaves + a
            assert parents[b, children[b, a, 1]] == n_leaves + a
        assert parents[b, n_all - 1] == n_all - 1


def test_topology_is_pytree():
    topo = balanced_topology(4)
    leaves = jax.tree_util.tree_leaves(topo)
    assert len(leaves) == 2
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), topo)
    assert isinstance(stacked, Topology)
    assert stacked.batch_shape == (2,)
