"""Majority-rule consensus trees."""

import jax
import pytest

from trex_tpu.io import load_newick
from trex_tpu.search.consensus import majority_rule_consensus, split_frequencies
from trex_tpu.topology import balanced_topology, random_topologies


def test_unanimous_trees_reproduce_topology():
    topo = balanced_topology(4)
    newick, kept = majority_rule_consensus([topo] * 5, leaf_names=list("ABCD"))
    # Fully resolved: the consensus is the input tree.
    parsed, _, names = load_newick(newick.replace("1.00", "").replace("0.", ""))
    # Structure check via splits instead of exact string:
    freqs = split_frequencies([topo])
    assert all(f == 1.0 for _, f in kept)
    assert {s for s, _ in kept if len(s) > 1} >= set(
        s for s in freqs if len(s) > 1
    )
    assert newick.count("(") == 3  # binary: n_leaves - 1 internal nodes


def test_conflicting_trees_collapse_to_polytomy():
    trees = [
        jax.tree_util.tree_map(
            lambda x: x[b], random_topologies(jax.random.PRNGKey(0), 8, 12)
        )
        for b in range(12)
    ]
    newick, kept = majority_rule_consensus(trees)
    # Random trees share few splits: consensus is mostly a root polytomy.
    assert newick.endswith(";")
    assert len(kept) >= 1  # at least the root
    root_split = kept[0][0]
    assert len(root_split) == 8 and kept[0][1] == 1.0


def test_supports_are_fractions():
    t1 = balanced_topology(4)
    t2 = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(1), 4, 1)
    )
    _, kept = majority_rule_consensus([t1, t1, t2])
    for split, support in kept:
        assert 0.0 <= support <= 1.0


def test_empty_input_raises():
    with pytest.raises(ValueError):
        majority_rule_consensus([])


def test_consensus_topology_resolved_and_unresolved():
    from trex_tpu.search.consensus import consensus_topology
    import numpy as np

    from trex_tpu.search.bootstrap import subtree_leaf_sets

    topo = balanced_topology(8)
    resolved = consensus_topology([topo, topo, topo])
    assert resolved is not None
    # Same labeled tree (ancestor numbering is canonical-DFS, which may
    # differ from the balanced constructor's numbering).
    assert set(subtree_leaf_sets(resolved)) == set(subtree_leaf_sets(topo))
    # Conflicting random trees -> polytomies -> None.
    trees = [
        jax.tree_util.tree_map(
            lambda x: x[b], random_topologies(jax.random.PRNGKey(3), 8, 10)
        )
        for b in range(10)
    ]
    assert consensus_topology(trees) is None
