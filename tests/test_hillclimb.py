"""Discrete NNI hill-climbing search."""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.sankoff import sankoff_score
from trex_tpu.search.hillclimb import batched_random_restarts, parsimony_hill_climb
from trex_tpu.topology import balanced_topology
from trex_tpu.io import sample_topologies
from trex_tpu.types import CostModel


def _setup(n_leaves=8, length=64, q=4, n_mut=2, seed=3):
    gt = generate_groundtruth(n_leaves, q, n_mut, length, seed=seed)
    cost = CostModel.hamming(q).matrix
    leaf = gt.all_sequences[:n_leaves].astype(jnp.int32)
    optimal = float(sankoff_score(balanced_topology(n_leaves), cost, leaf))
    return gt, cost, leaf, optimal


def test_hill_climb_monotone_and_terminates():
    _, cost, leaf, optimal = _setup()
    start = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(1, 8, 1)
    )
    result = parsimony_hill_climb(start, cost, leaf, max_rounds=50)
    # Strictly decreasing trace, finishes at a local optimum.
    assert all(b < a for a, b in zip(result.trace, result.trace[1:]))
    assert result.score <= result.trace[0]
    assert result.score >= 0


def test_restarts_recover_low_scores():
    """Multi-start NNI search should get at or near the true-tree score on
    strongly tree-structured data."""
    _, cost, leaf, optimal = _setup(n_leaves=8, length=64, n_mut=2)
    result = batched_random_restarts(
        jax.random.PRNGKey(0), 8, cost, leaf, n_starts=4, max_rounds=60,
        neighborhood="spr",
    )
    # The generating (balanced) tree's Sankoff score upper-bounds the optimum;
    # the search must land within a small slack of it.
    assert result.score <= optimal * 1.1 + 1e-6


def test_random_kicks_path():
    _, cost, leaf, _ = _setup(n_leaves=8)
    start = balanced_topology(8)
    result = parsimony_hill_climb(
        start, cost, leaf, max_rounds=5, random_kicks=4,
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(result.score)


def test_spr_neighborhood_superset_of_nni():
    from trex_tpu.io import nni_neighbors, spr_neighborhood

    topo = balanced_topology(8)
    nni = nni_neighbors(topo)
    spr = spr_neighborhood(topo)
    assert spr.children.shape[0] > nni.children.shape[0]
    spr_set = {np.asarray(spr.children[i]).tobytes() for i in range(spr.children.shape[0])}
    for i in range(nni.children.shape[0]):
        assert np.asarray(nni.children[i]).tobytes() in spr_set
