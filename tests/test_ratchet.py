"""Parsimony ratchet and RF distance."""

import jax
import jax.numpy as jnp

from trex_tpu.io import sample_topologies
from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.sankoff import sankoff_score
from trex_tpu.search.ratchet import parsimony_ratchet, robinson_foulds
from trex_tpu.topology import balanced_topology
from trex_tpu.types import CostModel


def test_rf_distance_basics():
    t = balanced_topology(8)
    assert robinson_foulds(t, t) == 0
    other = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(3, 8, 1)
    )
    d = robinson_foulds(t, other)
    assert d > 0 and d % 2 == 0  # symmetric difference has even size


def test_ratchet_improves_or_matches_plain_climb():
    n_leaves = 8
    gt = generate_groundtruth(n_leaves, 4, 3, 64, seed=11)
    leaf = gt.all_sequences[:n_leaves].astype(jnp.int32)
    cost = CostModel.hamming(4).matrix
    start = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(5, n_leaves, 1)
    )
    result = parsimony_ratchet(
        jax.random.PRNGKey(0), start, cost, leaf,
        n_iterations=4, climb_rounds=20,
    )
    # Best-so-far trace is monotone nonincreasing.
    assert all(b <= a for a, b in zip(result.trace, result.trace[1:]))
    # Never worse than the generating tree's score by much; usually at it.
    oracle = float(sankoff_score(balanced_topology(n_leaves), cost, leaf))
    assert result.score <= oracle * 1.15
    # Score claims are honest: re-score the returned topology.
    assert float(sankoff_score(result.topology, cost, leaf)) == result.score


def test_ratchet_progress_dump(tmp_path):
    import json
    import os

    gt = generate_groundtruth(8, 4, 3, 40, seed=2)
    leaf = gt.all_sequences[:8].astype(jnp.int32)
    cost = CostModel.hamming(4).matrix
    result = parsimony_ratchet(
        jax.random.PRNGKey(1), balanced_topology(8), cost, leaf,
        n_iterations=2, climb_rounds=5, progress_dir=str(tmp_path),
    )
    assert os.path.exists(tmp_path / "best.nwk")
    lines = [json.loads(l) for l in open(tmp_path / "trace.jsonl")]
    assert lines[-1]["best_score"] == result.score
    assert len(lines) == 3  # initial + 2 iterations
