"""Maximum-likelihood workflow: search, branch lengths, rate models.

    python examples/ml_workflow.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trex_tpu.io import sample_topologies, save_newick
from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.likelihood import (
    optimize_branch_lengths,
    tree_log_likelihood,
    tree_log_likelihood_gamma,
)
from trex_tpu.search.ml import ml_hill_climb
from trex_tpu.search.ratchet import robinson_foulds
from trex_tpu.topology import balanced_topology


def main() -> None:
    n_leaves, n_states, length = 16, 4, 300
    gt = generate_groundtruth(n_leaves, n_states, 6, length, seed=11)
    leaf = gt.all_sequences[:n_leaves].astype(jnp.int32)

    # 1. ML topology search from a random start.
    start = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(5, n_leaves, 1)
    )
    result, lengths, losses = ml_hill_climb(start, leaf, n_states, max_rounds=40)
    rf = robinson_foulds(result.topology, balanced_topology(n_leaves))
    print(f"ML search: -lnL {losses[-1]:.1f}, RF to true tree {rf}")

    # 2. Compare homogeneous vs +Gamma fits on the found tree.
    ll_plain = float(
        tree_log_likelihood(result.topology, lengths, leaf, n_states)
    )
    ll_gamma = float(
        tree_log_likelihood_gamma(result.topology, lengths, leaf, n_states, 0.5)
    )
    print(f"lnL homogeneous {ll_plain:.1f} | +Gamma(0.5) {ll_gamma:.1f}")

    # 3. Refit branch lengths from scratch on the true topology for reference.
    _, curve = optimize_branch_lengths(
        balanced_topology(n_leaves), leaf, n_states, n_iterations=300
    )
    print(f"true-topology -lnL after refit: {curve[-1]:.1f}")
    print("tree:", save_newick(result.topology))


if __name__ == "__main__":
    main()
