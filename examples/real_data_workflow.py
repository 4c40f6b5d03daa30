"""Real-alignment workflow: gapped/ambiguous FASTA in -> ML tree + ancestors.

Run from the repo root (any backend):

    python examples/real_data_workflow.py

Demonstrates the ambiguity-aware surface added for real data: IUPAC mask
parsing, pattern compression, distance (NJ) and stepwise-addition starting
trees, parsimony SPR search, ML hill climbing with Newton branch lengths,
GTR+G model fitting, marginal posterior ancestral reconstruction, and
branch-length-bearing newick output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.alignment import compress_alignment
from trex_tpu.io import DNA, parse_fasta_masks, save_newick, write_fasta
from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.likelihood import optimize_model
from trex_tpu.ops.likelihood_asr import marginal_ancestral_posteriors
from trex_tpu.search.ml import ml_hill_climb
from trex_tpu.search.nj import nj_start_tree
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.search.stepwise import stepwise_addition
from trex_tpu.topology import topology_from_adjacency

N_LEAVES, N_SITES, Q = 16, 400, 4


def make_messy_fasta() -> str:
    """Simulate an alignment, then add gaps and IUPAC codes like real data."""
    data = generate_groundtruth(
        n_leaves=N_LEAVES, n_states=Q, n_mutations=4, seq_length=N_SITES, seed=1
    )
    table = np.array(list("ACGT"))
    rows = table[np.asarray(data.masked_sequences[:N_LEAVES]).astype(int)]
    rng = np.random.default_rng(0)
    for i in range(N_LEAVES):
        for j in rng.choice(N_SITES, size=N_SITES // 40, replace=False):
            rows[i, j] = rng.choice(list("N-RYWS"))
    text = write_fasta(
        [f"taxon{i}" for i in range(N_LEAVES)],
        np.zeros((N_LEAVES, N_SITES), int), DNA,
    )
    # Replace the all-A bodies with the messy rows.
    lines = text.splitlines()
    for i in range(N_LEAVES):
        lines[2 * i + 1] = "".join(rows[i])
    return "\n".join(lines) + "\n", data


def main() -> None:
    fasta, data = make_messy_fasta()
    true_topo = topology_from_adjacency(data.adjacency, N_LEAVES)

    names, masks = parse_fasta_masks(fasta, DNA)
    ambiguous = int((np.bitwise_count(masks.astype(np.uint32)) > 1).sum())
    print(f"{len(names)} taxa x {masks.shape[1]} sites, {ambiguous} ambiguous cells")

    patterns, weights = compress_alignment(masks)
    weights = jnp.asarray(weights, jnp.float32)
    print(f"{patterns.shape[1]} unique site patterns")

    # Two starting trees: distance-based and greedy stepwise addition.
    nj_topo, _ = nj_start_tree(
        np.where(np.bitwise_count(masks.astype(np.uint32)) == 1,
                 np.log2(np.maximum(masks, 1)).astype(int), 0), Q,
    )
    sw_topo, sw_score = stepwise_addition(
        patterns, Q, sequences_are_masks=True, site_weights=weights, seed=0
    )
    print(f"stepwise parsimony score {sw_score}; "
          f"RF(nj, stepwise) = {rf_distance_unrooted(nj_topo, sw_topo)}")

    # ML search from the stepwise tree (Newton branch lengths).
    result, lengths, losses = ml_hill_climb(
        sw_topo, jnp.asarray(patterns), Q,
        max_rounds=20, neighborhood="nni",
        sequences_are_masks=True, site_weights=weights,
    )
    print(f"ML search: nll {float(losses[-1]):.1f} after "
          f"{result.evaluations} candidate evaluations; "
          f"RF to generating tree = {rf_distance_unrooted(result.topology, true_topo)}")

    # Fit GTR+G on the final topology.
    params, curve = optimize_model(
        result.topology, jnp.asarray(patterns), Q, model="gtr+g",
        sequences_are_masks=True, site_weights=weights, n_iterations=300,
    )
    print(f"GTR+G fit: nll {float(curve[-1]):.1f}, "
          f"gamma shape {float(params['gamma_shape']):.2f}, "
          f"freqs {np.round(np.asarray(params['freqs']), 3)}")

    # Marginal posterior ancestors (on the full masks, not patterns).
    posteriors, states = marginal_ancestral_posteriors(
        result.topology, params["branch_lengths"], jnp.asarray(masks), Q,
        rates=params["rates"], freqs=params["freqs"],
        sequences_are_masks=True,
    )
    conf = float(jnp.mean(jnp.max(posteriors, axis=1)[N_LEAVES:]))
    print(f"mean ancestral posterior confidence {conf:.3f}")

    print(save_newick(result.topology, names, np.asarray(params["branch_lengths"])))


if __name__ == "__main__":
    main()
