"""End-to-end workflow: FASTA in -> tree search -> bootstrap -> newick out.

Run from the repo root (any backend; uses the fastest scoring path
available):

    python examples/full_workflow.py

Demonstrates the full user surface: alignment I/O and compression, discrete
SPR search with random restarts, exact Sankoff reconstruction of ancestral
sequences on the best tree, bootstrap support, and consensus/newick export.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.alignment import compress_alignment
from trex_tpu.io import DNA, parse_fasta, save_newick, write_fasta
from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.sankoff import sankoff_reconstruct
from trex_tpu.search.bootstrap import bootstrap_analysis
from trex_tpu.search.consensus import majority_rule_consensus
from trex_tpu.search.hillclimb import batched_random_restarts
from trex_tpu.types import CostModel


def main() -> None:
    # 1. Data: simulate a 16-taxon alignment and round-trip it through FASTA
    #    (stand-in for reading a real file with parse_fasta).
    n_leaves, n_states, length = 16, 4, 200
    gt = generate_groundtruth(n_leaves, n_states, 5, length, seed=7)
    leaf_int = np.asarray(gt.all_sequences[:n_leaves]).astype(np.int64)
    names = [f"taxon{i}" for i in range(n_leaves)]
    fasta_text = write_fasta(names, leaf_int, DNA)
    names, leaf_np = parse_fasta(fasta_text, DNA)
    leaf = jnp.asarray(leaf_np.astype(np.int32))
    print(f"alignment: {n_leaves} taxa x {length} sites")

    # 2. Site-pattern compression (exact, pure speedup).
    patterns, weights = compress_alignment(leaf_np)
    print(f"compressed to {patterns.shape[1]} unique patterns")

    # 3. Discrete tree search: SPR hill climbing from random starts.
    cost = CostModel.hamming(n_states).matrix
    result = batched_random_restarts(
        jax.random.PRNGKey(0), n_leaves, cost, leaf,
        n_starts=4, max_rounds=40, neighborhood="spr",
    )
    print(
        f"best tree: parsimony {result.score:.0f} after "
        f"{result.evaluations} candidate evaluations"
    )

    # 4. Ancestral sequence reconstruction on the best tree (exact DP).
    ancestors, _, score = sankoff_reconstruct(result.topology, cost, leaf)
    assert float(score) == result.score
    print(f"reconstructed {n_leaves - 1} ancestral sequences (score {score:.0f})")

    # 5. Bootstrap support + consensus.
    support, replicate_best = bootstrap_analysis(
        jax.random.PRNGKey(1), result.topology, cost, leaf,
        n_replicates=20, search_rounds=8,
    )
    consensus_newick, _ = majority_rule_consensus(replicate_best, names)
    print(f"mean clade support: {support.mean():.2f}")
    print("best tree:", save_newick(result.topology, names))
    print("consensus:", consensus_newick)


if __name__ == "__main__":
    main()
