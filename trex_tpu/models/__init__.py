"""Data models: mutation trees, NK fitness landscapes, codon substitution."""

from trex_tpu.models import codon
from trex_tpu.models.mutation_tree import mutate, generate_groundtruth
from trex_tpu.models.simulate import simulate_alignment, simulate_ctmc
from trex_tpu.models.nk import (
    NKLandscape,
    make_landscape,
    sequence_fitness,
    batched_sequence_fitness,
    evolve_tree,
    evolve_tree_on_adjacency,
)

__all__ = [
    "codon",
    "mutate",
    "generate_groundtruth",
    "simulate_alignment",
    "simulate_ctmc",
    "NKLandscape",
    "make_landscape",
    "sequence_fitness",
    "batched_sequence_fitness",
    "evolve_tree",
    "evolve_tree_on_adjacency",
]
