"""Data models: mutation trees, NK fitness landscapes, codon substitution."""

from trex_tpu.models import codon
from trex_tpu.models.mutation_tree import mutate, generate_groundtruth
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
    "NKLandscape",
    "make_landscape",
    "sequence_fitness",
    "batched_sequence_fitness",
    "evolve_tree",
    "evolve_tree_on_adjacency",
]
