"""Synthetic data generators: mutation trees and NK fitness landscapes."""

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
    "mutate",
    "generate_groundtruth",
    "NKLandscape",
    "make_landscape",
    "sequence_fitness",
    "batched_sequence_fitness",
    "evolve_tree",
    "evolve_tree_on_adjacency",
]
