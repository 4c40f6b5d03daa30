"""Backend dispatch: pick the fastest scoring implementation per platform.

The Pallas fused kernel (``sankoff_pallas``) is the production TPU path; the
lax formulation is the oracle and the fallback everywhere else (CPU tests,
interpret-mode parity, platforms without Mosaic).
"""

from __future__ import annotations

import jax

from trex_tpu.ops.sankoff import batched_sankoff_score
from trex_tpu.topology import Topology


def batched_scores_fastest(
    topologies: Topology,
    cost_matrix: jax.Array,
    leaf_sequences: jax.Array,
) -> jax.Array:
    """Score a candidate batch with the fastest available backend."""
    if jax.default_backend() == "tpu":
        try:
            from trex_tpu.ops.sankoff_pallas import batched_sankoff_score_pallas

            return batched_sankoff_score_pallas(topologies, cost_matrix, leaf_sequences)
        except ImportError:
            pass
    return batched_sankoff_score(topologies, cost_matrix, leaf_sequences)
