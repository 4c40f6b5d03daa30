"""Backend dispatch: pick the fastest scoring implementation per platform.

The Pallas fused kernel (``sankoff_pallas``) is the production TPU path; the
lax formulation is the oracle and the fallback everywhere else (CPU tests,
interpret-mode parity, platforms without Mosaic). Hamming substitution costs
(the reference's universal choice) take O(Q) closed-form message paths in
both backends.
"""

from __future__ import annotations

import jax
import numpy as np

from trex_tpu.ops.sankoff import batched_sankoff_score
from trex_tpu.topology import Topology


def _is_hamming(cost_matrix) -> bool:
    try:
        c = np.asarray(cost_matrix)
    except jax.errors.TracerArrayConversionError:
        return False
    q = c.shape[-1]
    return bool(np.array_equal(c, np.ones((q, q)) - np.eye(q)))


def batched_scores_fastest(
    topologies: Topology,
    cost_matrix: jax.Array,
    leaf_sequences: jax.Array,
    site_weights: jax.Array | None = None,
    *,
    sequences_are_masks: bool = False,
) -> jax.Array:
    """Score a candidate batch with the fastest available backend.

    Selection: Hamming cost + n_states<=32 -> Fitch bitsets (fused kernel on
    TPU, lax elsewhere); other costs -> min-plus Sankoff (fused kernel on
    TPU, lax elsewhere). ``sequences_are_masks``: leaves are int32 state-set
    bitmasks (IUPAC ambiguity / gaps), not integer states.

    Do NOT wrap this dispatcher in ``jax.jit``: fast-path selection inspects
    the concrete cost matrix (a traced matrix conservatively falls back to
    the general min-plus path). The selected implementations are jitted.
    """
    hamming = _is_hamming(cost_matrix) and cost_matrix.shape[-1] <= 32
    on_tpu = jax.default_backend() == "tpu"
    if hamming:
        if on_tpu:
            from trex_tpu.ops.sankoff_pallas import batched_fitch_score_pallas

            # trees_per_block auto-picked by the kernel (SMEM-safe cap; see
            # batched_fitch_score_pallas docstring). Long alignments take
            # the SWAR 4-sites-per-word variant: slower per dependent step
            # but 4x fewer site blocks — with the carried-count kernels the
            # crossover is ~3k sites on v5e (nodes2 755k vs swar 629k
            # trees/s at 2048; swar 458k vs 375k at 4096, 234k vs 189k at
            # 8192). Small ancestor counts also get a full loop unroll
            # (+6% measured at 64 taxa; bounded n_anc keeps compiles fast).
            q = cost_matrix.shape[-1]
            n_anc = topologies.children.shape[-2]
            packing = (
                4
                if q <= 8 and n_anc <= 255 and leaf_sequences.shape[-1] > 3072
                else 1
            )
            unroll = n_anc if (packing == 1 and n_anc <= 64) else 1
            return batched_fitch_score_pallas(
                topologies, leaf_sequences,
                site_weights=site_weights,
                sequences_are_masks=sequences_are_masks,
                site_packing=packing, n_states=q, unroll=unroll,
            )
        from trex_tpu.ops.fitch import fitch_score

        return jax.vmap(
            lambda t: fitch_score(
                t, leaf_sequences, site_mask=site_weights,
                sequences_are_masks=sequences_are_masks,
            )
        )(topologies)
    from trex_tpu.ops.sankoff import sankoff_score

    if on_tpu and not sequences_are_masks:
        from trex_tpu.ops.sankoff_pallas import batched_sankoff_score_pallas

        return batched_sankoff_score_pallas(
            topologies, cost_matrix, leaf_sequences,
            site_weights=site_weights, hamming=False,
        )
    return jax.vmap(
        lambda t: sankoff_score(
            t, cost_matrix, leaf_sequences, site_mask=site_weights,
            sequences_are_masks=sequences_are_masks,
        )
    )(topologies)
