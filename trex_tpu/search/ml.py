"""Maximum-likelihood tree search.

Reuses the discrete search machinery (NNI/SPR neighborhoods, batched device
scoring) with the Felsenstein pruning likelihood as the objective: candidate
ranking uses a fixed per-branch length (standard fast heuristic), and the
winner gets gradient-optimized branch lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trex_tpu.ops.likelihood import (
    optimize_branch_lengths,
    tree_log_likelihood,
)
from trex_tpu.search.hillclimb import SearchResult, parsimony_hill_climb
from trex_tpu.topology import Topology


def ml_hill_climb(
    start: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    ranking_branch_length: float = 0.1,
    max_rounds: int = 50,
    neighborhood: str = "spr",
    optimize_final_lengths: bool = True,
    n_length_iterations: int = 400,
    length_optimizer: str = "newton",
    sequences_are_masks: bool = False,
    site_weights: jax.Array | None = None,
) -> tuple[SearchResult, jax.Array, jax.Array]:
    """Greedy ML topology search + final branch-length optimization.

    Candidates are ranked by log-likelihood with every branch fixed at
    ``ranking_branch_length`` (negated so the hill climber minimizes).
    ``sequences_are_masks``: leaves are int32 state-set bitmasks (IUPAC
    ambiguity / gaps). ``site_weights``: per-site log-lik multiplicities
    (compressed site patterns / bootstrap) — exact, since the total
    log-likelihood is a weighted site-sum. ``length_optimizer``: "newton"
    (default — damped analytic Newton sweeps, ~10x fewer likelihood passes)
    or "adam" (``n_length_iterations`` gradient steps).

    Returns:
        (search_result, branch_lengths, loss_curve): the result's ``score``
        is the negative ranking log-likelihood; ``branch_lengths`` are the
        ML-optimized lengths of the best topology (or the fixed lengths when
        ``optimize_final_lengths`` is False).
    """
    n_all = start.n_all

    on_tpu = jax.default_backend() == "tpu"

    def score_batch(topos, _cost, leaves):
        batch = topos.children.shape[0]
        blens = jnp.full((batch, n_all), ranking_branch_length)
        if on_tpu:
            from trex_tpu.ops.likelihood_pallas import (
                batched_log_likelihood_pallas,
            )

            # T=2 measured fastest on v5e at 64 taxa (interleaved: ~96k
            # trees/s vs 78k at T=1 and 84k at T=4; T=8 fails to compile —
            # f32 DP tables are 8x the Fitch bitsets, so the sweet spot is
            # lower than the Fitch kernel's).
            return -batched_log_likelihood_pallas(
                topos, blens, leaves, n_states, trees_per_block=2,
                sequences_are_masks=sequences_are_masks,
                site_weights=site_weights,
            )
        return -jax.vmap(
            lambda t, b: tree_log_likelihood(
                t, b, leaves, n_states, site_mask=site_weights,
                sequences_are_masks=sequences_are_masks,
            )
        )(topos, blens)

    dummy_cost = jnp.zeros((n_states, n_states))
    result = parsimony_hill_climb(
        start,
        dummy_cost,
        leaf_sequences,
        max_rounds=max_rounds,
        score_batch_fn=score_batch,
        neighborhood=neighborhood,
    )
    if optimize_final_lengths:
        if length_optimizer == "newton":
            from trex_tpu.ops.likelihood_asr import (
                optimize_branch_lengths_newton,
            )

            lengths, losses = optimize_branch_lengths_newton(
                result.topology,
                leaf_sequences,
                n_states,
                site_weights=site_weights,
                sequences_are_masks=sequences_are_masks,
                init_length=ranking_branch_length,
            )
        else:
            lengths, losses = optimize_branch_lengths(
                result.topology,
                leaf_sequences,
                n_states,
                init_length=ranking_branch_length,
                n_iterations=n_length_iterations,
                sequences_are_masks=sequences_are_masks,
                site_weights=site_weights,
            )
    else:
        lengths = jnp.full((n_all,), ranking_branch_length)
        losses = jnp.asarray([result.score])
    return result, lengths, losses
