"""Compute kernels: exact Sankoff DP, Pallas fused variants, soft costs, relaxations."""

from trex_tpu.ops.sankoff import (
    sankoff_score,
    sankoff_reconstruct,
    sankoff_tables,
    batched_sankoff_score,
    run_sankoff,
)
from trex_tpu.ops.costs import (
    surrogate_cost,
    soft_parsimony_cost,
    exact_cost,
)
from trex_tpu.ops.fitch import (
    fitch_score,
    batched_fitch_score,
    fitch_reconstruct,
    fitch_state_sets,
)
from trex_tpu.ops.likelihood import (
    gtr_eigensystem,
    gtr_transition,
    jc69_transition,
    tree_log_likelihood,
    batched_tree_log_likelihood,
    optimize_branch_lengths,
    optimize_model,
    discrete_gamma_rates,
    posterior_site_rates,
    tree_log_likelihood_gamma,
    tree_log_likelihood_gamma_invariant,
)
from trex_tpu.ops.likelihood_asr import (
    branch_length_gradients,
    joint_ancestral_reconstruction,
    marginal_ancestral_posteriors,
    optimize_branch_lengths_newton,
)
from trex_tpu.ops.clock import (
    ages_to_lengths,
    clock_lrt,
    increments_to_ages,
    optimize_clock,
)
from trex_tpu.ops.likelihood_scan import (
    likelihood_spr_scan,
    likelihood_spr_scan_best_segmented,
)
from trex_tpu.ops.spr_scan import (
    spr_scan,
    spr_scan_best,
    spr_scan_best_segmented,
)
from trex_tpu.ops.soft_dp import (
    soft_sankoff_score,
    soft_sankoff_score_from_sequences,
    batched_soft_sankoff_score,
)
from trex_tpu.ops.distances import (
    hamming_distance_matrix,
    p_distance_matrix,
    jc_distance_matrix,
)
from trex_tpu.ops.relax import (
    soft_topology,
    soft_sequences,
    discretize_topology,
    project_topology,
    binary_tree_penalty,
    joint_loss,
    straight_through,
)

__all__ = [
    "sankoff_score",
    "sankoff_reconstruct",
    "sankoff_tables",
    "batched_sankoff_score",
    "run_sankoff",
    "fitch_score",
    "batched_fitch_score",
    "fitch_reconstruct",
    "fitch_state_sets",
    "jc69_transition",
    "gtr_eigensystem",
    "gtr_transition",
    "tree_log_likelihood",
    "batched_tree_log_likelihood",
    "optimize_branch_lengths",
    "optimize_model",
    "discrete_gamma_rates",
    "posterior_site_rates",
    "ages_to_lengths",
    "clock_lrt",
    "increments_to_ages",
    "optimize_clock",
    "tree_log_likelihood_gamma",
    "tree_log_likelihood_gamma_invariant",
    "joint_ancestral_reconstruction",
    "marginal_ancestral_posteriors",
    "branch_length_gradients",
    "optimize_branch_lengths_newton",
    "spr_scan",
    "spr_scan_best",
    "spr_scan_best_segmented",
    "likelihood_spr_scan",
    "likelihood_spr_scan_best_segmented",
    "soft_sankoff_score",
    "soft_sankoff_score_from_sequences",
    "batched_soft_sankoff_score",
    "surrogate_cost",
    "soft_parsimony_cost",
    "exact_cost",
    "hamming_distance_matrix",
    "p_distance_matrix",
    "jc_distance_matrix",
    "soft_topology",
    "soft_sequences",
    "discretize_topology",
    "project_topology",
    "binary_tree_penalty",
    "joint_loss",
    "straight_through",
]
