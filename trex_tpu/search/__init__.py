"""Gradient-based search drivers: ASR, landscape-aware ASR, joint optimization."""

from trex_tpu.search.optimizers import make_optimizer
from trex_tpu.search.asr import (
    reconstruct_ancestors,
    reconstruct_ancestors_landscape_aware,
    parental_logits,
)
from trex_tpu.search.hillclimb import (
    parsimony_hill_climb,
    batched_random_restarts,
    constrained_start,
    constraint_mask,
    SearchResult,
)
from trex_tpu.search.bootstrap import (
    bootstrap_site_weights,
    bootstrap_scores,
    bootstrap_analysis,
    ml_bootstrap_analysis,
    split_support,
)
from trex_tpu.search.consensus import majority_rule_consensus, consensus_topology
from trex_tpu.search.ratchet import (
    parsimony_ratchet,
    rf_distance_unrooted,
    robinson_foulds,
    unrooted_splits,
)
from trex_tpu.search.alrt import BranchSupports, branch_supports
from trex_tpu.search.bremer import spr_decay_support
from trex_tpu.search.topotest import TopologyTestResult, topology_tests
from trex_tpu.search.ufboot import (
    UFBootResult,
    default_candidates,
    ultrafast_bootstrap,
)
from trex_tpu.search.model_select import (
    ModelFit,
    compare_models,
    count_parameters,
)
from trex_tpu.search.nj import neighbor_joining, nj_bootstrap, nj_start_tree, upgma
from trex_tpu.search.stepwise import stepwise_addition, stepwise_addition_multi
from trex_tpu.search.ml import ml_hill_climb, ml_iterated_search
from trex_tpu.search.mcmc import McmcResult, mcmc_sample
from trex_tpu.search.dating import DatingResult, mcmc_date
from trex_tpu.search.marginal import stepping_stone
from trex_tpu.search.treedist import (
    branch_score_distance,
    patristic_matrix,
    path_difference_distance,
    weighted_rf_distance,
)
from trex_tpu.search.concordance import (
    ConcordanceResult,
    concordance_factors,
    gene_concordance,
    site_concordance,
)
from trex_tpu.search.runner import RunnerConfig, run_search
from trex_tpu.search.joint import (
    JointConfig,
    joint_optimize,
    joint_search,
    evaluate_solution,
    extract_solution,
    init_params,
    fit_topology,
)

__all__ = [
    "make_optimizer",
    "reconstruct_ancestors",
    "reconstruct_ancestors_landscape_aware",
    "parental_logits",
    "JointConfig",
    "joint_optimize",
    "joint_search",
    "evaluate_solution",
    "extract_solution",
    "init_params",
    "fit_topology",
    "parsimony_hill_climb",
    "batched_random_restarts",
    "constrained_start",
    "constraint_mask",
    "SearchResult",
    "bootstrap_site_weights",
    "bootstrap_scores",
    "bootstrap_analysis",
    "ml_bootstrap_analysis",
    "split_support",
    "majority_rule_consensus",
    "consensus_topology",
    "parsimony_ratchet",
    "robinson_foulds",
    "rf_distance_unrooted",
    "unrooted_splits",
    "BranchSupports",
    "branch_supports",
    "spr_decay_support",
    "TopologyTestResult",
    "topology_tests",
    "UFBootResult",
    "default_candidates",
    "ultrafast_bootstrap",
    "ModelFit",
    "compare_models",
    "count_parameters",
    "neighbor_joining",
    "nj_bootstrap",
    "nj_start_tree",
    "upgma",
    "stepwise_addition",
    "stepwise_addition_multi",
    "ml_hill_climb",
    "ml_iterated_search",
    "McmcResult",
    "mcmc_sample",
    "DatingResult",
    "mcmc_date",
    "stepping_stone",
    "branch_score_distance",
    "patristic_matrix",
    "path_difference_distance",
    "weighted_rf_distance",
    "ConcordanceResult",
    "concordance_factors",
    "gene_concordance",
    "site_concordance",
    "RunnerConfig",
    "run_search",
]
