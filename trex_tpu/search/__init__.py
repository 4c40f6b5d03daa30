"""Gradient-based search drivers: ASR, landscape-aware ASR, joint optimization."""

from trex_tpu.search.optimizers import make_optimizer
from trex_tpu.search.asr import (
    reconstruct_ancestors,
    reconstruct_ancestors_landscape_aware,
    parental_logits,
)
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
]
