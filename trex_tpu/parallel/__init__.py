"""Multi-chip scaling: device meshes, sharded scoring, distributed init."""

from trex_tpu.parallel.mesh import make_mesh, TREE_AXIS, SITE_AXIS
from trex_tpu.parallel.sharded import (
    sharded_batch_scores,
    sharded_best_tree,
    sharded_joint_step,
    sharded_log_likelihoods,
    sharded_per_site_matrix,
    sharded_spr_scan,
    make_sharded_joint_step,
    make_sharded_restart_joint_step,
)
from trex_tpu.parallel.distributed import initialize_distributed

__all__ = [
    "make_mesh",
    "TREE_AXIS",
    "SITE_AXIS",
    "sharded_batch_scores",
    "sharded_best_tree",
    "sharded_joint_step",
    "sharded_log_likelihoods",
    "sharded_per_site_matrix",
    "sharded_spr_scan",
    "make_sharded_joint_step",
    "make_sharded_restart_joint_step",
    "initialize_distributed",
]
