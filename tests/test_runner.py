"""Checkpointed search runner: resume is bit-identical to uninterrupted."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.search.joint import JointConfig
from trex_tpu.search.runner import RunnerConfig, run_search


def _leaf_tensor(n_leaves=4, length=16, q=4):
    gt = generate_groundtruth(n_leaves, q, 2, length, seed=0)
    n_all = 2 * n_leaves - 1
    t = jnp.zeros((n_all, length, q))
    return t.at[:n_leaves].set(
        jax.nn.one_hot(gt.all_sequences[:n_leaves].astype(jnp.int32), q)
    )


def test_run_and_resume_bit_identical(tmp_path):
    leaf_tensor = _leaf_tensor()
    joint = JointConfig(n_iterations=200, learning_rate=0.02)

    # Uninterrupted run.
    cfg_a = RunnerConfig(
        workdir=str(tmp_path / "a"), n_iterations=200, checkpoint_every=200,
        seed=7, joint=joint,
    )
    params_a = run_search(cfg_a, leaf_tensor)

    # Interrupted run: 2 segments of 50, then resume for the remaining 100.
    cfg_b = RunnerConfig(
        workdir=str(tmp_path / "b"), n_iterations=200, checkpoint_every=50,
        seed=7, joint=joint,
    )
    run_search(cfg_b, leaf_tensor, max_segments=2)
    params_b = run_search(cfg_b, leaf_tensor, resume=True)

    for k in ("tree_params", "ancestors"):
        np.testing.assert_array_equal(
            np.asarray(params_a[k]), np.asarray(params_b[k])
        )

    # Metrics were written.
    lines = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
    assert lines[-1]["step"] == 200
    # Checkpoints exist.
    assert os.path.isdir(tmp_path / "b" / "checkpoints" / "step_200")
