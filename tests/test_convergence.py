"""End-to-end convergence: the reference's three regimes, same tolerances.

Port of ``/root/reference/tests/test_convergence.py``:
1. fixed topology + learned sequences  -> Sankoff score within atol 2.0;
2. fixed sequences + learned topology  -> Sankoff score within atol 1.0;
3. joint optimization                  -> score <= Sankoff (soft can cheat).

Exact Sankoff is the oracle throughout.
"""

import jax
import jax.numpy as jnp
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.costs import exact_cost, surrogate_cost
from trex_tpu.ops.relax import discretize_topology, soft_sequences, soft_topology
from trex_tpu.ops.sankoff import sankoff_reconstruct
from trex_tpu.search.joint import (
    joint_search,
    JointConfig,
    extract_solution,
    fit_topology,
    init_params,
    joint_optimize,
)
from trex_tpu.topology import balanced_topology
from trex_tpu.types import CostModel


@pytest.fixture(scope="module")
def case():
    n_leaves, seq_length, n_states, n_mutations = 4, 20, 4, 3
    n_all = 2 * n_leaves - 1
    gt = generate_groundtruth(n_leaves, n_states, n_mutations, seq_length, seed=42)
    cost = CostModel.hamming(n_states).matrix
    leaf = gt.all_sequences[:n_leaves].astype(jnp.int32)
    recon, _, sankoff_score_val = sankoff_reconstruct(
        balanced_topology(n_leaves), cost, leaf
    )
    # Internal oracle: the DP score must equal the realized edge cost of its
    # own reconstruction (reference sanity check, test_convergence.py:69-73).
    realized = exact_cost(jax.nn.one_hot(recon, n_states), gt.adjacency, cost)
    assert float(realized) == pytest.approx(float(sankoff_score_val), abs=1e-3)

    leaf_tensor = jnp.zeros((n_all, seq_length, n_states))
    leaf_tensor = leaf_tensor.at[:n_leaves].set(jax.nn.one_hot(leaf, n_states))
    return dict(
        gt=gt,
        cost=cost,
        leaf=leaf,
        leaf_tensor=leaf_tensor,
        sankoff_seqs=recon,
        sankoff_score=float(sankoff_score_val),
        n_leaves=n_leaves,
        n_all=n_all,
        n_states=n_states,
        seq_length=seq_length,
    )


def test_fixed_topology_learned_sequences(case):
    key = jax.random.PRNGKey(42)
    params = init_params(key, case["n_leaves"], case["seq_length"], case["n_states"])
    gt_adj_rows = jax.nn.one_hot(
        jnp.argmax(case["gt"].adjacency, axis=1), case["n_all"]
    )
    cfg = JointConfig(
        n_iterations=5000,
        learning_rate=0.01,
        learn_topology=False,
        temp_start=1.0,
        temp_end=1.0,
    )
    params, losses = joint_optimize(
        key, params, case["leaf_tensor"], cfg, fixed_adjacency=gt_adj_rows
    )
    learned = soft_sequences(
        params["ancestors"], case["leaf_tensor"], case["n_leaves"], temperature=0.01
    )
    score = exact_cost(learned, case["gt"].adjacency, case["cost"])
    assert float(score) == pytest.approx(case["sankoff_score"], abs=2.0)


def test_fixed_sequences_learned_topology(case):
    key = jax.random.PRNGKey(42)
    seqs_one_hot = jax.nn.one_hot(case["sankoff_seqs"], case["n_states"])
    params, losses = fit_topology(key, seqs_one_hot, n_iterations=3000)
    learned_tree = soft_topology(
        jax.random.PRNGKey(7), params["tree_params"], temperature=0.01
    )
    score = exact_cost(seqs_one_hot, learned_tree, case["cost"])
    assert float(score) == pytest.approx(case["sankoff_score"], abs=1.0)


def test_joint_optimization(case):
    key = jax.random.PRNGKey(42)
    cfg = JointConfig(n_iterations=5000, learning_rate=0.01)
    params, losses, score = joint_search(
        key, case["leaf_tensor"], case["cost"], cfg, n_restarts=8
    )
    # Soft scoring can cheat, so <= is the reference's bar
    # (test_convergence.py:299).
    assert float(score) <= case["sankoff_score"]


def test_joint_loss_curve_decreases(case):
    key = jax.random.PRNGKey(0)
    params = init_params(key, case["n_leaves"], case["seq_length"], case["n_states"])
    cfg = JointConfig(n_iterations=400)
    _, losses = joint_optimize(key, params, case["leaf_tensor"], cfg)
    assert float(losses[-1]) < float(losses[0])
