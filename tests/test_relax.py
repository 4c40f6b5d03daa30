"""Relaxation layer: soft topology structure, soft sequences, penalties, STE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.relax import (
    binary_tree_penalty,
    discretize_topology,
    joint_loss,
    soft_sequences,
    soft_topology,
    straight_through,
)


def make_params(key, n_leaves, length=8, q=4):
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    k1, k2 = jax.random.split(key)
    return {
        "tree_params": jax.random.normal(k1, (n_all - 1, n_anc)),
        "ancestors": jax.random.normal(k2, (n_anc, length, q)),
    }


@pytest.mark.parametrize("n_leaves", [2, 4, 8])
def test_soft_topology_rows_are_distributions(n_leaves):
    params = make_params(jax.random.PRNGKey(0), n_leaves)
    adj = soft_topology(jax.random.PRNGKey(1), params["tree_params"])
    n_all = 2 * n_leaves - 1
    assert adj.shape == (n_all, n_all)
    np.testing.assert_allclose(np.asarray(adj.sum(axis=1)), 1.0, rtol=1e-5)
    assert jnp.all(adj >= 0)


def test_soft_topology_structural_masks():
    """Leaves attach only to ancestors; ancestor block strictly upper-tri;
    root attaches to itself (tree.py:84-105)."""
    n_leaves = 4
    params = make_params(jax.random.PRNGKey(0), n_leaves)
    adj = np.asarray(soft_topology(jax.random.PRNGKey(1), params["tree_params"]))
    n_all = 2 * n_leaves - 1
    # No mass on leaf columns.
    assert adj[:, :n_leaves].max() == 0.0
    # Ancestor i cannot parent to ancestor j <= i.
    for i in range(n_leaves, n_all - 1):
        for j in range(n_leaves, i + 1):
            assert adj[i, j] == 0.0
    # Root row: all mass on itself.
    assert adj[-1, -1] == pytest.approx(1.0)


def test_soft_topology_no_ancestors_degenerate():
    """n_ancestors == 0 returns identity (tree.py:68-69)."""
    adj = soft_topology(jax.random.PRNGKey(0), jnp.zeros((0, 0)))
    np.testing.assert_array_equal(np.asarray(adj), np.eye(1))


def test_soft_topology_temperature_sharpens():
    params = make_params(jax.random.PRNGKey(0), 8)
    key = jax.random.PRNGKey(1)
    hot = soft_topology(key, params["tree_params"], temperature=5.0)
    cold = soft_topology(key, params["tree_params"], temperature=0.01)
    # Colder -> peakier rows (larger max mass on average).
    assert float(cold.max(axis=1).mean()) > float(hot.max(axis=1).mean())


def test_soft_sequences_replaces_ancestors_only():
    n_leaves, length, q = 4, 8, 4
    n_all = 2 * n_leaves - 1
    params = make_params(jax.random.PRNGKey(0), n_leaves, length, q)
    base = jnp.zeros((n_all, length, q))
    leaves = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (n_leaves, length), 0, q), q
    )
    base = base.at[:n_leaves].set(leaves)
    out = soft_sequences(params["ancestors"], base, n_leaves, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(out[:n_leaves]), np.asarray(leaves))
    np.testing.assert_allclose(
        np.asarray(out[n_leaves:].sum(-1)), 1.0, rtol=1e-5
    )


def test_soft_sequences_temperature_multiplies():
    """Reference multiplies logits by temperature (tree.py:129) — higher
    temperature means sharper, unlike the topology convention."""
    params = make_params(jax.random.PRNGKey(0), 4)
    base = jnp.zeros((7, 8, 4))
    sharp = soft_sequences(params["ancestors"], base, 4, temperature=100.0)
    flat = soft_sequences(params["ancestors"], base, 4, temperature=0.01)
    assert float(sharp[4:].max()) > float(flat[4:].max())


def test_discretize_topology_one_hot():
    adj = soft_topology(
        jax.random.PRNGKey(1), make_params(jax.random.PRNGKey(0), 4)["tree_params"]
    )
    hard = discretize_topology(adj)
    np.testing.assert_array_equal(
        np.asarray(hard.sum(axis=1)), np.ones(7, dtype=np.float32)
    )
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}


def test_binary_tree_penalty_zero_on_valid_tree():
    from trex_tpu.topology import balanced_adjacency

    adj = balanced_adjacency(8)
    one_hot_adj = jax.nn.one_hot(jnp.argmax(adj, axis=1), 15)
    assert float(binary_tree_penalty(one_hot_adj, 10.0)) == pytest.approx(0.0)
    # A topology where one ancestor hoards three children is penalized.
    bad = one_hot_adj.at[2, :].set(0).at[2, 8].set(1)
    assert float(binary_tree_penalty(bad, 10.0)) > 0


def test_joint_loss_finite_and_differentiable():
    n_leaves, length, q = 4, 8, 4
    n_all = 2 * n_leaves - 1
    params = make_params(jax.random.PRNGKey(0), n_leaves, length, q)
    seqs = jnp.zeros((n_all, length, q))
    loss, grads = jax.value_and_grad(
        lambda p: joint_loss(jax.random.PRNGKey(3), p, seqs, temperature=1.0)
    )(params)
    assert jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.all(jnp.isfinite(leaf))


def test_straight_through_routes_gradient_to_winner():
    x = jnp.array([[0.1, 0.7, 0.2]])
    y, vjp = jax.vjp(straight_through, x)
    np.testing.assert_array_equal(np.asarray(y), [1])
    (gx,) = vjp(jnp.ones_like(y, dtype=x.dtype))
    np.testing.assert_allclose(np.asarray(gx), [[0.0, 1.0, 0.0]])


def test_project_topology_roundtrips_valid_trees():
    """Projecting a valid tree's one-hot adjacency returns the same tree."""
    import numpy as np
    from trex_tpu.ops.relax import project_topology
    from trex_tpu.topology import random_topologies, topology_to_adjacency

    topos = random_topologies(jax.random.PRNGKey(7), 16, 8)
    for b in range(8):
        topo = jax.tree_util.tree_map(lambda x: x[b], topos)
        adj = topology_to_adjacency(topo)
        proj = project_topology(adj)
        np.testing.assert_array_equal(
            np.sort(np.asarray(proj.children), axis=1),
            np.sort(np.asarray(topo.children), axis=1),
        )
        np.testing.assert_array_equal(proj.parents, topo.parents)


def test_project_topology_always_valid_on_random_soft():
    """Any row-stochastic soft adjacency projects to a valid topology."""
    import numpy as np
    from trex_tpu.ops.relax import project_topology, soft_topology

    for seed in range(4):
        logits = jax.random.normal(jax.random.PRNGKey(seed), (32 * 2 - 2, 31))
        adj = soft_topology(jax.random.PRNGKey(100 + seed), logits, 0.5)
        topo = project_topology(adj)
        ch = np.asarray(topo.children)
        n_leaves = 32
        # each node used exactly once as a child; children precede parents
        flat = ch.ravel()
        assert sorted(flat.tolist()) == list(range(2 * n_leaves - 2))
        for a in range(n_leaves - 1):
            assert ch[a, 0] < n_leaves + a and ch[a, 1] < n_leaves + a


def test_project_topology_preserves_trained_structure():
    """Projection keeps what the differentiable search learned.

    Trains the joint Gumbel-softmax relaxation for real (not a random soft
    adjacency) on data simulated from a known tree, then checks that the
    greedy projection of the TRAINED soft adjacency scores far better than
    both random trees and the projection of the untrained init — i.e. the
    learned structure survives discretization (the failure mode the
    reference's row-argmax recipe hits at scale, tree.py:31-47).
    """
    import numpy as np

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.ops.relax import project_topology, soft_topology
    from trex_tpu.ops.sankoff import batched_sankoff_score
    from trex_tpu.search.joint import JointConfig, init_params, joint_optimize
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel

    n, length, q = 8, 48, 4
    n_all = 2 * n - 1
    cost = CostModel.hamming(q).matrix
    true_topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(0), n, 1)
    )
    seqs = jnp.asarray(
        simulate_alignment(
            jax.random.PRNGKey(1), true_topo, np.full(n_all, 0.2),
            n_sites=length, n_states=q,
        )
    )
    leaf_tensor = jnp.zeros((n_all, length, q))
    leaf_tensor = leaf_tensor.at[:n].set(jax.nn.one_hot(seqs, q))

    params0 = init_params(jax.random.PRNGKey(2), n, length, q)
    cfg = JointConfig(n_iterations=600)
    trained, _ = joint_optimize(jax.random.PRNGKey(3), params0, leaf_tensor, cfg)

    def projected_score(params):
        adj = soft_topology(jax.random.PRNGKey(4), params["tree_params"], 0.01)
        topo = project_topology(adj)
        batch = jax.tree_util.tree_map(lambda x: x[None], topo)
        return float(batched_sankoff_score(batch, cost, seqs)[0])

    score_trained = projected_score(trained)
    score_init = projected_score(params0)
    rand = batched_sankoff_score(
        random_topologies(jax.random.PRNGKey(5), n, 32), cost, seqs
    )
    assert score_trained < float(jnp.mean(rand)), (score_trained, rand.mean())
    assert score_trained < score_init, (score_trained, score_init)
