"""Data generators: mutation trees and NK landscapes/simulator.

Ports the assertions of the reference's ``tests/test_ground_truth.py`` and
``tests/test_nk_model_new.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth, mutate
from trex_tpu.models.nk import (
    NKLandscape,
    batched_sequence_fitness,
    evolve_tree,
    evolve_tree_on_adjacency,
    make_landscape,
    sequence_fitness,
)
from trex_tpu.topology import balanced_topology


class TestMutate:
    def test_exact_mutation_count(self):
        seq = jnp.zeros(50, dtype=jnp.int8)
        for n_mut in [0, 1, 5, 20]:
            out = mutate(jax.random.PRNGKey(0), seq, 4, n_mut)
            assert int((np.asarray(out) != 0).sum()) == n_mut

    def test_mutations_never_silent(self):
        """Offset in 1..Q-1 guarantees the state actually changes."""
        seq = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, 4).astype(jnp.int8)
        for s in range(5):
            out = mutate(jax.random.PRNGKey(s), seq, 4, 10)
            assert int((np.asarray(out) != np.asarray(seq)).sum()) == 10

    def test_states_stay_in_alphabet(self):
        seq = jnp.full((30,), 3, dtype=jnp.int8)
        out = np.asarray(mutate(jax.random.PRNGKey(2), seq, 4, 30))
        assert out.min() >= 0 and out.max() < 4


class TestGroundTruth:
    def test_shapes_and_masking(self):
        gt = generate_groundtruth(8, 4, 2, 30, seed=0)
        assert gt.all_sequences.shape == (15, 30)
        assert gt.masked_sequences.shape == (15, 30)
        assert gt.adjacency.shape == (15, 15)
        np.testing.assert_array_equal(
            np.asarray(gt.masked_sequences[8:]), np.zeros((7, 30))
        )
        np.testing.assert_array_equal(
            np.asarray(gt.masked_sequences[:8]), np.asarray(gt.all_sequences[:8])
        )

    def test_every_edge_has_exact_mutations(self):
        n_leaves, n_mut = 8, 3
        gt = generate_groundtruth(n_leaves, 4, n_mut, 40, seed=42)
        adj = np.asarray(gt.adjacency)
        seqs = np.asarray(gt.all_sequences)
        for child in range(2 * n_leaves - 2):
            parent = adj[child].argmax()
            assert (seqs[child] != seqs[parent]).sum() == n_mut

    def test_adjacency_structure(self):
        gt = generate_groundtruth(4, 4, 1, 10)
        adj = np.asarray(gt.adjacency)
        assert set(np.unique(adj)) <= {0.0, 1.0}
        assert adj[-1, -1] == 0  # no root self-loop
        # Every ancestor column has exactly two children.
        for a in range(4, 7):
            assert adj[:, a].sum() == 2

    def test_root_is_zeros(self):
        gt = generate_groundtruth(4, 4, 2, 12, seed=1)
        np.testing.assert_array_equal(np.asarray(gt.all_sequences[-1]), np.zeros(12))

    def test_power_of_two_required(self):
        with pytest.raises(ValueError):
            generate_groundtruth(6, 4, 1, 10)


class TestNKModel:
    @pytest.fixture
    def landscape(self):
        return make_landscape(16, 2, jax.random.PRNGKey(0), n_states=2)

    def test_landscape_shapes(self, landscape):
        assert landscape.interactions.shape == (16, 2)
        assert landscape.tables.shape == (16, 2 ** 3)
        assert int(landscape.interactions.max()) < 16

    def test_fitness_scalar_in_range(self, landscape):
        seq = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 2)
        f = sequence_fitness(seq, landscape)
        assert f.shape == ()
        assert 0.0 <= float(f) <= 1.0  # mean of uniform(0,1) entries

    def test_fitness_masked_mean(self, landscape):
        seq = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 2)
        full = sequence_fitness(seq, landscape)
        mask = jnp.ones(16, dtype=bool)
        assert float(sequence_fitness(seq, landscape, mask)) == pytest.approx(
            float(full), rel=1e-6
        )
        half = jnp.arange(16) < 8
        f_half = sequence_fitness(seq, landscape, half)
        assert f_half.shape == ()

    def test_batched_fitness(self, landscape):
        seqs = jax.random.randint(jax.random.PRNGKey(2), (5, 16), 0, 2)
        fs = batched_sequence_fitness(seqs, landscape)
        assert fs.shape == (5,)

    def test_evolve_tree_fills_all_nodes(self, landscape):
        topo = balanced_topology(8)
        root = jnp.zeros(16, dtype=jnp.int32)
        seqs = evolve_tree(
            landscape, topo, root, 0.2, jax.random.PRNGKey(3), branch_length=2
        )
        assert seqs.shape == (15, 16)
        np.testing.assert_array_equal(np.asarray(seqs[-1]), np.zeros(16))
        assert int(seqs.max()) < 2

    def test_longer_branches_diverge_more(self, landscape):
        """Behavioral check from the reference (test_nk_model_new.py:48-68)."""
        topo = balanced_topology(8)
        root = jnp.zeros(16, dtype=jnp.int32)
        short = evolve_tree(
            landscape, topo, root, 0.3, jax.random.PRNGKey(4), branch_length=1
        )
        long = evolve_tree(
            landscape, topo, root, 0.3, jax.random.PRNGKey(4), branch_length=10
        )
        d_short = int((np.asarray(short[:8]) != 0).sum())
        d_long = int((np.asarray(long[:8]) != 0).sum())
        assert d_long > d_short

    def test_adjacency_wrapper(self, landscape):
        gt_adj = np.zeros((15, 15), np.float32)
        topo = balanced_topology(8)
        parents = np.asarray(topo.parents)
        for j in range(14):
            gt_adj[j, parents[j]] = 1
        data = evolve_tree_on_adjacency(
            landscape,
            jnp.asarray(gt_adj),
            jnp.zeros(16, dtype=jnp.int32),
            0.2,
            jax.random.PRNGKey(5),
        )
        assert data.all_sequences.shape == (15, 16)
        np.testing.assert_array_equal(np.asarray(data.adjacency), gt_adj)

    def test_landscape_is_pytree(self, landscape):
        leaves = jax.tree_util.tree_leaves(landscape)
        assert len(leaves) == 2

        @jax.jit
        def f(ls: NKLandscape, seq):
            return sequence_fitness(seq, ls)

        seq = jnp.zeros(16, dtype=jnp.int32)
        assert jnp.isfinite(f(landscape, seq))


def test_evolve_tree_random_topology_order():
    """Root-down walk is valid on arbitrary (non-balanced) topologies."""
    from trex_tpu.topology import random_topologies

    landscape = make_landscape(12, 2, jax.random.PRNGKey(10), n_states=2)
    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(11), 16, 1)
    )
    root = jnp.zeros(12, dtype=jnp.int32)
    seqs = evolve_tree(
        landscape, topo, root, 0.4, jax.random.PRNGKey(12), branch_length=3
    )
    assert seqs.shape == (31, 12)
    parents = np.asarray(topo.parents)
    s = np.asarray(seqs)
    # Every non-root node evolved FROM its parent's final sequence: with
    # rate 0 it must copy the parent exactly.
    seqs0 = evolve_tree(
        landscape, topo, root, 0.0, jax.random.PRNGKey(13), branch_length=1,
        coupled_prob=0.0,
    )
    s0 = np.asarray(seqs0)
    for node in range(30):
        np.testing.assert_array_equal(s0[node], s0[parents[node]])
