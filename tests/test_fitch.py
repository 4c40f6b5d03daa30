"""Fitch bitset parsimony: equivalence with Sankoff, kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.costs import exact_cost
from trex_tpu.ops.fitch import batched_fitch_score, fitch_reconstruct, fitch_score
from trex_tpu.ops.sankoff import batched_sankoff_score, sankoff_score
from trex_tpu.ops.sankoff_pallas import batched_fitch_score_pallas
from trex_tpu.topology import balanced_topology, random_topologies, topology_to_adjacency
from trex_tpu.types import CostModel


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 20), (8, 2, 33), (16, 20, 40)])
def test_fitch_equals_sankoff_hamming(n_leaves, q, length):
    """Fitch == unit-cost Sankoff on every topology/alphabet tried."""
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, 8)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    sankoff = batched_sankoff_score(topos, cost, leaf)
    fitch = batched_fitch_score(topos, leaf)
    np.testing.assert_array_equal(np.asarray(fitch), np.asarray(sankoff))


def test_fitch_pallas_matches_lax_interpret():
    n_leaves, q, length = 8, 4, 2048  # spans two site blocks
    topos = random_topologies(jax.random.PRNGKey(2), n_leaves, 4)
    leaf = jax.random.randint(jax.random.PRNGKey(3), (n_leaves, length), 0, q)
    want = batched_fitch_score(topos, leaf)
    got = batched_fitch_score_pallas(topos, leaf, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fitch_pallas_handles_unaligned_lengths():
    """Non-tile-multiple L is zero-padded; padded sites add no events."""
    n_leaves, q, length = 8, 4, 777
    topos = random_topologies(jax.random.PRNGKey(4), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(5), (n_leaves, length), 0, q)
    want = batched_fitch_score(topos, leaf)
    got = batched_fitch_score_pallas(topos, leaf, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fitch_reconstruct_achieves_score():
    n_leaves, q, length = 8, 4, 50
    topo = balanced_topology(n_leaves)
    leaf = jax.random.randint(jax.random.PRNGKey(6), (n_leaves, length), 0, q)
    chosen, score = fitch_reconstruct(topo, leaf, q)
    assert float(score) == float(
        sankoff_score(topo, CostModel.hamming(q).matrix, leaf)
    )
    np.testing.assert_array_equal(np.asarray(chosen[:n_leaves]), np.asarray(leaf))
    realized = exact_cost(
        jax.nn.one_hot(chosen, q),
        topology_to_adjacency(topo),
        CostModel.hamming(q).matrix,
    )
    assert float(realized) == float(score)


def test_fitch_site_mask():
    topo = balanced_topology(4)
    leaf = jax.random.randint(jax.random.PRNGKey(7), (4, 10), 0, 4)
    padded = jnp.pad(leaf, ((0, 0), (0, 6)), constant_values=3)
    mask = jnp.arange(16) < 10
    assert float(fitch_score(topo, leaf)) == float(
        fitch_score(topo, padded, site_mask=mask)
    )


@pytest.mark.parametrize("trees_per_block", [2, 4, 8])
def test_fitch_pallas_multi_tree_parity(trees_per_block):
    n_leaves, q, length = 8, 4, 1024
    topos = random_topologies(jax.random.PRNGKey(8), n_leaves, 6)  # 6 % T != 0
    leaf = jax.random.randint(jax.random.PRNGKey(9), (n_leaves, length), 0, q)
    want = batched_fitch_score_pallas(topos, leaf, interpret=True)
    got = batched_fitch_score_pallas(
        topos, leaf, interpret=True, trees_per_block=trees_per_block
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fitch_pallas_large_tree_pack_shrink():
    """512-leaf trees shrink the node tile to stay in the VMEM budget."""
    n_leaves, q, length = 512, 4, 256
    topos = random_topologies(jax.random.PRNGKey(12), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(13), (n_leaves, length), 0, q)
    want = batched_fitch_score(topos, leaf)
    got = batched_fitch_score_pallas(topos, leaf, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fitch_sankoff_equivalence_fuzz():
    """Heavier randomized equivalence sweep across shapes and alphabets."""
    rng = np.random.default_rng(0)
    for trial in range(6):
        n_leaves = int(rng.choice([4, 8, 16, 32]))
        q = int(rng.choice([2, 4, 20, 31]))
        length = int(rng.integers(5, 90))
        topos = random_topologies(jax.random.PRNGKey(trial), n_leaves, 3)
        leaf = jax.random.randint(
            jax.random.PRNGKey(100 + trial), (n_leaves, length), 0, q
        )
        cost = CostModel.hamming(q).matrix
        sankoff = batched_sankoff_score(topos, cost, leaf)
        fitch = batched_fitch_score(topos, leaf)
        np.testing.assert_array_equal(np.asarray(fitch), np.asarray(sankoff))


def test_fitch_state_sets_and_ambiguity():
    from trex_tpu.ops.fitch import fitch_state_sets

    topo = balanced_topology(4)
    # Site 0: all leaves agree -> every node set = {0}, ambiguity 1.
    # Site 1: leaves 0,1 = state 0; leaves 2,3 = state 1 -> root ambiguous.
    leaf = jnp.array([[0, 0], [0, 0], [0, 1], [0, 1]], dtype=jnp.int32)
    sets, amb = fitch_state_sets(topo, leaf)
    assert sets.shape == (7, 2) and amb.shape == (7, 2)
    np.testing.assert_array_equal(np.asarray(amb[:, 0]), np.ones(7))
    assert int(amb[-1, 1]) == 2  # root set {0,1}
    assert int(sets[-1, 1]) == 0b11
    np.testing.assert_array_equal(np.asarray(amb[:4]), np.ones((4, 2)))


def test_fitch_pallas_weighted_compressed_patterns():
    """Kernel weighted scoring == plain scoring on compressed patterns."""
    from trex_tpu.alignment import compress_alignment

    n_leaves, q, length = 8, 2, 300
    topos = random_topologies(jax.random.PRNGKey(14), n_leaves, 4)
    leaf = jax.random.randint(jax.random.PRNGKey(15), (n_leaves, length), 0, q)
    patterns, weights = compress_alignment(np.asarray(leaf))
    full = batched_fitch_score_pallas(topos, leaf, interpret=True)
    compressed = batched_fitch_score_pallas(
        topos,
        jnp.asarray(patterns),
        site_weights=jnp.asarray(weights, jnp.float32),
        interpret=True,
        trees_per_block=2,
    )
    np.testing.assert_array_equal(np.asarray(compressed), np.asarray(full))


@pytest.mark.parametrize("trees_per_block", [1, 2])
def test_fitch_swar_packing_parity(trees_per_block):
    # 4-sites-per-word SWAR variant == lax Fitch exactly, weighted,
    # at lengths that exercise padding and multi-word packing.
    rng = np.random.default_rng(17)
    n_leaves, length, batch = 10, 300, 5
    topos = random_topologies(jax.random.PRNGKey(17), n_leaves, batch)
    seqs = rng.integers(0, 4, size=(n_leaves, length)).astype(np.int32)
    weights = jnp.asarray(rng.integers(1, 4, size=length), jnp.float32)
    expected = jnp.stack(
        [
            fitch_score(
                jax.tree_util.tree_map(lambda a, i=i: a[i], topos),
                jnp.asarray(seqs), site_mask=weights,
            )
            for i in range(batch)
        ]
    )
    got = batched_fitch_score_pallas(
        topos, jnp.asarray(seqs), site_weights=weights, interpret=True,
        trees_per_block=trees_per_block, site_packing=4, n_states=4,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_fitch_swar_packing_masks_and_validation():
    rng = np.random.default_rng(19)
    topos = random_topologies(jax.random.PRNGKey(19), 8, 3)
    seqs = rng.integers(0, 4, size=(8, 70)).astype(np.int32)
    masks = (1 << seqs).astype(np.int32)
    masks[1, :6] = 0b1111
    expected = jnp.stack(
        [
            fitch_score(
                jax.tree_util.tree_map(lambda a, i=i: a[i], topos),
                jnp.asarray(masks), sequences_are_masks=True,
            )
            for i in range(3)
        ]
    )
    got = batched_fitch_score_pallas(
        topos, jnp.asarray(masks), interpret=True,
        site_packing=4, n_states=4, sequences_are_masks=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    with pytest.raises(ValueError, match="n_states <= 8"):
        batched_fitch_score_pallas(
            topos, jnp.asarray(seqs), interpret=True,
            site_packing=4, n_states=20,
        )
    with pytest.raises(ValueError, match="site_packing"):
        batched_fitch_score_pallas(
            topos, jnp.asarray(seqs), interpret=True, site_packing=3,
        )
