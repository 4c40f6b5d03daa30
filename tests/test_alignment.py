"""Site-pattern compression: exact score preservation."""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.alignment import (
    compress_alignment,
    constant_site_mask,
    parsimony_informative_mask,
)
from trex_tpu.ops.fitch import fitch_score
from trex_tpu.ops.sankoff import sankoff_score
from trex_tpu.topology import balanced_topology, random_topologies
from trex_tpu.types import CostModel


def test_compression_shapes_and_counts():
    seqs = np.array([[0, 1, 0, 1, 2], [1, 1, 1, 1, 2], [0, 1, 0, 1, 0]])
    patterns, weights = compress_alignment(seqs)
    assert patterns.shape[1] == 3  # columns {010,111}, {111...}: unique cols
    assert weights.sum() == 5
    # First-occurrence order preserved.
    np.testing.assert_array_equal(patterns[:, 0], seqs[:, 0])


def test_compressed_scores_exact():
    n_leaves, q, length = 8, 4, 200
    key = jax.random.PRNGKey(0)
    # Low-entropy alignment -> many duplicate columns.
    seqs = jax.random.randint(key, (n_leaves, length), 0, 2)
    patterns, weights = compress_alignment(seqs)
    assert patterns.shape[1] < length  # actually compressed
    cost = CostModel.hamming(q).matrix
    topos = random_topologies(jax.random.PRNGKey(1), n_leaves, 4)
    for b in range(4):
        topo = jax.tree_util.tree_map(lambda x: x[b], topos)
        full_s = float(sankoff_score(topo, cost, seqs))
        comp_s = float(
            sankoff_score(
                topo, cost, jnp.asarray(patterns),
                site_mask=jnp.asarray(weights, jnp.float32),
            )
        )
        assert full_s == comp_s
        full_f = float(fitch_score(topo, seqs))
        comp_f = float(
            fitch_score(
                topo, jnp.asarray(patterns),
                site_mask=jnp.asarray(weights, jnp.int32),
            )
        )
        assert full_f == comp_f


def test_compression_padding():
    seqs = np.random.default_rng(0).integers(0, 2, (4, 30))
    patterns, weights = compress_alignment(seqs, pad_to=32)
    assert patterns.shape == (4, 32)
    assert weights.shape == (32,)
    assert weights.sum() == 30
    topo = balanced_topology(4)
    full = float(fitch_score(topo, jnp.asarray(seqs)))
    comp = float(
        fitch_score(
            topo, jnp.asarray(patterns), site_mask=jnp.asarray(weights)
        )
    )
    assert full == comp


def test_site_classification():
    seqs = np.array(
        [[0, 0, 1, 2], [0, 0, 1, 2], [0, 1, 2, 2], [0, 1, 2, 3]]
    )
    np.testing.assert_array_equal(
        constant_site_mask(seqs), [True, False, False, False]
    )
    info = parsimony_informative_mask(seqs)
    # col1: states {0:2, 1:2} -> informative; col2: {1:2, 2:2} -> informative;
    # col3: {2:3, 3:1} -> not.
    np.testing.assert_array_equal(info, [False, True, True, False])
