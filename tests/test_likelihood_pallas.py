"""Fused likelihood kernel parity vs the lax pruning (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.likelihood import (
    batched_tree_log_likelihood,
    gtr_eigensystem,
    gtr_transition,
    tree_log_likelihood,
)
from trex_tpu.ops.likelihood_pallas import batched_log_likelihood_pallas
from trex_tpu.topology import random_topologies


@pytest.mark.parametrize("n_leaves,q,length", [(4, 4, 128), (8, 4, 256), (8, 2, 128)])
def test_jc69_matches_lax(n_leaves, q, length):
    batch = 4
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    blens = jnp.asarray(
        np.random.default_rng(2).uniform(0.05, 1.0, (batch, 2 * n_leaves - 1)),
        jnp.float32,
    )
    want = batched_tree_log_likelihood(topos, blens, leaf, q)
    got = batched_log_likelihood_pallas(topos, blens, leaf, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_unaligned_length_masked():
    n_leaves, q, length = 8, 4, 300  # not lane-aligned
    topos = random_topologies(jax.random.PRNGKey(3), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(4), (n_leaves, length), 0, q)
    blens = jnp.full((2, 15), 0.3)
    want = batched_tree_log_likelihood(topos, blens, leaf, q)
    got = batched_log_likelihood_pallas(topos, blens, leaf, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_site_blocking_equivalent():
    n_leaves, q, length = 8, 4, 512
    topos = random_topologies(jax.random.PRNGKey(5), n_leaves, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(6), (n_leaves, length), 0, q)
    blens = jnp.full((2, 15), 0.25)
    a = batched_log_likelihood_pallas(
        topos, blens, leaf, q, site_block=128, interpret=True
    )
    b = batched_log_likelihood_pallas(
        topos, blens, leaf, q, site_block=512, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_gtr_matrices_path():
    rng = np.random.default_rng(7)
    q, n_leaves, length, batch = 4, 8, 128, 3
    rates = np.abs(rng.normal(1.0, 0.3, (q, q)))
    rates = (rates + rates.T) / 2
    freqs = rng.dirichlet(np.ones(q))
    topos = random_topologies(jax.random.PRNGKey(8), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(9), (n_leaves, length), 0, q)
    blens = jnp.asarray(
        rng.uniform(0.05, 0.8, (batch, 2 * n_leaves - 1)), jnp.float32
    )
    ev, left, right = gtr_eigensystem(jnp.asarray(rates), jnp.asarray(freqs))
    pmats = jax.vmap(
        jax.vmap(lambda t: gtr_transition(t, ev, left, right))
    )(blens)
    got = batched_log_likelihood_pallas(
        topos, blens, leaf, q,
        transition_matrices=pmats, root_prior=jnp.asarray(freqs),
        interpret=True,
    )
    want = jnp.stack(
        [
            tree_log_likelihood(
                jax.tree_util.tree_map(lambda x: x[b], topos),
                blens[b], leaf, q,
                rates=jnp.asarray(rates), freqs=jnp.asarray(freqs),
            )
            for b in range(batch)
        ]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


@pytest.mark.parametrize("trees_per_block", [2, 4])
def test_multi_tree_likelihood_parity(trees_per_block):
    n_leaves, q, length = 8, 4, 256
    topos = random_topologies(jax.random.PRNGKey(10), n_leaves, 5)  # 5 % T != 0
    leaf = jax.random.randint(jax.random.PRNGKey(11), (n_leaves, length), 0, q)
    blens = jnp.asarray(
        np.random.default_rng(12).uniform(0.05, 0.9, (5, 15)), jnp.float32
    )
    want = batched_log_likelihood_pallas(topos, blens, leaf, q, interpret=True)
    got = batched_log_likelihood_pallas(
        topos, blens, leaf, q, interpret=True, trees_per_block=trees_per_block
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_shared_transition_path_matches_per_node():
    """Shared fixed-length matrix == per-node matrices at the same t0."""
    import numpy as np

    from trex_tpu.ops.likelihood import jc69_transition

    rng = np.random.default_rng(7)
    B, n, L, Q = 6, 10, 96, 4
    topos = random_topologies(jax.random.key(7), n, B)
    seqs = jnp.asarray(rng.integers(0, Q, size=(n, L)).astype(np.int32))
    blens = jnp.full((B, 2 * n - 1), 0.17)
    p0 = jc69_transition(jnp.asarray(0.17), Q)
    a = batched_log_likelihood_pallas(
        topos, blens, seqs, Q, interpret=True, trees_per_block=2
    )
    b = batched_log_likelihood_pallas(
        topos, blens, seqs, Q, shared_transition=p0, interpret=True,
        trees_per_block=2,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("shared", [False, True])
@pytest.mark.parametrize("trees_per_block", [1, 2])
def test_mxu_layout_matches_lax(shared, trees_per_block):
    """The MXU (block-diag matmul message) layout matches the lax oracle."""
    from trex_tpu.ops.likelihood import jc69_transition

    n_leaves, q, length, batch = 8, 4, 192, 5
    topos = random_topologies(jax.random.PRNGKey(20), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(21), (n_leaves, length), 0, q)
    if shared:
        blens = jnp.full((batch, 2 * n_leaves - 1), 0.1)
        kwargs = {"shared_transition": jc69_transition(jnp.float32(0.1), q)}
    else:
        blens = jnp.asarray(
            np.random.default_rng(22).uniform(0.05, 1.0, (batch, 2 * n_leaves - 1)),
            jnp.float32,
        )
        kwargs = {}
    want = batched_tree_log_likelihood(topos, blens, leaf, q)
    got = batched_log_likelihood_pallas(
        topos, blens, leaf, q, interpret=True, layout="mxu",
        trees_per_block=trees_per_block, **kwargs,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


@pytest.mark.parametrize("rescale_every", [1, 2, 4])
@pytest.mark.parametrize("trees_per_block", [1, 2, 4])
def test_lanes_layout_matches_lax(rescale_every, trees_per_block):
    """The trees-in-lanes layout matches the lax oracle (shared-P only)."""
    from trex_tpu.ops.likelihood import jc69_transition

    n_leaves, q, length, batch = 8, 4, 192, 5
    topos = random_topologies(jax.random.PRNGKey(30), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(31), (n_leaves, length), 0, q)
    blens = jnp.full((batch, 2 * n_leaves - 1), 0.1)
    p0 = jc69_transition(jnp.float32(0.1), q)
    want = batched_tree_log_likelihood(topos, blens, leaf, q)
    got = batched_log_likelihood_pallas(
        topos, blens, leaf, q, interpret=True, layout="lanes",
        trees_per_block=trees_per_block, rescale_every=rescale_every,
        shared_transition=p0,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_lanes_layout_masks_and_weights():
    """lanes matches slots bit-exactly with ambiguity masks + site weights."""
    from trex_tpu.ops.likelihood import jc69_transition

    n_leaves, q, length, batch = 8, 4, 160, 4
    rng = np.random.default_rng(33)
    topos = random_topologies(jax.random.PRNGKey(32), n_leaves, batch)
    states = rng.integers(0, q, size=(n_leaves, length))
    masks = np.where(
        rng.random((n_leaves, length)) < 0.15, (1 << q) - 1, 1 << states
    ).astype(np.int32)
    weights = jnp.asarray(rng.integers(0, 3, size=(length,)), jnp.float32)
    blens = jnp.full((batch, 2 * n_leaves - 1), 0.2)
    p0 = jc69_transition(jnp.float32(0.2), q)
    common = dict(
        shared_transition=p0, sequences_are_masks=True, site_weights=weights,
        interpret=True,
    )
    want = batched_log_likelihood_pallas(
        topos, blens, jnp.asarray(masks), q, layout="slots", **common
    )
    got = batched_log_likelihood_pallas(
        topos, blens, jnp.asarray(masks), q, layout="lanes",
        trees_per_block=2, rescale_every=4, **common
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lanes_layout_guards():
    """lanes rejects per-branch P and out-of-range rescale_every."""
    n_leaves, q, length, batch = 8, 4, 128, 2
    topos = random_topologies(jax.random.PRNGKey(34), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(35), (n_leaves, length), 0, q)
    blens = jnp.full((batch, 2 * n_leaves - 1), 0.1)
    with pytest.raises(ValueError, match="lanes"):
        batched_log_likelihood_pallas(
            topos, blens, leaf, q, layout="lanes", interpret=True
        )
    from trex_tpu.ops.likelihood import jc69_transition

    with pytest.raises(ValueError, match="rescale_every"):
        batched_log_likelihood_pallas(
            topos, blens, leaf, q, layout="lanes", rescale_every=8,
            shared_transition=jc69_transition(jnp.float32(0.1), q),
            interpret=True,
        )
