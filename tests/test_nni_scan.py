"""Analytic all-NNI rescoring (``ops.nni_scan``) vs direct per-neighbor pruning."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import sample_topologies
from trex_tpu.ops.likelihood import (
    gtr_eigensystem,
    gtr_transition,
    tree_log_likelihood,
)
from trex_tpu.ops.nni_scan import nni_neighborhood_lnl, tree_lnl_via_scan
from trex_tpu.ops.tree_moves import nni_neighborhood_device
from trex_tpu.topology import Topology


def _setup(seed, n_leaves, length, masks=False, gtr=False):
    rng = np.random.default_rng(seed)
    topo = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )
    n_all = 2 * n_leaves - 1
    lengths = jnp.asarray(rng.exponential(0.12, n_all).astype(np.float32))
    lengths = lengths.at[-1].set(0.0)
    if masks:
        leaves = jnp.asarray(
            rng.integers(1, 16, size=(n_leaves, length)).astype(np.int32)
        )
    else:
        leaves = jnp.asarray(
            rng.integers(0, 4, size=(n_leaves, length)).astype(np.int32)
        )
    pmats = prior = None
    if gtr:
        rates = np.ones((4, 4), np.float32)
        rates[0, 2] = rates[2, 0] = 3.0
        freqs = jnp.asarray(np.array([0.4, 0.1, 0.2, 0.3], np.float32))
        eigvals, left, right = gtr_eigensystem(jnp.asarray(rates), freqs)
        pmats = jax.vmap(lambda t: gtr_transition(t, eigvals, left, right))(
            lengths
        )
        prior = freqs
    return topo, lengths, leaves, pmats, prior


@pytest.mark.parametrize(
    "seed,n_leaves,masks,gtr",
    [(0, 5, False, False), (1, 8, False, False), (2, 12, True, False),
     (3, 9, False, True), (4, 7, True, True)],
)
def test_scan_matches_direct_neighbor_eval(seed, n_leaves, masks, gtr):
    topo, lengths, leaves, pmats, prior = _setup(seed, n_leaves, 160, masks, gtr)
    weights = jnp.asarray(
        np.random.default_rng(99).integers(0, 3, 160).astype(np.float32)
    )
    got = nni_neighborhood_lnl(
        jnp.asarray(topo.children), lengths, leaves, 4,
        transition_matrices=pmats, root_prior=prior,
        site_weights=weights, sequences_are_masks=masks,
    )
    nbr_c, nbr_l = nni_neighborhood_device(
        jnp.asarray(topo.children), lengths, n_leaves
    )
    n_all = 2 * n_leaves - 1
    want = []
    for j in range(nbr_c.shape[0]):
        t = Topology(children=nbr_c[j], parents=jnp.zeros(n_all, jnp.int32))
        if gtr:
            # Rebuild per-node P from the carried lengths of THIS neighbor.
            rates = np.ones((4, 4), np.float32)
            rates[0, 2] = rates[2, 0] = 3.0
            freqs = jnp.asarray(np.array([0.4, 0.1, 0.2, 0.3], np.float32))
            eigvals, left, right = gtr_eigensystem(jnp.asarray(rates), freqs)
            pm = jax.vmap(
                lambda x: gtr_transition(x, eigvals, left, right)
            )(nbr_l[j])
            from trex_tpu.ops.likelihood import _per_site_log_likelihood

            per_site = _per_site_log_likelihood(
                t, nbr_l[j], leaves, 4, transition_matrices=pm,
                root_prior=freqs, sequences_are_masks=masks,
            )
            want.append(float(jnp.sum(per_site * weights)))
        else:
            from trex_tpu.ops.likelihood import _per_site_log_likelihood

            per_site = _per_site_log_likelihood(
                t, nbr_l[j], leaves, 4, sequences_are_masks=masks,
            )
            want.append(float(jnp.sum(per_site * weights)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-3)


def test_identity_variant_matches_tree_log_likelihood():
    topo, lengths, leaves, _, _ = _setup(7, 10, 240)
    got = tree_lnl_via_scan(jnp.asarray(topo.children), lengths, leaves, 4)
    want = tree_log_likelihood(topo, lengths, leaves, 4)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_scan_vmaps_over_chains():
    """The MCMC usage shape: vmap over a chain batch inside jit."""
    rng = np.random.default_rng(0)
    n_leaves, C, L = 8, 3, 100
    n_all = 2 * n_leaves - 1
    topos = sample_topologies(5, n_leaves, C)
    children = jnp.asarray(np.asarray(topos.children))
    lengths = jnp.asarray(rng.exponential(0.1, (C, n_all)).astype(np.float32))
    leaves = jnp.asarray(rng.integers(0, 4, (n_leaves, L)).astype(np.int32))

    batched = jax.jit(
        jax.vmap(
            lambda c, l: nni_neighborhood_lnl(c, l, leaves, 4)
        )
    )
    out = batched(children, lengths)
    assert out.shape == (C, 2 * (n_leaves - 2))
    for i in range(C):
        one = nni_neighborhood_lnl(children[i], lengths[i], leaves, 4)
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(one), rtol=1e-6
        )
