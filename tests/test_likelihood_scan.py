"""Analytic ML SPR scan (ops.likelihood_scan) vs explicit rescoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import native, spr_move
from trex_tpu.ops.likelihood import tree_log_likelihood
from trex_tpu.ops.likelihood_scan import likelihood_spr_scan
from trex_tpu.topology import random_topologies

Q = 4
T0 = 0.13


def _single(topos, i):
    return jax.tree_util.tree_map(lambda a: a[i], topos)


def _exact(topo, leaf, weights=None, masks=False):
    blens = jnp.full((topo.n_all,), T0)
    return -float(
        tree_log_likelihood(
            topo, blens, leaf, Q, site_mask=weights,
            sequences_are_masks=masks,
        )
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_scan_entries_match_explicit_rescoring(seed):
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    n_leaves = 7
    topo = _single(random_topologies(jax.random.key(seed + 70), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 15)).astype(np.int32))

    scores, base = likelihood_spr_scan(topo, leaf, Q, T0)
    scores = np.asarray(scores)
    np.testing.assert_allclose(float(base), _exact(topo, leaf), rtol=1e-5)

    n_all = 2 * n_leaves - 1
    checked = 0
    for p in range(n_all - 1):
        for v in range(n_all):
            if not np.isfinite(scores[p, v]):
                continue
            moved = spr_move(topo, p, v)
            if moved is None:  # no-op reattachment: equals the base tree
                np.testing.assert_allclose(
                    scores[p, v], float(base), rtol=1e-5
                )
                continue
            np.testing.assert_allclose(
                scores[p, v], _exact(moved, leaf), rtol=2e-5,
                err_msg=f"(p={p}, v={v})",
            )
            checked += 1
    assert checked > 2 * n_all


def test_scan_with_masks_weights_and_chunking():
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n_leaves = 8
    topo = _single(random_topologies(jax.random.key(75), n_leaves, 1), 0)
    seqs = rng.integers(0, Q, size=(n_leaves, 18)).astype(np.int32)
    masks = (1 << seqs).astype(np.int32)
    masks[2, :4] = 0b1111
    weights = jnp.asarray(rng.integers(1, 3, size=18), jnp.float32)

    full, base = likelihood_spr_scan(
        topo, jnp.asarray(masks), Q, T0, weights, sequences_are_masks=True
    )
    chunked, base2 = likelihood_spr_scan(
        topo, jnp.asarray(masks), Q, T0, weights, sequences_are_masks=True,
        prune_chunk=4,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-6
    )
    np.testing.assert_allclose(float(base), float(base2), rtol=1e-6)

    scores = np.asarray(full)
    n_all = 2 * n_leaves - 1
    for p in range(0, n_all - 1, 3):
        for v in range(0, n_all, 4):
            if not np.isfinite(scores[p, v]):
                continue
            moved = spr_move(topo, p, v)
            if moved is None:
                continue
            np.testing.assert_allclose(
                scores[p, v],
                _exact(moved, jnp.asarray(masks), weights, masks=True),
                rtol=2e-5,
            )


def test_ml_scan_climb_matches_enumerating_climb():
    from trex_tpu.search.ml import ml_hill_climb

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    n_leaves = 9
    topo = _single(random_topologies(jax.random.key(99), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 40)).astype(np.int32))
    scan, scan_lengths, scan_losses = ml_hill_climb(
        topo, leaf, Q, neighborhood="spr-scan", max_rounds=30,
        ranking_branch_length=T0,
    )
    enum, _, _ = ml_hill_climb(
        topo, leaf, Q, neighborhood="spr", max_rounds=30,
        ranking_branch_length=T0,
    )
    np.testing.assert_allclose(scan.score, enum.score, rtol=2e-5)
    assert np.all(np.asarray(scan_lengths) > 0)
    assert np.isfinite(float(scan_losses[-1]))


@pytest.mark.parametrize("seed", [0, 3])
def test_scan_gtr_matches_explicit_rescoring(seed):
    """Model-aware scan: every entry equals explicit GTR rescoring.

    Uses a strongly asymmetric transition matrix (kappa 9, skewed
    frequencies) so any hidden symmetry assumption in the up/down message
    algebra would show up immediately.
    """
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    n_leaves = 6
    topo = _single(random_topologies(jax.random.key(seed + 90), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 12)).astype(np.int32))
    rates = np.ones((4, 4)) - np.eye(4)
    rates[0, 2] = rates[2, 0] = 9.0
    rates[1, 3] = rates[3, 1] = 9.0
    rates = jnp.asarray(rates, jnp.float32)
    freqs = jnp.asarray([0.45, 0.25, 0.2, 0.1], jnp.float32)

    def exact(t):
        blens = jnp.full((t.n_all,), T0)
        return -float(
            tree_log_likelihood(t, blens, leaf, Q, rates=rates, freqs=freqs)
        )

    scores, base = likelihood_spr_scan(
        topo, leaf, Q, T0, rates=rates, freqs=freqs
    )
    scores = np.asarray(scores)
    np.testing.assert_allclose(float(base), exact(topo), rtol=1e-5)
    n_all = 2 * n_leaves - 1
    checked = 0
    for p in range(n_all - 1):
        for v in range(n_all):
            if not np.isfinite(scores[p, v]):
                continue
            moved = spr_move(topo, p, v)
            if moved is None:
                np.testing.assert_allclose(scores[p, v], float(base), rtol=1e-5)
                continue
            np.testing.assert_allclose(
                scores[p, v], exact(moved), rtol=3e-5,
                err_msg=f"(p={p}, v={v})",
            )
            checked += 1
    assert checked > 2 * n_all


def test_scan_gamma_matches_explicit_rescoring():
    """+G scan entries equal tree_log_likelihood_gamma on each candidate."""
    if not native.available():
        pytest.skip("native library unavailable")
    from trex_tpu.ops.likelihood import tree_log_likelihood_gamma

    rng = np.random.default_rng(11)
    n_leaves = 6
    topo = _single(random_topologies(jax.random.key(111), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 10)).astype(np.int32))
    alpha = 0.4

    def exact(t):
        blens = jnp.full((t.n_all,), T0)
        return -float(
            tree_log_likelihood_gamma(
                t, blens, leaf, Q, gamma_shape=alpha, n_categories=4
            )
        )

    scores, base = likelihood_spr_scan(
        topo, leaf, Q, T0, gamma_shape=alpha, n_categories=4
    )
    scores = np.asarray(scores)
    np.testing.assert_allclose(float(base), exact(topo), rtol=1e-5)
    n_all = 2 * n_leaves - 1
    checked = 0
    for p in range(n_all - 1):
        for v in range(n_all):
            if not np.isfinite(scores[p, v]):
                continue
            moved = spr_move(topo, p, v)
            if moved is None:
                np.testing.assert_allclose(scores[p, v], float(base), rtol=1e-5)
                continue
            np.testing.assert_allclose(
                scores[p, v], exact(moved), rtol=3e-5,
                err_msg=f"(p={p}, v={v})",
            )
            checked += 1
    assert checked > 2 * n_all


def test_scan_gamma_gtr_combination():
    """GTR + Gamma together: base score matches the lax mixture."""
    from trex_tpu.ops.likelihood import tree_log_likelihood_gamma

    rng = np.random.default_rng(12)
    n_leaves = 5
    topo = _single(random_topologies(jax.random.key(112), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 8)).astype(np.int32))
    rates = jnp.asarray(np.ones((4, 4)) - np.eye(4) + np.diag([0.0] * 4), jnp.float32)
    rates = rates.at[0, 2].set(7.0).at[2, 0].set(7.0)
    freqs = jnp.asarray([0.4, 0.3, 0.2, 0.1], jnp.float32)
    _, base = likelihood_spr_scan(
        topo, leaf, Q, T0, rates=rates, freqs=freqs,
        gamma_shape=0.7, n_categories=4,
    )
    expected = -float(
        tree_log_likelihood_gamma(
            topo, jnp.full((topo.n_all,), T0), leaf, Q,
            gamma_shape=0.7, n_categories=4, rates=rates, freqs=freqs,
        )
    )
    np.testing.assert_allclose(float(base), expected, rtol=1e-5)


def test_scan_freerate_matches_explicit_rescoring():
    """FreeRate mixture (explicit rates+weights) matches the lax mixture."""
    from trex_tpu.ops.likelihood import tree_log_likelihood_freerate

    rng = np.random.default_rng(13)
    n_leaves = 5
    topo = _single(random_topologies(jax.random.key(113), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 9)).astype(np.int32))
    cr = jnp.asarray([0.3, 1.0, 2.4], jnp.float32)
    cw = jnp.asarray([0.5, 0.3, 0.2], jnp.float32)
    _, base = likelihood_spr_scan(
        topo, leaf, Q, T0, category_rates=cr, category_weights=cw
    )
    expected = -float(
        tree_log_likelihood_freerate(
            topo, jnp.full((topo.n_all,), T0), leaf, Q, cr, cw
        )
    )
    np.testing.assert_allclose(float(base), expected, rtol=1e-5)


def test_scan_invariant_category_matches_gamma_invariant():
    """Rate-0 category + weights reproduce the +G+I mixture at all-t0."""
    from trex_tpu.ops.likelihood import (
        discrete_gamma_rates,
        tree_log_likelihood_gamma_invariant,
    )

    rng = np.random.default_rng(14)
    n_leaves = 5
    topo = _single(random_topologies(jax.random.key(114), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 12)).astype(np.int32))
    alpha, p_inv = 0.8, 0.3
    g = np.asarray(discrete_gamma_rates(alpha, 4))
    cr = jnp.asarray(np.concatenate([g, [0.0]]), jnp.float32)
    cw = jnp.asarray(
        np.concatenate([np.full(4, (1 - p_inv) / 4), [p_inv]]), jnp.float32
    )
    _, base = likelihood_spr_scan(
        topo, leaf, Q, T0, category_rates=cr, category_weights=cw
    )
    expected = -float(
        tree_log_likelihood_gamma_invariant(
            topo, jnp.full((topo.n_all,), T0), leaf, Q,
            gamma_shape=alpha, p_invariant=p_inv, n_categories=4,
        )
    )
    np.testing.assert_allclose(float(base), expected, rtol=1e-5)
