"""Joint ML model-parameter estimation (ops.likelihood.optimize_model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.likelihood import (
    optimize_branch_lengths,
    optimize_model,
    tree_log_likelihood,
)
from trex_tpu.topology import random_topologies

Q = 4


def _case(seed: int, n_leaves: int = 6, length: int = 80):
    rng = np.random.default_rng(seed)
    topo = jax.tree.map(
        lambda a: a[0], random_topologies(jax.random.key(seed), n_leaves, 1)
    )
    seqs = rng.integers(0, Q, size=(n_leaves, length)).astype(np.int32)
    return topo, jnp.asarray(seqs)


def test_jc_model_matches_branch_length_optimizer():
    topo, seqs = _case(0)
    params, losses = optimize_model(
        topo, seqs, Q, model="jc", n_iterations=150
    )
    _, bl_losses = optimize_branch_lengths(
        topo, seqs, Q, n_iterations=150
    )
    assert float(losses[-1]) < float(losses[0])
    np.testing.assert_allclose(
        float(losses[-1]), float(bl_losses[-1]), rtol=1e-4
    )
    assert set(params) == {"branch_lengths"}
    assert np.all(np.asarray(params["branch_lengths"]) > 0)


@pytest.mark.parametrize("model", ["gtr", "gtr+g", "gtr+g+i"])
def test_gtr_models_fit_and_improve(model):
    topo, seqs = _case(1)
    params, losses = optimize_model(
        topo, seqs, Q, model=model, n_iterations=120
    )
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])
    rates = np.asarray(params["rates"])
    freqs = np.asarray(params["freqs"])
    np.testing.assert_allclose(rates, rates.T)  # symmetric
    np.testing.assert_allclose(rates[2, 3], 1.0, atol=1e-6)  # pinned pair
    np.testing.assert_allclose(freqs.sum(), 1.0, rtol=1e-6)
    assert (freqs > 0).all()
    if "+g" in model:
        assert float(params["gamma_shape"]) > 0
    if "+i" in model:
        assert 0.0 < float(params["p_invariant"]) < 1.0


def test_fitted_gtr_beats_jc_on_skewed_data():
    # Data with strongly skewed base composition: a fitted GTR (free
    # frequencies) must reach a higher likelihood than fitted JC.
    rng = np.random.default_rng(7)
    topo = jax.tree.map(
        lambda a: a[0], random_topologies(jax.random.key(7), 6, 1)
    )
    seqs = rng.choice(Q, p=[0.6, 0.25, 0.1, 0.05], size=(6, 120)).astype(
        np.int32
    )
    seqs = jnp.asarray(seqs)
    p_jc, l_jc = optimize_model(topo, seqs, Q, model="jc", n_iterations=200)
    p_gtr, l_gtr = optimize_model(topo, seqs, Q, model="gtr", n_iterations=200)
    assert float(l_gtr[-1]) < float(l_jc[-1])
    # Fitted frequencies track the empirical composition ordering.
    freqs = np.asarray(p_gtr["freqs"])
    assert freqs[0] == freqs.max()
    # And the fitted model evaluates consistently outside the optimizer.
    ll = tree_log_likelihood(
        topo, p_gtr["branch_lengths"], seqs, Q,
        rates=p_gtr["rates"], freqs=p_gtr["freqs"],
    )
    np.testing.assert_allclose(float(-ll), float(l_gtr[-1]), rtol=1e-4)


def test_model_with_masks_and_weights():
    from trex_tpu.alignment import compress_alignment

    topo, seqs = _case(9, length=60)
    masks = (1 << np.asarray(seqs)).astype(np.int32)
    masks[1, :6] = 0b1111
    patterns, weights = compress_alignment(masks)
    params, losses = optimize_model(
        topo, jnp.asarray(patterns), Q, model="gtr+g",
        sequences_are_masks=True,
        site_weights=jnp.asarray(weights, jnp.float32),
        n_iterations=80,
    )
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])


def test_unknown_model_rejected():
    topo, seqs = _case(11)
    with pytest.raises(ValueError, match="unknown model"):
        optimize_model(topo, seqs, Q, model="hky85-typo")


def test_freerate_single_category_is_plain_likelihood():
    from trex_tpu.ops.likelihood import tree_log_likelihood_freerate

    topo, seqs = _case(3)
    blens = jnp.full((topo.n_all,), 0.2)
    plain = float(tree_log_likelihood(topo, blens, seqs, Q))
    free = float(
        tree_log_likelihood_freerate(
            topo, blens, seqs, Q,
            jnp.ones((1,)), jnp.ones((1,)),
        )
    )
    assert free == pytest.approx(plain, rel=1e-6)


def test_freerate_matches_manual_mixture():
    from trex_tpu.ops.likelihood import (
        per_site_log_likelihood,
        tree_log_likelihood_freerate,
    )

    topo, seqs = _case(4)
    blens = jnp.full((topo.n_all,), 0.15)
    rates = jnp.asarray([0.5, 1.5])
    weights = jnp.asarray([0.3, 0.7])
    got = float(
        tree_log_likelihood_freerate(topo, blens, seqs, Q, rates, weights)
    )
    per_cat = np.stack([
        np.asarray(per_site_log_likelihood(topo, blens * r, seqs, Q))
        for r in (0.5, 1.5)
    ])  # (2, L)
    manual = float(
        np.log(
            0.3 * np.exp(per_cat[0]) + 0.7 * np.exp(per_cat[1])
        ).sum()
    )
    assert got == pytest.approx(manual, rel=1e-5)


def test_freerate_model_fits():
    topo, seqs = _case(5)
    params, losses = optimize_model(
        topo, seqs, Q, model="gtr+r3", n_iterations=120
    )
    assert float(losses[-1]) < float(losses[0])
    r = np.asarray(params["category_rates"])
    w = np.asarray(params["category_weights"])
    assert r.shape == (3,) and w.shape == (3,)
    assert w.sum() == pytest.approx(1.0, abs=1e-5)
    assert float((w * r).sum()) == pytest.approx(1.0, abs=1e-4)
    assert (r > 0).all()


def test_freerate_bad_k_rejected():
    topo, seqs = _case(6)
    with pytest.raises(ValueError, match="unknown model"):
        optimize_model(topo, seqs, Q, model="gtr+r9")
    with pytest.raises(ValueError, match="unknown model"):
        optimize_model(topo, seqs, Q, model="gtr+r1")
