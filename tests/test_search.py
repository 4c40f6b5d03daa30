"""Search drivers: ASR descent, parental logits oracle, landscape-aware loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.models.nk import make_landscape
from trex_tpu.search.asr import (
    landscape_aware_loss,
    parental_logits,
    reconstruct_ancestors,
    reconstruct_ancestors_landscape_aware,
)
from trex_tpu.search.optimizers import make_optimizer


def test_make_optimizer_names():
    for name in ["adam", "sgd", "rmsprop", "adamw"]:
        opt = make_optimizer(name, 1e-3)
        assert opt.init is not None
    with pytest.raises(ValueError):
        make_optimizer("nope", 1e-3)


def test_reconstruct_ancestors_decreases_loss():
    gt = generate_groundtruth(4, 4, 2, 16, seed=0)
    leaf = gt.all_sequences[:4].astype(jnp.int32)
    anc, losses = reconstruct_ancestors(
        leaf,
        7,
        4,
        gt.adjacency,
        jax.random.PRNGKey(0),
        n_iterations=300,
        learning_rate=0.05,
        return_losses=True,
    )
    assert anc.shape == (3, 16)
    assert float(losses[-1]) < float(losses[0])


def test_reconstruct_ancestors_soft_cost_variant():
    gt = generate_groundtruth(4, 4, 2, 16, seed=0)
    leaf = gt.all_sequences[:4].astype(jnp.int32)
    anc = reconstruct_ancestors(
        leaf,
        7,
        4,
        gt.adjacency,
        jax.random.PRNGKey(0),
        use_soft_cost=True,
        n_iterations=100,
        learning_rate=0.05,
    )
    assert anc.shape == (3, 16)
    assert int(anc.max()) < 4


def naive_parental_logits(parent_soft, landscape):
    """Direct per-site marginalization (oracle for the vectorized einsum)."""
    p, length, q = parent_soft.shape
    k = landscape.interactions.shape[1]
    out = np.zeros((p, length, q))
    tables = np.asarray(landscape.tables)
    inter = np.asarray(landscape.interactions)
    for i in range(length):
        # joint neighbor distribution, shape (P, q^k)
        joint = np.ones((p, 1))
        for j in range(k):
            probs = np.asarray(parent_soft[:, inter[i, j], :])  # (P, q)
            joint = np.einsum("pc,ps->pcs", joint, probs).reshape(p, -1)
        table = tables[i].reshape(q, -1)  # (q, q^k)
        out[:, i, :] = joint @ table.T
    return out


@pytest.mark.parametrize("k", [1, 2, 3])
def test_parental_logits_match_naive(k):
    length, q, n_parents = 10, 2, 5
    landscape = make_landscape(length, k, jax.random.PRNGKey(0), n_states=q)
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (n_parents, length, q)), axis=-1
    )
    got = parental_logits(soft, landscape)
    want = naive_parental_logits(soft, landscape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_parental_logits_site_chunking_equivalent():
    landscape = make_landscape(12, 2, jax.random.PRNGKey(0), n_states=2)
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (3, 12, 2)), axis=-1
    )
    full = parental_logits(soft, landscape)
    chunked = parental_logits(soft, landscape, site_chunk=4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-6)


def test_parental_logits_k0_broadcasts_tables():
    landscape = make_landscape(6, 0, jax.random.PRNGKey(0), n_states=2)
    soft = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (4, 6, 2)), -1)
    got = parental_logits(soft, landscape)
    assert got.shape == (4, 6, 2)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(landscape.tables), rtol=1e-6
    )


def test_landscape_aware_loss_reduces_to_surrogate_at_lambda0():
    from trex_tpu.ops.costs import surrogate_cost
    from trex_tpu.ops.relax import soft_sequences

    gt = generate_groundtruth(4, 2, 2, 10, seed=0)
    landscape = make_landscape(10, 2, jax.random.PRNGKey(0), n_states=2)
    masked = jnp.zeros((7, 10, 2)).at[:4].set(
        jax.nn.one_hot(gt.all_sequences[:4].astype(jnp.int32), 2)
    )
    anc = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 2))
    l0 = landscape_aware_loss(anc, masked, 4, landscape, gt.adjacency, 0.0)
    seqs = soft_sequences(anc, masked, 4, 1.0)
    assert float(l0) == pytest.approx(float(surrogate_cost(seqs, gt.adjacency)))
    l1 = landscape_aware_loss(anc, masked, 4, landscape, gt.adjacency, 1.0)
    assert jnp.isfinite(l1)
    assert float(l1) != float(l0)


def test_landscape_aware_reconstruction_runs():
    gt = generate_groundtruth(4, 2, 2, 10, seed=0)
    landscape = make_landscape(10, 2, jax.random.PRNGKey(0), n_states=2)
    leaf = gt.all_sequences[:4].astype(jnp.int32)
    anc, losses = reconstruct_ancestors_landscape_aware(
        leaf,
        7,
        2,
        landscape,
        0.3,
        gt.adjacency,
        jax.random.PRNGKey(2),
        n_iterations=100,
        learning_rate=0.05,
        return_losses=True,
    )
    assert anc.shape == (3, 10)
    assert float(losses[-1]) < float(losses[0])


def test_parental_logits_chunking_non_divisible():
    landscape = make_landscape(13, 2, jax.random.PRNGKey(0), n_states=2)
    soft = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (3, 13, 2)), axis=-1
    )
    full = parental_logits(soft, landscape)
    chunked = parental_logits(soft, landscape, site_chunk=5)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-6)


def test_mixed_precision_bf16_reconstruction():
    """bf16 compute path converges (params stay f32 under mixed precision)."""
    gt = generate_groundtruth(4, 4, 2, 16, seed=0)
    leaf = gt.all_sequences[:4].astype(jnp.int32)
    anc, losses = reconstruct_ancestors(
        leaf, 7, 4, gt.adjacency, jax.random.PRNGKey(0),
        n_iterations=200, learning_rate=0.05,
        mixed_precision=True, compute_dtype=jnp.bfloat16,
        return_losses=True,
    )
    assert anc.shape == (3, 16)
    assert float(losses[-1]) < float(losses[0])
    assert bool(jnp.all(jnp.isfinite(losses)))
