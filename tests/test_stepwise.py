"""Stepwise-addition starting trees (TPU-batched greedy construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.fitch import fitch_score
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.search.stepwise import stepwise_addition, stepwise_addition_multi
from trex_tpu.topology import topology_from_adjacency


def _groundtruth(n_leaves=16, seed=3):
    data = generate_groundtruth(
        n_leaves=n_leaves, n_states=4, n_mutations=3, seq_length=400, seed=seed
    )
    true = topology_from_adjacency(data.adjacency, n_leaves)
    return true, data.masked_sequences[:n_leaves]


def _assert_valid_topology(topo):
    children = np.asarray(topo.children)
    parents = np.asarray(topo.parents)
    n_leaves = topo.n_leaves
    for a in range(topo.n_ancestors):
        node = n_leaves + a
        assert children[a, 0] < children[a, 1] < node
        assert parents[children[a, 0]] == node
        assert parents[children[a, 1]] == node
    assert parents[-1] == topo.n_all - 1
    # Every non-root node appears exactly once as a child.
    flat = children.ravel()
    assert sorted(flat) == list(range(topo.n_all - 1))


def test_reported_score_matches_exact_rescore():
    _, seqs = _groundtruth()
    topo, score = stepwise_addition(seqs, 4, seed=1)
    _assert_valid_topology(topo)
    assert float(fitch_score(topo, jnp.asarray(seqs))) == score


def test_recovers_generating_topology():
    true, seqs = _groundtruth()
    topo, score = stepwise_addition(seqs, 4, seed=0)
    true_score = float(fitch_score(true, jnp.asarray(seqs)))
    # Greedy construction on low-homoplasy data: parsimony-optimal, and the
    # tree itself matches the generator.
    assert score <= true_score
    assert rf_distance_unrooted(topo, true) == 0


def test_explicit_order_and_validation():
    _, seqs = _groundtruth(n_leaves=8, seed=5)
    order = np.arange(8)
    topo, score = stepwise_addition(seqs, 4, order=order)
    _assert_valid_topology(topo)
    with pytest.raises(ValueError, match="permutation"):
        stepwise_addition(seqs, 4, order=np.zeros(8, dtype=int))
    with pytest.raises(ValueError, match="at least 3"):
        stepwise_addition(seqs[:2], 4)


def test_multi_order_takes_best():
    _, seqs = _groundtruth(n_leaves=8, seed=9)
    single_scores = [
        stepwise_addition(seqs, 4, seed=s)[1] for s in range(4)
    ]
    _, best = stepwise_addition_multi(seqs, 4, n_orders=4, seed=0)
    assert best <= max(single_scores)


def test_scan_and_batched_paths_agree():
    from trex_tpu.io import native

    if not native.available():
        pytest.skip("native library unavailable")
    _, seqs = _groundtruth(n_leaves=16, seed=21)
    for seed in (0, 1):
        t_scan, s_scan = stepwise_addition(seqs, 4, seed=seed, use_scan=True)
        t_batch, s_batch = stepwise_addition(seqs, 4, seed=seed, use_scan=False)
        # Same greedy rule, same exact per-edge scores: equal tree quality
        # (tie-breaking order may differ between the two evaluators).
        assert s_scan == s_batch
        _assert_valid_topology(t_scan)
        assert float(fitch_score(t_scan, jnp.asarray(np.asarray(seqs)))) == s_scan


def test_masks_input_and_site_weights():
    _, seqs = _groundtruth(n_leaves=8, seed=11)
    seqs = np.asarray(seqs)
    masks = (1 << seqs.astype(np.int32)).astype(np.int32)
    masks[0, :5] = 0b1111  # some missing data in taxon 0
    weights = np.ones(seqs.shape[1], dtype=np.float32)
    weights[:10] = 2.0
    topo, score = stepwise_addition(
        masks, 4, sequences_are_masks=True, site_weights=jnp.asarray(weights),
        seed=2,
    )
    _assert_valid_topology(topo)
    expected = float(
        fitch_score(
            topo, jnp.asarray(masks), site_mask=jnp.asarray(weights),
            sequences_are_masks=True,
        )
    )
    assert score == expected
