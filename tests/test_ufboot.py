"""Ultrafast (RELL) bootstrap supports.

Oracles: candidate bookkeeping invariants (reference present exactly once,
winner counts sum to the replicate count); statistical behavior — strongly
supported data (long alignment, clean tree) yields ~1.0 supports and the
reference wins nearly all replicates, while conflicting/noisy data yields
depressed supports on the ambiguous branch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.search.ufboot import (
    default_candidates,
    ultrafast_bootstrap,
)
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def test_default_candidates_dedup_and_reference():
    topo = _single(jax.random.key(0), 10)
    cands = default_candidates(topo, extra_tbr=32, seed=1)
    children = np.asarray(cands.children)
    keys = [c.tobytes() for c in children]
    assert len(keys) == len(set(keys))  # deduplicated
    assert np.asarray(topo.children).tobytes() == keys[0]  # reference first


def test_ufboot_invariants_and_strong_support():
    truth = _single(jax.random.key(1), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(2), truth, blens, n_sites=2000)
    res = ultrafast_bootstrap(
        jax.random.key(3), truth, jnp.asarray(leaves), 4,
        n_replicates=200, extra_tbr=16,
    )
    assert res.winner_counts.sum() == 200
    assert res.support.shape == (truth.n_ancestors,)
    assert ((res.support >= 0) & (res.support <= 1)).all()
    # Clean long alignment on the true tree: overwhelming support.
    assert res.winner_counts[res.reference_index] >= 180
    assert (res.support > 0.9).all()
    # The reference tree has the best observed likelihood among candidates.
    assert res.log_likelihoods.argmax() == res.reference_index


def test_ufboot_uncertainty_on_short_noisy_data():
    truth = _single(jax.random.key(4), 8)
    blens = np.full((truth.n_all,), 0.02)  # barely any signal
    leaves = simulate_alignment(jax.random.key(5), truth, blens, n_sites=60)
    res = ultrafast_bootstrap(
        jax.random.key(6), truth, jnp.asarray(leaves), 4,
        n_replicates=200, extra_tbr=16,
    )
    # With ~1 substitution expected per branch over 60 sites, several
    # branches must be uncertain: not every split can win every replicate.
    assert (res.support < 0.95).any()
    assert res.winner_counts[res.reference_index] < 200


def test_ufboot_site_weights_equivalent_to_expansion():
    """Compressed patterns + weights give the same observed lnL ranking."""
    truth = _single(jax.random.key(7), 6)
    blens = np.full((truth.n_all,), 0.3)
    leaves = np.asarray(
        simulate_alignment(jax.random.key(8), truth, blens, n_sites=200)
    )
    patterns, inverse, counts = np.unique(
        leaves, axis=1, return_inverse=True, return_counts=True
    )
    full = ultrafast_bootstrap(
        jax.random.key(9), truth, jnp.asarray(leaves), 4,
        n_replicates=50, extra_tbr=8,
    )
    comp = ultrafast_bootstrap(
        jax.random.key(9), truth, jnp.asarray(patterns), 4,
        site_weights=jnp.asarray(counts, jnp.float32),
        n_replicates=50, extra_tbr=8,
    )
    # Same candidates (topology-determined), same observed lnL per candidate.
    assert full.n_candidates == comp.n_candidates
    np.testing.assert_allclose(
        full.log_likelihoods, comp.log_likelihoods, rtol=1e-4
    )


def test_cli_infer_ufboot(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    truth = _single(jax.random.key(10), 6)
    blens = np.full((truth.n_all,), 0.25)
    leaves = simulate_alignment(jax.random.key(11), truth, blens, n_sites=500)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(6)], leaves, DNA))
    out_tree = tmp_path / "out.nwk"
    main(["infer", "--fasta", str(path), "--criterion", "ml",
          "--start", "nj", "--ufboot", "100",
          "--output-tree", str(out_tree)])
    import json

    out = json.loads(capsys.readouterr().out)
    assert len(out["ufboot_support"]) == 5
    assert out["ufboot_candidates"] > 1
    # Supports ride the newick as internal labels.
    text = out_tree.read_text()
    assert text.count("(") == 5
