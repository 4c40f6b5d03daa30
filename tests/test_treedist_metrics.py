"""Branch-length-aware tree distances: hand-checked + invariance oracles."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.io import sample_topologies
from trex_tpu.search.treedist import (
    branch_score_distance,
    patristic_matrix,
    path_difference_distance,
    weighted_rf_distance,
)
from trex_tpu.topology import Topology, balanced_topology


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


def test_patristic_matrix_hand_case():
    # Balanced 4-leaf tree ((0,1),(2,3)): nodes 4=(0,1), 5=(2,3), 6=root.
    topo = balanced_topology(4)
    lengths = np.array([0.1, 0.2, 0.3, 0.4, 0.05, 0.06, 0.0])
    d = patristic_matrix(topo, lengths)
    np.testing.assert_allclose(d[0, 1], 0.1 + 0.2)
    np.testing.assert_allclose(d[2, 3], 0.3 + 0.4)
    np.testing.assert_allclose(d[0, 2], 0.1 + 0.05 + 0.06 + 0.3)
    np.testing.assert_allclose(d[1, 3], 0.2 + 0.05 + 0.06 + 0.4)
    np.testing.assert_allclose(np.diag(d), 0.0)
    np.testing.assert_allclose(d, d.T)


def test_identity_and_scaling():
    topo = _single(3, 8)
    rng = np.random.default_rng(0)
    lengths = rng.exponential(0.1, size=topo.n_all)
    lengths[-1] = 0.0
    assert branch_score_distance(topo, lengths, topo, lengths) == 0.0
    assert weighted_rf_distance(topo, lengths, topo, lengths) == 0.0
    assert path_difference_distance(topo, lengths, topo, lengths) == 0.0
    # Same topology, all lengths scaled: wRF = (c-1) * sum of UNROOTED
    # edge lengths (the two root-child edges merge into one edge).
    scaled = lengths * 2.0
    wrf = weighted_rf_distance(topo, lengths, topo, scaled)
    np.testing.assert_allclose(wrf, lengths[:-1].sum(), rtol=1e-6)


def test_reroot_invariance():
    """Unrooted metrics must not change under re-rooting."""
    from trex_tpu.io import reroot_at_edge

    topo = _single(5, 9)
    rng = np.random.default_rng(1)
    la = rng.exponential(0.1, size=topo.n_all)
    la[-1] = 0.0
    other = _single(6, 9)
    lb = rng.exponential(0.1, size=topo.n_all)
    lb[-1] = 0.0
    base_bs = branch_score_distance(topo, la, other, lb)
    base_pd = path_difference_distance(topo, la, other, lb)
    for node in (0, 3, 9, 12):
        re_topo, re_lens = reroot_at_edge(topo, node, la)
        bs = branch_score_distance(re_topo, re_lens, other, lb)
        pd = path_difference_distance(re_topo, re_lens, other, lb)
        np.testing.assert_allclose(bs, base_bs, rtol=1e-6)
        np.testing.assert_allclose(pd, base_pd, rtol=1e-6)


def test_cli_treedist_reports_weighted_metrics(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import save_newick

    topo = _single(3, 6)
    rng = np.random.default_rng(0)
    names = [f"t{i}" for i in range(6)]
    la = rng.exponential(0.1, size=topo.n_all)
    la[-1] = 0.0
    f_a = tmp_path / "a.nwk"
    f_a.write_text(save_newick(topo, names, branch_lengths=la) + "\n")
    # Second tree: same topology, scaled lengths, SHUFFLED name order in
    # the file (exercises the leaf renumbering path).
    lb = la * 1.5
    f_b = tmp_path / "b.nwk"
    f_b.write_text(save_newick(topo, names, branch_lengths=lb) + "\n")
    main(["treedist", str(f_a), str(f_b)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rf"] == 0
    np.testing.assert_allclose(
        out["weighted_rf"], 0.5 * la[:-1].sum(), rtol=1e-4
    )
    assert out["branch_score"] > 0
    assert out["path_difference"] > 0
