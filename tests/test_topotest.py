"""KH / SH / BP / ELW topology tests.

Oracles: statistical behavior on simulated data — the true tree is the
best, clearly wrong trees are rejected (small p), a near-equivalent tree is
not; SH is never more aggressive than KH (max-correction); bp/elw are
probability-vectors; CLI round trip.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.search.topotest import topology_tests
from trex_tpu.topology import Topology, random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def _batch(topos):
    return Topology(
        children=jnp.stack([t.children for t in topos]),
        parents=jnp.stack([t.parents for t in topos]),
    )


@pytest.fixture(scope="module")
def strong_case():
    truth = _single(jax.random.key(0), 10)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(1), truth, blens, n_sites=1500)
    wrong1 = _single(jax.random.key(2), 10)
    wrong2 = _single(jax.random.key(3), 10)
    trees = _batch([wrong1, truth, wrong2])
    res = topology_tests(
        jax.random.key(4), trees, jnp.asarray(leaves), 4, n_replicates=2000
    )
    return res


def test_true_tree_wins(strong_case):
    res = strong_case
    assert res.best_index == 1
    assert res.delta[1] == 0.0
    assert (res.delta[[0, 2]] > 10).all()


def test_wrong_trees_rejected(strong_case):
    res = strong_case
    assert res.p_kh[0] < 0.05 and res.p_kh[2] < 0.05
    assert res.p_sh[0] < 0.05 and res.p_sh[2] < 0.05
    assert res.p_kh[1] == 1.0 and res.p_sh[1] == 1.0  # best by convention


def test_sh_not_more_aggressive_than_kh(strong_case):
    res = strong_case
    assert (res.p_sh + 1e-12 >= res.p_kh).all()


def test_bp_elw_are_distributions(strong_case):
    res = strong_case
    for v in (res.bp, res.elw):
        assert v.shape == (3,)
        assert np.isclose(v.sum(), 1.0, atol=1e-6)
        assert (v >= 0).all()
    # Overwhelming data: the true tree takes nearly all the weight.
    assert res.bp[1] > 0.95 and res.elw[1] > 0.95


def test_equivalent_tree_not_rejected():
    # Weak data: an NNI-neighbor of the truth cannot be distinguished.
    truth = _single(jax.random.key(5), 8)
    blens = np.full((truth.n_all,), 0.05)
    leaves = simulate_alignment(jax.random.key(6), truth, blens, n_sites=80)
    from trex_tpu.io import nni_neighbors_host

    nc, npar = nni_neighbors_host(truth)
    neighbor = Topology(
        children=jnp.asarray(nc[0]), parents=jnp.asarray(npar[0])
    )
    res = topology_tests(
        jax.random.key(7), _batch([truth, neighbor]), jnp.asarray(leaves), 4,
        n_replicates=2000,
    )
    worse = 1 - res.best_index
    assert res.p_sh[worse] > 0.05  # cannot reject the close alternative


def test_cli_topotest(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, save_newick, write_fasta

    truth = _single(jax.random.key(8), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(9), truth, blens, n_sites=800)
    names = [f"t{i}" for i in range(8)]
    aln = tmp_path / "a.fasta"
    aln.write_text(write_fasta(names, leaves, DNA))
    wrong = _single(jax.random.key(10), 8)
    trees = tmp_path / "cands.nwk"
    trees.write_text(
        save_newick(truth, names) + "\n" + save_newick(wrong, names) + "\n"
    )
    main(["topotest", "--fasta", str(aln), "--trees", str(trees),
          "--replicates", "1000"])
    out = json.loads(capsys.readouterr().out)
    assert out["best"] == 0
    table = out["table"]
    assert table[1]["delta"] > 0 and table[1]["p_sh"] < 0.05
    assert table[0]["p_kh"] == 1.0


def test_cli_topotest_site_lnl_export(capsys, tmp_path):
    """Site-lnL export: rows sum to the reported totals, original order."""
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, save_newick, write_fasta

    truth = _single(jax.random.key(30), 6)
    blens = np.full((truth.n_all,), 0.25)
    leaves = simulate_alignment(jax.random.key(31), truth, blens, n_sites=120)
    names = [f"t{i}" for i in range(6)]
    aln = tmp_path / "a.fasta"
    aln.write_text(write_fasta(names, leaves, DNA))
    other = _single(jax.random.key(32), 6)
    trees = tmp_path / "c.nwk"
    trees.write_text(
        save_newick(truth, names) + "\n" + save_newick(other, names) + "\n"
    )
    out_lnl = tmp_path / "site.lnl"
    main(["topotest", "--fasta", str(aln), "--trees", str(trees),
          "--replicates", "200", "--site-lnl", str(out_lnl)])
    out = json.loads(capsys.readouterr().out)

    lines = out_lnl.read_text().splitlines()
    n_trees, n_sites = (int(x) for x in lines[0].split())
    assert n_trees == 2 and n_sites == 120
    for t in range(2):
        row = [float(x) for x in lines[1 + t].split()[1:]]
        assert len(row) == 120
        # Row sum equals the reported total lnL for that tree.
        assert abs(sum(row) - out["table"][t]["log_likelihood"]) < 0.01


def test_au_test_behavior(strong_case):
    """AU: best tree retained (p high), clearly wrong trees rejected."""
    res = strong_case
    assert res.p_au is not None and res.p_au.shape == (3,)
    assert ((res.p_au >= 0) & (res.p_au <= 1)).all()
    assert res.p_au[1] > 0.9
    assert res.p_au[0] < 0.05 and res.p_au[2] < 0.05


def test_au_close_alternative_not_rejected():
    # Nearly no signal (expected substitutions per branch ~0.02 x 40 sites):
    # the NNI alternative is statistically indistinguishable from the truth.
    truth = _single(jax.random.key(40), 8)
    blens = np.full((truth.n_all,), 0.02)
    leaves = simulate_alignment(jax.random.key(41), truth, blens, n_sites=40)
    from trex_tpu.io import nni_neighbors_host

    nc, npar = nni_neighbors_host(truth)
    neighbor = Topology(
        children=jnp.asarray(nc[0]), parents=jnp.asarray(npar[0])
    )
    res = topology_tests(
        jax.random.key(42), _batch([truth, neighbor]), jnp.asarray(leaves), 4,
        n_replicates=1000,
    )
    worse = 1 - res.best_index
    assert res.delta[worse] < 3.0  # genuinely weak signal
    assert res.p_au[worse] > 0.05
