"""CTMC alignment simulator: shape/determinism checks, statistical
properties (stationarity on long branches, invariant-site fraction,
identity under zero-length branches), model recovery by likelihood
comparison at true vs wrong parameters, and CLI round trips.

Oracles: closed-form JC69 expected identity, exact stationary frequencies,
the engine's own likelihood (true-tree lnL beats a scrambled tree's), and
NJ topology recovery on clean data (RF 0).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.simulate import simulate_alignment, simulate_ctmc
from trex_tpu.ops.likelihood import gtr_generator, tree_log_likelihood
from trex_tpu.search.nj import nj_start_tree
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.topology import balanced_topology, random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def test_shapes_and_determinism():
    topo = balanced_topology(8)
    blens = np.full((topo.n_all,), 0.1)
    key = jax.random.key(0)
    a = simulate_alignment(key, topo, blens, n_sites=64)
    b = simulate_alignment(key, topo, blens, n_sites=64)
    assert a.shape == (8, 64) and a.dtype == np.int32
    assert (a >= 0).all() and (a < 4).all()
    np.testing.assert_array_equal(a, b)
    c = simulate_alignment(jax.random.key(1), topo, blens, n_sites=64)
    assert (a != c).any()


def test_zero_branch_lengths_copy_root():
    topo = balanced_topology(8)
    blens = np.zeros((topo.n_all,))
    leaves, anc = simulate_alignment(
        jax.random.key(0), topo, blens, n_sites=50, return_ancestors=True
    )
    root = anc[-1]
    assert (leaves == root[None, :]).all()
    assert (anc == root[None, :]).all()


def test_long_branches_reach_stationarity():
    topo = balanced_topology(64)
    blens = np.full((topo.n_all,), 50.0)
    freqs = np.array([0.5, 0.3, 0.15, 0.05])
    leaves = simulate_alignment(
        jax.random.key(2), topo, blens, n_sites=400, freqs=freqs
    )
    observed = np.bincount(leaves.ravel(), minlength=4) / leaves.size
    np.testing.assert_allclose(observed, freqs, atol=0.02)


def test_jc_expected_identity():
    # JC69: P(same) = 1/4 + 3/4 exp(-4t/3) for one branch of length t.
    topo = balanced_topology(2)  # one cherry: both children of the root
    t = 0.3
    blens = np.array([t, 0.0, 0.0])  # leaf0 evolves, leaf1 stays at root
    leaves, anc = simulate_alignment(
        jax.random.key(3), topo, blens, n_sites=20000,
        return_ancestors=True,
    )
    np.testing.assert_array_equal(leaves[1], anc[-1])
    expected = 0.25 + 0.75 * np.exp(-4.0 * t / 3.0)
    identity = float((leaves[0] == leaves[1]).mean())
    assert abs(identity - expected) < 0.02


def test_invariant_fraction():
    topo = balanced_topology(16)
    blens = np.full((topo.n_all,), 0.5)
    leaves = simulate_alignment(
        jax.random.key(4), topo, blens, n_sites=2000, p_invariant=0.5
    )
    constant = (leaves == leaves[0:1]).all(axis=0).mean()
    # p_inv=0.5 plus chance constancy among variable sites.
    assert 0.5 < constant < 0.75
    leaves0 = simulate_alignment(
        jax.random.key(4), topo, blens, n_sites=2000, p_invariant=0.0
    )
    assert (leaves0 == leaves0[0:1]).all(axis=0).mean() < constant - 0.2


def test_gamma_increases_rate_dispersion():
    topo = balanced_topology(32)
    blens = np.full((topo.n_all,), 0.3)
    key = jax.random.key(5)
    plain = simulate_alignment(key, topo, blens, n_sites=1500)
    gamma = simulate_alignment(
        key, topo, blens, n_sites=1500, gamma_shape=0.2
    )

    def site_diversity(x):
        # Count of distinct states per site: dispersion proxy.
        return np.array([len(np.unique(x[:, i])) for i in range(x.shape[1])])

    # Strong heterogeneity (alpha=.2) concentrates substitutions on few
    # sites: more constant sites AND variance of diversity goes up.
    dp, dg = site_diversity(plain), site_diversity(gamma)
    assert (dg == 1).mean() > (dp == 1).mean() + 0.1


def test_likelihood_prefers_true_parameters():
    topo = _single(jax.random.key(6), 12)
    blens = np.full((topo.n_all,), 0.2)
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    rates = np.array(
        [
            [0, 4.0, 1.0, 1.0],
            [4.0, 0, 1.0, 4.0],
            [1.0, 1.0, 0, 1.0],
            [1.0, 4.0, 1.0, 0],
        ]
    )
    leaves = simulate_alignment(
        jax.random.key(7), topo, blens, n_sites=800, rates=rates, freqs=freqs
    )
    bl = jnp.asarray(blens, jnp.float32)
    ll_true = tree_log_likelihood(
        topo, bl, jnp.asarray(leaves), 4,
        rates=jnp.asarray(rates, jnp.float32),
        freqs=jnp.asarray(freqs, jnp.float32),
    )
    ll_jc = tree_log_likelihood(topo, bl, jnp.asarray(leaves), 4)
    assert float(ll_true) > float(ll_jc)


def test_nj_recovers_topology_from_simulated_data():
    truth = _single(jax.random.key(8), 10)
    blens = np.full((truth.n_all,), 0.15)
    leaves = simulate_alignment(jax.random.key(9), truth, blens, n_sites=3000)
    topo, _ = nj_start_tree(np.asarray(leaves), 4, None, method="nj")
    assert rf_distance_unrooted(topo, truth) == 0


def test_simulate_ctmc_rate_categories():
    topo = balanced_topology(4)
    blens = np.full((topo.n_all,), 1.0)
    gen = np.asarray(gtr_generator(jnp.ones((4, 4)) - jnp.eye(4), jnp.full(4, 0.25)))
    # All mass on a zero-rate category -> everything identical.
    leaves = simulate_ctmc(
        jax.random.key(10), topo, blens, generator=gen,
        freqs=np.full(4, 0.25), n_sites=64,
        site_rates=np.array([0.0]), rate_probs=np.array([1.0]),
    )
    assert (leaves == leaves[0:1]).all()


def test_cli_simulate_and_treedist(capsys, tmp_path):
    from trex_tpu.cli import main

    aln = tmp_path / "sim.fasta"
    tree = tmp_path / "sim.nwk"
    anc = tmp_path / "anc.fasta"
    main([
        "simulate", "--leaves", "8", "--sites", "200", "--seed", "3",
        "--model", "gtr+g", "--output", str(aln),
        "--output-tree", str(tree), "--output-ancestors", str(anc),
    ])
    capsys.readouterr()
    from trex_tpu.io import DNA, load_newick, parse_fasta

    names, states = parse_fasta(aln.read_text(), DNA)
    assert len(names) == 8 and states.shape == (8, 200)
    topo, blens, tree_names = load_newick(tree.read_text())
    assert sorted(tree_names) == sorted(names)
    anc_names, anc_states = parse_fasta(anc.read_text(), DNA)
    assert anc_states.shape == (7, 200)

    # treedist: tree vs itself -> 0; vs a different random tree -> > 0.
    main(["treedist", str(tree), str(tree)])
    out = json.loads(capsys.readouterr().out)
    assert out["rf"] == 0 and out["max_rf"] == 2 * (8 - 3)

    other = tmp_path / "other.nwk"
    main([
        "simulate", "--leaves", "8", "--sites", "4", "--seed", "77",
        "--output", str(tmp_path / "x.fasta"), "--output-tree", str(other),
    ])
    capsys.readouterr()
    main(["treedist", str(tree), str(other)])
    assert json.loads(capsys.readouterr().out)["rf"] > 0


def test_cli_simulate_topology_only_tree(capsys, tmp_path):
    from trex_tpu.cli import main

    tree = tmp_path / "topo.nwk"
    tree.write_text("((a,b),(c,d));\n")
    main(["simulate", "--tree", str(tree), "--sites", "100",
          "--default-blen", "0.2"])
    stdout = capsys.readouterr().out
    from trex_tpu.io import DNA, parse_fasta

    names, states = parse_fasta(stdout, DNA)
    assert sorted(names) == ["a", "b", "c", "d"]
    # Non-degenerate: default lengths substituted for the missing ones.
    assert (states != states[0:1]).any()


def test_cli_simulate_gy94_dnds_roundtrip(capsys, tmp_path):
    """Codon simulation -> dnds fit recovers the omega/kappa regime."""
    from trex_tpu.cli import main
    from trex_tpu.io import save_newick
    from trex_tpu.topology import random_topologies

    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(50), 8, 1)
    )
    names = [f"s{i}" for i in range(8)]
    tree = tmp_path / "t.nwk"
    tree.write_text(
        save_newick(truth, names,
                    branch_lengths=np.full((truth.n_all,), 0.3)) + "\n"
    )
    aln = tmp_path / "codons.fasta"
    main(["simulate", "--model", "gy94", "--tree", str(tree),
          "--sites", "300", "--seed", "2", "--kappa", "4.0",
          "--omega", "0.15", "--output", str(aln)])
    capsys.readouterr()
    text = aln.read_text()
    seqs = [l for l in text.splitlines() if not l.startswith(">")]
    assert all(len(s) == 900 for s in seqs)  # 300 codons = 900 nt
    assert not any("TAA" == s[i:i+3] for s in seqs for i in range(0, 900, 3))

    main(["dnds", "--fasta", str(aln), "--tree", str(tree)])
    out = json.loads(capsys.readouterr().out)
    assert out["omega"] < 0.6  # purifying regime recovered
    assert out["kappa"] > 1.5  # transition bias recovered


def test_cli_simulate_explicit_gtr_rates(capsys, tmp_path):
    """--gtr-rates/--freqs override the seeded random model."""
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, parse_fasta

    out = tmp_path / "g.fasta"
    main(["simulate", "--leaves", "6", "--sites", "4000", "--seed", "1",
          "--model", "gtr",
          "--gtr-rates", "1", "8", "1", "1", "8", "1",
          "--freqs", "0.4", "0.1", "0.4", "0.1",
          "--default-blen", "5.0", "--output", str(out)])
    capsys.readouterr()
    names, states = parse_fasta(out.read_text(), DNA)
    comp = np.bincount(states.ravel(), minlength=4) / states.size
    # Long branches push composition toward the requested frequencies.
    assert comp[0] > 0.3 and comp[2] > 0.3
    assert comp[1] < 0.2 and comp[3] < 0.2


def test_device_path_statistics():
    """The device scan generator (round-5: the 8192-taxa harness's
    bottleneck fix) satisfies the same closed-form oracles as the host
    walk: JC expected identity, stationarity on long branches, exactly
    invariant zero-rate sites, determinism, and GTR frequency bias."""
    # Determinism + shapes.
    topo = balanced_topology(8)
    blens = np.full((topo.n_all,), 0.1)
    a = simulate_alignment(jax.random.key(0), topo, blens, n_sites=64, device=True)
    b = simulate_alignment(jax.random.key(0), topo, blens, n_sites=64, device=True)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 64) and (a >= 0).all() and (a < 4).all()

    # Zero branch lengths copy the root exactly (expm(0) = I).
    leaves, anc = simulate_alignment(
        jax.random.key(1), topo, np.zeros((topo.n_all,)), n_sites=50,
        return_ancestors=True, device=True,
    )
    assert (leaves == anc[-1][None, :]).all()

    # JC expected identity on one branch.
    cherry = balanced_topology(2)
    t = 0.3
    leaves, anc = simulate_alignment(
        jax.random.key(3), cherry, np.array([t, 0.0, 0.0]), n_sites=20000,
        return_ancestors=True, device=True,
    )
    np.testing.assert_array_equal(leaves[1], anc[-1])
    expected = 0.25 + 0.75 * np.exp(-4.0 * t / 3.0)
    assert abs(float((leaves[0] == leaves[1]).mean()) - expected) < 0.02

    # Long branches reach the requested stationary distribution.
    big = balanced_topology(64)
    freqs = np.array([0.5, 0.3, 0.15, 0.05])
    leaves = simulate_alignment(
        jax.random.key(2), big, np.full((big.n_all,), 50.0), n_sites=400,
        freqs=freqs, device=True,
    )
    observed = np.bincount(leaves.ravel(), minlength=4) / leaves.size
    np.testing.assert_allclose(observed, freqs, atol=0.02)

    # Invariant-category sites are EXACTLY constant (rate 0 -> identity).
    mid = balanced_topology(16)
    leaves = simulate_alignment(
        jax.random.key(4), mid, np.full((mid.n_all,), 0.5), n_sites=2000,
        p_invariant=0.5, device=True,
    )
    constant = (leaves == leaves[0:1]).all(axis=0).mean()
    # The constant fraction ~ Binomial(2000, 0.5)/2000 (variable sites at
    # blen 0.5 over 16 taxa are never chance-constant — measured 0.0
    # without p_inv), so bound it by +/-4 sd of 0.5, not strictly 0.5.
    assert 0.455 < constant < 0.545
    no_inv = simulate_alignment(
        jax.random.key(4), mid, np.full((mid.n_all,), 0.5), n_sites=2000,
        p_invariant=0.0, device=True,
    )
    assert (no_inv == no_inv[0:1]).all(axis=0).mean() < constant - 0.2


def test_device_path_auto_threshold():
    """Auto-dispatch: small shapes stay on the host path (byte-identical
    fixtures), huge shapes take the device scan."""
    from trex_tpu.models.simulate import _DEVICE_CELLS

    topo = balanced_topology(8)
    blens = np.full((topo.n_all,), 0.1)
    host = simulate_alignment(jax.random.key(7), topo, blens, n_sites=64)
    forced = simulate_alignment(
        jax.random.key(7), topo, blens, n_sites=64, device=False
    )
    np.testing.assert_array_equal(host, forced)  # auto == host at this size
    assert topo.n_all * 64 < _DEVICE_CELLS
