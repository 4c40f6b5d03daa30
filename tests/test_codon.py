"""GY94 codon model: genetic code, generator, brute-force parity, inference.

Oracles: hand-checked genetic-code facts, reversibility/detailed-balance
identities, and exact enumeration of ancestor codon states on a 3-leaf tree
(61^2 assignments). Model discrimination is tested by scoring simulated data
at the true vs a wrong omega (no optimization, deterministic).
"""

import itertools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from trex_tpu.models import codon as cd
from trex_tpu.topology import balanced_topology, parents_to_topology


def test_genetic_code_facts():
    assert cd.N_CODONS == 61
    assert len(cd.SENSE_CODONS) == len(set(cd.SENSE_CODONS)) == 61
    assert set(cd.STOP_CODONS) == {"TAA", "TAG", "TGA"}
    assert cd.GENETIC_CODE["ATG"] == "M"
    assert cd.GENETIC_CODE["TGG"] == "W"
    assert cd.GENETIC_CODE["GGG"] == "G"
    counts = Counter(cd.CODON_AMINO_ACIDS)
    assert counts["L"] == counts["S"] == counts["R"] == 6
    assert counts["M"] == counts["W"] == 1
    assert counts["I"] == 3
    assert sum(counts.values()) == 61 and len(counts) == 20


def test_exchangeabilities_classes():
    s = np.asarray(cd.gy94_exchangeabilities(2.0, 0.3))
    assert np.allclose(s, s.T)
    assert (np.diag(s) == 0).all()
    ix = cd.CODON_INDEX
    # Synonymous transition (AAA->AAG, K->K, A<->G): kappa.
    assert s[ix["AAA"], ix["AAG"]] == pytest.approx(2.0)
    # Nonsynonymous transversion (AAA->AAC, K->N): omega.
    assert s[ix["AAA"], ix["AAC"]] == pytest.approx(0.3)
    # Nonsynonymous transition (AAA->GAA, K->E): kappa*omega.
    assert s[ix["AAA"], ix["GAA"]] == pytest.approx(0.6)
    # Synonymous transversion (GGA->GGC, G->G): 1.
    assert s[ix["GGA"], ix["GGC"]] == pytest.approx(1.0)
    # Multi-position changes are forbidden.
    assert s[ix["AAA"], ix["CCA"]] == 0.0
    assert s[ix["AAA"], ix["CCC"]] == 0.0


def test_generator_reversible_normalized():
    freqs = jnp.asarray(
        np.random.default_rng(0).dirichlet(np.ones(61) * 5), jnp.float32
    )
    q = np.asarray(cd.gy94_generator(2.5, 0.4, freqs))
    f = np.asarray(freqs)
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-5)
    flux = f[:, None] * q
    np.testing.assert_allclose(flux, flux.T, atol=1e-6)  # detailed balance
    assert -(f * np.diag(q)).sum() == pytest.approx(1.0, abs=1e-4)


def test_encode_codons():
    ix = cd.CODON_INDEX
    # ATG TGG AA? TAA(stop), trailing partial base dropped.
    nuc = np.array([[0, 3, 2, 3, 2, 2, 0, 0, -1, 3, 0, 0, 2]])
    with pytest.raises(ValueError, match="stop"):
        cd.encode_codons(nuc)
    states = cd.encode_codons(nuc, stops="missing")
    assert states.shape == (1, 4)
    assert states[0, 0] == ix["ATG"] and states[0, 1] == ix["TGG"]
    assert states[0, 2] == cd.MISSING and states[0, 3] == cd.MISSING


def test_frequency_estimators():
    rng = np.random.default_rng(2)
    nuc = rng.integers(0, 4, size=(6, 90))
    codons = cd.encode_codons(nuc, stops="missing")
    for mode in ("f61", "f3x4", "f1x4"):
        f = cd.codon_frequencies(codons, mode=mode, nuc_states=nuc)
        assert f.shape == (61,)
        assert f.sum() == pytest.approx(1.0, abs=1e-5)
        assert (f > 0).all()
    with pytest.raises(ValueError):
        cd.codon_frequencies(codons, mode="f3x4")  # needs nuc_states


def test_matches_brute_force_enumeration():
    # 3 leaves, 2 ancestors: exact sum over 61^2 ancestor assignments,
    # including a missing (-1) leaf codon marginalized out.
    topo = parents_to_topology(jnp.asarray([3, 3, 4, 4, 4]), 3)
    rng = np.random.default_rng(0)
    freqs = rng.dirichlet(np.ones(61) * 5).astype(np.float32)
    kappa, omega = 2.5, 0.4
    blens = rng.uniform(0.05, 0.8, 5).astype(np.float32)
    ix = cd.CODON_INDEX
    leaf = np.array(
        [
            [ix["ATG"], ix["AAA"], cd.MISSING],
            [ix["ATA"], ix["AAG"], ix["TGG"]],
            [ix["ACG"], ix["GAA"], ix["TGG"]],
        ],
        dtype=np.int32,
    )
    got = float(
        cd.gy94_log_likelihood(
            topo, jnp.asarray(blens), jnp.asarray(leaf),
            kappa=kappa, omega=omega, freqs=jnp.asarray(freqs),
        )
    )
    gen = np.asarray(
        cd.gy94_generator(kappa, omega, jnp.asarray(freqs)), dtype=np.float64
    )
    mats = [scipy.linalg.expm(gen * t) for t in blens]
    children = np.asarray(topo.children)
    total = 0.0
    for site in range(leaf.shape[1]):
        lik = 0.0
        for labels in itertools.product(range(61), repeat=2):
            full = list(leaf[:, site]) + list(labels)
            p = float(freqs[full[-1]])
            for a in range(2):
                parent_state = full[3 + a]
                for c in children[a]:
                    if full[c] >= 0:
                        p *= mats[c][parent_state, full[c]]
            lik += p
        total += np.log(lik)
    assert got == pytest.approx(total, rel=1e-4)


def test_gamma_mixture_differs_and_is_finite():
    topo = balanced_topology(4)
    leaf = jnp.asarray(
        cd.simulate_gy94(
            jax.random.PRNGKey(0), topo, np.full(7, 0.2), n_sites=30
        )
    )
    freqs = jnp.full((61,), 1.0 / 61)
    blens = jnp.full((7,), 0.2)
    plain = float(
        cd.gy94_log_likelihood(
            topo, blens, leaf, kappa=2.0, omega=0.5, freqs=freqs
        )
    )
    gamma = float(
        cd.gy94_log_likelihood(
            topo, blens, leaf, kappa=2.0, omega=0.5, freqs=freqs,
            gamma_shape=0.5,
        )
    )
    assert np.isfinite(plain) and np.isfinite(gamma)
    assert plain != gamma


def test_scoring_discriminates_omega():
    # Score simulated data at the true omega vs a wrong one (both sides of 1).
    topo = balanced_topology(8)
    blens = np.full(15, 0.15, np.float32)
    freqs = np.random.default_rng(1).dirichlet(np.ones(61) * 20).astype(np.float32)
    fj = jnp.asarray(freqs)
    bj = jnp.asarray(blens)
    for true_omega, wrong_omega in ((0.15, 2.5), (2.5, 0.15)):
        leaf = jnp.asarray(
            cd.simulate_gy94(
                jax.random.PRNGKey(7), topo, blens,
                kappa=3.0, omega=true_omega, freqs=freqs, n_sites=300,
            )
        )
        ll_true = float(
            cd.gy94_log_likelihood(topo, bj, leaf, kappa=3.0, omega=true_omega, freqs=fj)
        )
        ll_wrong = float(
            cd.gy94_log_likelihood(topo, bj, leaf, kappa=3.0, omega=wrong_omega, freqs=fj)
        )
        assert ll_true > ll_wrong + 10.0


def test_optimize_gy94_smoke():
    topo = balanced_topology(4)
    blens = np.full(7, 0.2, np.float32)
    leaf = jnp.asarray(
        cd.simulate_gy94(
            jax.random.PRNGKey(5), topo, blens, kappa=2.0, omega=0.3,
            n_sites=60,
        )
    )
    params, losses = cd.optimize_gy94(topo, leaf, n_iterations=40)
    assert float(losses[-1]) < float(losses[0])
    assert float(params["omega"]) > 0 and float(params["kappa"]) > 0
    assert params["branch_lengths"].shape == (7,)
    assert bool(jnp.all(jnp.isfinite(params["branch_lengths"])))


def test_cli_dnds_search_recovers_topology(capsys, tmp_path):
    """Codon-model tree search: GY94 SPR scan recovers the true tree."""
    import json

    import jax as _jax

    from trex_tpu.cli import main
    from trex_tpu.io import load_newick, renumber_leaves, save_newick
    from trex_tpu.search.ratchet import rf_distance_unrooted
    from trex_tpu.topology import random_topologies

    truth = _jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(60), 7, 1)
    )
    names = [f"c{i}" for i in range(7)]
    blens = np.full((truth.n_all,), 0.35)
    codons = cd.simulate_gy94(
        jax.random.key(61), truth, blens, kappa=3.0, omega=0.2, n_sites=150
    )
    rows = ["".join(cd.SENSE_CODONS[c] for c in row) for row in codons]
    aln = tmp_path / "codons.fasta"
    aln.write_text("\n".join(f">{n}\n{s}" for n, s in zip(names, rows)) + "\n")
    out_tree = tmp_path / "out.nwk"
    main(["dnds", "--fasta", str(aln), "--search", "--iterations", "300",
          "--output-tree", str(out_tree)])
    out = json.loads(capsys.readouterr().out)
    assert "search" in out["tree_source"]
    assert out["omega"] < 1.0
    got, _, got_names = load_newick(out_tree.read_text())
    order = {n: i for i, n in enumerate(names)}
    aligned = renumber_leaves(got, [order[n] for n in got_names])
    assert rf_distance_unrooted(aligned, truth) == 0
