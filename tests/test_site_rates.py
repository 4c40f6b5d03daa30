"""Posterior mean per-site rates (empirical-Bayes, +Gamma / FreeRate).

Oracle: two concatenated blocks simulated at branch-length multipliers
0.2x and 3x — the fitted +G posterior mean rates must separate the blocks
cleanly; posteriors are proper distributions; CLI export round trip.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.ops.likelihood import optimize_model, posterior_site_rates
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def _two_block_data(key_a, key_b, n=10, block=150):
    truth = _single(jax.random.key(0), n)
    blens = np.full((truth.n_all,), 0.15)
    slow = simulate_alignment(
        jax.random.key(key_a), truth, blens * 0.2, n_sites=block
    )
    fast = simulate_alignment(
        jax.random.key(key_b), truth, blens * 3.0, n_sites=block
    )
    return truth, np.concatenate([np.asarray(slow), np.asarray(fast)], axis=1)


def test_site_rates_separate_slow_and_fast_blocks():
    truth, leaves = _two_block_data(1, 2)
    params, _ = optimize_model(
        truth, jnp.asarray(leaves), 4, model="jc+g"
    )
    mean_rates, post = posterior_site_rates(
        truth, params["branch_lengths"], jnp.asarray(leaves), 4,
        params["gamma_shape"],
    )
    mean_rates = np.asarray(mean_rates)
    block = leaves.shape[1] // 2
    assert mean_rates[:block].mean() < 0.7
    assert mean_rates[block:].mean() > 1.2
    # Posteriors are proper per-site distributions.
    np.testing.assert_allclose(np.asarray(post).sum(axis=0), 1.0, atol=1e-5)
    # Mixture-average rate ~ 1 by the mean-1 normalization.
    assert 0.6 < mean_rates.mean() < 1.4


def test_site_rates_freerate_mixture():
    truth, leaves = _two_block_data(3, 4)
    params, _ = optimize_model(
        truth, jnp.asarray(leaves), 4, model="jc+r3"
    )
    mean_rates, _ = posterior_site_rates(
        truth, params["branch_lengths"], jnp.asarray(leaves), 4, 1.0,
        category_rates=jnp.asarray(params["category_rates"]),
        category_weights=jnp.asarray(params["category_weights"]),
    )
    mean_rates = np.asarray(mean_rates)
    block = leaves.shape[1] // 2
    assert mean_rates[:block].mean() < mean_rates[block:].mean()


def test_cli_score_site_rates(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, save_newick, write_fasta

    truth, leaves = _two_block_data(5, 6, n=8, block=100)
    names = [f"t{i}" for i in range(8)]
    aln = tmp_path / "a.fasta"
    aln.write_text(write_fasta(names, leaves, DNA))
    tree = tmp_path / "t.nwk"
    tree.write_text(save_newick(truth, names) + "\n")
    rates_file = tmp_path / "rates.tsv"
    main(["score", "--fasta", str(aln), "--tree", str(tree),
          "--criterion", "ml", "--model", "gtr+g",
          "--site-rates", str(rates_file)])
    out = json.loads(capsys.readouterr().out)
    assert out["site_rates"] == str(rates_file)
    lines = rates_file.read_text().splitlines()
    assert lines[0] == "site\tmean_rate"
    assert len(lines) == 201
    vals = np.array([float(l.split("\t")[1]) for l in lines[1:]])
    assert vals[:100].mean() < vals[100:].mean()

    import pytest

    with pytest.raises(SystemExit):
        main(["score", "--fasta", str(aln), "--tree", str(tree),
              "--criterion", "ml", "--site-rates", str(rates_file)])
