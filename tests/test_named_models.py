"""Named nucleotide substitution models (K80 / HKY85 / F81 / TN93).

Oracles: parameter recovery from simulated data (kappa, frequencies,
purine/pyrimidine transition ordering), likelihood nesting (a supermodel
fits at least as well as its submodel on the same data), and free-parameter
counts for the information criteria.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.ops.likelihood import optimize_model
from trex_tpu.search.model_select import count_parameters
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def _transition_rates(k_r, k_y):
    # DNA order ACGT: transitions A<->G (0,2), C<->T (1,3).
    r = np.ones((4, 4)) - np.eye(4)
    r[0, 2] = r[2, 0] = k_r
    r[1, 3] = r[3, 1] = k_y
    return r


@pytest.fixture(scope="module")
def k80_data():
    topo = _single(jax.random.key(0), 8)
    blens = np.full((topo.n_all,), 0.15)
    leaves = simulate_alignment(
        jax.random.key(1), topo, blens, n_sites=1500,
        rates=_transition_rates(4.0, 4.0),
    )
    return topo, jnp.asarray(leaves)


def test_k80_recovers_kappa(k80_data):
    topo, leaves = k80_data
    params, losses = optimize_model(topo, leaves, 4, model="k80")
    assert 2.5 < float(params["kappa"]) < 6.5
    assert "freqs" in params and np.allclose(params["freqs"], 0.25)


def test_hky_recovers_frequencies():
    topo = _single(jax.random.key(2), 8)
    blens = np.full((topo.n_all,), 0.2)
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    leaves = simulate_alignment(
        jax.random.key(3), topo, blens, n_sites=2000,
        rates=_transition_rates(3.0, 3.0), freqs=freqs,
    )
    params, _ = optimize_model(topo, jnp.asarray(leaves), 4, model="hky")
    np.testing.assert_allclose(np.asarray(params["freqs"]), freqs, atol=0.05)
    assert float(params["kappa"]) > 1.8


def test_tn93_recovers_transition_asymmetry():
    topo = _single(jax.random.key(4), 8)
    blens = np.full((topo.n_all,), 0.2)
    leaves = simulate_alignment(
        jax.random.key(5), topo, blens, n_sites=2500,
        rates=_transition_rates(8.0, 2.0),
    )
    params, _ = optimize_model(topo, jnp.asarray(leaves), 4, model="tn93")
    assert float(params["kappa_purine"]) > float(params["kappa_pyrimidine"])


def test_likelihood_nesting(k80_data):
    topo, leaves = k80_data
    lnl = {}
    for model in ("jc", "k80", "hky", "gtr"):
        _, losses = optimize_model(topo, leaves, 4, model=model)
        lnl[model] = -float(losses[-1])
    slack = 0.5  # optimizer tolerance
    assert lnl["k80"] >= lnl["jc"] - slack
    assert lnl["hky"] >= lnl["k80"] - slack
    assert lnl["gtr"] >= lnl["hky"] - slack
    # Data IS K80: kappa matters a lot, frequencies/extra rates barely.
    assert lnl["k80"] - lnl["jc"] > 20.0
    assert lnl["gtr"] - lnl["k80"] < 10.0


def test_f81_equals_jc_on_uniform_freq_data(k80_data):
    # F81's only freedom over JC is the frequencies; on uniform-frequency
    # data the fitted freqs approach 1/4 and the lnL gain is tiny.
    topo, leaves = k80_data
    _, losses_jc = optimize_model(topo, leaves, 4, model="jc")
    params, losses_f81 = optimize_model(topo, leaves, 4, model="f81")
    np.testing.assert_allclose(np.asarray(params["freqs"]), 0.25, atol=0.05)
    assert abs(float(losses_f81[-1]) - float(losses_jc[-1])) < 5.0


def test_count_parameters_for_named_models():
    n = 10
    base = 2 * n - 3
    assert count_parameters("jc", 4, n) == base
    assert count_parameters("k80", 4, n) == base + 1
    assert count_parameters("hky", 4, n) == base + 4
    assert count_parameters("f81", 4, n) == base + 3
    assert count_parameters("tn93", 4, n) == base + 5
    assert count_parameters("hky+g", 4, n) == base + 5
    assert count_parameters("tn93+g", 4, n) == base + 6


def test_named_models_reject_non_dna():
    topo = _single(jax.random.key(6), 4)
    leaves = jnp.zeros((4, 10), jnp.int32)
    with pytest.raises(ValueError, match="nucleotide model"):
        optimize_model(topo, leaves, 20, model="hky")


def test_cli_modeltest_includes_named_models(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    topo = _single(jax.random.key(7), 6)
    blens = np.full((topo.n_all,), 0.2)
    leaves = simulate_alignment(
        jax.random.key(8), topo, blens, n_sites=400,
        rates=_transition_rates(5.0, 5.0),
    )
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(6)], leaves, DNA))
    main(["modeltest", "--fasta", str(path), "--models", "jc,k80,hky"])
    out = json.loads(capsys.readouterr().out)
    ranked = [r["model"] for r in out["table"]]
    assert set(ranked) == {"jc", "k80", "hky"}
    # Strong transition bias: kappa models beat JC.
    assert out["best"] in ("k80", "hky")


def test_plus_i_without_gamma():
    """'+i' alone: single rate-1 category + invariant class, p recovered."""
    topo = _single(jax.random.key(50), 8)
    blens = np.full((topo.n_all,), 0.3)
    leaves = simulate_alignment(
        jax.random.key(51), topo, blens, n_sites=600, p_invariant=0.4
    )
    params, losses = optimize_model(topo, jnp.asarray(leaves), 4, model="jc+i")
    assert 0.25 < float(params["p_invariant"]) < 0.6
    _, losses_jc = optimize_model(topo, jnp.asarray(leaves), 4, model="jc")
    assert -float(losses[-1]) > -float(losses_jc[-1]) + 50.0
    # Named-model combination parses too.
    params2, _ = optimize_model(topo, jnp.asarray(leaves), 4, model="hky+i")
    assert "kappa" in params2 and "p_invariant" in params2
    assert count_parameters("jc+i", 4, 8) == count_parameters("jc", 4, 8) + 1
    assert (
        count_parameters("gtr+i", 4, 8) == count_parameters("gtr", 4, 8) + 1
    )
