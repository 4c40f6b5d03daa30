"""Model selection (AIC/AICc/BIC), PAML rate files, empirical models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import parse_paml_rates
from trex_tpu.ops.likelihood import optimize_model, tree_log_likelihood
from trex_tpu.search.model_select import compare_models, count_parameters
from trex_tpu.topology import balanced_topology

# A tiny 4-state "PAML" file: 6 lower-triangle exchangeabilities + 4 freqs,
# with comments and trailing junk the parser must skip.
PAML_4STATE = """# toy matrix
1.0
2.0 0.5
0.5 2.0 1.0   // transversions/transitions
0.30 0.20 0.20 0.30

toy matrix citation (ignored)
"""


def test_parse_paml_rates():
    rates, freqs = parse_paml_rates(PAML_4STATE, n_states=4)
    assert rates.shape == (4, 4) and freqs.shape == (4,)
    np.testing.assert_allclose(rates, rates.T)
    assert rates[1, 0] == 1.0 and rates[2, 1] == 0.5 and rates[3, 2] == 1.0
    np.testing.assert_allclose(freqs.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(freqs, [0.3, 0.2, 0.2, 0.3])
    with pytest.raises(ValueError, match="need"):
        parse_paml_rates("1.0 2.0", n_states=4)


def test_count_parameters():
    # 8 leaves -> 13 unrooted branches.
    assert count_parameters("jc", 4, 8) == 13
    assert count_parameters("jc+g", 4, 8) == 14
    assert count_parameters("gtr", 4, 8) == 13 + 5 + 3
    assert count_parameters("gtr+g+i", 4, 8) == 13 + 5 + 3 + 2
    assert count_parameters("gtr+r3", 4, 8) == 13 + 5 + 3 + 4
    assert count_parameters("empirical", 20, 8) == 13
    assert count_parameters("empirical", 20, 8, freqs_fitted=True) == 13 + 19
    # Named nucleotide submodels are first-class now.
    assert count_parameters("hky", 4, 8) == 13 + 4
    with pytest.raises(ValueError):
        count_parameters("hky85-typo", 4, 8)


def test_empirical_model_fits_and_holds_rates_fixed():
    rates, freqs = parse_paml_rates(PAML_4STATE, n_states=4)
    topo = balanced_topology(4)
    seqs = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, (4, 60)), jnp.int32
    )
    params, losses = optimize_model(
        topo, seqs, 4, model="empirical", n_iterations=80,
        fixed_rates=jnp.asarray(rates), fixed_freqs=jnp.asarray(freqs),
    )
    assert float(losses[-1]) < float(losses[0])
    np.testing.assert_allclose(np.asarray(params["rates"]), rates)
    np.testing.assert_allclose(np.asarray(params["freqs"]), freqs)
    # Fitted-frequency variant (+F): freqs move away from the file values.
    params_f, _ = optimize_model(
        topo, seqs, 4, model="empirical", n_iterations=80,
        fixed_rates=jnp.asarray(rates),
    )
    assert not np.allclose(np.asarray(params_f["freqs"]), freqs)
    with pytest.raises(ValueError, match="fixed_rates"):
        optimize_model(topo, seqs, 4, model="empirical")


def test_compare_models_ranks_and_is_consistent():
    topo = balanced_topology(4)
    seqs = jnp.asarray(
        np.random.default_rng(1).integers(0, 4, (4, 80)), jnp.int32
    )
    fits = compare_models(
        topo, seqs, 4, models=("jc", "gtr"), criterion="aic",
        n_iterations=120,
    )
    assert len(fits) == 2
    assert fits[0].aic <= fits[1].aic
    by_model = {f.model: f for f in fits}
    # GTR nests JC: its ML fit can't be (much) worse in raw likelihood.
    assert by_model["gtr"].log_likelihood >= by_model["jc"].log_likelihood - 1.0
    # AIC arithmetic.
    for f in fits:
        assert f.aic == pytest.approx(
            2 * f.n_parameters - 2 * f.log_likelihood
        )
        assert f.bic >= f.aic  # n=80 sites -> ln(80) > 2
    # Reported lnL is reproducible by scoring at the fitted params.
    gtr = by_model["gtr"]
    rescored = float(
        tree_log_likelihood(
            topo, jnp.asarray(gtr.params["branch_lengths"]), seqs, 4,
            rates=jnp.asarray(gtr.params["rates"]),
            freqs=jnp.asarray(gtr.params["freqs"]),
        )
    )
    assert rescored == pytest.approx(gtr.log_likelihood, rel=1e-4)


def test_compare_models_bad_criterion():
    topo = balanced_topology(4)
    seqs = jnp.asarray(np.zeros((4, 10)), jnp.int32)
    with pytest.raises(ValueError, match="criterion"):
        compare_models(topo, seqs, 4, criterion="dic")
