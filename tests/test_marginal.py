"""Stepping-stone marginal likelihood: exact quadrature + Bayes factors."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.io import sample_topologies
from trex_tpu.ops.likelihood import tree_log_likelihood
from trex_tpu.search.marginal import stepping_stone
from trex_tpu.topology import Topology


def test_two_taxon_marginal_matches_quadrature():
    """The 2-taxon JC marginal has a 1D integral form (prior of the
    root-path sum is Gamma(2, m)); stepping stone must match it."""
    rng = np.random.default_rng(0)
    length = 200
    a = rng.integers(0, 4, length)
    b = np.where(
        rng.uniform(size=length) < 0.2,
        (a + rng.integers(1, 4, length)) % 4, a,
    )
    leaves = jnp.asarray(np.stack([a, b]).astype(np.int32))
    topo = Topology(
        children=jnp.asarray([[0, 1]], jnp.int32),
        parents=jnp.asarray([2, 2, 2], jnp.int32),
    )
    m_prior = 0.1
    grid = jnp.linspace(1e-5, 3.0, 12000)
    lnl = np.asarray(
        jax.jit(
            jax.vmap(
                lambda s: tree_log_likelihood(
                    topo, jnp.stack([s, 0 * s, 0 * s]), leaves, 4
                )
            )
        )(grid)
    )
    g = np.asarray(grid)
    dg = g[1] - g[0]
    terms = lnl + np.log(g) - g / m_prior - 2 * np.log(m_prior)
    mx = terms.max()
    log_z = mx + np.log(np.sum(np.exp(terms - mx)) * dg)

    res = stepping_stone(
        jax.random.PRNGKey(1), topo, leaves, 4,
        n_rungs=32, n_generations=3000, brlen_prior_mean=m_prior,
    )
    assert abs(res["log_marginal"] - log_z) < 0.15
    assert res["ess_min"] > 10
    assert 0.3 < res["acceptance"] < 0.95


def test_bayes_factors_prefer_true_model():
    """Occam's razor both ways: JC wins on JC data (the sampled-GTR pays
    its prior spread), GTR wins overwhelmingly on strongly-GTR data."""
    from trex_tpu.models.simulate import simulate_alignment

    truth = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(9, 8, 1)
    )
    common = dict(n_rungs=24, n_generations=1500)

    jc_aln = simulate_alignment(
        jax.random.PRNGKey(4), truth, np.full(15, 0.15, np.float32),
        n_sites=300,
    )
    seqs = jnp.asarray(jc_aln.astype(np.int32))
    z_jc = stepping_stone(jax.random.PRNGKey(2), truth, seqs, 4, **common)
    z_gtr = stepping_stone(
        jax.random.PRNGKey(3), truth, seqs, 4, sample_model=True, **common
    )
    assert z_jc["log_marginal"] - z_gtr["log_marginal"] > 3.0

    rates = np.ones((4, 4), np.float32)
    rates[0, 2] = rates[2, 0] = 6.0
    rates[1, 3] = rates[3, 1] = 6.0
    freqs = np.array([0.4, 0.1, 0.15, 0.35], np.float32)
    gtr_aln = simulate_alignment(
        jax.random.PRNGKey(5), truth, np.full(15, 0.15, np.float32),
        n_sites=300, rates=rates, freqs=freqs,
    )
    seqs2 = jnp.asarray(gtr_aln.astype(np.int32))
    z_jc2 = stepping_stone(jax.random.PRNGKey(6), truth, seqs2, 4, **common)
    z_gtr2 = stepping_stone(
        jax.random.PRNGKey(7), truth, seqs2, 4, sample_model=True, **common
    )
    assert z_gtr2["log_marginal"] - z_jc2["log_marginal"] > 30.0
