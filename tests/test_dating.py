"""Clock fitting + Bayesian dating validation.

Oracles: exact ML clock recovery on ultrametric data, the LRT's
clock/non-clock separation, 2-taxon quadrature for the root-age
posterior, the EXACT 3-taxon prior (root ~ Gamma(2, m), interior/root ~
Uniform), and simulated-age recovery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.io import sample_topologies
from trex_tpu.ops.clock import (
    ages_to_lengths,
    clock_lrt,
    increments_to_ages,
    optimize_clock,
)
from trex_tpu.search.dating import mcmc_date
from trex_tpu.topology import Topology


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


def _ultrametric(seed, n_leaves, lo=0.02, hi=0.12):
    topo = _single(seed, n_leaves)
    rng = np.random.default_rng(seed)
    inc = jnp.asarray(
        rng.uniform(lo, hi, size=n_leaves - 1).astype(np.float32)
    )
    ages = increments_to_ages(topo, inc)
    return topo, ages


def test_ages_lengths_roundtrip_and_validity():
    topo, ages = _ultrametric(3, 10)
    lengths = np.asarray(ages_to_lengths(topo, ages))
    assert lengths[-1] == 0.0
    assert np.all(lengths[:-1] > 0)
    # Root-to-leaf path sums all equal the root age (ultrametricity).
    parents = np.asarray(topo.parents)
    for leaf in range(10):
        total, node = 0.0, leaf
        while node != topo.n_all - 1:
            total += lengths[node]
            node = int(parents[node])
        assert abs(total - float(ages[-1])) < 1e-5


def test_optimize_clock_recovers_simulated_ages():
    from trex_tpu.models.simulate import simulate_alignment

    topo, ages_true = _ultrametric(3, 10)
    aln = simulate_alignment(
        jax.random.PRNGKey(0), topo,
        np.asarray(ages_to_lengths(topo, ages_true)), n_sites=3000,
    )
    ages_fit, _ = optimize_clock(topo, jnp.asarray(aln.astype(np.int32)), 4)
    assert float(jnp.max(jnp.abs(ages_fit - ages_true))) < 0.03


def test_clock_lrt_separates_clock_from_nonclock():
    from trex_tpu.models.simulate import simulate_alignment

    topo, ages_true = _ultrametric(3, 10)
    clock_aln = simulate_alignment(
        jax.random.PRNGKey(0), topo,
        np.asarray(ages_to_lengths(topo, ages_true)), n_sites=3000,
    )
    res = clock_lrt(
        topo, jnp.asarray(clock_aln.astype(np.int32)), 4,
        n_iterations=1000,
    )
    assert res["df"] == 8
    assert res["p_value"] > 0.005  # clock data: not (strongly) rejected

    rng = np.random.default_rng(1)
    bad = rng.exponential(0.08, size=19).astype(np.float32)
    bad[-1] = 0.0
    bad_aln = simulate_alignment(
        jax.random.PRNGKey(1), topo, bad, n_sites=3000
    )
    res_bad = clock_lrt(
        topo, jnp.asarray(bad_aln.astype(np.int32)), 4, n_iterations=1000
    )
    assert res_bad["p_value"] < 1e-8
    assert res_bad["statistic"] > 10 * max(res["statistic"], 1.0)


def test_two_taxon_root_age_matches_quadrature():
    from trex_tpu.ops.likelihood import tree_log_likelihood

    rng = np.random.default_rng(0)
    length = 400
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
    grid = jnp.linspace(1e-4, 1.0, 2000)
    lnl = np.asarray(
        jax.jit(
            jax.vmap(
                lambda r: tree_log_likelihood(
                    topo, jnp.stack([r, r, 0 * r]), leaves, 4
                )
            )
        )(grid)
    )
    g = np.asarray(grid)
    logpost = lnl - g / 0.3
    w = np.exp(logpost - logpost.max())
    w /= w.sum()
    mean_exact = float((w * g).sum())
    sd_exact = float(np.sqrt((w * (g - mean_exact) ** 2).sum()))

    res = mcmc_date(
        jax.random.PRNGKey(1), topo, leaves, 4,
        n_generations=6000, n_chains=2, root_age_prior_mean=0.3,
    )
    r = res.sample_ages[:, -1]
    assert abs(r.mean() - mean_exact) < 0.004
    assert abs(r.std() - sd_exact) < 0.004
    assert res.ess_root_age > 200


def test_three_taxon_prior_is_exact():
    """Prior-only: root ~ Gamma(2, m) EXACTLY; interior/root ~ Uniform."""
    topo = _single(0, 3)
    res = mcmc_date(
        jax.random.PRNGKey(2), topo, jnp.zeros((3, 4), jnp.int32), 4,
        n_generations=30000, n_chains=2, prior_only=True,
        root_age_prior_mean=0.3, sample_every=6,
    )
    root = res.sample_ages[:, -1]
    assert abs(root.mean() - 0.6) < 0.06  # Gamma(2, 0.3) mean
    assert abs(root.std() - 0.424) < 0.06  # and sd m*sqrt(2)
    ratio = res.sample_ages[:, 3] / root
    assert abs(ratio.mean() - 0.5) < 0.03
    for p in (0.25, 0.5, 0.75):
        assert abs((ratio < p).mean() - p) < 0.04


def test_dating_recovers_simulated_ages():
    from trex_tpu.models.simulate import simulate_alignment

    topo, ages_true = _ultrametric(5, 8)
    aln = simulate_alignment(
        jax.random.PRNGKey(3), topo,
        np.asarray(ages_to_lengths(topo, ages_true)), n_sites=2000,
    )
    res = mcmc_date(
        jax.random.PRNGKey(4), topo, jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=4000, n_chains=2,
    )
    true = np.asarray(ages_true)
    # Every true age inside its 95% interval, posterior mean close.
    inside = (res.age_hpd[:, 0] <= true) & (true <= res.age_hpd[:, 1])
    assert inside[8:].mean() >= 6 / 7  # allow one near-boundary miss
    assert np.max(np.abs(res.mean_ages[8:] - true[8:])) < 0.05
    # Output newick is ultrametric at the posterior mean root age.
    assert res.newick.count(":") == 14


def test_relaxed_prior_recovers_lognormal_rates():
    """Prior-only relaxed clock: log-rates ~ N(-sd^2/2, sd^2) exactly."""
    topo = _single(0, 6)
    sd = 0.4
    res = mcmc_date(
        jax.random.PRNGKey(1), topo, jnp.zeros((6, 4), jnp.int32), 4,
        n_generations=20000, n_chains=2, prior_only=True,
        clock="relaxed", relaxed_sd=sd, sample_every=8,
    )
    lr = np.log(res.sample_rates[:, :-1]).ravel()
    assert abs(lr.mean() - (-0.5 * sd * sd)) < 0.03
    assert abs(lr.std() - sd) < 0.03
    assert res.acceptance["rate"] > 0.3


def test_relaxed_clock_flags_fast_branch():
    """One branch simulated 3x fast: its posterior rate leads the pack."""
    from trex_tpu.models.simulate import simulate_alignment

    topo, ages_true = _ultrametric(5, 8, lo=0.04, hi=0.1)
    lengths = np.asarray(ages_to_lengths(topo, ages_true))
    fast_node = 2
    sim = lengths.copy()
    sim[fast_node] *= 3.0
    aln = simulate_alignment(
        jax.random.PRNGKey(1), topo, sim.astype(np.float32), n_sites=2000
    )
    res = mcmc_date(
        jax.random.PRNGKey(2), topo, jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=8000, n_chains=2, clock="relaxed", relaxed_sd=0.5,
    )
    mean_rates = res.sample_rates.mean(0)[:-1]
    others = np.delete(mean_rates, fast_node)
    assert mean_rates[fast_node] > others.max()
    assert mean_rates[fast_node] > 1.5 * np.median(others)
    # Strict-clock data: rates shrink to ~1 (no false signal).
    aln0 = simulate_alignment(
        jax.random.PRNGKey(3), topo, lengths.astype(np.float32),
        n_sites=2000,
    )
    res0 = mcmc_date(
        jax.random.PRNGKey(4), topo, jnp.asarray(aln0.astype(np.int32)), 4,
        n_generations=6000, n_chains=2, clock="relaxed", relaxed_sd=0.5,
    )
    r0 = res0.sample_rates.mean(0)[:-1]
    assert np.all(r0 > 0.45) and np.all(r0 < 2.2)


def test_calibrated_dating_recovers_absolute_time():
    """Root calibrated to [3, 5] time units, true root age 4, true rate
    0.05 subs/site/unit: the rate x root-age PRODUCT (the identified
    quantity) is recovered tightly; the truth sits inside the HPD; the
    chain explores the calibration window (the likelihood-invariant joint
    time/rate scale move mixes along the ridge)."""
    from trex_tpu.models.simulate import simulate_alignment

    topo = _single(3, 8)
    rng = np.random.default_rng(0)
    inc = jnp.asarray(rng.uniform(0.3, 0.9, size=7).astype(np.float32))
    ages_t = np.array(increments_to_ages(topo, inc))
    ages_t *= 4.0 / ages_t[-1]
    lengths = np.array(ages_to_lengths(topo, jnp.asarray(ages_t))) * 0.05
    aln = simulate_alignment(
        jax.random.PRNGKey(1), topo, lengths.astype(np.float32),
        n_sites=3000,
    )
    res = mcmc_date(
        jax.random.PRNGKey(2), topo, jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=8000, n_chains=2, calibrations={"root": (3.0, 5.0)},
    )
    assert res.sample_clock_rate is not None
    product = res.sample_ages[:, -1] * res.sample_clock_rate
    assert abs(product.mean() - 0.2) < 0.012
    assert res.age_hpd[-1, 0] <= 4.0 <= res.age_hpd[-1, 1]
    assert res.sample_ages[:, -1].std() > 0.25  # explores the window
    # Ages stay inside the calibration window.
    assert res.sample_ages[:, -1].min() >= 3.0 - 1e-5
    assert res.sample_ages[:, -1].max() <= 5.0 + 1e-5


def test_calibration_requires_monophyly():
    import pytest

    topo = _single(3, 8)
    from trex_tpu.search.bootstrap import subtree_leaf_sets

    clades = set(subtree_leaf_sets(topo))
    non_clade = frozenset([0, 1])
    if non_clade in clades:  # pick something that is NOT a clade
        non_clade = frozenset([0, 7]) if frozenset([0, 7]) not in clades \
            else frozenset([1, 6])
    assert non_clade not in clades
    with pytest.raises(ValueError, match="monophyletic"):
        mcmc_date(
            jax.random.PRNGKey(0), topo,
            jnp.zeros((8, 4), jnp.int32), 4,
            n_generations=10, prior_only=True,
            calibrations={non_clade: (1.0, 2.0)},
        )


def test_tip_dating_identifies_absolute_rate():
    """Heterochronous tips (ages spread over [0,2]) identify the clock
    rate WITHOUT calibration windows: rate and root age both recovered
    inside their HPDs."""
    from trex_tpu.models.simulate import simulate_alignment

    topo = _single(3, 8)
    rng = np.random.default_rng(0)
    tips = rng.uniform(0.0, 2.0, size=8).astype(np.float32)
    children = np.asarray(topo.children)
    parents = np.asarray(topo.parents)
    ages_t = np.zeros(15)
    ages_t[:8] = tips
    for a in range(7):
        c0, c1 = children[a]
        ages_t[8 + a] = max(ages_t[c0], ages_t[c1]) + rng.uniform(0.4, 1.2)
    rate_true = 0.1
    lengths = np.zeros(15, np.float32)
    for v in range(14):
        lengths[v] = (ages_t[parents[v]] - ages_t[v]) * rate_true
    aln = simulate_alignment(
        jax.random.PRNGKey(1), topo, lengths, n_sites=4000
    )
    res = mcmc_date(
        jax.random.PRNGKey(2), topo, jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=8000, n_chains=2, tip_ages=tips,
        root_age_prior_mean=10.0,
    )
    cr = res.sample_clock_rate
    assert cr is not None
    lo_r, hi_r = np.percentile(cr, [2.5, 97.5])
    assert lo_r <= rate_true <= hi_r
    assert abs(cr.mean() - rate_true) < 0.015
    assert res.age_hpd[-1, 0] <= ages_t[-1] <= res.age_hpd[-1, 1]
    assert np.abs(res.mean_ages[8:] - ages_t[8:]).max() < 0.3
    # Tips stay pinned at their sampling ages.
    np.testing.assert_allclose(
        res.sample_ages[:, :8], np.broadcast_to(tips, res.sample_ages[:, :8].shape),
        atol=1e-6,
    )


def test_coalescent_area_hand_case():
    from trex_tpu.search.dating import coalescent_area

    # 3 tips at 0, coalescences at 0.5 and 1.3: 3*0.5 + 1*0.8.
    ages = jnp.asarray([0.0, 0.0, 0.0, 0.5, 1.3])
    np.testing.assert_allclose(float(coalescent_area(ages, 3)), 2.3, rtol=1e-6)
    # Serial tips: tip enters mid-interval.
    ages2 = jnp.asarray([0.0, 0.0, 0.4, 0.6, 1.0])
    # [0,0.4] k=2: 1*0.4 ; [0.4,0.6] k=3: 3*0.2 ; [0.6,1.0] k=2: 1*0.4
    np.testing.assert_allclose(
        float(coalescent_area(ages2, 3)), 0.4 + 0.6 + 0.4, rtol=1e-6
    )


def test_coalescent_prior_is_exact():
    """Prior-only with fixed Ne: the inter-coalescent intervals are the
    EXACT Kingman exponentials (2-tip root ~ Exp(Ne); 3-tip first interval
    ~ Exp(Ne/3), second ~ Exp(Ne))."""
    ne = 0.7
    topo2 = Topology(
        children=jnp.asarray([[0, 1]], jnp.int32),
        parents=jnp.asarray([2, 2, 2], jnp.int32),
    )
    res2 = mcmc_date(
        jax.random.PRNGKey(0), topo2, jnp.zeros((2, 4), jnp.int32), 4,
        n_generations=30000, n_chains=2, prior_only=True,
        tree_prior="coalescent", ne=ne, sample_every=6,
    )
    root = res2.sample_ages[:, -1]
    assert abs(root.mean() - ne) < 0.05
    assert abs(root.std() - ne) < 0.07

    topo3 = _single(0, 3)
    res3 = mcmc_date(
        jax.random.PRNGKey(1), topo3, jnp.zeros((3, 4), jnp.int32), 4,
        n_generations=40000, n_chains=2, prior_only=True,
        tree_prior="coalescent", ne=ne, sample_every=8,
    )
    t1 = res3.sample_ages[:, 3]
    t2 = res3.sample_ages[:, 4]
    assert abs(t1.mean() - ne / 3) < 0.03
    assert abs((t2 - t1).mean() - ne) < 0.07


def test_gibbs_ne_recovery_from_coalescent_data():
    """Simulate a Kingman genealogy (Ne = 0.05 substitution units) + data;
    the Gibbs-sampled Ne posterior recovers it."""
    from trex_tpu.io.fallback import _canonicalize
    from trex_tpu.models.simulate import simulate_alignment

    rng = np.random.default_rng(2)
    ne_true, n = 0.05, 16
    active = list(range(n))
    age = {i: 0.0 for i in range(n)}
    t, node = 0.0, n
    kids_map = {}
    while len(active) > 1:
        k = len(active)
        t += rng.exponential(ne_true / (k * (k - 1) / 2))
        i, j = rng.choice(len(active), 2, replace=False)
        a, b = active[i], active[j]
        active = [x for x in active if x not in (a, b)] + [node]
        kids_map[node] = [min(a, b), max(a, b)]
        age[node] = t
        node += 1
    ch, par, relabel = _canonicalize(n, kids_map, 2 * n - 2)
    ages_arr = np.zeros(2 * n - 1, np.float32)
    for old, new in relabel.items():
        ages_arr[new] = age.get(old, 0.0)
    topo = Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))
    lengths = ages_arr[np.asarray(par)] - ages_arr
    lengths[-1] = 0.0
    aln = simulate_alignment(
        jax.random.PRNGKey(3), topo, lengths.astype(np.float32),
        n_sites=2000,
    )
    res = mcmc_date(
        jax.random.PRNGKey(4), topo, jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=6000, n_chains=2, tree_prior="coalescent",
    )
    assert res.sample_ne is not None
    lo, hi = np.percentile(res.sample_ne, [2.5, 97.5])
    assert lo <= ne_true <= hi
    assert abs(res.sample_ne.mean() - ne_true) < 0.02
    assert res.age_hpd[-1, 0] <= ages_arr[-1] <= res.age_hpd[-1, 1]
