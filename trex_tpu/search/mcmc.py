"""Bayesian phylogenetic MCMC: Metropolis-coupled, TPU-batched chains.

The reference has no Bayesian machinery at all (its only posterior-ish
object is the Gumbel-softmax topology relaxation, ``/root/reference/src/
trex/tree.py:50-107``); this is the MrBayes-class capability re-designed for
the TPU execution model:

- **All chains ride one device batch.** Every run x chain is a row of a
  batched state (topologies as ``children`` tensors, branch lengths, log
  posteriors); the per-generation likelihood evaluations — the only O(data)
  work — are ONE vmapped pruning pass over the whole chain batch, exactly
  the layout the batched scorers already use. Branch-length sweeps run as a
  jitted ``lax.scan`` entirely on device.
- **Topology proposals stay host-side** (numpy + the native move library,
  like every discrete searcher here): a uniform draw from the NNI
  neighborhood, which is a *symmetric* proposal on canonical topology space
  (verified exhaustively in ``tests/test_io.py``), so Metropolis needs no
  Hastings factor. Branch lengths are carried across the rearrangement by
  clade identity — the one edge whose clade changes inherits the one
  leftover length (standard NNI bookkeeping).
- **Metropolis coupling (MC^3)**: within each independent run, chain k
  targets ``posterior^beta_k`` with ``beta_k = 1/(1 + heat*k)``; adjacent
  chains propose state swaps between blocks; only the cold chain (k=0) is
  sampled.

Priors: iid Exponential(rate = 1/brlen_prior_mean) on the 2n-2 branch
lengths; uniform over topologies. Model: JC69 or fixed GTR(+Gamma is left
to ``optimize_model`` empirical-Bayes fits — pass fitted ``rates/freqs``).

Convergence diagnostics follow standard practice: ASDSF between the
independent runs' split frequencies, ESS of the cold-chain log-likelihood,
and per-move acceptance rates.

Statistical validation (tests/test_mcmc.py): prior-only sampling recovers
the exponential prior; the 2-taxon branch-length posterior matches 1D
quadrature; the 5-taxon topology posterior matches exhaustive enumeration
over all 105 rooted topologies (with and without heated chains).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.topology import Topology


@dataclasses.dataclass
class McmcResult:
    """Posterior sample + summaries from ``mcmc_sample``."""

    sample_children: np.ndarray
    """(n_samples, n_anc, 2) cold-chain topology samples (all runs pooled,
    post burn-in)."""
    sample_lengths: np.ndarray
    """(n_samples, n_all) matching branch-length samples."""
    sample_lnl: np.ndarray
    """(n_samples,) matching data log-likelihoods."""
    sample_run: np.ndarray
    """(n_samples,) which independent run each sample came from."""
    split_posterior: dict[frozenset[int], float]
    """Posterior probability of every sampled split (clade leaf set)."""
    consensus_newick: str
    """Majority-rule consensus of the posterior sample, clade posterior
    probabilities as internal labels."""
    acceptance: dict[str, float]
    """Acceptance rates per move class ('branch', 'topology', 'swap')."""
    asdsf: float | None
    """Average standard deviation of split frequencies across runs (None
    for a single run). < 0.01-0.05 is the usual converged range."""
    ess_lnl: float
    """Effective sample size of the pooled cold-chain lnL trace."""
    generations: int
    mean_lengths: np.ndarray
    """(n_all,) pooled mean branch length per canonical node index. Node
    identity mixes across topologies; for per-clade summaries aggregate
    ``sample_lengths`` over ``sample_children`` clades instead."""
    sample_rates: np.ndarray | None = None
    """(n_samples, Q(Q-1)/2) sampled exchangeability simplices (upper
    triangle, row-major) in sampled-model mode; None otherwise."""
    sample_freqs: np.ndarray | None = None
    """(n_samples, Q) sampled stationary-frequency simplices, or None."""


def _logsumexp_rows(logw: np.ndarray) -> np.ndarray:
    m = logw.max(axis=1)
    return m + np.log(np.exp(logw - m[:, None]).sum(axis=1))


def _exp_logprior(lengths: jax.Array, rate: float) -> jax.Array:
    """log p(branch lengths) under iid Exponential(rate); root entry excluded."""
    return jnp.log(rate) * (lengths.shape[-1] - 1) - rate * jnp.sum(
        lengths[..., :-1], axis=-1
    )


def _pairs_to_matrix(vec: jax.Array, q: int) -> jax.Array:
    """(Q(Q-1)/2,) upper-triangle exchangeabilities -> (Q, Q) symmetric."""
    iu = jnp.triu_indices(q, 1)
    m = jnp.zeros((q, q), vec.dtype).at[iu].set(vec)
    return m + m.T


def _matrix_to_pairs(m: np.ndarray, q: int) -> np.ndarray:
    iu = np.triu_indices(q, 1)
    vec = np.asarray(m, dtype=np.float64)[iu]
    return (vec / vec.sum()).astype(np.float32)


def _dirichlet_logpdf(x: jax.Array, alpha: jax.Array) -> jax.Array:
    from jax.scipy.special import gammaln

    return (
        gammaln(jnp.sum(alpha))
        - jnp.sum(gammaln(alpha))
        + jnp.sum((alpha - 1.0) * jnp.log(x))
    )


def _make_device_kernels(
    leaf_sequences: jax.Array,
    n_states: int,
    n_all: int,
    site_weights: jax.Array | None,
    sequences_are_masks: bool,
    rates: jax.Array | None,
    freqs: jax.Array | None,
    prior_rate: float,
    gamma_shape: float | None,
    n_categories: int,
    force_lax: bool = False,
    sample_model: bool = False,
):
    """Jitted (batched lnL, branch sweep, model sweep) device kernels.

    On a TPU backend, scoring goes through the fused Pallas pruning kernel
    (forward-only — exactly what Metropolis needs); +Gamma models and CPU
    runs use the lax path. GTR transitions come from the eigensystem (one
    diag-exp matmul per branch), not per-branch ``expm`` — model parameters
    are constants within any one evaluation here, so the AD-robustness
    reason for ``expm`` (``ops.likelihood`` docstring) does not apply.

    With ``sample_model`` every lnL signature gains per-chain
    ``(rates_vec (C, Q(Q-1)/2 simplex), freqs (C, Q) simplex)`` and a
    ``model_sweep`` kernel performs one Dirichlet-centered Metropolis move
    on each simplex per call (flat Dirichlet(1) priors, so only the
    proposal densities enter the Hastings ratio). Per-tree root priors ride
    the Pallas kernel by folding diag(freqs) into the root's first child
    transition matrix (sum_s pi_s A_s B_s == sum_s (diag(pi) A)_s B_s).
    """
    from trex_tpu.ops.likelihood import (
        _per_site_log_likelihood,
        discrete_gamma_rates,
        gtr_eigensystem,
        gtr_transition,
        per_site_log_likelihood,
    )

    q = n_states
    use_pallas = (
        jax.default_backend() == "tpu"
        and gamma_shape is None
        and not force_lax
    )

    if sample_model:
        def pmats_of(lengths_row, rates_vec, freqs_row):
            eigvals, left, right = gtr_eigensystem(
                _pairs_to_matrix(rates_vec, q), freqs_row
            )
            return jax.vmap(
                lambda t: gtr_transition(t, eigvals, left, right)
            )(lengths_row)

        if use_pallas:
            from trex_tpu.ops.likelihood_pallas import (
                batched_log_likelihood_pallas,
            )

            def batched_eval(children, lengths, rates_v, freqs_v):
                batch = children.shape[0]
                topo = Topology(
                    children=children,
                    parents=jnp.zeros((batch, n_all), dtype=jnp.int32),
                )
                pmats = jax.vmap(pmats_of)(lengths, rates_v, freqs_v)
                # Fold the per-tree root prior into the root's first child
                # P (scale its rows); kernel then sums with a ones prior.
                c1 = children[:, -1, 0]
                pmats = pmats.at[jnp.arange(batch), c1].multiply(
                    freqs_v[:, :, None]
                )
                return batched_log_likelihood_pallas(
                    topo, lengths, leaf_sequences, n_states,
                    transition_matrices=pmats,
                    root_prior=jnp.ones((q,), jnp.float32),
                    site_weights=site_weights,
                    sequences_are_masks=sequences_are_masks,
                )
        else:
            def lnl_one(children, lengths, rates_vec, freqs_row):
                topo = Topology(
                    children=children,
                    parents=jnp.zeros((n_all,), dtype=jnp.int32),
                )

                def per_site_at(scale):
                    return _per_site_log_likelihood(
                        topo, lengths, leaf_sequences, n_states,
                        sequences_are_masks=sequences_are_masks,
                        transition_matrices=pmats_of(
                            lengths * scale, rates_vec, freqs_row
                        ),
                        root_prior=freqs_row,
                    )

                if gamma_shape is None:
                    per_site = per_site_at(1.0)
                else:
                    cat = discrete_gamma_rates(gamma_shape, n_categories)
                    per_site = jax.nn.logsumexp(
                        jax.vmap(per_site_at)(cat), axis=0
                    ) - jnp.log(n_categories)
                if site_weights is not None:
                    per_site = per_site * site_weights
                return jnp.sum(per_site)

            def batched_eval(children, lengths, rates_v, freqs_v):
                return jax.vmap(lnl_one)(children, lengths, rates_v, freqs_v)

        batched_lnl = jax.jit(batched_eval)
    else:
        if rates is not None or freqs is not None:
            eig_freqs = jnp.full((q,), 1.0 / q) if freqs is None else freqs
            eig_rates = jnp.ones((q, q)) if rates is None else rates
            eigvals, left, right = gtr_eigensystem(eig_rates, eig_freqs)
        else:
            eigvals = None

        if use_pallas:
            from trex_tpu.ops.likelihood_pallas import (
                batched_log_likelihood_pallas,
            )

            def batched_eval_fixed(children, lengths):
                topo = Topology(
                    children=children,
                    parents=jnp.zeros(
                        children.shape[:-2] + (n_all,), dtype=jnp.int32
                    ),
                )
                pmats = None
                prior = None
                if eigvals is not None:
                    pmats = jax.vmap(
                        jax.vmap(
                            lambda t: gtr_transition(t, eigvals, left, right)
                        )
                    )(lengths)
                    prior = eig_freqs
                return batched_log_likelihood_pallas(
                    topo, lengths, leaf_sequences, n_states,
                    transition_matrices=pmats, root_prior=prior,
                    site_weights=site_weights,
                    sequences_are_masks=sequences_are_masks,
                )
        else:
            def lnl_one_fixed(children, lengths):
                topo = Topology(
                    children=children,
                    parents=jnp.zeros((n_all,), dtype=jnp.int32),
                )
                per_site = per_site_log_likelihood(
                    topo, lengths, leaf_sequences, n_states,
                    rates=rates, freqs=freqs,
                    gamma_shape=gamma_shape, n_categories=n_categories,
                    sequences_are_masks=sequences_are_masks,
                )
                if site_weights is not None:
                    per_site = per_site * site_weights
                return jnp.sum(per_site)

            def batched_eval_fixed(children, lengths):
                return jax.vmap(lnl_one_fixed)(children, lengths)

        def batched_eval(children, lengths, rates_v=None, freqs_v=None):
            return batched_eval_fixed(children, lengths)

        batched_lnl = jax.jit(batched_eval_fixed)

    @partial(jax.jit, static_argnames=("steps",))
    def branch_sweep(
        children, lengths, lnl, key, beta, steps, tuning,
        rates_v=None, freqs_v=None,
    ):
        """``steps`` single-branch multiplier moves on every chain, on device.

        Targets ``(likelihood * prior)^beta``; the multiplier proposal
        ``t' = t * exp(tuning * (u - 1/2))`` has Hastings factor ``t'/t``.
        """
        n_chains = lengths.shape[0]
        rows = jnp.arange(n_chains)

        def step(carry, k):
            lengths, lnl, logprior, accepted = carry
            k_node, k_mult, k_acc = jax.random.split(k, 3)
            node = jax.random.randint(k_node, (n_chains,), 0, n_all - 1)
            factor = jnp.exp(
                tuning * (jax.random.uniform(k_mult, (n_chains,)) - 0.5)
            )
            old = lengths[rows, node]
            new = old * factor
            prop = lengths.at[rows, node].set(new)
            prop_lnl = batched_eval(children, prop, rates_v, freqs_v)
            prop_logprior = logprior - prior_rate * (new - old)
            log_alpha = (
                beta * (prop_lnl - lnl + prop_logprior - logprior)
                + jnp.log(factor)
            )
            take = jnp.log(jax.random.uniform(k_acc, (n_chains,))) < log_alpha
            lengths = jnp.where(take[:, None], prop, lengths)
            lnl = jnp.where(take, prop_lnl, lnl)
            logprior = jnp.where(take, prop_logprior, logprior)
            return (lengths, lnl, logprior, accepted + take.sum()), None

        logprior = _exp_logprior(lengths, prior_rate)
        keys = jax.random.split(key, steps)
        (lengths, lnl, logprior, accepted), _ = jax.lax.scan(
            step, (lengths, lnl, logprior, jnp.zeros((), jnp.int32)), keys
        )
        return lengths, lnl, accepted

    model_sweep = None
    if sample_model:
        @jax.jit
        def model_sweep(
            children, lengths, lnl, rates_v, freqs_v, key, beta,
            concentration,
        ):
            """One Dirichlet-centered Metropolis move per simplex per chain.

            Flat Dirichlet(1) priors on both simplices, so only the
            proposal densities enter the ratio. Components below 1e-5 are
            auto-rejected (a truncated prior: keeps the eigensystem away
            from degenerate corners while preserving detailed balance).
            """
            n_chains = lengths.shape[0]
            accepted = jnp.zeros((2,), jnp.int32)

            def simplex_move(x, other_eval, k):
                k_prop, k_acc = jax.random.split(k)
                prop = jax.random.dirichlet(k_prop, concentration * x)
                lq_fwd = jax.vmap(_dirichlet_logpdf)(prop, concentration * x)
                lq_rev = jax.vmap(_dirichlet_logpdf)(x, concentration * prop)
                prop_lnl = other_eval(prop)
                inside = jnp.min(prop, axis=-1) >= 1e-5
                log_alpha = beta * (prop_lnl - lnl) + lq_rev - lq_fwd
                take = inside & (
                    jnp.log(jax.random.uniform(k_acc, (n_chains,)))
                    < log_alpha
                )
                return take, prop, prop_lnl

            k_r, k_f = jax.random.split(key)
            take, prop, prop_lnl = simplex_move(
                rates_v,
                lambda rv: batched_eval(children, lengths, rv, freqs_v),
                k_r,
            )
            rates_v = jnp.where(take[:, None], prop, rates_v)
            lnl = jnp.where(take, prop_lnl, lnl)
            accepted = accepted.at[0].add(take.sum())

            take, prop, prop_lnl = simplex_move(
                freqs_v,
                lambda fv: batched_eval(children, lengths, rates_v, fv),
                k_f,
            )
            freqs_v = jnp.where(take[:, None], prop, freqs_v)
            lnl = jnp.where(take, prop_lnl, lnl)
            accepted = accepted.at[1].add(take.sum())
            return lnl, rates_v, freqs_v, accepted

    return batched_lnl, branch_sweep, model_sweep


def carry_lengths_nni(
    old_topology: Topology,
    old_lengths: np.ndarray,
    new_topology: Topology,
) -> np.ndarray:
    """Branch lengths carried across a rearrangement by clade identity.

    Every edge is identified by the leaf set below it; edges whose clade
    persists keep their length (leaf edges carry by index). Changed clades
    inherit the leftover lengths by sorted clade rank, which makes the carry
    an INVOLUTION: applying it from the new topology back to the old one
    restores the original assignment exactly — required for the reverse
    proposal density of the topology Metropolis move to be well defined.
    (For NNI exactly one clade changes, so the rank mapping is trivial.)
    """
    from trex_tpu.search.bootstrap import subtree_leaf_sets

    n_leaves = old_topology.n_leaves
    old_sets = subtree_leaf_sets(old_topology)
    new_sets = subtree_leaf_sets(new_topology)
    old_map = {s: float(old_lengths[n_leaves + i]) for i, s in enumerate(old_sets)}
    new_set_set = set(new_sets)
    clade_rank = lambda s: tuple(sorted(s))
    leftover = sorted(
        (s for s in old_map if s not in new_set_set), key=clade_rank
    )
    changed = sorted(
        (s for s in new_sets if s not in old_map), key=clade_rank
    )
    assert len(leftover) == len(changed)
    inherit = {c: old_map[o] for c, o in zip(changed, leftover)}
    out = np.array(old_lengths, dtype=np.float32, copy=True)
    for i, s in enumerate(new_sets):
        out[n_leaves + i] = old_map.get(s, inherit.get(s, 0.0))
    return out


def _clade_hash_batch(
    children_batch: np.ndarray, n_leaves: int, salt: np.ndarray
) -> np.ndarray:
    """(B, n_all) additive clade hashes: hash(node) = sum of its leaves'
    salts (uint64 wraparound). Disjoint leaf sets -> distinct sums w.h.p."""
    b, n_anc, _ = children_batch.shape
    n_all = n_leaves + n_anc
    h = np.zeros((b, n_all), np.uint64)
    h[:, :n_leaves] = salt[None, :]
    rows = np.arange(b)
    for a in range(n_anc):
        h[:, n_leaves + a] = (
            h[rows, children_batch[:, a, 0]] + h[rows, children_batch[:, a, 1]]
        )
    return h


def _carry_lengths_nni_batch(
    old_children: np.ndarray,
    old_lengths: np.ndarray,
    nbr_children: np.ndarray,
    n_leaves: int,
    salt: np.ndarray,
) -> np.ndarray:
    """Vectorized ``carry_lengths_nni`` over a whole NNI neighborhood.

    Same semantics (clade-identity carry, single changed clade inherits the
    single leftover length) but via additive clade hashes + searchsorted —
    O(B * n) numpy instead of O(B * n^2) Python frozenset work. The
    per-neighbor hot path of the informed proposal.
    """
    n_anc = n_leaves - 1
    n_all = 2 * n_leaves - 1
    b = nbr_children.shape[0]
    old_h = _clade_hash_batch(old_children[None], n_leaves, salt)[0]
    new_h = _clade_hash_batch(nbr_children, n_leaves, salt)
    anc_old_h = old_h[n_leaves:]
    order = np.argsort(anc_old_h, kind="stable")
    sorted_h = anc_old_h[order]
    anc_len_sorted = old_lengths[n_leaves:][order]
    idx = np.minimum(
        np.searchsorted(sorted_h, new_h[:, n_leaves:]), n_anc - 1
    )
    match = sorted_h[idx] == new_h[:, n_leaves:]
    out = np.broadcast_to(
        old_lengths.astype(np.float32), (b, n_all)
    ).copy()
    out[:, n_leaves:] = np.where(match, anc_len_sorted[idx], 0.0)
    miss_rows, miss_cols = np.where(~match)
    if miss_rows.size:
        # NNI changes exactly one clade; the leftover old hash is the total
        # minus the matched row sum (exact under uint64 wraparound).
        assert miss_rows.size == b and np.array_equal(
            miss_rows, np.arange(b)
        ), "NNI neighbors must each change exactly one clade"
        total = anc_old_h.sum(dtype=np.uint64)
        matched = np.where(match, sorted_h[idx], np.uint64(0)).sum(
            axis=1, dtype=np.uint64
        )
        pos = np.minimum(
            np.searchsorted(sorted_h, total - matched), n_anc - 1
        )
        out[miss_rows, n_leaves + miss_cols] = anc_len_sorted[pos]
    return out


def effective_sample_size(trace: np.ndarray) -> float:
    """ESS via the initial positive sequence estimator (Geyer 1992)."""
    x = np.asarray(trace, dtype=np.float64)
    n = x.size
    if n < 4:
        return float(n)
    x = x - x.mean()
    var = float(np.dot(x, x) / n)
    if var <= 0:
        return float(n)
    # Autocovariances via FFT.
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acov = np.fft.irfft(f * np.conjugate(f), m)[:n].real / n
    rho = acov / var
    # Sum consecutive pairs while positive.
    s = 0.0
    for k in range(1, n // 2):
        pair = rho[2 * k - 1] + rho[2 * k]
        if pair <= 0:
            break
        s += pair
    ess = n / (1.0 + 2.0 * s)
    return float(min(max(ess, 1.0), n))


def average_stddev_split_freqs(
    per_run_samples: list[list[Topology]], min_freq: float = 0.1
) -> float | None:
    """ASDSF between independent runs (splits above ``min_freq`` anywhere)."""
    from trex_tpu.search.consensus import split_frequencies

    if len(per_run_samples) < 2:
        return None
    freqs = [split_frequencies(s) for s in per_run_samples if s]
    if len(freqs) < 2:
        return None
    splits = {s for f in freqs for s, v in f.items() if v >= min_freq}
    if not splits:
        return 0.0
    sds = [
        float(np.std([f.get(s, 0.0) for f in freqs])) for s in splits
    ]
    return float(np.mean(sds))


def mcmc_sample(
    key: jax.Array,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    n_generations: int = 10_000,
    n_runs: int = 2,
    n_chains: int = 4,
    heat: float = 0.1,
    sample_every: int = 20,
    burnin_frac: float = 0.25,
    branch_moves_per_gen: int = 1,
    topo_moves: bool = True,
    topo_proposal: str = "informed",
    brlen_prior_mean: float = 0.1,
    tuning: float = 1.4,
    start: Topology | None = None,
    start_lengths: np.ndarray | None = None,
    site_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
    gamma_shape: float | None = None,
    n_categories: int = 4,
    sample_model: bool = False,
    model_tuning: float = 500.0,
    leaf_names: list[str] | None = None,
    prior_only: bool = False,
    progress_every: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1000,
    stop_after_generations: int | None = None,
) -> McmcResult:
    """Sample the Bayesian tree posterior with coupled MCMC chains.

    One *generation* = ``branch_moves_per_gen`` single-branch multiplier
    moves (a jitted on-device scan over the whole chain batch) followed by
    one NNI topology Metropolis round (host-proposed, device-scored as a
    single batched likelihood call) and one MC^3 swap proposal per run.

    Args:
        leaf_sequences: (n_leaves, L) int states (or bitmasks with
            ``sequences_are_masks=True``). Compress to site patterns first
            and pass ``site_weights`` for long alignments.
        n_runs / n_chains: independent runs (for ASDSF) x coupled chains
            per run (chain 0 cold, k heated by ``1/(1 + heat*k)``).
        topo_proposal: "informed" (default) draws the NNI neighbor
            proportionally to ``posterior^(beta/2)`` over the WHOLE
            neighborhood — a locally-balanced proposal (Zanella 2020,
            J. Am. Stat. Assoc.) whose Hastings factor is the ratio of
            neighborhood normalizers; both the proposal weights and the
            reverse normalizer are one batched likelihood call over all
            chains x neighbors, which is exactly the shape the batched
            scorers are fastest at. "nni" draws a neighbor uniformly
            (symmetric, 1 eval/chain/generation) — cheaper per generation
            but mixes far slower on peaked posteriors.
        rates / freqs / gamma_shape: optional fixed substitution model
            (empirical-Bayes: fit once with ``optimize_model``); default JC69.
        sample_model: FULL Bayes over the GTR model — per-chain
            exchangeability and stationary-frequency simplices with flat
            Dirichlet(1) priors, one Dirichlet-centered Metropolis move on
            each per generation (on device). ``rates``/``freqs`` then only
            seed the chains (uniform when absent); ``gamma_shape`` stays
            fixed if given.
        prior_only: target the prior alone (validation: the sampler must
            recover Exponential branch lengths / uniform topologies).
        start: optional starting topology (defaults to random per chain).
        checkpoint_dir: write the FULL sampler state (chain states, both
            RNG streams, accumulated samples and counters) to
            ``<dir>/mcmc_checkpoint.npz`` every ``checkpoint_every``
            generations; if the file already exists, RESUME from it —
            bit-identical to an uninterrupted run (tested). Keep
            ``n_generations`` (the FINAL target, which fixes the burn-in
            boundary) the same across legs; use ``stop_after_generations``
            to bound how many generations one call executes (a checkpoint
            is written at the stop).

    Returns:
        ``McmcResult`` — pooled post-burn-in cold-chain samples, split
        posterior probabilities, consensus tree, diagnostics.
    """
    from trex_tpu.io import nni_neighbors_host, sample_topologies
    from trex_tpu.search.consensus import majority_rule_consensus, split_frequencies

    n_leaves = int(leaf_sequences.shape[0])
    n_anc = n_leaves - 1
    n_all = 2 * n_leaves - 1
    n_total = n_runs * n_chains
    prior_rate = 1.0 / brlen_prior_mean

    seeds = np.asarray(jax.random.key_data(key)).ravel()
    rng = np.random.default_rng(int(seeds[-1]))
    clade_salt = rng.integers(1, 2**62, size=n_leaves, dtype=np.uint64) * 2 + 1

    # --- initial state -----------------------------------------------------
    if start is not None:
        children_host = np.broadcast_to(
            np.asarray(start.children)[None], (n_total, n_anc, 2)
        ).copy()
    else:
        starts = sample_topologies(int(rng.integers(2**31)), n_leaves, n_total)
        children_host = np.asarray(starts.children).copy()
    # ``children_host`` is the single source of truth for chain topologies;
    # Topology views over its rows are built on the fly for the host move
    # machinery (which reads children only). No second copy may exist —
    # aliased views made row swaps self-cancelling in an earlier draft.
    zero_parents = np.zeros((n_all,), dtype=np.int32)

    def topo_view(row: np.ndarray) -> Topology:
        return Topology(children=row, parents=zero_parents)
    if start_lengths is not None:
        lengths_host = np.broadcast_to(
            np.asarray(start_lengths, dtype=np.float32)[None], (n_total, n_all)
        ).copy()
    else:
        lengths_host = rng.exponential(
            brlen_prior_mean, size=(n_total, n_all)
        ).astype(np.float32)
    lengths_host[:, -1] = 0.0  # root entry is unused by the likelihood

    if prior_only:
        leaf_sequences = jnp.zeros((n_leaves, 1), dtype=jnp.int32)
        site_weights = jnp.zeros((1,), dtype=jnp.float32)

    batched_lnl, branch_sweep, model_sweep = _make_device_kernels(
        jnp.asarray(leaf_sequences), n_states, n_all,
        None if site_weights is None else jnp.asarray(site_weights),
        sequences_are_masks, rates, freqs, prior_rate,
        gamma_shape, n_categories, force_lax=prior_only,
        sample_model=sample_model,
    )

    # Per-chain model state (sampled-model mode): exchangeability and
    # frequency simplices, seeded from the given model or uniform.
    n_pairs = n_states * (n_states - 1) // 2
    if sample_model:
        if rates is not None:
            rates0 = _matrix_to_pairs(np.asarray(rates), n_states)
        else:
            rates0 = np.full((n_pairs,), 1.0 / n_pairs, np.float32)
        if freqs is not None:
            f0 = np.asarray(freqs, np.float64)
            freqs0 = (f0 / f0.sum()).astype(np.float32)
        else:
            freqs0 = np.full((n_states,), 1.0 / n_states, np.float32)
        rates_host = np.broadcast_to(rates0, (n_total, n_pairs)).copy()
        freqs_host = np.broadcast_to(freqs0, (n_total, n_states)).copy()
    else:
        rates_host = freqs_host = None

    def model_args(reps: int = 1):
        """(rates, freqs) device args, per chain, optionally repeated."""
        if not sample_model:
            return ()
        if reps == 1:
            return (jnp.asarray(rates_host), jnp.asarray(freqs_host))
        return (
            jnp.asarray(np.repeat(rates_host, reps, axis=0)),
            jnp.asarray(np.repeat(freqs_host, reps, axis=0)),
        )

    beta_host = np.array(
        [1.0 / (1.0 + heat * k) for _ in range(n_runs) for k in range(n_chains)],
        dtype=np.float32,
    )
    beta = jnp.asarray(beta_host)

    # The HOST owns the chain state (children/lengths/lnl mirrors); the
    # device only evaluates batched likelihoods. Each generation costs 2-3
    # blocking device round trips total (batched jax.device_get), which is
    # what bounds wall speed through a remote-tunnel TPU (~20 ms RTT).
    lnl_host = np.array(
        jax.device_get(
            batched_lnl(
                jnp.asarray(children_host), jnp.asarray(lengths_host),
                *model_args(),
            )
        )
    )

    def host_logprior(lens: np.ndarray) -> np.ndarray:
        return np.log(prior_rate) * (n_all - 1) - prior_rate * lens[
            :, :-1
        ].sum(axis=1)

    n_burnin = int(burnin_frac * n_generations)
    cold_rows = [r * n_chains for r in range(n_runs)]

    samples_children: list[np.ndarray] = []
    samples_lengths: list[np.ndarray] = []
    samples_lnl: list[float] = []
    samples_run: list[int] = []
    samples_rates: list[np.ndarray] = []
    samples_freqs: list[np.ndarray] = []
    acc = {"branch": 0, "branch_n": 0, "topology": 0, "topology_n": 0,
           "swap": 0, "swap_n": 0, "model": 0, "model_n": 0}

    n_nbr = 2 * (n_leaves - 2)  # constant for every topology

    def neighborhood(children, lens):
        """Stacked NNI neighborhoods + carried lengths + lnLs (1 sync)."""
        ch = np.empty((n_total, n_nbr, n_anc, 2), np.int32)
        ln = np.empty((n_total, n_nbr, n_all), np.float32)
        for c in range(n_total):
            nbr_c, _ = nni_neighbors_host(topo_view(children[c]))
            ch[c] = nbr_c
            ln[c] = _carry_lengths_nni_batch(
                children[c], lens[c], nbr_c, n_leaves, clade_salt,
            )
        flat_lnl = batched_lnl(
            jnp.asarray(ch.reshape(-1, n_anc, 2)),
            jnp.asarray(ln.reshape(-1, n_all)),
            *model_args(reps=n_nbr),
        )
        return ch, ln, np.asarray(
            jax.device_get(flat_lnl)
        ).reshape(n_total, n_nbr)

    # --- checkpoint / resume -------------------------------------------------
    key_dev = key
    start_gen = 1
    ckpt_path = None
    if checkpoint_dir is not None:
        import json as _json
        import os as _os

        _os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt_path = _os.path.join(checkpoint_dir, "mcmc_checkpoint.npz")
        if _os.path.exists(ckpt_path):
            ck = np.load(ckpt_path, allow_pickle=False)
            start_gen = int(ck["gen"]) + 1
            children_host = ck["children"].copy()
            lengths_host = ck["lengths"].copy()
            lnl_host = ck["lnl"].copy()
            key_dev = jax.random.wrap_key_data(jnp.asarray(ck["jax_key"]))
            rng.bit_generator.state = _json.loads(str(ck["np_state"]))
            if sample_model:
                rates_host = ck["rates"].copy()
                freqs_host = ck["freqs"].copy()
            samples_children = list(ck["s_children"])
            samples_lengths = list(ck["s_lengths"])
            samples_lnl = list(ck["s_lnl"])
            samples_run = list(ck["s_run"])
            if sample_model and "s_rates" in ck:
                samples_rates = list(ck["s_rates"])
                samples_freqs = list(ck["s_freqs"])
            acc = {k: int(v) for k, v in zip(ck["acc_keys"], ck["acc_vals"])}

    def write_checkpoint(gen):
        import json as _json

        payload = {
            "gen": gen,
            "children": children_host,
            "lengths": lengths_host,
            "lnl": lnl_host,
            "jax_key": np.asarray(jax.random.key_data(key_dev)),
            "np_state": _json.dumps(rng.bit_generator.state),
            "s_children": np.stack(samples_children)
            if samples_children
            else np.zeros((0, n_anc, 2), np.int32),
            "s_lengths": np.stack(samples_lengths)
            if samples_lengths
            else np.zeros((0, n_all), np.float32),
            "s_lnl": np.asarray(samples_lnl, np.float64),
            "s_run": np.asarray(samples_run, np.int32),
            "acc_keys": np.asarray(list(acc.keys())),
            "acc_vals": np.asarray(list(acc.values()), np.int64),
        }
        if sample_model:
            payload["rates"] = rates_host
            payload["freqs"] = freqs_host
            payload["s_rates"] = (
                np.stack(samples_rates)
                if samples_rates
                else np.zeros((0, rates_host.shape[1]), np.float32)
            )
            payload["s_freqs"] = (
                np.stack(samples_freqs)
                if samples_freqs
                else np.zeros((0, n_states), np.float32)
            )
        import os as _os

        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, **payload)
        _os.replace(tmp, ckpt_path)

    for gen in range(start_gen, n_generations + 1):
        # --- branch-length sweep (device; 1 sync) ---------------------------
        if branch_moves_per_gen > 0:
            key_dev, sub = jax.random.split(key_dev)
            out = branch_sweep(
                jnp.asarray(children_host), jnp.asarray(lengths_host),
                jnp.asarray(lnl_host), sub, beta,
                branch_moves_per_gen, tuning, *model_args(),
            )
            new_lengths, new_lnl, accepted = jax.device_get(out)
            lengths_host = np.array(new_lengths)
            lnl_host = np.array(new_lnl)
            acc["branch"] += int(accepted)
            acc["branch_n"] += branch_moves_per_gen * n_total

        # --- model-parameter sweep (device; 1 sync; sampled-model mode) ----
        if sample_model:
            key_dev, sub = jax.random.split(key_dev)
            out = model_sweep(
                jnp.asarray(children_host), jnp.asarray(lengths_host),
                jnp.asarray(lnl_host), *model_args(), sub, beta,
                jnp.float32(model_tuning),
            )
            new_lnl, new_rates, new_freqs, accepted = jax.device_get(out)
            lnl_host = np.array(new_lnl)
            rates_host = np.array(new_rates)
            freqs_host = np.array(new_freqs)
            acc["model"] += int(accepted.sum())
            acc["model_n"] += 2 * n_total

        # --- NNI topology round (host proposal, device scoring) ------------
        if topo_moves and n_leaves >= 4:
            if topo_proposal == "informed":
                # Forward: draw y ~ exp(beta/2 lnl) over N(x) (the branch
                # prior is invariant under the carry, so it cancels).
                ch_x, ln_x, lnl_x_nbr = neighborhood(children_host, lengths_host)
                logw_x = 0.5 * beta_host[:, None] * lnl_x_nbr
                z_x = _logsumexp_rows(logw_x)
                probs = np.exp(logw_x - z_x[:, None])
                probs /= probs.sum(axis=1, keepdims=True)
                picks = np.array(
                    [rng.choice(n_nbr, p=probs[c]) for c in range(n_total)]
                )
                rows = np.arange(n_total)
                prop_children = ch_x[rows, picks]
                prop_lengths = ln_x[rows, picks]
                prop_lnl = lnl_x_nbr[rows, picks]
                # Reverse normalizer over N(y) (x is in it by NNI symmetry
                # with exactly the current lengths: the carry is involutive).
                _, _, lnl_y_nbr = neighborhood(prop_children, prop_lengths)
                z_y = _logsumexp_rows(0.5 * beta_host[:, None] * lnl_y_nbr)
                log_alpha = (
                    0.5 * beta_host * (prop_lnl - lnl_host) + z_x - z_y
                )
            else:  # plain uniform NNI (symmetric; 1 sync)
                prop_children = np.empty_like(children_host)
                prop_lengths = np.empty_like(lengths_host)
                for c in range(n_total):
                    nbr_c, _ = nni_neighbors_host(topo_view(children_host[c]))
                    j = int(rng.integers(nbr_c.shape[0]))
                    prop_children[c] = nbr_c[j]
                    prop_lengths[c] = carry_lengths_nni(
                        topo_view(children_host[c]), lengths_host[c],
                        topo_view(nbr_c[j]),
                    )
                prop_lnl = np.asarray(
                    jax.device_get(
                        batched_lnl(
                            jnp.asarray(prop_children),
                            jnp.asarray(prop_lengths),
                            *model_args(),
                        )
                    )
                )
                # Same length multiset -> prior unchanged; symmetric proposal.
                log_alpha = beta_host * (prop_lnl - lnl_host)
            take = np.log(rng.uniform(size=n_total)) < log_alpha
            acc["topology"] += int(take.sum())
            acc["topology_n"] += n_total
            for c in np.where(take)[0]:
                children_host[c] = prop_children[c]
                lengths_host[c] = prop_lengths[c]
                lnl_host[c] = prop_lnl[c]

        # --- MC^3 swap proposal (host-only bookkeeping) ---------------------
        if n_chains > 1:
            logprior_host = host_logprior(lengths_host)
            for r in range(n_runs):
                k = int(rng.integers(n_chains - 1))
                i, j = r * n_chains + k, r * n_chains + k + 1
                post_i = lnl_host[i] + logprior_host[i]
                post_j = lnl_host[j] + logprior_host[j]
                log_alpha = (beta_host[i] - beta_host[j]) * (post_j - post_i)
                acc["swap_n"] += 1
                if np.log(rng.uniform()) < log_alpha:
                    acc["swap"] += 1
                    children_host[[i, j]] = children_host[[j, i]]
                    lengths_host[[i, j]] = lengths_host[[j, i]]
                    lnl_host[[i, j]] = lnl_host[[j, i]]
                    if sample_model:
                        rates_host[[i, j]] = rates_host[[j, i]]
                        freqs_host[[i, j]] = freqs_host[[j, i]]

        # --- sampling (host mirrors; no sync) -------------------------------
        if gen > n_burnin and gen % sample_every == 0:
            for r, row in enumerate(cold_rows):
                samples_children.append(children_host[row].copy())
                samples_lengths.append(lengths_host[row].copy())
                samples_lnl.append(float(lnl_host[row]))
                samples_run.append(r)
                if sample_model:
                    samples_rates.append(rates_host[row].copy())
                    samples_freqs.append(freqs_host[row].copy())
        if progress_every and gen % progress_every == 0:
            cold = " ".join(f"{lnl_host[r]:.2f}" for r in cold_rows)
            print(f"[mcmc] gen {gen}/{n_generations} cold lnL: {cold}")
        if ckpt_path is not None and gen % checkpoint_every == 0:
            write_checkpoint(gen)
        if (
            stop_after_generations is not None
            and gen - start_gen + 1 >= stop_after_generations
            and gen < n_generations
        ):
            if ckpt_path is not None:
                write_checkpoint(gen)
            break

    # --- summaries ----------------------------------------------------------
    # Summarize on a CANONICAL ROOTING (re-root every sample on leaf 0):
    # under a reversible model the data cannot identify the root, so chains
    # wander over rootings and raw rooted-clade frequencies fluctuate even
    # at a fixed unrooted topology. Rooting on leaf 0 makes clades correspond
    # 1:1 to unrooted splits — the quantity MrBayes-style summaries (split
    # posteriors, consensus, ASDSF) are defined on.
    from trex_tpu.io import reroot_on_outgroup

    sample_topos = [
        reroot_on_outgroup(
            Topology(children=c, parents=zero_parents), [0]
        )[0]
        for c in samples_children
    ]
    per_run = [
        [t for t, r in zip(sample_topos, samples_run) if r == rr]
        for rr in range(n_runs)
    ]
    split_post = split_frequencies(sample_topos) if sample_topos else {}
    consensus = (
        majority_rule_consensus(sample_topos, leaf_names)[0]
        if sample_topos
        else ""
    )
    per_run_lnl = [
        np.array([v for v, r in zip(samples_lnl, samples_run) if r == rr])
        for rr in range(n_runs)
    ]
    ess = float(
        sum(effective_sample_size(t) for t in per_run_lnl if t.size > 0)
    )
    mean_lengths = (
        np.mean(np.stack(samples_lengths), axis=0)
        if samples_lengths
        else np.zeros(n_all, np.float32)
    )
    return McmcResult(
        sample_children=(
            np.stack(samples_children)
            if samples_children
            else np.zeros((0, n_anc, 2), np.int32)
        ),
        sample_lengths=(
            np.stack(samples_lengths)
            if samples_lengths
            else np.zeros((0, n_all), np.float32)
        ),
        sample_lnl=np.asarray(samples_lnl, dtype=np.float64),
        sample_run=np.asarray(samples_run, dtype=np.int32),
        split_posterior=split_post,
        consensus_newick=consensus,
        acceptance={
            "branch": acc["branch"] / max(acc["branch_n"], 1),
            "topology": acc["topology"] / max(acc["topology_n"], 1),
            "swap": acc["swap"] / max(acc["swap_n"], 1),
            **(
                {"model": acc["model"] / max(acc["model_n"], 1)}
                if sample_model
                else {}
            ),
        },
        asdsf=average_stddev_split_freqs(per_run),
        ess_lnl=ess,
        generations=n_generations,
        mean_lengths=mean_lengths.astype(np.float32),
        sample_rates=np.stack(samples_rates) if samples_rates else None,
        sample_freqs=np.stack(samples_freqs) if samples_freqs else None,
    )
