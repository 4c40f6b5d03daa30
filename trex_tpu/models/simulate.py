"""General CTMC alignment simulator (seq-gen equivalent).

Samples an alignment down an arbitrary rooted tree under any reversible
substitution model the likelihood layer supports — JC69, GTR, empirical
amino-acid matrices — with optional discrete-Gamma site-rate heterogeneity
and an invariant-sites category, matching the mixing conventions of
``ops.likelihood`` exactly (p_inv · invariant + (1-p_inv) · mean-1 Gamma
categories; branch lengths in expected substitutions per site).

Host-side data generation (numpy + scipy.expm), like the reference's
generators (`/root/reference/src/trex/ground_truth.py:112-197`,
`/root/reference/src/trex/nk_model.py:116-278`) — this is fixture/example
data production, not a compute path, so it stays off-device by design. The
per-branch transition matrices are computed once per (branch, rate
category) and all sites in a category are sampled vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.likelihood import discrete_gamma_rates, gtr_generator
from ..topology import Topology

__all__ = ["simulate_ctmc", "simulate_alignment"]


def _sample_markov(
    rng: np.random.Generator, probs: np.ndarray
) -> np.ndarray:
    """Sample one categorical draw per row of ``probs`` ((n, Q) rows sum 1)."""
    cum = np.cumsum(probs, axis=1)
    u = rng.random(probs.shape[0])[:, None]
    return (u > cum).sum(axis=1).astype(np.int64)


def simulate_ctmc(
    key: jax.Array,
    topology: Topology,
    branch_lengths: np.ndarray,
    *,
    generator: np.ndarray,
    freqs: np.ndarray,
    n_sites: int,
    site_rates: np.ndarray | None = None,
    rate_probs: np.ndarray | None = None,
    p_invariant: float = 0.0,
    return_ancestors: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Simulate an alignment down ``topology`` under a CTMC.

    Args:
        generator: (Q, Q) rate matrix (rows sum to 0). Use
            ``ops.likelihood.gtr_generator`` for the normalized reversible
            family (one expected substitution per unit branch length).
        freqs: (Q,) root/stationary distribution.
        branch_lengths: (n_all,) length ABOVE each node (root entry ignored),
            the engine's newick convention.
        site_rates / rate_probs: optional discrete rate-mixture categories
            (each site draws one category; lengths scale by its rate).
            Defaults to a single rate-1 category.
        p_invariant: probability a site is invariant (rate 0), mixed in on
            top of the rate categories — the ``tree_log_likelihood_gamma_
            invariant`` convention.
        return_ancestors: also return the (n_ancestors, n_sites) true
            ancestral states (index order: node n_leaves + i at row i).

    Returns:
        (n_leaves, n_sites) int32 leaf states, plus the ancestor states when
        ``return_ancestors``.
    """
    import scipy.linalg  # host-side data gen only

    q = int(generator.shape[0])
    freqs = np.asarray(freqs, dtype=np.float64)
    freqs = freqs / freqs.sum()
    gen = np.asarray(generator, dtype=np.float64)
    blens = np.asarray(branch_lengths, dtype=np.float64)
    children = np.asarray(topology.children)

    if site_rates is None:
        site_rates = np.ones((1,), dtype=np.float64)
        rate_probs = np.ones((1,), dtype=np.float64)
    site_rates = np.asarray(site_rates, dtype=np.float64)
    if rate_probs is None:
        rate_probs = np.full(site_rates.shape, 1.0 / site_rates.size)
    rate_probs = np.asarray(rate_probs, dtype=np.float64)
    rate_probs = rate_probs / rate_probs.sum()
    if p_invariant > 0.0:
        site_rates = np.concatenate([site_rates, [0.0]])
        rate_probs = np.concatenate(
            [rate_probs * (1.0 - p_invariant), [p_invariant]]
        )

    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    site_cat = rng.choice(site_rates.size, size=n_sites, p=rate_probs)

    n_all = topology.n_all
    states = np.zeros((n_all, n_sites), dtype=np.int64)
    states[-1] = rng.choice(q, size=n_sites, p=freqs)
    # Root-first ancestor walk: reverse index order keeps parents before
    # children under the engine's topological node ordering.
    for anc in range(topology.n_ancestors - 1, -1, -1):
        parent = topology.n_leaves + anc
        for child in children[anc]:
            child = int(child)
            for cat in range(site_rates.size):
                sel = site_cat == cat
                if not sel.any():
                    continue
                rate = site_rates[cat]
                if rate == 0.0 or blens[child] == 0.0:
                    states[child, sel] = states[parent, sel]
                    continue
                p = scipy.linalg.expm(gen * (blens[child] * rate))
                p = np.clip(p, 0.0, None)
                p = p / p.sum(axis=1, keepdims=True)
                states[child, sel] = _sample_markov(rng, p[states[parent, sel]])
    leaves = states[: topology.n_leaves].astype(np.int32)
    if return_ancestors:
        return leaves, states[topology.n_leaves :].astype(np.int32)
    return leaves


def simulate_alignment(
    key: jax.Array,
    topology: Topology,
    branch_lengths: np.ndarray,
    *,
    n_sites: int,
    n_states: int = 4,
    rates: np.ndarray | None = None,
    freqs: np.ndarray | None = None,
    gamma_shape: float | None = None,
    n_categories: int = 4,
    p_invariant: float = 0.0,
    return_ancestors: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Model-level wrapper over ``simulate_ctmc``.

    ``rates``/``freqs`` follow ``tree_log_likelihood``'s GTR convention
    ((Q, Q) symmetric exchangeabilities + (Q,) stationary frequencies; both
    None → JC69). ``gamma_shape`` switches on the Yang-1994 discrete-Gamma
    mixture used by ``tree_log_likelihood_gamma`` so fitted parameters are
    directly comparable to the simulation truth.
    """
    q = n_states
    if freqs is None:
        freqs = np.full((q,), 1.0 / q)
    if rates is None:
        rates = np.ones((q, q)) - np.eye(q)
    gen = np.asarray(
        gtr_generator(jnp.asarray(rates, jnp.float32), jnp.asarray(freqs, jnp.float32))
    )
    site_rates = rate_probs = None
    if gamma_shape is not None:
        site_rates = np.asarray(
            discrete_gamma_rates(jnp.float32(gamma_shape), n_categories)
        )
        rate_probs = np.full((n_categories,), 1.0 / n_categories)
    return simulate_ctmc(
        key,
        topology,
        branch_lengths,
        generator=gen,
        freqs=freqs,
        n_sites=n_sites,
        site_rates=site_rates,
        rate_probs=rate_probs,
        p_invariant=p_invariant,
        return_ancestors=return_ancestors,
    )


def simulate_coalescent(
    seed: int,
    n_leaves: int,
    ne: float,
    tip_ages: np.ndarray | None = None,
):
    """Sample a (serial) Kingman coalescent genealogy.

    Goes backward in time: lineages activate at their ``tip_ages``
    (all 0 when None); with k active lineages the next coalescence waits
    Exp(ne / C(k, 2)); pending tips that activate first pre-empt it. The
    generative complement of the coalescent prior in ``search.dating``
    (their agreement is tested), and the data generator for tip-dating /
    phylodynamics validation.

    Returns:
        (Topology (canonical numbering), ages (n_all,) float32 node ages).
    """
    from trex_tpu.io.fallback import _canonicalize
    from trex_tpu.topology import Topology

    rng = np.random.default_rng(seed)
    tips = (
        np.zeros(n_leaves) if tip_ages is None
        else np.asarray(tip_ages, dtype=np.float64)
    )
    order = np.argsort(tips)
    pending = list(order)  # leaves not yet sampled (ascending age)
    active: list[int] = []
    ages = {i: float(tips[i]) for i in range(n_leaves)}
    kids: dict[int, list[int]] = {}
    t = float(tips[order[0]])
    node = n_leaves
    while len(active) + len(pending) > 1 or len(pending) == 1:
        while pending and tips[pending[0]] <= t + 1e-12:
            active.append(int(pending.pop(0)))
        k = len(active)
        if k < 2:
            if not pending:
                break
            t = float(tips[pending[0]])
            continue
        wait = rng.exponential(ne / (k * (k - 1) / 2.0))
        if pending and t + wait > tips[pending[0]]:
            t = float(tips[pending[0]])
            continue
        t += wait
        i, j = rng.choice(k, 2, replace=False)
        a, b = active[i], active[j]
        active = [x for x in active if x not in (a, b)] + [node]
        kids[node] = [min(a, b), max(a, b)]
        ages[node] = t
        node += 1
        if len(active) == 1 and not pending:
            break
    ch, par, relabel = _canonicalize(n_leaves, kids, 2 * n_leaves - 2)
    ages_arr = np.zeros(2 * n_leaves - 1, np.float32)
    for old, new in relabel.items():
        ages_arr[new] = ages.get(old, 0.0)
    import jax.numpy as _jnp

    return (
        Topology(children=_jnp.asarray(ch), parents=_jnp.asarray(par)),
        ages_arr,
    )
