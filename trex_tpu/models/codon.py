"""Codon substitution models (Goldman-Yang 1994 / Muse-Gaut style).

A third scoring model family beyond parsimony and nucleotide/protein
likelihood (the reference has neither; cf. `/root/reference/readme.md:118-131`
listing all model work as future work). The GY94 model treats each of the 61
sense codons of the standard genetic code as one state of a reversible
continuous-time Markov chain whose exchangeabilities are

    s_ij = 0                                   if codons i, j differ at >1 position
           1                                   synonymous transversion
           kappa                               synonymous transition
           omega                               nonsynonymous transversion
           kappa * omega                       nonsynonymous transition

with stationary codon frequencies pi (F61 empirical, F3x4, or F1x4). Because
s is symmetric, GY94 plugs directly into the engine's reversible-GTR
machinery (`ops.likelihood.gtr_generator`, Q = s * pi, expm transitions), so
codon likelihoods ride the exact same pruning recursion, jit/vmap batching,
and ('tree','site') sharding as every other model — just with Q=61 states and
sites = codon columns.

omega (dN/dS) is the object of interest: omega < 1 purifying selection,
omega = 1 neutral, omega > 1 positive selection. `optimize_gy94` fits
branch lengths + kappa + omega (+ Gamma shape) by the same jitted
Adam-in-scan recipe as `ops.likelihood.optimize_model`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trex_tpu.ops.likelihood import (
    gtr_generator,
    tree_log_likelihood,
    tree_log_likelihood_gamma,
)
from trex_tpu.topology import Topology

# Engine nucleotide order (trex_tpu.io.DNA): A=0, C=1, G=2, T=3.
_NUC = "ACGT"

# Standard genetic code, textbook layout: first/second/third base in TCAG
# order, amino acids read off the classic 64-character string.
_TCAG = "TCAG"
_AA64 = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"

GENETIC_CODE: dict[str, str] = {}
for _i, _b1 in enumerate(_TCAG):
    for _j, _b2 in enumerate(_TCAG):
        for _k, _b3 in enumerate(_TCAG):
            GENETIC_CODE[_b1 + _b2 + _b3] = _AA64[16 * _i + 4 * _j + _k]

STOP_CODONS = tuple(sorted(c for c, aa in GENETIC_CODE.items() if aa == "*"))

# The 61 sense codons, ordered by their ACGT base-4 index (A=0..T=3) so the
# state order is deterministic and alphabetical in the engine's alphabet.
SENSE_CODONS: tuple[str, ...] = tuple(
    sorted(
        (c for c, aa in GENETIC_CODE.items() if aa != "*"),
        key=lambda c: tuple(_NUC.index(b) for b in c),
    )
)
N_CODONS = len(SENSE_CODONS)  # 61
CODON_INDEX: dict[str, int] = {c: i for i, c in enumerate(SENSE_CODONS)}
CODON_AMINO_ACIDS: tuple[str, ...] = tuple(GENETIC_CODE[c] for c in SENSE_CODONS)

MISSING = -1  # leaf state for an unresolvable codon (marginalized out)


def _pair_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(one_diff, is_transition, is_nonsyn) boolean (61, 61) tables."""
    codons = np.array(
        [[_NUC.index(b) for b in c] for c in SENSE_CODONS], dtype=np.int32
    )
    diff = codons[:, None, :] != codons[None, :, :]  # (61, 61, 3)
    n_diff = diff.sum(axis=-1)
    one_diff = n_diff == 1
    # The single differing position's nucleotide pair: transition iff
    # {A,G} (0,2) or {C,T} (1,3) — i.e. both purines or both pyrimidines.
    pos = np.argmax(diff, axis=-1)
    a = np.take_along_axis(codons[:, None, :].repeat(N_CODONS, 1), pos[..., None], 2)
    b = np.take_along_axis(codons[None, :, :].repeat(N_CODONS, 0), pos[..., None], 2)
    purine = lambda x: (x == 0) | (x == 2)
    is_transition = one_diff & (purine(a[..., 0]) == purine(b[..., 0]))
    aa = np.array([ord(x) for x in CODON_AMINO_ACIDS])
    is_nonsyn = aa[:, None] != aa[None, :]
    return one_diff, is_transition, is_nonsyn


_ONE_DIFF, _IS_TRANSITION, _IS_NONSYN = _pair_tables()


def gy94_exchangeabilities(
    kappa: float | jax.Array, omega: float | jax.Array
) -> jax.Array:
    """(61, 61) symmetric GY94 exchangeabilities.

    Differentiable in ``kappa`` (transition/transversion ratio) and ``omega``
    (dN/dS). Feed to ``ops.likelihood`` as the ``rates`` argument with codon
    frequencies as ``freqs``.
    """
    one = jnp.asarray(_ONE_DIFF, dtype=jnp.float32)
    ts = jnp.asarray(_IS_TRANSITION)
    ns = jnp.asarray(_IS_NONSYN)
    s = one * jnp.where(ts, kappa, 1.0) * jnp.where(ns, omega, 1.0)
    return s.astype(jnp.float32)


def gy94_generator(
    kappa: float | jax.Array,
    omega: float | jax.Array,
    freqs: jax.Array,
) -> jax.Array:
    """Normalized GY94 rate matrix (one expected substitution per unit length)."""
    return gtr_generator(gy94_exchangeabilities(kappa, omega), freqs)


def encode_codons(
    nuc_states: np.ndarray, *, stops: str = "error"
) -> np.ndarray:
    """(n, L) nucleotide states (0..3; negative = ambiguous/gap) -> (n, L//3)
    codon states in the SENSE_CODONS order.

    Codons containing any non-ACGT position become ``MISSING`` (-1), the
    standard missing-data treatment (the likelihood marginalizes them out).
    In-frame stop codons raise by default (they indicate a frame/alignment
    error); ``stops="missing"`` downgrades them to missing data.

    Trailing bases beyond the last full codon are dropped.
    """
    if stops not in ("error", "missing"):
        raise ValueError(f"stops must be 'error' or 'missing', got {stops!r}")
    nuc = np.asarray(nuc_states)
    n, length = nuc.shape
    n_codons = length // 3
    trimmed = nuc[:, : n_codons * 3].reshape(n, n_codons, 3)
    valid = ((trimmed >= 0) & (trimmed <= 3)).all(axis=-1)
    base4 = np.where(valid[..., None], np.clip(trimmed, 0, 3), 0)
    idx64 = base4[..., 0] * 16 + base4[..., 1] * 4 + base4[..., 2]
    # Map base-4 codon index -> sense-codon state (or -1 for stops).
    lut = np.full((64,), -1, dtype=np.int32)
    for state, codon in enumerate(SENSE_CODONS):
        lut[_NUC.index(codon[0]) * 16 + _NUC.index(codon[1]) * 4 + _NUC.index(codon[2])] = state
    states = lut[idx64]
    is_stop = valid & (states < 0)
    if is_stop.any():
        if stops == "error":
            seq, col = np.argwhere(is_stop)[0]
            raise ValueError(
                f"in-frame stop codon at sequence {seq}, codon column {col} "
                "(pass stops='missing' to treat stop codons as missing data)"
            )
        valid = valid & ~is_stop
    return np.where(valid, states, MISSING).astype(np.int32)


def empirical_codon_frequencies(
    codon_states: np.ndarray, *, pseudocount: float = 0.1
) -> np.ndarray:
    """F61: observed codon frequencies (+pseudocount so no state has mass 0)."""
    states = np.asarray(codon_states)
    counts = np.bincount(
        states[states >= 0].ravel(), minlength=N_CODONS
    ).astype(np.float64)
    counts += pseudocount
    return (counts / counts.sum()).astype(np.float32)


def f3x4_frequencies(nuc_states: np.ndarray) -> np.ndarray:
    """F3x4: product of per-codon-position nucleotide frequencies, stop mass
    removed and renormalized over the 61 sense codons."""
    nuc = np.asarray(nuc_states)
    length = (nuc.shape[1] // 3) * 3
    nuc = nuc[:, :length]
    pos_freqs = np.zeros((3, 4), dtype=np.float64)
    for p in range(3):
        col = nuc[:, p::3]
        col = col[(col >= 0) & (col <= 3)]
        counts = np.bincount(col.ravel(), minlength=4).astype(np.float64) + 0.1
        pos_freqs[p] = counts / counts.sum()
    freqs = np.array(
        [
            pos_freqs[0, _NUC.index(c[0])]
            * pos_freqs[1, _NUC.index(c[1])]
            * pos_freqs[2, _NUC.index(c[2])]
            for c in SENSE_CODONS
        ]
    )
    return (freqs / freqs.sum()).astype(np.float32)


def f1x4_frequencies(nuc_states: np.ndarray) -> np.ndarray:
    """F1x4: one shared nucleotide distribution across codon positions."""
    nuc = np.asarray(nuc_states)
    col = nuc[(nuc >= 0) & (nuc <= 3)]
    counts = np.bincount(col.ravel(), minlength=4).astype(np.float64) + 0.1
    p = counts / counts.sum()
    freqs = np.array(
        [p[_NUC.index(c[0])] * p[_NUC.index(c[1])] * p[_NUC.index(c[2])] for c in SENSE_CODONS]
    )
    return (freqs / freqs.sum()).astype(np.float32)


def codon_frequencies(
    codon_states: np.ndarray,
    *,
    mode: str = "f61",
    nuc_states: np.ndarray | None = None,
) -> np.ndarray:
    """Dispatch F61 / F3x4 / F1x4 (the latter two need the nucleotide alignment)."""
    mode = mode.lower()
    if mode == "f61":
        return empirical_codon_frequencies(codon_states)
    if mode in ("f3x4", "f1x4"):
        if nuc_states is None:
            raise ValueError(f"{mode} frequencies need nuc_states")
        fn = f3x4_frequencies if mode == "f3x4" else f1x4_frequencies
        return fn(nuc_states)
    raise ValueError(f"unknown codon frequency mode {mode!r}")


def simulate_gy94(
    key: jax.Array,
    topology: Topology,
    branch_lengths: np.ndarray,
    *,
    kappa: float = 2.0,
    omega: float = 0.5,
    freqs: np.ndarray | None = None,
    n_sites: int = 200,
) -> np.ndarray:
    """Simulate a codon alignment down a tree under GY94.

    Host-side data generator (test fixture / example data): samples the root
    from the stationary distribution and each child through expm(Q t). Returns
    (n_leaves, n_sites) codon states.
    """
    if freqs is None:
        freqs = np.full((N_CODONS,), 1.0 / N_CODONS, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    freqs = freqs / freqs.sum()
    gen = np.asarray(
        gy94_generator(
            jnp.asarray(kappa, jnp.float32),
            jnp.asarray(omega, jnp.float32),
            jnp.asarray(freqs, jnp.float32),
        ),
        dtype=np.float64,
    )
    blens = np.asarray(branch_lengths, dtype=np.float64)
    children = np.asarray(topology.children)
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)

    n_all = topology.n_all
    states = np.zeros((n_all, n_sites), dtype=np.int64)
    states[-1] = rng.choice(N_CODONS, size=n_sites, p=freqs)
    # Walk ancestors root-first (reverse index order keeps parents before
    # children under the engine's topological node ordering).
    import scipy.linalg  # CPU-only data gen; fine outside jit

    for anc in range(topology.n_ancestors - 1, -1, -1):
        parent = topology.n_leaves + anc
        for child in children[anc]:
            p = scipy.linalg.expm(gen * blens[child])
            p = np.clip(p, 0.0, None)
            p = p / p.sum(axis=1, keepdims=True)
            cum = np.cumsum(p[states[parent]], axis=1)
            u = rng.random(n_sites)[:, None]
            states[child] = (u > cum).sum(axis=1)
    return states[: topology.n_leaves].astype(np.int32)


def gy94_log_likelihood(
    topology: Topology,
    branch_lengths: jax.Array,
    codon_states: jax.Array,
    *,
    kappa: float | jax.Array,
    omega: float | jax.Array,
    freqs: jax.Array,
    gamma_shape: float | jax.Array | None = None,
    n_categories: int = 4,
    site_weights: jax.Array | None = None,
) -> jax.Array:
    """Log-likelihood of a codon alignment under GY94 (+G optional)."""
    rates = gy94_exchangeabilities(kappa, omega)
    if gamma_shape is None:
        return tree_log_likelihood(
            topology, branch_lengths, codon_states, N_CODONS,
            site_mask=site_weights, rates=rates, freqs=freqs,
        )
    return tree_log_likelihood_gamma(
        topology, branch_lengths, codon_states, N_CODONS,
        gamma_shape=gamma_shape, n_categories=n_categories,
        site_mask=site_weights, rates=rates, freqs=freqs,
    )


def optimize_gy94(
    topology: Topology,
    codon_states: jax.Array,
    *,
    freqs: np.ndarray | jax.Array | None = None,
    model: str = "gy94",
    n_categories: int = 4,
    init_length: float = 0.1,
    learning_rate: float = 0.05,
    n_iterations: int = 600,
    site_weights: jax.Array | None = None,
) -> tuple[dict[str, jax.Array], jax.Array]:
    """Joint ML fit of branch lengths + kappa + omega (+ Gamma shape).

    Codon frequencies are held at their empirical estimate (the standard
    GY94 practice — frequencies are nuisance parameters estimated by
    counting, not by likelihood). Same jitted Adam-in-``lax.scan`` recipe as
    ``ops.likelihood.optimize_model``.

    Args:
        model: "gy94" or "gy94+g".

    Returns:
        (params, nll_curve): params maps "branch_lengths" (n_all,), "kappa",
        "omega" (scalars), "freqs" (61,), plus "gamma_shape" for +g.
    """
    model = model.lower()
    if model not in ("gy94", "gy94+g"):
        raise ValueError(f"unknown codon model {model!r}")
    use_gamma = model.endswith("+g")
    if freqs is None:
        freqs = empirical_codon_frequencies(np.asarray(codon_states))
    freqs_j = jnp.asarray(freqs, jnp.float32)
    n_all = topology.n_all

    def build(params):
        out = {
            "branch_lengths": jax.nn.softplus(params["theta_len"]),
            "kappa": jax.nn.softplus(params["theta_kappa"]),
            "omega": jax.nn.softplus(params["theta_omega"]),
            "freqs": freqs_j,
        }
        if use_gamma:
            out["gamma_shape"] = jax.nn.softplus(params["theta_shape"])
        return out

    def loss_fn(params):
        built = build(params)
        ll = gy94_log_likelihood(
            topology, built["branch_lengths"], codon_states,
            kappa=built["kappa"], omega=built["omega"], freqs=freqs_j,
            gamma_shape=built.get("gamma_shape"),
            n_categories=n_categories, site_weights=site_weights,
        )
        return -ll

    inv_softplus = lambda x: float(np.log(np.expm1(x)))
    params0 = {
        "theta_len": jnp.full((n_all,), inv_softplus(init_length)),
        "theta_kappa": jnp.asarray(inv_softplus(2.0)),
        "theta_omega": jnp.asarray(inv_softplus(0.5)),
    }
    if use_gamma:
        params0["theta_shape"] = jnp.asarray(inv_softplus(1.0))

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def run(params):
        opt_state = optimizer.init(params)

        def step(carry, _):
            p, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st = optimizer.update(grads, st, p)
            p = optax.apply_updates(p, updates)
            return (p, st), loss

        (params_f, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=n_iterations
        )
        return params_f, losses

    params_f, losses = run(params0)
    return build(params_f), losses
