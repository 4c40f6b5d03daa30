"""Felsenstein pruning: phylogenetic likelihood, differentiable in branch lengths.

A second scoring model beyond parsimony (the reference has none; cf.
TreeFlow-style differentiable phylogenetics): per-site likelihood of the
alignment under a continuous-time substitution model, computed by the pruning
recursion over the same (nodes, states, sites) layout and ancestor-scan
schedule as the Sankoff DP — so it jits, vmaps over candidate batches, and
shards over ('tree', 'site') identically.

Provided models: Jukes-Cantor (JC69) generalized to Q states and reversible
GTR (arbitrary symmetric exchangeabilities + stationary frequencies, via the
eigendecomposition of the pi-symmetrized generator). JC69's transition
matrix has the closed form

    P(t)[i,j] = 1/Q + (1 - 1/Q) exp(-Q/(Q-1) t)     if i == j
                1/Q - (1/Q)     exp(-Q/(Q-1) t)     otherwise,

smooth in t, so ``jax.grad`` w.r.t. branch lengths drives ML branch-length
optimization. Underflow is handled with per-node max-scaling accumulated in
log space (standard pruning practice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from trex_tpu.topology import Topology


def jc69_transition(branch_length: jax.Array, n_states: int) -> jax.Array:
    """(Q, Q) JC69 transition matrix for one branch length (scalar)."""
    q = n_states
    decay = jnp.exp(-q / (q - 1.0) * branch_length)
    same = 1.0 / q + (1.0 - 1.0 / q) * decay
    diff = 1.0 / q - (1.0 / q) * decay
    return jnp.full((q, q), diff) + (same - diff) * jnp.eye(q)


def gtr_eigensystem(
    rates: jax.Array, freqs: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Eigensystem of a normalized reversible (GTR) rate matrix.

    Args:
        rates: (Q, Q) symmetric exchangeabilities (diagonal ignored).
        freqs: (Q,) stationary distribution.

    Returns:
        (eigenvalues (Q,), left (Q,Q), right (Q,Q)) such that
        ``P(t) = right @ diag(exp(eigenvalues * t)) @ left``. The rate matrix
        is normalized to one expected substitution per unit branch length.
        Differentiable (eigh of the symmetrized generator).
    """
    sym = (rates + rates.T) / 2.0
    gen = sym * freqs[None, :]
    gen = gen - jnp.diag(jnp.diag(gen))
    gen = gen - jnp.diag(jnp.sum(gen, axis=1))
    # Normalize expected rate: -sum_i pi_i * Q_ii == 1.
    scale = -jnp.sum(freqs * jnp.diag(gen))
    gen = gen / scale
    sqrt_pi = jnp.sqrt(freqs)
    balanced = sqrt_pi[:, None] * gen / sqrt_pi[None, :]  # symmetric
    eigvals, eigvecs = jnp.linalg.eigh((balanced + balanced.T) / 2.0)
    right = eigvecs / sqrt_pi[:, None]
    left = eigvecs.T * sqrt_pi[None, :]
    return eigvals, left, right


def gtr_transition(
    branch_length: jax.Array,
    eigvals: jax.Array,
    left: jax.Array,
    right: jax.Array,
) -> jax.Array:
    """(Q, Q) transition matrix from a precomputed GTR eigensystem."""
    p = (right * jnp.exp(eigvals * branch_length)[None, :]) @ left
    return jnp.clip(p, 0.0, 1.0)


def tree_log_likelihood(
    topology: Topology,
    branch_lengths: jax.Array,
    leaf_sequences: jax.Array,
    n_states: int,
    site_mask: jax.Array | None = None,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
) -> jax.Array:
    """Log-likelihood of the alignment given topology + branch lengths.

    Args:
        branch_lengths: (n_all,) per-node branch length ABOVE each node (the
            root entry is ignored). Must be positive.
        leaf_sequences: (n_leaves, L) int states.
        rates / freqs: optional GTR exchangeabilities (Q, Q) and stationary
            frequencies (Q,); both None -> JC69 with a uniform prior.

    Returns:
        Scalar log-likelihood (f32), differentiable w.r.t. branch_lengths
        (and rates/freqs when given).
    """
    n_leaves = topology.n_leaves
    n_all = topology.n_all
    length = leaf_sequences.shape[-1]
    q = n_states

    if rates is not None or freqs is not None:
        if freqs is None:
            freqs = jnp.full((q,), 1.0 / q)
        if rates is None:
            rates = jnp.ones((q, q))
        eigvals, left, right = gtr_eigensystem(rates, freqs)
        transition = lambda t: gtr_transition(t, eigvals, left, right)
        root_prior = freqs
    else:
        transition = lambda t: jc69_transition(t, q)
        root_prior = jnp.full((q,), 1.0 / q)

    # Partial likelihoods, (n_all, Q, L); leaves one-hot.
    partials0 = jnp.zeros((n_all, q, length))
    states = jnp.arange(q, dtype=jnp.int32)
    leaf_onehot = (
        leaf_sequences.astype(jnp.int32)[:, None, :] == states[None, :, None]
    ).astype(jnp.float32)
    partials0 = partials0.at[:n_leaves].set(leaf_onehot)
    # Ancestor rows start at 1 so un-filled rows cannot poison the scaling.
    partials0 = partials0.at[n_leaves:].set(1.0)
    logscale0 = jnp.zeros((length,))

    def up(carry, inputs):
        partials, logscale = carry
        anc_offset, child_pair = inputs
        child_partials = partials[child_pair]  # (2, Q, L)
        child_mats = jax.vmap(transition)(branch_lengths[child_pair])  # (2, Q, Q)
        # message[c, i, l] = sum_j P_c[i, j] * L_c[j, l]
        messages = jnp.einsum(
            "cij,cjl->cil", child_mats, child_partials,
            preferred_element_type=jnp.float32,
        )
        combined = messages[0] * messages[1]  # (Q, L)
        # Per-site scaling to avoid underflow.
        scale = jnp.max(combined, axis=0)  # (L,)
        safe = jnp.maximum(scale, 1e-300)
        combined = combined / safe
        partials = jax.lax.dynamic_update_slice(
            partials, combined[None], (n_leaves + anc_offset, 0, 0)
        )
        return (partials, logscale + jnp.log(safe)), None

    offsets = jnp.arange(topology.n_ancestors, dtype=jnp.int32)
    (partials, logscale), _ = jax.lax.scan(
        up, (partials0, logscale0), (offsets, topology.children)
    )
    site_lik = jnp.sum(root_prior[:, None] * partials[-1], axis=0)  # (L,)
    per_site = jnp.log(site_lik) + logscale
    if site_mask is not None:
        per_site = per_site * site_mask.astype(per_site.dtype)
    return jnp.sum(per_site)


batched_tree_log_likelihood = jax.vmap(
    tree_log_likelihood, in_axes=(0, 0, None, None)
)


def optimize_branch_lengths(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    init_length: float = 0.1,
    learning_rate: float = 0.05,
    n_iterations: int = 500,
) -> tuple[jax.Array, jax.Array]:
    """ML branch lengths on a fixed topology by gradient ascent.

    Parameterizes lengths as softplus(theta) for positivity; the whole loop
    is one jitted scan. Returns (branch_lengths (n_all,), loss curve).
    """
    n_all = topology.n_all

    def lengths(theta):
        return jax.nn.softplus(theta)

    def loss_fn(theta):
        return -tree_log_likelihood(
            topology, lengths(theta), leaf_sequences, n_states
        )

    theta0 = jnp.full(
        (n_all,), jnp.log(jnp.expm1(jnp.asarray(init_length)))
    )
    optimizer = optax.adam(learning_rate)

    @jax.jit
    def run(theta):
        opt_state = optimizer.init(theta)

        def step(carry, _):
            th, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(th)
            updates, st = optimizer.update(grads, st, th)
            th = optax.apply_updates(th, updates)
            return (th, st), loss

        (theta_f, _), losses = jax.lax.scan(
            step, (theta, opt_state), None, length=n_iterations
        )
        return theta_f, losses

    theta_f, losses = run(theta0)
    return lengths(theta_f), losses
