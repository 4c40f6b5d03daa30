"""Strict molecular clock: ultrametric (node-age) trees.

The reference has no time machinery at all; this supplies the clock
family: age<->length conversion, ML strict-clock fitting (the constrained
counterpart of ``optimize_branch_lengths``), and the likelihood-ratio
clock test (Felsenstein 1981; chi-square with n-2 degrees of freedom —
an ultrametric n-leaf tree has n-1 free node ages vs 2n-3 free
unconstrained edge lengths).

Ages are indexed by node like everything else (leaves 0..n-1 at age 0,
ancestors above, root last); the edge length above node v is
``age(parent(v)) - age(v)``, guaranteed positive by construction:
ML fitting parameterizes each ancestor's age as (max child age) +
softplus(theta) accumulated in index order (children precede parents),
so gradient steps can never produce a negative branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trex_tpu.topology import Topology


def ages_to_lengths(topology: Topology, ages: jax.Array) -> jax.Array:
    """(n_all,) edge lengths above each node from node ages (root -> 0)."""
    parents = topology.parents
    lengths = ages[parents] - ages
    return lengths.at[-1].set(0.0)


def increments_to_ages(topology: Topology, increments: jax.Array) -> jax.Array:
    """(n_anc,) positive increments -> (n_all,) valid ages (leaves at 0).

    Ancestor ``i``'s age = max(children ages) + increments[i]; index order
    is topological so one scan suffices. jit/vmap/grad-compatible.
    """
    n_leaves = topology.n_leaves
    n_all = topology.n_all
    ages0 = jnp.zeros((n_all,), increments.dtype)

    def step(ages, inputs):
        offset, pair, inc = inputs
        age = jnp.maximum(ages[pair[0]], ages[pair[1]]) + inc
        return ages.at[n_leaves + offset].set(age), None

    offsets = jnp.arange(topology.n_ancestors, dtype=jnp.int32)
    ages, _ = jax.lax.scan(
        step, ages0, (offsets, topology.children, increments)
    )
    return ages


def optimize_clock(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    init_increment: float = 0.05,
    learning_rate: float = 0.05,
    n_iterations: int = 500,
    sequences_are_masks: bool = False,
    site_weights: jax.Array | None = None,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """ML node ages under a strict clock (one jitted scan, like
    ``optimize_branch_lengths`` but over n-1 age increments).

    Returns (ages (n_all,), negative-log-likelihood curve).
    """
    from trex_tpu.ops.likelihood import tree_log_likelihood

    n_anc = topology.n_ancestors

    def loss_fn(theta):
        increments = jax.nn.softplus(theta)
        ages = increments_to_ages(topology, increments)
        lengths = ages_to_lengths(topology, ages)
        ll = tree_log_likelihood(
            topology, lengths, leaf_sequences, n_states,
            site_mask=site_weights, rates=rates, freqs=freqs,
            sequences_are_masks=sequences_are_masks,
        )
        return -ll

    theta0 = jnp.full(
        (n_anc,), jnp.log(jnp.expm1(jnp.asarray(init_increment)))
    )
    optimizer = optax.adam(learning_rate)

    @jax.jit
    def run(theta):
        opt_state = optimizer.init(theta)

        def step(carry, _):
            t, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(t)
            updates, st = optimizer.update(grads, st, t)
            return (optax.apply_updates(t, updates), st), loss

        (theta_f, _), losses = jax.lax.scan(
            step, (theta, opt_state), None, length=n_iterations
        )
        return theta_f, losses

    theta_f, losses = run(theta0)
    ages = increments_to_ages(topology, jax.nn.softplus(theta_f))
    return ages, losses


def clock_lrt(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    sequences_are_masks: bool = False,
    site_weights: jax.Array | None = None,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
    n_iterations: int = 600,
) -> dict:
    """Likelihood-ratio test of the strict clock on a fixed topology.

    H0: ultrametric (n-1 free ages); H1: free branch lengths (2n-3 free —
    the rooted representation's 2n-2 lengths are identifiable only through
    the root-children sum, hence one fewer). 2*(lnL1 - lnL0) ~ chi2(n-2).

    Returns dict with lnl_clock, lnl_free, statistic, df, p_value, ages.
    """
    from trex_tpu.ops.likelihood import (
        optimize_branch_lengths,
        tree_log_likelihood,
    )

    kwargs = dict(
        sequences_are_masks=sequences_are_masks,
        rates=rates, freqs=freqs,
    )
    ages, _ = optimize_clock(
        topology, leaf_sequences, n_states,
        site_weights=site_weights, n_iterations=n_iterations, **kwargs,
    )
    lnl_clock = float(
        tree_log_likelihood(
            topology, ages_to_lengths(topology, ages), leaf_sequences,
            n_states, site_mask=site_weights, **kwargs,
        )
    )
    free_lengths, _ = optimize_branch_lengths(
        topology, leaf_sequences, n_states,
        site_weights=site_weights, n_iterations=n_iterations, **kwargs,
    )
    lnl_free = float(
        tree_log_likelihood(
            topology, free_lengths, leaf_sequences, n_states,
            site_mask=site_weights, **kwargs,
        )
    )
    stat = max(2.0 * (lnl_free - lnl_clock), 0.0)
    df = topology.n_leaves - 2
    try:
        from scipy.stats import chi2

        p_value = float(chi2.sf(stat, df))
    except ImportError:  # pragma: no cover
        p_value = float("nan")
    return {
        "lnl_clock": lnl_clock,
        "lnl_free": lnl_free,
        "statistic": stat,
        "df": df,
        "p_value": p_value,
        "ages": np.asarray(ages),
    }
