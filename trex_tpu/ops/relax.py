"""Differentiable relaxations: soft topologies, soft sequences, constraints.

Counterparts of the reference's relaxation layer
(``/root/reference/src/trex/tree.py:31-160, 299-361`` and the straight-through
estimator at ``evals/benchmark.py:544-583``).

Faithfully-kept conventions (the optimization dynamics depend on them):

- ``soft_topology`` *divides* logits by temperature while ``soft_sequences``
  *multiplies* (``tree.py:78`` vs ``tree.py:129``) — asymmetric on purpose.
- Topology structural masks: leaves may only attach to ancestors; the
  ancestor->ancestor block is strictly upper triangular (acyclicity); the
  root's self-logit is pinned to 1.0 pre-softmax (``tree.py:84-105``).
- ``joint_loss`` leaves the topology temperature at 1.0 (``tree.py:338``)
  and scales only the constraint penalty by the annealed temperature.

Parameters are stacked arrays only (``ancestors: (n_anc, L, Q)``), the
vmap-compatible representation (cf. ``_update_seq_stacked``,
``evals/benchmark.py:210-232``); the reference's legacy Python-list params are
not reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_topology(
    key: jax.Array,
    tree_logits: jax.Array,
    temperature: float | jax.Array = 1.0,
    gates: jax.Array | None = None,
) -> jax.Array:
    """Gumbel-softmax relaxed tree topology.

    Args:
        key: PRNG key for the Gumbel perturbation.
        tree_logits: (n_all - 1, n_ancestors) learnable parent-assignment
            logits for every non-root node.
        temperature: softmax temperature (logits are divided by it).
        gates: optional multiplicative gates on the perturbed logits.

    Returns:
        (n_all, n_all) row-stochastic soft adjacency: row i is node i's
        parent-assignment distribution over nodes.
    """
    n_all_minus_1, n_ancestors = tree_logits.shape
    n_all = n_all_minus_1 + 1
    n_leaves = n_all - n_ancestors

    if n_ancestors == 0:
        return jnp.eye(n_all, dtype=tree_logits.dtype)

    perturbed = tree_logits + jax.random.gumbel(key, tree_logits.shape)
    if gates is not None:
        perturbed = perturbed * gates
    perturbed = perturbed / temperature

    neg_inf = jnp.asarray(-jnp.inf, dtype=perturbed.dtype)
    logits = jnp.full((n_all, n_all), neg_inf)
    # Leaves may attach to any ancestor.
    logits = logits.at[:n_leaves, n_leaves:].set(perturbed[:n_leaves])
    # Ancestor i may only attach to ancestor j with j > i (strict upper tri).
    anc_rows = perturbed[n_leaves:]  # (n_ancestors - 1, n_ancestors)
    row_ids = jnp.arange(n_ancestors - 1)[:, None]
    col_ids = jnp.arange(n_ancestors)[None, :]
    anc_rows = jnp.where(col_ids > row_ids, anc_rows, neg_inf)
    logits = logits.at[n_leaves:-1, n_leaves:].set(anc_rows)
    # Root points at itself (finite logit -> prob 1 after softmax of its row).
    logits = logits.at[-1, -1].set(1.0)
    return jax.nn.softmax(logits, axis=-1)


def soft_sequences(
    ancestor_logits: jax.Array,
    sequences: jax.Array,
    n_leaves: int,
    temperature: float | jax.Array = 1.0,
) -> jax.Array:
    """Replace ancestor rows of a (N, L, Q) tensor with softmaxed logits.

    Note the *multiplication* by temperature (``tree.py:129``).
    """
    soft = jax.nn.softmax(ancestor_logits * temperature, axis=-1)
    return sequences.at[n_leaves:].set(soft.astype(sequences.dtype))


def discretize_topology(soft_adjacency: jax.Array) -> jax.Array:
    """One-hot per-row argmax of a soft adjacency (``tree.py:31-47``)."""
    n = soft_adjacency.shape[-1]
    return jax.nn.one_hot(jnp.argmax(soft_adjacency, axis=-1), n)


def project_topology(soft_adjacency: jax.Array):
    """Project a soft adjacency onto the nearest-greedy VALID ``Topology``.

    Row-argmax discretization (``discretize_topology``, the reference's
    evaluation recipe at ``tree.py:31-47``) almost never yields a valid
    binary tree beyond toy sizes — at 64 taxa a trained soft adjacency
    routinely gives some ancestor 3+ children and scoring it with the
    dense-edge ``exact_cost`` silently under-counts. This projection makes
    the differentiable search's output consumable by every discrete tool
    (Fitch/likelihood kernels, SPR climbers, newick IO).

    Greedy sequential assignment: ancestors in increasing index order each
    claim the 2 still-unassigned lower-indexed nodes with the largest soft
    attachment weight toward them. Before ancestor ``j`` exactly
    ``n_leaves - j`` candidates remain, so feasibility is invariant and
    the result is always a valid topology under the repo node convention
    (children precede parents; root last).

    Args:
        soft_adjacency: (n_all, n_all) row-stochastic soft adjacency.

    Returns:
        ``Topology`` (unbatched; vmap for batches).
    """
    from trex_tpu.topology import Topology

    n_all = soft_adjacency.shape[-1]
    n_anc = (n_all - 1) // 2
    n_leaves = n_anc + 1
    w = soft_adjacency[:-1, n_leaves:]  # (n_all-1, n_anc); root never a child
    idx = jnp.arange(n_all - 1)
    neg_inf = jnp.asarray(-jnp.inf, dtype=w.dtype)

    def claim(avail, j):
        wj = jnp.where(avail & (idx < n_leaves + j), w[:, j], neg_inf)
        c1 = jnp.argmax(wj)
        c2 = jnp.argmax(wj.at[c1].set(neg_inf))
        avail = avail.at[c1].set(False).at[c2].set(False)
        pair = jnp.stack([jnp.minimum(c1, c2), jnp.maximum(c1, c2)])
        return avail, pair.astype(jnp.int32)

    _, children = jax.lax.scan(
        claim, jnp.ones((n_all - 1,), bool), jnp.arange(n_anc)
    )
    anc = jnp.arange(n_anc, dtype=jnp.int32) + n_leaves
    parents = jnp.zeros((n_all,), jnp.int32).at[-1].set(n_all - 1)
    parents = parents.at[children[:, 0]].set(anc).at[children[:, 1]].set(anc)
    return Topology(children=children, parents=parents)


def binary_tree_penalty(soft_adjacency: jax.Array, scale: float | jax.Array) -> jax.Array:
    """Quadratic penalty pushing every ancestor to exactly two children.

    ``scale * sum_ancestors (col_sum - 2)^2`` over ancestor columns of the
    soft adjacency, root row excluded (``tree.py:133-160``).
    """
    n_all = soft_adjacency.shape[-1]
    n_ancestors = (n_all - 1) // 2
    child_mass = jnp.sum(soft_adjacency[:-1, -n_ancestors:], axis=0)
    return scale * jnp.sum(jnp.square(child_mass - 2.0))


def joint_loss(
    key: jax.Array,
    params: dict[str, jax.Array],
    sequences: jax.Array,
    temperature: float | jax.Array,
    adjacency: jax.Array | None = None,
    *,
    constraint_scale: float = 10.0,
    fix_seqs: bool = False,
    fix_tree: bool = False,
    verbose: bool = False,
) -> jax.Array:
    """Joint topology + sequence objective (``compute_loss``, ``tree.py:299-361``).

    surrogate(soft_seqs, soft_tree) + temperature * binary_tree_penalty.
    The topology softmax runs at temperature 1.0 regardless of the annealed
    ``temperature`` (reference behavior, ``tree.py:338``). ``verbose`` emits
    NaN/range diagnostics via ``jax.debug.print`` (``tree.py:344-359``).
    """
    from trex_tpu.ops.costs import surrogate_cost

    n_all = sequences.shape[0]
    n_leaves = (n_all + 1) // 2
    seqs = (
        sequences
        if fix_seqs
        else soft_sequences(params["ancestors"], sequences, n_leaves, temperature)
    )
    _, tree_key = jax.random.split(key)
    tree = adjacency if fix_tree else soft_topology(tree_key, params["tree_params"])
    cost = surrogate_cost(seqs, tree)
    penalty = binary_tree_penalty(tree, constraint_scale)
    total = cost + temperature * penalty
    if verbose:
        jax.debug.print(
            "seqs min/max {}/{} nan={} | tree min/max {}/{} nan={} | "
            "surrogate {} penalty {} total {}",
            jnp.min(seqs), jnp.max(seqs), jnp.any(jnp.isnan(seqs)),
            jnp.min(tree), jnp.max(tree), jnp.any(jnp.isnan(tree)),
            cost, penalty, total,
        )
    return total


@jax.custom_vjp
def straight_through(soft_sequence: jax.Array) -> jax.Array:
    """Argmax forward; gradient routed to the winning logit (STE).

    Differentiable bridge between soft optimization and the exact DP
    (pattern from ``evals/benchmark.py:544-583``).
    """
    return jnp.argmax(soft_sequence, axis=-1)


def _ste_fwd(soft_sequence):
    return jnp.argmax(soft_sequence, axis=-1), soft_sequence


def _ste_bwd(soft_sequence, grad_out):
    winners = jax.nn.one_hot(
        jnp.argmax(soft_sequence, axis=-1), soft_sequence.shape[-1],
        dtype=soft_sequence.dtype,
    )
    return (grad_out[..., None].astype(soft_sequence.dtype) * winners,)


straight_through.defvjp(_ste_fwd, _ste_bwd)
