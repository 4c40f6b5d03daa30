"""Analytic all-NNI likelihood rescoring: one up/down pass, exact lnLs.

The informed MCMC proposal needs the data log-likelihood of every NNI
neighbor with clade-carried branch lengths, every generation. Evaluating
the 2(n-2) neighbors as independent trees costs 2(n-2) full pruning passes;
but an NNI at internal edge (p, c) only rearranges the three subtrees
around that edge — everything else is shared. With

- ``M_v = P_{t_v} @ inside(v)`` the upward message of subtree v through its
  own branch (length carried by clade, so t_v rides with v), and
- ``O_p`` the outside partial at p's states (everything above p, including
  p's own branch),

the per-site likelihood of the neighbor that swaps sibling s with
grandchild g (keeping k under c) is EXACTLY

    L_site = sum_x O_p(x) * M_g(x) * [P_{t_c} @ (M_s .* M_k)](x)

because every subtree keeps its internal structure and its edge length, and
the edge above c keeps the leftover length t_c (the pointer-swap carry,
``ops.tree_moves``). One inside pass + one outside pass + O(Q^2 L) per edge
replaces 2(n-2) full O(n Q^2 L) pruning passes — the same up/down-pass
trick as the analytic SPR scan (``ops.spr_scan``), specialized to exact
carried-length NNI rescoring (how IQ-TREE evaluates NNIs).

Unlike ``likelihood_asr``'s passes (which drop normalization constants —
posteriors cancel them), both passes here carry per-site log-scale
accumulators so the returned values are absolute log-likelihoods.

The reference has no likelihood machinery at all (SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from trex_tpu.ops.likelihood import highest_matmul_precision, jc69_transition
from trex_tpu.ops.tree_moves import parents_from_children


def _tip_partials(leaf_sequences, n_states, masks):
    states = jnp.arange(n_states, dtype=jnp.int32)
    if masks:
        return (
            (leaf_sequences.astype(jnp.int32)[:, None, :] >> states[None, :, None])
            & 1
        ).astype(jnp.float32)
    leaves = leaf_sequences.astype(jnp.int32)[:, None, :]
    return ((leaves == states[None, :, None]) | (leaves < 0)).astype(
        jnp.float32
    )


@partial(jax.jit, static_argnames=("n_states", "sequences_are_masks"))
@highest_matmul_precision
def nni_neighborhood_lnl(
    children: jax.Array,
    lengths: jax.Array,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    transition_matrices: jax.Array | None = None,
    root_prior: jax.Array | None = None,
    site_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
) -> jax.Array:
    """(K,) exact log-likelihoods of all K = 2(n-2) NNI neighbors.

    Neighbor ``2*e + v`` is exactly ``ops.tree_moves.nni_neighbor_device(
    children, lengths, e, v, n_leaves)`` — same edge enumeration, same
    variant convention, same clade-carried branch lengths — so the values
    can weight an informed Metropolis proposal whose moves are constructed
    by that function. Parity-tested against direct per-neighbor pruning
    (tests/test_nni_scan.py).

    Args:
        children: (n_anc, 2) topologically ordered children array.
        lengths: (n_all,) per-node branch lengths (root entry unused).
        transition_matrices: optional (n_all, Q, Q) per-node P matrices
            (overrides JC69-from-lengths; pair with ``root_prior``).
        root_prior: (Q,) root distribution, uniform when None.
        site_weights: optional (L,) per-site multiplicities.
    """
    n_anc = children.shape[0]
    n_leaves = n_anc + 1
    n_all = 2 * n_leaves - 1
    q = n_states
    length = leaf_sequences.shape[-1]

    if transition_matrices is None:
        pmats = jax.vmap(lambda t: jc69_transition(t, q))(lengths)
    else:
        pmats = transition_matrices
    if root_prior is None:
        root_prior = jnp.full((q,), 1.0 / q)
    weights = (
        jnp.ones((length,), jnp.float32)
        if site_weights is None
        else site_weights.astype(jnp.float32)
    )

    # --- inside pass with per-site log-scale bookkeeping -------------------
    inside0 = jnp.zeros((n_all, q, length))
    inside0 = inside0.at[:n_leaves].set(
        _tip_partials(leaf_sequences, q, sequences_are_masks)
    )
    ls_in0 = jnp.zeros((n_all, length))

    def up(carry, inputs):
        inside, ls = carry
        anc_offset, pair = inputs
        msgs = jnp.einsum(
            "cij,cjl->cil", pmats[pair], inside[pair],
            preferred_element_type=jnp.float32,
        )
        combined = msgs[0] * msgs[1]
        scale = jnp.maximum(jnp.max(combined, axis=0, keepdims=True), 1e-30)
        inside = jax.lax.dynamic_update_slice(
            inside, (combined / scale)[None], (n_leaves + anc_offset, 0, 0)
        )
        ls_node = ls[pair[0]] + ls[pair[1]] + jnp.log(scale[0])
        ls = jax.lax.dynamic_update_slice(
            ls, ls_node[None], (n_leaves + anc_offset, 0)
        )
        return (inside, ls), None

    offsets = jnp.arange(n_anc, dtype=jnp.int32)
    (inside, ls_in), _ = jax.lax.scan(
        up, (inside0, ls_in0), (offsets, children)
    )

    # Upward message of every node through its own branch (root row unused).
    msg = jnp.einsum(
        "vij,vjl->vil", pmats, inside, preferred_element_type=jnp.float32
    )

    # --- outside pass (O at each node's own states) with log-scales --------
    outside0 = jnp.zeros((n_all, q, length))
    outside0 = outside0.at[-1].set(
        jnp.broadcast_to(root_prior[:, None], (q, length))
    )
    ls_out0 = jnp.zeros((n_all, length))

    def down(carry, inputs):
        outside, ls = carry
        anc_offset, pair = inputs
        parent_o = outside[n_leaves + anc_offset]  # (Q, L)
        parent_ls = ls[n_leaves + anc_offset]  # (L,)
        sib_msgs = msg[pair][::-1]  # (2, Q, L): sibling message of each child
        upstream = parent_o[None] * sib_msgs  # (2, Q, L) at parent states
        norm = jnp.maximum(jnp.max(upstream, axis=1, keepdims=True), 1e-30)
        child_o = jnp.einsum(
            "cji,cjl->cil", pmats[pair], upstream / norm,
            preferred_element_type=jnp.float32,
        )
        sib_ls = ls_in[pair][::-1]  # (2, L): scale carried by sibling msg
        child_ls = parent_ls[None] + sib_ls + jnp.log(norm[:, 0, :])
        outside = outside.at[pair[0]].set(child_o[0])
        outside = outside.at[pair[1]].set(child_o[1])
        ls = ls.at[pair[0]].set(child_ls[0])
        ls = ls.at[pair[1]].set(child_ls[1])
        return (outside, ls), None

    (outside, ls_out), _ = jax.lax.scan(
        down, (outside0, ls_out0), (offsets, children), reverse=True
    )

    # --- per-edge exact NNI rescoring ---------------------------------------
    parents = parents_from_children(children, n_leaves)
    c_nodes = n_leaves + jnp.arange(n_anc - 1, dtype=jnp.int32)
    p_nodes = parents[c_nodes]
    p_off = p_nodes - n_leaves
    sib = jnp.where(
        children[p_off, 0] == c_nodes, children[p_off, 1], children[p_off, 0]
    )
    a_nodes = children[: n_anc - 1, 0]
    b_nodes = children[: n_anc - 1, 1]

    m_a, m_b, m_s = msg[a_nodes], msg[b_nodes], msg[sib]  # (E, Q, L)
    o_p = outside[p_nodes]  # (E, Q, L)
    p_c = pmats[c_nodes]  # (E, Q, Q)
    # Shared per-edge log-scale: the four carried components.
    ls_edge = (
        ls_out[p_nodes] + ls_in[a_nodes] + ls_in[b_nodes] + ls_in[sib]
    )  # (E, L)

    def variant_lnl(m_g, m_k):
        t = jnp.einsum(
            "eij,ejl->eil", p_c, m_s * m_k,
            preferred_element_type=jnp.float32,
        )
        w = jnp.sum(o_p * m_g * t, axis=1)  # (E, L)
        per_site = jnp.log(jnp.maximum(w, 1e-30)) + ls_edge
        return jnp.sum(per_site * weights[None, :], axis=1)  # (E,)

    lnl0 = variant_lnl(m_a, m_b)  # swap s <-> a (keep b under c)
    lnl1 = variant_lnl(m_b, m_a)  # swap s <-> b (keep a under c)
    return jnp.stack([lnl0, lnl1], axis=1).reshape(-1)


@partial(jax.jit, static_argnames=("n_states", "sequences_are_masks"))
@highest_matmul_precision
def tree_lnl_via_scan(
    children: jax.Array,
    lengths: jax.Array,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    transition_matrices: jax.Array | None = None,
    root_prior: jax.Array | None = None,
    site_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
) -> jax.Array:
    """Scalar lnL of the CURRENT tree through the same message algebra.

    The identity variant of the rescoring formula (g == s). Used as a
    self-consistency oracle in tests: it must equal ``tree_log_likelihood``
    to f32 noise, which validates every message and scale term the NNI
    formula consumes.
    """
    n_anc = children.shape[0]
    n_leaves = n_anc + 1
    q = n_states
    if transition_matrices is None:
        pmats = jax.vmap(lambda t: jc69_transition(t, q))(lengths)
    else:
        pmats = transition_matrices
    if root_prior is None:
        root_prior = jnp.full((q,), 1.0 / q)
    length = leaf_sequences.shape[-1]
    weights = (
        jnp.ones((length,), jnp.float32)
        if site_weights is None
        else site_weights.astype(jnp.float32)
    )

    inside0 = jnp.zeros((2 * n_leaves - 1, q, length))
    inside0 = inside0.at[:n_leaves].set(
        _tip_partials(leaf_sequences, q, sequences_are_masks)
    )
    ls0 = jnp.zeros((length,))

    def up(carry, inputs):
        inside, ls = carry
        anc_offset, pair = inputs
        msgs = jnp.einsum(
            "cij,cjl->cil", pmats[pair], inside[pair],
            preferred_element_type=jnp.float32,
        )
        combined = msgs[0] * msgs[1]
        scale = jnp.maximum(jnp.max(combined, axis=0, keepdims=True), 1e-30)
        inside = jax.lax.dynamic_update_slice(
            inside, (combined / scale)[None], (n_leaves + anc_offset, 0, 0)
        )
        return (inside, ls + jnp.log(scale[0])), None

    offsets = jnp.arange(n_anc, dtype=jnp.int32)
    (inside, ls), _ = jax.lax.scan(up, (inside0, ls0), (offsets, children))
    site_lik = jnp.sum(root_prior[:, None] * inside[-1], axis=0)
    return jnp.sum(
        (jnp.log(jnp.maximum(site_lik, 1e-30)) + ls) * weights
    )
