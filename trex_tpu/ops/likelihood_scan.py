"""All-SPR scan under the likelihood criterion (fixed ranking lengths).

``search.ml.ml_hill_climb`` ranks SPR candidates by pruning log-likelihood
with every branch fixed at one length t0 — which makes the likelihood of ANY
rearrangement a LOCAL contraction of cached partials, no per-candidate
pruning pass needed. Inserting node w (all three incident branches t0) on
the edge above v of T∖S, with the pruned subtree S below it:

    L_site(p, v) = Σ_m  (P0ᵀ upstream_v)(m) · (P0 inside_v)(m) · (P0 U_S)(m)

where ``inside`` / ``upstream`` are T∖S's Felsenstein partials (computed
once per prune variant with the same pass-through-row trick as
``ops.spr_scan``; per-node rescalings are tracked in log space and added
back, so scores are ABSOLUTE log-likelihoods). Exact for the all-t0
candidate trees the enumerating ranker scores — verified against it in
``tests/test_likelihood_scan.py`` — because likelihood under a reversible
model is rooting-invariant.

One scan round costs ~2n pruning passes instead of O(n²); combined with
zero candidate construction/transfer this is the ML counterpart of the
parsimony ``spr_scan``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from trex_tpu.ops.likelihood import highest_matmul_precision, jc69_transition
from trex_tpu.topology import Topology


@partial(
    jax.jit,
    static_argnames=(
        "n_states", "sequences_are_masks", "prune_chunk", "n_categories"
    ),
)
@highest_matmul_precision
def likelihood_spr_scan(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    ranking_branch_length: float | jax.Array = 0.1,
    site_weights: jax.Array | None = None,
    *,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
    gamma_shape: float | jax.Array | None = None,
    n_categories: int = 4,
    category_rates: jax.Array | None = None,
    category_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
    prune_nodes: jax.Array | None = None,
    prune_chunk: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Negative log-likelihoods of all SPR rearrangements (all-t0 lengths).

    Args / layout mirror ``ops.spr_scan.spr_scan``; returns
    (scores, base_score) where ``scores[i, v]`` is the NEGATIVE
    log-likelihood (minimize) of pruning ``prune_nodes[i]`` and regrafting
    above v with every branch at ``ranking_branch_length``; +inf at invalid
    pairs. ``base_score`` is the unmodified tree's negative log-likelihood
    at the same lengths.

    ``rates``/``freqs``: optional GTR exchangeabilities + stationary
    frequencies (both None -> JC69). The message algebra is
    direction-correct for any transition matrix — downward hops use
    ``P0[parent_state, child_state]`` — and exactness for arbitrary
    insertion points relies only on reversibility (the pulley principle),
    which the normalized GTR family satisfies; parity vs the enumerating
    ranker is tested with strongly asymmetric matrices.

    ``gamma_shape``: optional discrete-Gamma site-rate heterogeneity — the
    up/down passes run once per category (branch lengths scaled by the
    Yang-1994 category rates) and the per-site likelihoods are mixed with
    equal category weights BEFORE the site-sum, matching
    ``tree_log_likelihood_gamma`` exactly. Compute and memory scale by
    ``n_categories``.
    """
    n_leaves = topology.n_leaves
    n_all = topology.n_all
    n_anc = topology.n_ancestors
    length = leaf_sequences.shape[-1]
    root = n_all - 1
    q = n_states

    states = jnp.arange(q, dtype=jnp.int32)
    if sequences_are_masks:
        tips = (
            (leaf_sequences.astype(jnp.int32)[:, None, :] >> states[None, :, None]) & 1
        ).astype(jnp.float32)
    else:
        # Negative states mean "missing" (e.g. an ambiguous codon): all-ones
        # tip partial, the same marginalization as tree_log_likelihood.
        leaves = leaf_sequences.astype(jnp.int32)[:, None, :]
        tips = (
            (leaves == states[None, :, None]) | (leaves < 0)
        ).astype(jnp.float32)
    if site_weights is None:
        weights = jnp.ones((length,), jnp.float32)
    else:
        weights = site_weights.astype(jnp.float32)

    # Per-rate-category transition matrices (K = 1 without a rate mixture).
    # ``category_rates``/``category_weights`` give an explicit mixture (the
    # FreeRate family); ``gamma_shape`` the equal-weight discrete Gamma.
    cat_log_w = None
    if category_rates is not None:
        cat_rates = jnp.asarray(category_rates, jnp.float32)
        if category_weights is not None:
            w = jnp.asarray(category_weights, jnp.float32)
            cat_log_w = jnp.log(w / jnp.sum(w))
    elif gamma_shape is not None:
        from trex_tpu.ops.likelihood import discrete_gamma_rates

        cat_rates = discrete_gamma_rates(gamma_shape, n_categories)  # (K,)
    else:
        cat_rates = jnp.ones((1,), jnp.float32)
    t0 = jnp.asarray(ranking_branch_length)
    if rates is not None or freqs is not None:
        from trex_tpu.ops.likelihood import gtr_eigensystem, gtr_transition

        model_rates = (
            rates if rates is not None else jnp.ones((q, q)) - jnp.eye(q)
        )
        prior = (
            freqs.astype(jnp.float32)
            if freqs is not None
            else jnp.full((q,), 1.0 / q)
        )
        eig = gtr_eigensystem(jnp.asarray(model_rates), prior)
        p0s = jax.vmap(lambda r: gtr_transition(t0 * r, *eig))(cat_rates)
    else:
        p0s = jax.vmap(lambda r: jc69_transition(t0 * r, q))(cat_rates)
        prior = jnp.full((q,), 1.0 / q)
    n_cat = p0s.shape[0]

    children = topology.children.astype(jnp.int32)
    parents = topology.parents.astype(jnp.int32)

    full_scan = prune_nodes is None
    if full_scan:
        prune_nodes = jnp.arange(n_all - 1, dtype=jnp.int32)
    else:
        prune_nodes = prune_nodes.astype(jnp.int32)
    q_rows = parents[prune_nodes] - n_leaves
    row_pair = children[q_rows]
    siblings = row_pair[:, 0] + row_pair[:, 1] - prune_nodes

    def variant(q_row, sib):
        return children.at[q_row].set(jnp.stack([sib, sib]))

    var_children = jax.vmap(variant)(q_rows, siblings)

    def up_pass(p0, ch):
        """inside partials (n_all, Q, L) + per-node log-scales (n_all, L)."""
        inside0 = jnp.zeros((n_all, q, length))
        inside0 = inside0.at[:n_leaves].set(tips)
        ls0 = jnp.zeros((n_all, length))

        def step(carry, inputs):
            inside, ls = carry
            anc_offset, pair = inputs
            node = n_leaves + anc_offset
            c1, c2 = pair[0], pair[1]
            msgs = jnp.einsum(
                "ij,cjl->cil", p0, inside[pair],
                preferred_element_type=jnp.float32,
            )
            is_pass = c1 == c2
            # Pass-through rows forward the child partial VERBATIM: the
            # suppressed edge must not add a P0 hop (the candidate tree has
            # ONE t0 edge where the variant has the s-q-gp path).
            combined = jnp.where(is_pass, inside[c1], msgs[0] * msgs[1])
            scale = jnp.maximum(jnp.max(combined, axis=0), 1e-30)
            combined = combined / scale
            child_ls = jnp.where(is_pass, ls[c1], ls[c1] + ls[c2])
            inside = jax.lax.dynamic_update_slice(
                inside, combined[None], (node, 0, 0)
            )
            ls = jax.lax.dynamic_update_slice(
                ls, (child_ls + jnp.log(scale))[None], (node, 0)
            )
            return (inside, ls), None

        offsets = jnp.arange(n_anc, dtype=jnp.int32)
        (inside, ls), _ = jax.lax.scan(step, (inside0, ls0), (offsets, ch))
        return inside, ls

    def down_pass(p0, ch, inside, ls_in):
        """upstream partials (n_all, Q, L) + log-scales (n_all, L).

        ``upstream(v)`` lives at the PARENT's states and excludes v's own
        branch; root row = prior with log-scale 0.
        """
        up0 = jnp.zeros((n_all, q, length))
        up0 = up0.at[root].set(jnp.broadcast_to(prior[:, None], (q, length)))
        ls0 = jnp.zeros((n_all, length))

        def step(carry, inputs):
            upstream, ls = carry
            anc_offset, pair = inputs
            node = n_leaves + anc_offset
            c1, c2 = pair[0], pair[1]
            is_pass = c1 == c2
            parent_up = upstream[node]  # (Q, L) at node's PARENT's states
            # Cross node's own branch to get its outside (at node's states);
            # the root has no branch above, its upstream IS the prior.
            outside = jnp.where(
                node == root,
                parent_up,
                jnp.einsum(
                    "ji,jl->il", p0, parent_up,
                    preferred_element_type=jnp.float32,
                ),
            )
            msgs = jnp.einsum(
                "ij,cjl->cil", p0, inside[pair],
                preferred_element_type=jnp.float32,
            )
            raw1 = outside * msgs[1]  # upstream(c1): sibling is c2
            scale1 = jnp.maximum(jnp.max(raw1, axis=0), 1e-30)
            # Pass-through rows forward upstream(node) VERBATIM (the
            # suppressed edge contributes no hop and no sibling factor).
            up1 = jnp.where(is_pass, parent_up, raw1 / scale1)
            nls1 = jnp.where(
                is_pass, ls[node], ls[node] + ls_in[c2] + jnp.log(scale1)
            )
            raw2 = outside * msgs[0]
            scale2 = jnp.maximum(jnp.max(raw2, axis=0), 1e-30)
            up2 = raw2 / scale2
            nls2 = ls[node] + ls_in[c1] + jnp.log(scale2)
            upstream = upstream.at[c1].set(up1)
            ls = ls.at[c1].set(nls1)
            upstream = upstream.at[c2].set(jnp.where(is_pass, up1, up2))
            ls = ls.at[c2].set(jnp.where(is_pass, nls1, nls2))
            return (upstream, ls), None

        offsets = jnp.arange(n_anc, dtype=jnp.int32)
        (upstream, ls), _ = jax.lax.scan(
            step, (up0, ls0), (offsets, ch), reverse=True
        )
        return upstream, ls

    # Category mixing constants: log-weights (FreeRate) or -log K (Gamma).
    if cat_log_w is None:
        cat_log_w = jnp.full((n_cat,), -jnp.log(float(n_cat)))

    def mix(per_site_k, axis=0):
        shape = [1] * per_site_k.ndim
        shape[axis] = n_cat
        return jax.scipy.special.logsumexp(
            per_site_k + cat_log_w.reshape(shape), axis=axis
        )

    # Base score (all branches t0) from the unmodified tree: per-category
    # per-site log-liks, weight-mixed BEFORE the site-sum.
    def base_per_site(p0):
        base_inside, base_ls = up_pass(p0, children)
        return jnp.log(
            jnp.maximum(
                jnp.sum(prior[:, None] * base_inside[root], axis=0), 1e-30
            )
        ) + base_ls[root]

    base_site = mix(jax.vmap(base_per_site)(p0s))
    base_score = -jnp.sum(base_site * weights)

    def chunk_scores(args):
        pn, vch = args
        c = pn.shape[0]
        rows = jnp.arange(c)

        def cat_per_site(p0):
            inside, ls_in = jax.vmap(up_pass, in_axes=(None, 0))(p0, vch)
            upstream, ls_up = jax.vmap(down_pass, in_axes=(None, 0, 0, 0))(
                p0, vch, inside, ls_in
            )
            u_s = inside[rows, pn]  # (C, Q, L): pruned subtree root partial
            ls_s = ls_in[rows, pn]  # (C, L)
            msg_s = jnp.einsum(
                "ij,cjl->cil", p0, u_s, preferred_element_type=jnp.float32
            )
            msg_v = jnp.einsum(
                "ij,cnjl->cnil", p0, inside,
                preferred_element_type=jnp.float32,
            )
            alpha = jnp.einsum(
                "ij,cnil->cnjl", p0, upstream,
                preferred_element_type=jnp.float32,
            )
            site_lik = jnp.sum(
                alpha * msg_v * msg_s[:, None], axis=2
            )  # (C, n, L)
            return (
                jnp.log(jnp.maximum(site_lik, 1e-30))
                + ls_in
                + ls_up
                + ls_s[:, None, :]
            )

        # lax.map over categories: peak memory stays ~one category's passes.
        per_site_k = jax.lax.map(cat_per_site, p0s)  # (K, C, n, L)
        mixed = mix(per_site_k)
        return -jnp.sum(mixed * weights[None, None, :], axis=-1)

    n_prune = prune_nodes.shape[0]
    if prune_chunk is None or prune_chunk >= n_prune:
        scores = chunk_scores((prune_nodes, var_children))
    else:
        pad = (-n_prune) % prune_chunk
        pn = jnp.concatenate(
            [prune_nodes, jnp.broadcast_to(prune_nodes[-1:], (pad,))]
        )
        vch = jnp.concatenate(
            [
                var_children,
                jnp.broadcast_to(
                    var_children[-1:], (pad,) + var_children.shape[1:]
                ),
            ]
        )
        k = pn.shape[0] // prune_chunk
        scores = jax.lax.map(
            chunk_scores,
            (
                pn.reshape(k, prune_chunk),
                vch.reshape(k, prune_chunk, n_anc, 2),
            ),
        ).reshape(-1, n_all)[:n_prune]

    # Invalid pairs -> +inf (same rules as the parsimony scan).
    idx = jnp.arange(n_all, dtype=jnp.int32)

    def mark(carry, _):
        ptr, hit = carry
        hit = hit | (ptr[None, :] == prune_nodes[:, None])
        ptr = parents[ptr]
        return (ptr, hit), None

    (_, in_s), _ = jax.lax.scan(
        mark,
        (idx, jnp.zeros((n_prune, n_all), bool)),
        None,
        length=n_all,
    )
    q_par = parents[prune_nodes]
    rem_root = jnp.where(q_par == root, siblings, root)
    invalid = (
        in_s
        | (idx[None, :] == q_par[:, None])
        | (idx[None, :] == rem_root[:, None])
        | (idx[None, :] == root)
    )
    scores = jnp.where(invalid, jnp.inf, scores)
    if full_scan:
        scores = jnp.concatenate(
            [scores, jnp.full((1, n_all), jnp.inf, scores.dtype)]
        )
    return scores, base_score


def likelihood_spr_scan_segmented(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    ranking_branch_length: float | jax.Array = 0.1,
    site_weights: jax.Array | None = None,
    *,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
    gamma_shape: float | jax.Array | None = None,
    n_categories: int = 4,
    category_rates: jax.Array | None = None,
    category_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
    prune_chunk: int | None = None,
    max_cells: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full-prune-set ML scan split into safe dispatches.

    Same rationale and layout as ``ops.spr_scan.spr_scan_segmented`` (see
    its docstring for the measured 4096-taxa single-dispatch device-kill
    this avoids); equal-sized segments keep it at two compiled programs.
    """
    import numpy as np

    from trex_tpu.ops.spr_scan import _MAX_SCAN_CELLS

    if max_cells is None:
        max_cells = _MAX_SCAN_CELLS
    n_all = topology.n_all
    n_prune = n_all - 1
    kwargs = dict(
        rates=rates, freqs=freqs, gamma_shape=gamma_shape,
        n_categories=n_categories, category_rates=category_rates,
        category_weights=category_weights,
        sequences_are_masks=sequences_are_masks, prune_chunk=prune_chunk,
    )
    if n_prune * n_all <= max_cells:
        return likelihood_spr_scan(
            topology, leaf_sequences, n_states, ranking_branch_length,
            site_weights, **kwargs,
        )
    seg = max(1, max_cells // n_all)
    rows = []
    base = None
    for s0 in range(0, n_prune, seg):
        pn = np.arange(s0, s0 + seg, dtype=np.int32)
        pn[pn >= n_prune] = n_prune - 1
        sc, base = likelihood_spr_scan(
            topology, leaf_sequences, n_states, ranking_branch_length,
            site_weights, prune_nodes=jnp.asarray(pn), **kwargs,
        )
        rows.append(sc)
    scores = jnp.concatenate(rows)[:n_prune]
    root_row = jnp.full((1, n_all), jnp.inf, scores.dtype)
    return jnp.concatenate([scores, root_row]), base


def likelihood_spr_scan_best_segmented(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    ranking_branch_length: float | jax.Array = 0.1,
    site_weights: jax.Array | None = None,
    *,
    rates: jax.Array | None = None,
    freqs: jax.Array | None = None,
    gamma_shape: float | jax.Array | None = None,
    n_categories: int = 4,
    category_rates: jax.Array | None = None,
    category_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
    prune_chunk: int | None = None,
    max_cells: int | None = None,
) -> tuple[float, int, int, float, int]:
    """Best ML move via segmented scans with DEVICE-SIDE argmin reduction.

    ML twin of ``ops.spr_scan.spr_scan_best_segmented``: each segment
    reduces to (min, argmin, finite_count) on device and only scalars
    cross to the host — the full (n_all, n_all) ranking table (4.3 GB at
    16384 taxa) is never materialized host-side. Picks the identical move
    to a full-table ``np.argmin``. Returns
    (best_score, prune_node, regraft_node, base_score, n_finite).
    """
    import numpy as np

    from trex_tpu.ops.spr_scan import _MAX_SCAN_CELLS, _segment_best

    if max_cells is None:
        max_cells = _MAX_SCAN_CELLS
    n_all = topology.n_all
    n_prune = n_all - 1
    kwargs = dict(
        rates=rates, freqs=freqs, gamma_shape=gamma_shape,
        n_categories=n_categories, category_rates=category_rates,
        category_weights=category_weights,
        sequences_are_masks=sequences_are_masks, prune_chunk=prune_chunk,
    )
    seg = max(1, min(n_prune, max_cells // n_all))
    # Dispatch all segments before any readback (see spr_scan_best_
    # segmented: a per-segment blocking readback serializes the device).
    pending = []
    base = None
    for s0 in range(0, n_prune, seg):
        valid = min(seg, n_prune - s0)
        pn = np.arange(s0, s0 + seg, dtype=np.int32)
        pn[pn >= n_prune] = n_prune - 1
        sc, base = likelihood_spr_scan(
            topology, leaf_sequences, n_states, ranking_branch_length,
            site_weights, prune_nodes=jnp.asarray(pn), **kwargs,
        )
        pending.append((s0, _segment_best(sc, jnp.int32(valid))))
    best = np.inf
    best_p = best_v = 0
    n_finite = 0
    for s0, (m, idx, cnt) in pending:
        m = float(m)
        n_finite += int(cnt)
        if m < best:
            best = m
            row, best_v = divmod(int(idx), n_all)
            best_p = s0 + row
    return best, best_p, best_v, float(base), n_finite
