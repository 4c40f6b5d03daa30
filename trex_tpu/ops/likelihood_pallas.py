"""Fused Pallas kernel for batched Felsenstein pruning likelihood.

Same design as the Sankoff kernel (``sankoff_pallas``): the whole partials
table lives in VMEM per (tree, site-block) tile; per ancestor the update is
two (Q x Q) x (Q x L) products done as Q full-tile FMA accumulations (the
multiply-add analogue of the min-plus accumulation), followed by per-site
max-rescaling with the log-scale accumulated in a scratch row.

Transition matrices are precomputed outside the kernel — (B, n_all, Qp, Qp),
one per branch, from JC69 or a GTR eigensystem — so the kernel itself is
model-agnostic. Padded state rows of P are zero and padded leaf partials are
zero, so padded states contribute nothing; padded *sites* are masked via a
per-block valid-site count in SMEM.

Forward-only (scores for candidate ranking); use the lax path
(``ops.likelihood``) when branch-length gradients are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trex_tpu.ops.likelihood import jc69_transition
from trex_tpu.topology import Topology

_LANES = 128
_SUBLANES_F32 = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _likelihood_kernel(
    children_ref,  # SMEM (T, n_anc, 2) int32
    prior_ref,  # SMEM (1, Q_pad) f32 — root prior (0 at padded states)
    seq_ref,  # VMEM (n_leaves, L_BLK) int32
    pmats_ref,  # VMEM (T, n_all * Q_pad, Q_pad) f32 — per-node P, row-padded 0
    weight_ref,  # VMEM (1, 8, L_BLK) f32 — row 0 = per-site weights (0 at pads)
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-block log-lik sums at [...,t,0,0]
    part_ref,  # VMEM scratch (T * n_all * Q_pad, L_BLK) f32 — partials
    ls_ref,  # VMEM scratch (T * 8, L_BLK) f32 — rows t*8 accumulate log-scales
    *,
    n_leaves: int,
    n_states: int,
    q_pad: int,
    trees: int,
    masks: bool,
    shared_pmats: bool = False,
):
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    l_blk = seq_ref.shape[-1]
    stride = n_all * q_pad

    state_iota = jax.lax.broadcasted_iota(jnp.int32, (q_pad, l_blk), 0)

    def init_leaf(i, _):
        observed = seq_ref[pl.ds(i, 1), :]
        if masks:
            # State-set bitmask tips: partial 1 at every allowed state.
            onehot = jnp.where((observed >> state_iota) & 1 == 1, 1.0, 0.0)
        else:
            # Negative states mean "missing" (ambiguous codon): all-ones
            # partial within the real states, matching tree_log_likelihood.
            onehot = jnp.where(
                (state_iota == observed)
                | ((observed < 0) & (state_iota < n_states)),
                1.0,
                0.0,
            )
        for t in range(trees):
            part_ref[pl.ds(t * stride + i * q_pad, q_pad), :] = onehot
        return 0

    jax.lax.fori_loop(0, n_leaves, init_leaf, 0, unroll=True)
    ls_ref[:, :] = jnp.zeros((trees * 8, l_blk), jnp.float32)

    def visit(a, _):
        for t in range(trees):
            c1 = children_ref[t, a, 0]
            c2 = children_ref[t, a, 1]
            base = t * stride

            def message(c):
                d = part_ref[pl.ds(base + c * q_pad, q_pad), :]
                if shared_pmats:
                    # One branch-length-shared P for ALL trees and nodes
                    # (the ranking regime): the pmats operand is a single
                    # (1, Q_pad, Q_pad) block.
                    p = pmats_ref[0, :, :]
                else:
                    p = pmats_ref[t, pl.ds(c * q_pad, q_pad), :]  # (Q_pad, Q_pad)
                acc = jnp.zeros((q_pad, l_blk), jnp.float32)
                for j in range(n_states):
                    col = p[:, j : j + 1]  # (Q_pad, 1) = P[:, j]
                    acc = acc + col * d[j : j + 1, :]
                return acc

            combined = message(c1) * message(c2)  # (Q_pad, L)
            scale = jnp.maximum(
                jnp.max(combined, axis=0, keepdims=True), 1e-30
            )  # (1, L)
            part_ref[pl.ds(base + (n_leaves + a) * q_pad, q_pad), :] = (
                combined / scale
            )
            ls_ref[pl.ds(t * 8, 1), :] = ls_ref[pl.ds(t * 8, 1), :] + jnp.log(
                scale
            )
        return 0

    jax.lax.fori_loop(0, n_anc, visit, 0)

    weights_row = weight_ref[0][0:1, :]  # (1, L_BLK); 0 at padded sites
    for t in range(trees):
        root = part_ref[
            pl.ds(t * stride + (n_all - 1) * q_pad, q_pad), :
        ]
        site_lik = jnp.zeros((1, l_blk), jnp.float32)
        for i in range(n_states):
            site_lik = site_lik + prior_ref[0, i] * root[i : i + 1, :]
        per_site = (
            jnp.log(jnp.maximum(site_lik, 1e-30)) + ls_ref[pl.ds(t * 8, 1), :]
        )
        out_ref[0, 0, t, :, :] = jnp.full(
            (8, 128), jnp.sum(per_site * weights_row), dtype=jnp.float32
        )


def _likelihood_kernel_slots(
    slots_ref,  # SMEM (T, 1, n_all) int32 — node -> storage slot
    prior_ref,  # SMEM (1, Q_pad) f32 — root prior (0 at padded states)
    seq_ref,  # VMEM (n_leaves, L_BLK) int32
    pmats_ref,  # VMEM — shared: (1, Q_pad, Q_pad); else (T, n_all*Q_pad, Q_pad)
    #             f32 per-node P reordered so slot s holds P of the node
    #             stored at s (the child P the parent's message needs)
    weight_ref,  # VMEM (1, 8, L_BLK) f32 — row 0 = per-site weights
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-block log-lik sums at [...,t,0,0]
    part_ref,  # VMEM scratch (T * n_all * Q_pad, L_BLK) f32 — slot-indexed
    *,
    n_leaves: int,
    n_states: int,
    q_pad: int,
    trees: int,
    masks: bool,
    shared_pmats: bool,
    unroll: int = 1,
):
    """Pruning recursion, parent-slot layout + power-of-two rescaling.

    Two measured bottlenecks of ``_likelihood_kernel`` removed:

    - per ancestor it issued 2 scattered dynamic-slice reads + 2 SMEM child
      indices + (non-shared) 2 scattered P reads; the parent-slot layout
      (``sankoff_pallas._parent_slot_layout``) makes both the partials pair
      and the P pair ONE contiguous read at an address linear in ``a``, plus
      a single SMEM scalar for the write slot;
    - the per-ancestor max-rescale cost a lane DIVIDE of the (Q_pad, L)
      tile and a transcendental ``log`` of the scale. Rescaling by the
      power of two 2^(e-127) (e = the max's biased exponent field) keeps
      partials in [2^-1, 2) at a cost of two bitcasts + shift + integer
      add, the divide becomes a multiply by the exact inverse (both powers
      of two: no rounding), and the log-scale accumulator collapses to an
      int32 exponent sum carried in registers — one ``ln 2 *`` fixup at the
      end. Stochastic-matrix rows keep messages <= max(d) < 2, so combined
      < 4 and the biased exponent never overflows its field.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    l_blk = seq_ref.shape[-1]
    stride = n_all * q_pad

    state_iota = jax.lax.broadcasted_iota(jnp.int32, (q_pad, l_blk), 0)

    for i in range(n_leaves):
        observed = seq_ref[pl.ds(i, 1), :]
        if masks:
            onehot = jnp.where((observed >> state_iota) & 1 == 1, 1.0, 0.0)
        else:
            onehot = jnp.where(
                (state_iota == observed)
                | ((observed < 0) & (state_iota < n_states)),
                1.0,
                0.0,
            )
        for t in range(trees):
            s = slots_ref[t, 0, i]
            part_ref[pl.ds(t * stride + s * q_pad, q_pad), :] = onehot

    if shared_pmats:
        p_shared = pmats_ref[0, :, :]
        shared_cols = [p_shared[:, j : j + 1] for j in range(n_states)]

    def msg(d, cols):
        acc = cols[0] * d[0:1, :]
        for j in range(1, n_states):
            acc = acc + cols[j] * d[j : j + 1, :]
        return acc

    def visit(a, exp_sums):
        new_sums = []
        for t in range(trees):
            base = t * stride
            d12 = part_ref[pl.ds(base + 2 * a * q_pad, 2 * q_pad), :]
            if shared_pmats:
                cols1 = cols2 = shared_cols
            else:
                p12 = pmats_ref[t, pl.ds(2 * a * q_pad, 2 * q_pad), :]
                cols1 = [p12[:q_pad, j : j + 1] for j in range(n_states)]
                cols2 = [p12[q_pad:, j : j + 1] for j in range(n_states)]
            combined = msg(d12[:q_pad], cols1) * msg(d12[q_pad:], cols2)
            m = jnp.max(combined, axis=0, keepdims=True)  # (1, L)
            e = jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(m, jnp.int32), 23
            )  # biased exponent; m >= 0 so no sign bit
            inv = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(254 - e, 23), jnp.float32
            )  # exact 2^(127 - (e - 127)); 0 stays 0 harmlessly
            w = slots_ref[t, 0, n_leaves + a]
            part_ref[pl.ds(base + w * q_pad, q_pad), :] = combined * inv
            new_sums.append(exp_sums[t] + (e - 127))
        return tuple(new_sums)

    exp_sums = jax.lax.fori_loop(
        0,
        n_anc,
        visit,
        tuple(jnp.zeros((1, l_blk), jnp.int32) for _ in range(trees)),
        unroll=unroll,
    )

    ln2 = jnp.float32(0.6931471805599453)
    weights_row = weight_ref[0][0:1, :]  # (1, L_BLK); 0 at padded sites
    for t in range(trees):
        root = part_ref[
            pl.ds(t * stride + 2 * n_anc * q_pad, q_pad), :
        ]
        site_lik = prior_ref[0, 0] * root[0:1, :]
        for i in range(1, n_states):
            site_lik = site_lik + prior_ref[0, i] * root[i : i + 1, :]
        per_site = (
            jnp.log(jnp.maximum(site_lik, 1e-30))
            + exp_sums[t].astype(jnp.float32) * ln2
        )
        out_ref[0, 0, t, :, :] = jnp.full(
            (8, 128), jnp.sum(per_site * weights_row), dtype=jnp.float32
        )


def _likelihood_kernel_lanes(
    slots_ref,  # SMEM (T, 1, n_all) int32 — node -> storage slot
    prior_ref,  # SMEM (1, Q_pad) f32 — root prior (0 at padded states)
    seq_ref,  # VMEM (n_leaves, L_BLK) int32
    pmats_ref,  # VMEM (1, Q_pad, Q_pad) f32 — ONE shared P (ranking regime)
    weight_ref,  # VMEM (1, 8, L_BLK) f32 — row 0 = per-site weights
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-block log-lik sums at [...,t,0,0]
    part_ref,  # VMEM scratch (n_all * Q_pad, T * L_BLK) f32 — slot rows,
    #            tree t in lanes [t*L_BLK, (t+1)*L_BLK)
    *,
    n_leaves: int,
    n_states: int,
    q_pad: int,
    trees: int,
    masks: bool,
    unroll: int = 1,
    rescale_every: int = 1,
):
    """Pruning recursion with T trees side-by-side in the LANE dimension.

    The ``slots`` kernel unrolls T independent trees inside each ancestor
    step to hide operand latency, but every per-tree body re-issues its own
    dynamic-address read, Q-FMA message chain, rescale chain, and write —
    the instruction count grows linearly in T while the (8,128)-register
    lane work per instruction stays the same. The parent-slot layout makes
    the per-ancestor READ address ``2a * q_pad`` tree-independent, so
    storing tree t's partials in lanes ``[t*L, (t+1)*L)`` of one wide
    buffer turns the whole step into single wide-tile ops:

    - ONE contiguous (2*Q_pad, T*L) read serves every tree;
    - the Q broadcast-FMA messages, the combine multiply, the max-rescale,
      and the int32 exponent bookkeeping all issue once on (Q_pad, T*L)
      tiles (the exponent sums ride ONE (1, T*L) carry);
    - only the result write stays per-tree (T dynamic-sublane writes of
      (Q_pad, L) lane slices — each tree's parent reads a different slot).

    ``rescale_every=k`` rescales only every k-th ancestor step: partials
    stay exact f32 between rescales and the per-site max shrinks by at
    most ~2*log2(1/P_min) bits per step, so small k keeps far clear of the
    f32 underflow floor while dropping most of the per-step max-reduce +
    exponent chain (see batched_log_likelihood_pallas for the guard).
    Shared-P only: per-branch P matrices would need per-tree matrices per
    step, defeating the wide-op point.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    l_blk = seq_ref.shape[-1]
    wide = trees * l_blk

    state_iota = jax.lax.broadcasted_iota(jnp.int32, (q_pad, l_blk), 0)

    for i in range(n_leaves):
        observed = seq_ref[pl.ds(i, 1), :]
        if masks:
            onehot = jnp.where((observed >> state_iota) & 1 == 1, 1.0, 0.0)
        else:
            onehot = jnp.where(
                (state_iota == observed)
                | ((observed < 0) & (state_iota < n_states)),
                1.0,
                0.0,
            )
        for t in range(trees):
            s = slots_ref[t, 0, i]
            part_ref[pl.ds(s * q_pad, q_pad), t * l_blk : (t + 1) * l_blk] = (
                onehot
            )

    p_shared = pmats_ref[0, :, :]
    cols = [p_shared[:, j : j + 1] for j in range(n_states)]

    def visit(a, exp_sum):
        d12 = part_ref[pl.ds(2 * a * q_pad, 2 * q_pad), :]  # (2Qp, T*L)
        acc1 = cols[0] * d12[0:1, :]
        acc2 = cols[0] * d12[q_pad : q_pad + 1, :]
        for j in range(1, n_states):
            acc1 = acc1 + cols[j] * d12[j : j + 1, :]
            acc2 = acc2 + cols[j] * d12[q_pad + j : q_pad + j + 1, :]
        combined = acc1 * acc2  # (Q_pad, T*L)
        if rescale_every == 1 or (a + 1) % rescale_every == 0 or (
            a == n_anc - 1
        ):
            m = jnp.max(combined, axis=0, keepdims=True)  # (1, T*L)
            e = jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(m, jnp.int32), 23
            )
            inv = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(254 - e, 23), jnp.float32
            )
            combined = combined * inv
            exp_sum = exp_sum + (e - 127)
        for t in range(trees):
            w = slots_ref[t, 0, n_leaves + a]
            part_ref[
                pl.ds(w * q_pad, q_pad), t * l_blk : (t + 1) * l_blk
            ] = combined[:, t * l_blk : (t + 1) * l_blk]
        return exp_sum

    if rescale_every == 1:
        exp_sum = jax.lax.fori_loop(
            0, n_anc, visit, jnp.zeros((1, wide), jnp.int32), unroll=unroll
        )
    else:
        # The rescale predicate depends on the (static) step index, so the
        # loop must be fully unrolled for it to stay compile-time.
        exp_sum = jnp.zeros((1, wide), jnp.int32)
        for a in range(n_anc):
            exp_sum = visit(a, exp_sum)

    ln2 = jnp.float32(0.6931471805599453)
    weights_row = weight_ref[0][0:1, :]  # (1, L_BLK); 0 at padded sites
    root = part_ref[pl.ds(2 * n_anc * q_pad, q_pad), :]  # (Qp, T*L)
    site_lik = prior_ref[0, 0] * root[0:1, :]
    for i in range(1, n_states):
        site_lik = site_lik + prior_ref[0, i] * root[i : i + 1, :]
    per_site = (
        jnp.log(jnp.maximum(site_lik, 1e-30))
        + exp_sum.astype(jnp.float32) * ln2
    )  # (1, T*L)
    for t in range(trees):
        total = jnp.sum(
            per_site[:, t * l_blk : (t + 1) * l_blk] * weights_row
        )
        out_ref[0, 0, t, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


def _likelihood_kernel_mxu(
    slots_ref,  # SMEM (T, 1, n_all) int32 — node -> storage slot
    prior_ref,  # SMEM (1, Q_pad) f32 — root prior (0 at padded states)
    seq_ref,  # VMEM (n_leaves, L_BLK) int32
    pmats_ref,  # VMEM — shared: (1, 2*Q_pad, 2*Q_pad) block-diagonal pair P;
    #             else (T, n_anc * 2*Q_pad, 2*Q_pad), pair a holding the
    #             block-diag of the Ps of the children stored at slots
    #             2a and 2a+1.
    weight_ref,  # VMEM (1, 8, L_BLK) f32 — row 0 = per-site weights
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-block log-lik sums at [...,t,0,0]
    part_ref,  # VMEM scratch (T * n_all * Q_pad, L_BLK) f32 — slot-indexed
    *,
    n_leaves: int,
    n_states: int,
    q_pad: int,
    trees: int,
    masks: bool,
    shared_pmats: bool,
):
    """Pruning recursion with the message matmuls on the MXU.

    ``_likelihood_kernel_slots`` is VPU-issue-bound: per ancestor step the
    two child messages cost 2 x Q broadcast-FMA ops on (Q_pad, L) tiles and
    the max-rescale chain another ~1/3 of the issues, while the MXU sits
    idle (min-plus can't use it, but the pruning recursion is literally a
    matmul). This kernel moves both per-step reductions there:

    - both children's messages come from ONE ``dot_general`` with the
      block-diagonal pair matrix diag(P_c1, P_c2): (2Q_pad, 2Q_pad) @
      (2Q_pad, L) -> (2Q_pad, L), top half = P_c1 @ d_c1, bottom half =
      P_c2 @ d_c2. ``Precision.HIGHEST`` keeps f32-grade mantissas (the
      bf16 default shifts total lnL by whole units — speed_of_light.md
      "Matmul precision");
    - the rescale factor derives from the per-site STATE SUM (a (1, Q_pad)
      ones-row matmul) instead of a VPU sublane max-reduce. sum is within
      [max, Q*max], so the extracted power-of-two exponent differs from
      the max-based one by <= 2 bits — normalized partials live in
      [2^-3, 2) instead of [2^-1, 2), which changes nothing downstream
      (the exponent is recorded exactly, the upper bound stays < 4).

    Numerics match ``slots`` (power-of-two rescaling, one final log);
    scores differ from it only by f32 reduction order inside the matmul.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    l_blk = seq_ref.shape[-1]
    stride = n_all * q_pad

    state_iota = jax.lax.broadcasted_iota(jnp.int32, (q_pad, l_blk), 0)

    for i in range(n_leaves):
        observed = seq_ref[pl.ds(i, 1), :]
        if masks:
            onehot = jnp.where((observed >> state_iota) & 1 == 1, 1.0, 0.0)
        else:
            onehot = jnp.where(
                (state_iota == observed)
                | ((observed < 0) & (state_iota < n_states)),
                1.0,
                0.0,
            )
        for t in range(trees):
            s = slots_ref[t, 0, i]
            part_ref[pl.ds(t * stride + s * q_pad, q_pad), :] = onehot

    if shared_pmats:
        pbd_shared = pmats_ref[0, :, :]
    ones_row = jnp.ones((1, q_pad), jnp.float32)
    dims = (((1,), (0,)), ((), ()))

    def visit(a, exp_sums):
        new_sums = []
        for t in range(trees):
            base = t * stride
            d12 = part_ref[pl.ds(base + 2 * a * q_pad, 2 * q_pad), :]
            if shared_pmats:
                pbd = pbd_shared
            else:
                pbd = pmats_ref[t, pl.ds(a * 2 * q_pad, 2 * q_pad), :]
            mp = jax.lax.dot_general(
                pbd, d12, dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (2*Q_pad, L): both messages
            combined = mp[:q_pad, :] * mp[q_pad:, :]
            s = jax.lax.dot_general(
                ones_row, combined, dims,
                preferred_element_type=jnp.float32,
            )  # (1, L) state sum >= max > 0 (padded rows are exact 0)
            bits = jax.lax.bitcast_convert_type(s, jnp.int32)
            e = jax.lax.shift_right_logical(bits, 23)
            inv = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(254 - e, 23), jnp.float32
            )  # exact 2^(127 - (e - 127)); s == 0 stays 0 harmlessly
            w = slots_ref[t, 0, n_leaves + a]
            part_ref[pl.ds(base + w * q_pad, q_pad), :] = combined * inv
            new_sums.append(exp_sums[t] + (e - 127))
        return tuple(new_sums)

    exp_sums = jax.lax.fori_loop(
        0,
        n_anc,
        visit,
        tuple(jnp.zeros((1, l_blk), jnp.int32) for _ in range(trees)),
    )

    ln2 = jnp.float32(0.6931471805599453)
    weights_row = weight_ref[0][0:1, :]  # (1, L_BLK); 0 at padded sites
    for t in range(trees):
        root = part_ref[
            pl.ds(t * stride + 2 * n_anc * q_pad, q_pad), :
        ]
        site_lik = prior_ref[0, 0] * root[0:1, :]
        for i in range(1, n_states):
            site_lik = site_lik + prior_ref[0, i] * root[i : i + 1, :]
        per_site = (
            jnp.log(jnp.maximum(site_lik, 1e-30))
            + exp_sums[t].astype(jnp.float32) * ln2
        )
        out_ref[0, 0, t, :, :] = jnp.full(
            (8, 128), jnp.sum(per_site * weights_row), dtype=jnp.float32
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_states", "site_block", "interpret", "trees_per_block",
        "sequences_are_masks", "layout", "vmem_budget_mb", "unroll",
        "rescale_every",
    ),
)
def batched_log_likelihood_pallas(
    topologies: Topology,
    branch_lengths: jax.Array,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    transition_matrices: jax.Array | None = None,
    shared_transition: jax.Array | None = None,
    root_prior: jax.Array | None = None,
    site_weights: jax.Array | None = None,
    site_block: int | None = None,
    interpret: bool = False,
    trees_per_block: int = 1,
    sequences_are_masks: bool = False,
    layout: str = "slots",
    vmem_budget_mb: int | None = None,
    unroll: int | None = None,
    rescale_every: int = 1,
) -> jax.Array:
    """(B,) log-likelihoods of a candidate batch via the fused kernel.

    Args:
        branch_lengths: (B, n_all) per-tree per-node lengths (JC69 unless
            ``transition_matrices`` is given).
        transition_matrices: optional precomputed (B, n_all, Q, Q) P-matrices
            (e.g. from a GTR eigensystem); overrides ``branch_lengths``.
        shared_transition: optional single (Q, Q) P shared by EVERY branch
            of EVERY tree — the fixed-ranking-length regime. Skips the
            (B, n_all, Q, Q) materialization entirely (a ~19 ms fixed
            per-call overhead at B=1024 that dominated the 11 ms kernel);
            overrides both length-derived and per-tree matrices.
        root_prior: (Q,) stationary distribution; uniform when None.
        site_weights: optional (L,) multiplicities for the per-site log-liks
            (compressed site patterns / bootstrap); padded sites weigh 0.
        sequences_are_masks: leaves are int32 state-set bitmasks (IUPAC
            ambiguity / gaps); tip partials are 1 at every allowed state.
        layout: "slots" (default) stores each node's partials where its
            parent reads them — one contiguous pair read per ancestor and
            power-of-two exponent rescaling (``_likelihood_kernel_slots``).
            Chosen as default for NUMERICS: one final ``log`` instead of
            n_anc approximate TPU logs makes it ~13x closer to an f64
            oracle (max err 0.058 vs 0.77 lnL at 64 taxa x 1024 sites,
            B=64) — ranking-relevant. "lanes" packs T trees side by side
            in the lane dimension against one shared P (the ranking
            regime's fast path; same power-of-two numerics). "nodes" is
            the original node-indexed kernel, kept as the A/B baseline;
            "mxu" routes messages through block-diag matmuls (measured 4x
            SLOWER — MXU pipeline latency on a dependent chain; kept as
            the recorded negative result). Round-3 interleaved A/B at 64
            taxa x 1k, B=1024, shared-P: lanes-T4-re4 196k trees/s >
            slots-T2-unroll 173k > slots-T2 126k > nodes-T2 116k > mxu
            44k; see benchmarks/speed_of_light.md "Pruning kernel".
        unroll: ancestor-loop unroll factor (-1 = full). Full unroll
            measured +37% on "slots" (the dependent chain exposes no ILP
            without it); "lanes" with rescale_every > 1 is always fully
            unrolled (static rescale predicate).
        rescale_every: rescale every k-th ancestor step (lanes only;
            1 <= k <= 4). Between rescales the combine step squares the
            magnitude, so k=4 bounds exponents to ~2^4 extra bits — safe
            in f32 — while dropping most of the per-step max/exponent
            chain (measured +6% over k=1). CAVEAT: the ~1-bit-per-step
            shrink estimate assumes a moderate shared transition (all
            entries >= ~1e-2, i.e. branch lengths >= ~0.01 under JC69).
            A near-singular P (very short branch: off-diagonals ~t/Q)
            shrinks conflicting sites by ~2*log2(1/P_min) bits per step
            and the compounding can underflow partials to 0 between
            rescales, clamping their log at -69 and silently corrupting
            lnL. Use rescale_every=1 (or the slots layout, which tracks
            exponents exactly) when min(shared_transition) < 1e-3.
    """
    batch = topologies.children.shape[0]
    n_anc = topologies.children.shape[-2]
    n_leaves = n_anc + 1
    if unroll is None:
        # Full unroll measured +37% (slots, 64 taxa); compile time scales
        # with T * n_anc, so follow the Fitch dispatch policy and unroll
        # fully only for small trees.
        unroll = -1 if n_anc <= 64 else 1
    n_all = 2 * n_leaves - 1
    length = leaf_sequences.shape[-1]
    q = n_states
    q_pad = _round_up(q, _SUBLANES_F32)

    trees = max(trees_per_block, 1)
    if vmem_budget_mb is None:
        # 8 MB was tuned for the FMA kernels; the mxu kernel wants bigger
        # site blocks (fewer grid instances amortize the per-block leaf
        # init) and v5e has 128 MB of VMEM to spend.
        vmem_budget_mb = 48 if layout in ("mxu", "lanes") else 8
    if site_block is None:
        site_block = _round_up(length, _LANES) if length <= 2048 else 2048
        # Keep T partial tables within a VMEM budget; blocks must stay
        # 128-lane-aligned (Mosaic rejects e.g. 1408 -> 704 = 5.5 x 128).
        while (
            trees * n_all * q_pad * site_block * 4
            > vmem_budget_mb * 1024 * 1024
            and site_block > _LANES
        ):
            site_block = _round_up(site_block // 2, _LANES)
        # The lanes kernel's wide buffers are (rows, trees * site_block);
        # Mosaic fails to compile past 2048 lanes (measured: T4 x 1024
        # dies in the compile helper, T4 x 512 runs), so cap the product.
        while layout == "lanes" and trees * site_block > 2048:
            if site_block == _LANES:
                raise ValueError(
                    f"layout='lanes' supports trees_per_block <= "
                    f"{2048 // _LANES}, got {trees}"
                )
            site_block = _round_up(site_block // 2, _LANES)
    if layout == "lanes" and trees * site_block > 2048:
        # Also guards caller-supplied site_block: past 2048 lanes Mosaic
        # fails with an opaque compile error, not this ValueError.
        raise ValueError(
            f"layout='lanes' needs trees_per_block * site_block <= 2048 "
            f"(Mosaic trailing-dim cap), got {trees} * {site_block} = "
            f"{trees * site_block}"
        )
    padded_len = _round_up(length, site_block)
    seqs = leaf_sequences.astype(jnp.int32)
    if padded_len != length:
        # Padded sites carry weight 0; pad with a nonempty mask (1) in mask
        # mode to keep partials sane.
        seqs = jnp.pad(
            seqs, ((0, 0), (0, padded_len - length)),
            constant_values=1 if sequences_are_masks else 0,
        )
    n_blocks = padded_len // site_block
    if site_weights is None:
        weights = jnp.ones((length,), jnp.float32)
    else:
        weights = site_weights.astype(jnp.float32)
    weights = jnp.pad(weights, (0, padded_len - length))
    # Row 0 carries the weights; rows 1..7 pad the f32 tile.
    weights_tiled = jnp.zeros((n_blocks, 8, site_block), jnp.float32)
    weights_tiled = weights_tiled.at[:, 0, :].set(
        weights.reshape(n_blocks, site_block)
    )

    shared = shared_transition is not None

    if root_prior is None:
        root_prior = jnp.full((q,), 1.0 / q)
    prior = jnp.zeros((1, q_pad), jnp.float32).at[0, :q].set(
        root_prior.astype(jnp.float32)
    )

    children = topologies.children.astype(jnp.int32)
    padded_batch = _round_up(batch, trees)
    if padded_batch != batch:
        reps = padded_batch - batch
        children = jnp.concatenate(
            [children, jnp.broadcast_to(children[-1:], (reps, n_anc, 2))]
        )

    def _pad_batch(x):
        if padded_batch == batch:
            return x
        reps = padded_batch - batch
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (reps,) + x.shape[1:])]
        )

    if layout == "lanes" and not shared:
        raise ValueError(
            "layout='lanes' packs trees into lanes against ONE shared P; "
            "use 'slots' for per-branch transition matrices"
        )
    if not 1 <= rescale_every <= 4:
        # Between rescales ``combined = m1 * m2`` SQUARES the magnitude, so
        # the exponent doubles per unrescaled step: after k steps partials
        # reach ~2^(±2^k). k=4 keeps |exponent| <= ~32 (safe in f32);
        # k=8 overflows/underflows outright (measured: total-lnL error 5e4).
        raise ValueError(f"rescale_every must be in [1, 4], got {rescale_every}")
    node_of_slot = None
    if layout in ("slots", "mxu", "lanes"):
        from trex_tpu.ops.sankoff_pallas import _parent_slot_layout

        slots3 = _parent_slot_layout(children)  # (padded_B, n_all)
        slots = slots3[:, None, :]  # (B, 1, n_all)
        if not shared:
            # Inverse permutation (slot -> node) so per-node data can be
            # GATHERED into the slot order the kernel reads. Scattering the
            # (B, n_all, Q, Q) P tensor instead measured 2.5x slower
            # end-to-end at B=1024 (XLA scatters serialize).
            rows = jnp.arange(padded_batch)[:, None]
            node_of_slot = (
                jnp.zeros((padded_batch, n_all), jnp.int32)
                .at[rows, slots3]
                .set(
                    jnp.broadcast_to(
                        jnp.arange(n_all, dtype=jnp.int32),
                        (padded_batch, n_all),
                    )
                )
            )

    if shared:
        if layout == "mxu":
            # Block-diagonal pair matrix diag(P, P): one dot computes both
            # children's messages.
            qp2 = 2 * q_pad
            p32 = shared_transition.astype(jnp.float32)
            pmats = (
                jnp.zeros((1, qp2, qp2), jnp.float32)
                .at[0, :q, :q].set(p32)
                .at[0, q_pad : q_pad + q, q_pad : q_pad + q].set(p32)
            )
        else:
            # Single (Q, Q) matrix for every branch: one padded block total.
            pmats = jnp.zeros((1, q_pad, q_pad), jnp.float32)
            pmats = pmats.at[0, :q, :q].set(
                shared_transition.astype(jnp.float32)
            )
    else:
        if transition_matrices is None:
            # Per-branch JC69: permute the (B, n_all) LENGTHS into slot
            # order first (tiny gather), then build P directly in the order
            # the kernel reads — the big P tensor is never reordered.
            bl = _pad_batch(branch_lengths)
            if node_of_slot is not None:
                bl = jnp.take_along_axis(bl, node_of_slot, axis=1)
            tm = jax.vmap(jax.vmap(lambda t: jc69_transition(t, q)))(bl)
        else:
            tm = _pad_batch(transition_matrices)
            if node_of_slot is not None:
                tm = tm[jnp.arange(padded_batch)[:, None], node_of_slot]
        if layout == "mxu":
            # Per-ancestor block-diag of the slot-pair children's Ps:
            # slot 2a top-left, slot 2a+1 bottom-right. Padded rows stay 0.
            qp2 = 2 * q_pad
            tm32 = tm.astype(jnp.float32)
            pbd = jnp.zeros((padded_batch, n_anc, qp2, qp2), jnp.float32)
            pbd = pbd.at[:, :, :q, :q].set(tm32[:, 0 : 2 * n_anc : 2])
            pbd = pbd.at[
                :, :, q_pad : q_pad + q, q_pad : q_pad + q
            ].set(tm32[:, 1 : 2 * n_anc : 2])
            pmats = pbd.reshape(padded_batch, n_anc * qp2, qp2)
        else:
            # Pad states; padded rows stay 0 so padded parent states give 0.
            pmats = jnp.zeros(
                (padded_batch, n_all, q_pad, q_pad), jnp.float32
            )
            pmats = pmats.at[:, :, :q, :q].set(tm.astype(jnp.float32))
            pmats = pmats.reshape(padded_batch, n_all * q_pad, q_pad)

    if layout == "mxu":
        qp2 = 2 * q_pad
        kernel = functools.partial(
            _likelihood_kernel_mxu,
            n_leaves=n_leaves,
            n_states=q,
            q_pad=q_pad,
            trees=trees,
            masks=sequences_are_masks,
            shared_pmats=shared,
        )
        block_ll = pl.pallas_call(
            kernel,
            grid=(padded_batch // trees, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (trees, 1, n_all), lambda b, l: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, q_pad), lambda b, l: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((n_leaves, site_block), lambda b, l: (0, l)),
                (
                    pl.BlockSpec((1, qp2, qp2), lambda b, l: (0, 0, 0))
                    if shared
                    else pl.BlockSpec(
                        (trees, n_anc * qp2, qp2), lambda b, l: (b, 0, 0)
                    )
                ),
                pl.BlockSpec((1, 8, site_block), lambda b, l: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (trees * n_all * q_pad, site_block), jnp.float32
                ),
            ],
            interpret=interpret,
        )(slots, prior, seqs, pmats, weights_tiled)
        scores = jnp.sum(block_ll[:, :, :, 0, 0], axis=1)  # (B//T, T)
        return scores.reshape(padded_batch)[:batch]
    if layout == "lanes":
        kernel = functools.partial(
            _likelihood_kernel_lanes,
            n_leaves=n_leaves,
            n_states=q,
            q_pad=q_pad,
            trees=trees,
            masks=sequences_are_masks,
            unroll=n_anc if unroll == -1 else unroll,
            rescale_every=rescale_every,
        )
        block_ll = pl.pallas_call(
            kernel,
            grid=(padded_batch // trees, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (trees, 1, n_all), lambda b, l: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, q_pad), lambda b, l: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((n_leaves, site_block), lambda b, l: (0, l)),
                pl.BlockSpec((1, q_pad, q_pad), lambda b, l: (0, 0, 0)),
                pl.BlockSpec((1, 8, site_block), lambda b, l: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (n_all * q_pad, trees * site_block), jnp.float32
                ),
            ],
            interpret=interpret,
        )(slots, prior, seqs, pmats, weights_tiled)
        scores = jnp.sum(block_ll[:, :, :, 0, 0], axis=1)  # (B//T, T)
        return scores.reshape(padded_batch)[:batch]
    if layout == "slots":
        kernel = functools.partial(
            _likelihood_kernel_slots,
            n_leaves=n_leaves,
            n_states=q,
            q_pad=q_pad,
            trees=trees,
            masks=sequences_are_masks,
            shared_pmats=shared,
            unroll=n_anc if unroll == -1 else unroll,
        )
        block_ll = pl.pallas_call(
            kernel,
            grid=(padded_batch // trees, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (trees, 1, n_all), lambda b, l: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, q_pad), lambda b, l: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((n_leaves, site_block), lambda b, l: (0, l)),
                (
                    pl.BlockSpec((1, q_pad, q_pad), lambda b, l: (0, 0, 0))
                    if shared
                    else pl.BlockSpec(
                        (trees, n_all * q_pad, q_pad), lambda b, l: (b, 0, 0)
                    )
                ),
                pl.BlockSpec((1, 8, site_block), lambda b, l: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (trees * n_all * q_pad, site_block), jnp.float32
                ),
            ],
            interpret=interpret,
        )(slots, prior, seqs, pmats, weights_tiled)
        scores = jnp.sum(block_ll[:, :, :, 0, 0], axis=1)  # (B//T, T)
        return scores.reshape(padded_batch)[:batch]
    if layout != "nodes":
        raise ValueError(
            f"layout must be 'nodes', 'slots' or 'mxu', got {layout!r}"
        )
    kernel = functools.partial(
        _likelihood_kernel,
        n_leaves=n_leaves,
        n_states=q,
        q_pad=q_pad,
        trees=trees,
        masks=sequences_are_masks,
        shared_pmats=shared,
    )
    block_ll = pl.pallas_call(
        kernel,
        grid=(padded_batch // trees, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (trees, n_anc, 2), lambda b, l: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, q_pad), lambda b, l: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((n_leaves, site_block), lambda b, l: (0, l)),
            (
                pl.BlockSpec(
                    (1, q_pad, q_pad), lambda b, l: (0, 0, 0)
                )
                if shared
                else pl.BlockSpec(
                    (trees, n_all * q_pad, q_pad), lambda b, l: (b, 0, 0)
                )
            ),
            pl.BlockSpec((1, 8, site_block), lambda b, l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((trees * n_all * q_pad, site_block), jnp.float32),
            pltpu.VMEM((trees * 8, site_block), jnp.float32),
        ],
        interpret=interpret,
    )(children, prior, seqs, pmats, weights_tiled)
    scores = jnp.sum(block_ll[:, :, :, 0, 0], axis=1)  # (B//T, T)
    return scores.reshape(padded_batch)[:batch]
