"""Fused Pallas TPU kernel for batched Sankoff scoring.

The tree-search hot path: score B candidate topologies against one alignment.
The lax formulation (``ops/sankoff.py``) round-trips the (n_all, Q, L) DP
table through HBM on every ancestor step; this kernel keeps the entire DP
resident in VMEM per (tree, site-block) tile, so HBM traffic collapses to
"leaf sequences in, per-site root minima out".

Layout / schedule:
  - grid = (B, L // L_BLK); one kernel instance owns one tree x site-block.
  - DP scratch: (n_all * Q_pad, L_BLK) f32 in VMEM — states padded to the
    8-sublane f32 tile, sites on the 128-wide lanes.
  - child indices: (1, n_anc, 2) int32 block in SMEM (per-tree slice of the
    topology batch); read as scalars inside the ancestor loop.
  - min-plus inner product per ancestor on the VPU. Two paths:
      * general (Q_real x Q_real) cost: unrolled per parent state,
        ``min(costT[:, s] + child_dp)`` — O(Q^2) per node;
      * Hamming closed form (cost = ones - eye):
        ``msg = min(d, 1 + min_s d)`` — O(Q) per node. Padded states carry
        BIG_COST through leaf init, and under the closed form a padded row
        can exceed the true minimum by at most +1 per child, never below the
        best real row, so root minima are exact (proof in ``_hamming_msg``).

Numerics match the lax oracle bit-for-bit: f32, 1e5 sentinel, per-site min
at the root then site-sum outside the kernel (same reduction order as the
reference, ``/root/reference/src/trex/sankoff.py:187``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trex_tpu.topology import Topology
from trex_tpu.types import BIG_COST

_LANES = 128
_SUBLANES_F32 = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hamming_msg(child_dp: jax.Array) -> jax.Array:
    """Closed-form Hamming min-plus message.

    msg[s] = min_{s'} (C[s,s'] + d[s']) with C = ones - eye
           = min(d[s], 1 + min_{s'} d[s']).
    Padded state rows hold values >= the row minimum, so min over all rows
    (including padded) equals the min over real rows; a padded row's message
    (1 + min) never undercuts the best real row of the *parent* either, since
    the parent's best real row is <= (sum of per-child row minima) + 1.
    """
    return jnp.minimum(child_dp, 1.0 + jnp.min(child_dp, axis=0, keepdims=True))


def _sankoff_kernel(
    children_ref,  # SMEM (1, n_anc, 2) int32
    seq_ref,  # VMEM (n_leaves, L_BLK) int32
    cost_t_ref,  # VMEM (Q_pad, Q_pad) f32 cost[parent, child], BIG at pads
    weight_ref,  # VMEM (1, 8, L_BLK) f32 — row 0 = per-site weights
    out_ref,  # VMEM (1, 1, 8, 128) f32 tile; partial score lands in [0,0,0,0]
    dp_ref,  # VMEM scratch (n_all * Q_pad, L_BLK) f32
    *,
    n_leaves: int,
    n_states: int,
    q_pad: int,
    hamming: bool,
):
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    l_blk = seq_ref.shape[-1]

    # Leaf initialization: 0 at the observed state, BIG elsewhere. One
    # (Q_pad, L_BLK) compare per leaf against a state iota on the sublanes.
    state_iota = jax.lax.broadcasted_iota(jnp.int32, (q_pad, l_blk), 0)

    def init_leaf(i, _):
        observed = seq_ref[pl.ds(i, 1), :]  # (1, L_BLK)
        dp_ref[pl.ds(i * q_pad, q_pad), :] = jnp.where(
            state_iota == observed, 0.0, BIG_COST
        )
        return 0

    jax.lax.fori_loop(0, n_leaves, init_leaf, 0, unroll=True)

    # Ancestor recursion: dp[parent] = sum over children of min-plus message.
    def visit(a, _):
        c1 = children_ref[0, a, 0]
        c2 = children_ref[0, a, 1]
        d1 = dp_ref[pl.ds(c1 * q_pad, q_pad), :]
        d2 = dp_ref[pl.ds(c2 * q_pad, q_pad), :]
        if hamming:
            total = _hamming_msg(d1) + _hamming_msg(d2)
        else:
            # General cost, accumulated over child states s' with full-tile
            # ops (no cross-sublane reductions):
            #   msg[s, :] = min_{s'} (C[s, s'] + d[s', :])
            # where C[:, s'] rides the sublanes and d[s', :] broadcasts.
            def msg(d):
                acc = jnp.full((q_pad, l_blk), BIG_COST, jnp.float32)
                for sp in range(n_states):
                    col = cost_t_ref[:, pl.ds(sp, 1)]  # (Q_pad, 1) = C[:, sp]
                    acc = jnp.minimum(acc, col + d[sp : sp + 1, :])
                return acc

            total = msg(d1) + msg(d2)
        dp_ref[pl.ds((n_leaves + a) * q_pad, q_pad), :] = total
        return 0

    jax.lax.fori_loop(0, n_anc, visit, 0)

    root_dp = dp_ref[pl.ds((n_all - 1) * q_pad, q_pad), :]
    # Per-site minima, weighted (weights are 1.0 by default, 0 at padding).
    weights_row = weight_ref[0][0:1, :]  # (1, L_BLK)
    per_site = jnp.min(root_dp, axis=0, keepdims=True) * weights_row
    # Mosaic requires (8,128)-divisible (or full-dim) trailing block dims, so
    # the per-tile scalar ships inside an (8,128) tile at [0, 0].
    out_ref[0, 0, :, :] = jnp.full((8, 128), jnp.sum(per_site), dtype=jnp.float32)


def _fitch_kernel_multi(
    children_ref,  # SMEM (T, n_anc, 2) int32
    leaf_ref,  # VMEM (1, n_leaves * P, 128) int32 — packed leaf bitmasks
    weight_ref,  # VMEM (1, P, 128) f32 — per-site weights (packed like leaves)
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-tree counts at [...,t,0,0]
    sets_ref,  # VMEM scratch (T * n_all * P, 128) int32
    count_ref,  # VMEM scratch (T * P, 128) f32
    *,
    n_leaves: int,
    pack: int,
    trees: int,
    unroll: int,
):
    """Fitch recursion over T trees per instance, with per-site weights.

    The ancestor loop is the serial dependency chain; interleaving T
    independent trees inside each ancestor step gives the VPU latency-hiding
    work between dependent (8,128) tile reads/writes, and the leaf-mask tile
    is loaded once for all T trees. Per-site weights make compressed site
    patterns (``trex_tpu.alignment.compress_alignment``) and bootstrap
    reweighting first-class at kernel speed: each union event adds the
    site's weight instead of 1.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    stride = n_all * pack

    leaf_block = leaf_ref[0]
    for t in range(trees):
        sets_ref[pl.ds(t * stride, n_leaves * pack), :] = leaf_block
    count_ref[:, :] = jnp.zeros((trees * pack, 128), jnp.float32)
    weights = weight_ref[0]  # (P, 128)

    def visit(a, _):
        for t in range(trees):
            c1 = children_ref[t, a, 0]
            c2 = children_ref[t, a, 1]
            base = t * stride
            d1 = sets_ref[pl.ds(base + c1 * pack, pack), :]
            d2 = sets_ref[pl.ds(base + c2 * pack, pack), :]
            inter = d1 & d2
            empty = inter == 0
            sets_ref[pl.ds(base + (n_leaves + a) * pack, pack), :] = jnp.where(
                empty, d1 | d2, inter
            )
            count_ref[pl.ds(t * pack, pack), :] = count_ref[
                pl.ds(t * pack, pack), :
            ] + jnp.where(empty, weights, 0.0)
        return 0

    jax.lax.fori_loop(0, n_anc, visit, 0, unroll=unroll)
    for t in range(trees):
        total = jnp.sum(count_ref[pl.ds(t * pack, pack), :])
        out_ref[0, 0, t, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


def _fitch_kernel_multi_carry(
    pairs_ref,  # SMEM (T, 1, n_anc) int32 — c1 | (c2 << 16) packed children
    leaf_ref,  # VMEM (1, n_leaves * P, 128) int32 — packed leaf bitmasks
    weight_ref,  # VMEM (1, P, 128) f32 — per-site weights (packed like leaves)
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-tree counts at [...,t,0,0]
    sets_ref,  # VMEM scratch (T * n_all * P, 128) int32
    *,
    n_leaves: int,
    pack: int,
    trees: int,
    unroll: int,
):
    """Node-indexed Fitch with reduced per-ancestor scalar work.

    Two deltas vs ``_fitch_kernel_multi``, both aimed at the scalar unit
    (the measured bottleneck — the VPU lane work per ancestor is ~6 ops on
    resident tiles, but each step also issues SMEM index loads + dynamic
    address arithmetic that serialize on the scalar core):

    - both child indices ship in ONE packed SMEM word (``c1 | c2 << 16``),
      halving SMEM loads per tree-step (shift+mask are scalar-ALU cheap);
    - per-site event counters ride the ``fori_loop`` carry (vector
      registers) instead of a VMEM read-modify-write, dropping one dynamic
      VMEM read + one write per tree-step. Counters are int32; site weights
      (compressed patterns / bootstrap) apply once at the end, which is
      exact because every event adds the same per-site weight.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    stride = n_all * pack

    leaf_block = leaf_ref[0]
    for t in range(trees):
        sets_ref[pl.ds(t * stride, n_leaves * pack), :] = leaf_block

    def visit(a, counts):
        new_counts = []
        for t in range(trees):
            packed = pairs_ref[t, 0, a]
            c1 = packed & 0xFFFF
            c2 = packed >> 16
            base = t * stride
            d1 = sets_ref[pl.ds(base + c1 * pack, pack), :]
            d2 = sets_ref[pl.ds(base + c2 * pack, pack), :]
            inter = d1 & d2
            empty = inter == 0
            sets_ref[pl.ds(base + (n_leaves + a) * pack, pack), :] = jnp.where(
                empty, d1 | d2, inter
            )
            new_counts.append(counts[t] + empty.astype(jnp.int32))
        return tuple(new_counts)

    counts = jax.lax.fori_loop(
        0,
        n_anc,
        visit,
        tuple(jnp.zeros((pack, 128), jnp.int32) for _ in range(trees)),
        unroll=unroll,
    )
    weights = weight_ref[0]  # (P, 128); 0 at padded sites
    for t in range(trees):
        total = jnp.sum(counts[t].astype(jnp.float32) * weights)
        out_ref[0, 0, t, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


def _parent_slot_layout(children: jax.Array) -> jax.Array:
    """Per-tree node -> storage-slot map for the paired-read kernel layout.

    Slot assignment: the two children of ancestor ``a`` land in slots
    ``2a`` and ``2a + 1``, so the ancestor loop reads ONE contiguous
    ``(2 * pack, 128)`` slice at a linear address instead of two dynamic
    slices at scattered child addresses (+ their two SMEM index loads) —
    the per-ancestor scalar/address work is the measured bottleneck of the
    dependent DP chain, not the VPU lane arithmetic. Every non-root node
    has exactly one parent, so the map is a bijection; the root (never
    read) parks in the last slot ``2 * n_anc``.

    Args:
        children: (B, n_anc, 2) int32 child indices.

    Returns:
        (B, n_all) int32 slot of each node.
    """
    batch, n_anc, _ = children.shape
    n_all = 2 * n_anc + 1
    rows = jnp.arange(batch)[:, None]
    pair_base = 2 * jnp.arange(n_anc, dtype=jnp.int32)[None, :]
    slots = jnp.zeros((batch, n_all), jnp.int32)
    slots = slots.at[rows, children[:, :, 0]].set(pair_base)
    slots = slots.at[rows, children[:, :, 1]].set(pair_base + 1)
    return slots.at[:, n_all - 1].set(2 * n_anc)


def _fitch_kernel_slots(
    slots_ref,  # SMEM (T, 1, n_all) int32 — node -> storage slot
    leaf_ref,  # VMEM (1, n_leaves * P, 128) int32 — packed leaf bitmasks
    weight_ref,  # VMEM (1, P, 128) f32 — per-site weights (packed like leaves)
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-tree counts at [...,t,0,0]
    sets_ref,  # VMEM scratch (T * n_all * P, 128) int32 — slot-indexed
    *,
    n_leaves: int,
    pack: int,
    trees: int,
):
    """Fitch recursion over the parent-slot storage layout.

    vs ``_fitch_kernel_multi``, per ancestor per tree: one contiguous
    (2*pack, 128) read at a linear-in-``a`` address + ONE SMEM scalar (the
    write slot) replaces two scattered dynamic-slice reads + two SMEM child
    indices, and the per-site event counters ride the ``fori_loop`` carry in
    vector registers instead of a VMEM read-modify-write. Counters are
    int32 (events <= n_anc < 2^31); site weights apply once at the end.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    stride = n_all * pack

    for t in range(trees):
        base = t * stride
        for i in range(n_leaves):
            s = slots_ref[t, 0, i]
            sets_ref[pl.ds(base + s * pack, pack), :] = leaf_ref[
                0, pl.ds(i * pack, pack), :
            ]

    def visit(a, counts):
        new_counts = []
        for t in range(trees):
            base = t * stride
            d12 = sets_ref[pl.ds(base + 2 * a * pack, 2 * pack), :]
            d1 = d12[:pack]
            d2 = d12[pack:]
            inter = d1 & d2
            empty = inter == 0
            merged = jnp.where(empty, d1 | d2, inter)
            w = slots_ref[t, 0, n_leaves + a]
            sets_ref[pl.ds(base + w * pack, pack), :] = merged
            new_counts.append(counts[t] + empty.astype(jnp.int32))
        return tuple(new_counts)

    counts = jax.lax.fori_loop(
        0,
        n_anc,
        visit,
        tuple(jnp.zeros((pack, 128), jnp.int32) for _ in range(trees)),
    )
    weights = weight_ref[0]  # (P, 128); 0 at padded sites
    for t in range(trees):
        total = jnp.sum(counts[t].astype(jnp.float32) * weights)
        out_ref[0, 0, t, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


def _fitch_kernel_swar(
    pairs_ref,  # SMEM (T, 1, n_anc) int32 — c1 | (c2 << 16) packed children
    leaf_ref,  # VMEM (1, n_leaves * P, 128) int32 — 4 sites per word (bytes)
    weight_ref,  # VMEM (1, 4, P, 128) f32 — per-byte-lane site weights
    out_ref,  # VMEM (1, 1, T, 8, 128) f32; per-tree totals at [...,t,0,0]
    sets_ref,  # VMEM scratch (T * n_all * P, 128) int32
    *,
    n_leaves: int,
    n_states: int,
    pack: int,
    trees: int,
):
    """SWAR Fitch: 4 sites per int32, state sets in 8-bit fields.

    AND/OR work bitwise-parallel across the packed sites for free; the
    per-field empty-intersection test is the classic SWAR nonzero detect
    (OR of Q-1 right shifts, masked to each field's low bit), the select
    uses ``nz * 255`` to expand the per-field bit to a full byte mask (no
    cross-field carries since 255 * 1 < 256), and events accumulate as
    packed byte counters (valid while n_ancestors <= 255). Per-site weights
    apply at unpack time: byte lane k of word j is site ``k * (L/4) + j``.

    Same scalar-work treatment as ``_fitch_kernel_multi_carry``: child
    indices ship packed in one SMEM word, packed byte counters ride the
    loop carry instead of a VMEM read-modify-write.
    """
    n_all = 2 * n_leaves - 1
    n_anc = n_leaves - 1
    stride = n_all * pack
    low_bits = jnp.int32(0x01010101)

    leaf_block = leaf_ref[0]
    for t in range(trees):
        sets_ref[pl.ds(t * stride, n_leaves * pack), :] = leaf_block

    def visit(a, counts):
        new_counts = []
        for t in range(trees):
            packed = pairs_ref[t, 0, a]
            c1 = packed & 0xFFFF
            c2 = packed >> 16
            base = t * stride
            d1 = sets_ref[pl.ds(base + c1 * pack, pack), :]
            d2 = sets_ref[pl.ds(base + c2 * pack, pack), :]
            inter = d1 & d2
            nz = inter
            for b in range(1, n_states):
                nz = nz | (inter >> b)
            nz = nz & low_bits  # 1 in each byte with nonempty intersection
            byte_mask = nz * jnp.int32(255)
            merged = (inter & byte_mask) | ((d1 | d2) & ~byte_mask)
            sets_ref[pl.ds(base + (n_leaves + a) * pack, pack), :] = merged
            new_counts.append(counts[t] + (nz ^ low_bits))
        return tuple(new_counts)

    counts = jax.lax.fori_loop(
        0,
        n_anc,
        visit,
        tuple(jnp.zeros((pack, 128), jnp.int32) for _ in range(trees)),
    )
    for t in range(trees):
        packed = counts[t]
        total = jnp.float32(0.0)
        for k in range(4):
            field = (packed >> (8 * k)) & jnp.int32(0xFF)
            total = total + jnp.sum(
                field.astype(jnp.float32) * weight_ref[0, k]
            )
        out_ref[0, 0, t, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "trees_per_block", "unroll", "sequences_are_masks",
        "site_packing", "n_states", "layout",
    ),
)
def batched_fitch_score_pallas(
    topologies: Topology,
    leaf_sequences: jax.Array,
    *,
    site_weights: jax.Array | None = None,
    interpret: bool = False,
    trees_per_block: int | None = None,
    unroll: int = 1,
    sequences_are_masks: bool = False,
    site_packing: int = 1,
    n_states: int = 32,
    layout: str = "nodes2",
) -> jax.Array:
    """Unit-cost parsimony scores of a candidate batch via fused Fitch.

    ``site_packing=4`` packs 4 sites per int32 word (8-bit state-set fields,
    SWAR update) — 4x less VMEM and set arithmetic per site. Requires
    ``n_states <= 8`` (pass the real alphabet size!) and n_ancestors <= 255
    (packed byte event counters).

    ``trees_per_block`` (T): independent trees per kernel instance — the
    latency-hiding work between the DP's serial dependent tile ops. Default
    ``None`` auto-picks ``min(8, 512 // n_ancestors)``. Same-process
    interleaved measurement on v5e at 64 taxa shows T in {4, 8} within noise
    of each other (~860k trees/s; earlier sweeps that suggested large T
    gains were confounded by chip warm-up drift between configs). The cap
    matters for compile safety: the T-unrolled ancestor body's register
    spill slots live in SMEM and overflow its 1 MiB once T x n_anc exceeds
    ~1000 (T=8 compiles at 63 ancestors, not at 127).

    ``unroll``: Mosaic supports only 1 (hardware loop) or the full ancestor
    count. On the "nodes" layout full unroll measured only +2%, but on
    "nodes2" (carried counters) it bought +6% (2.34 -> 2.20 ms at 64 taxa,
    B=2048) — ``ops.dispatch`` therefore forces full unroll for
    ``n_anc <= 64`` on the default path; the raw-call default stays 1 to
    bound compile time for large trees.

    ``layout`` (interleaved A/B at 64 taxa x 1024 sites, B=2048, bit-exact
    across all three): "nodes2" (default) packs both child indices into one
    SMEM word and carries event counters in the loop carry — 886k trees/s
    at T=8 (+22% over "nodes"; the DP chain is scalar-issue-bound, so
    halving SMEM loads + dropping the counter read-modify-write is the win);
    "nodes" is the original (727k); "slots" (parent-slot storage, contiguous
    pair reads) measured SLOWER (541k — the per-tree leaf scatter and
    slot-indexed writes cost more than the paired read saves).

    The fastest scoring path for Hamming costs (the reference's universal
    choice): state sets are int32 bitmasks, 1024 sites per (8, 128) VPU
    tile, ~4 integer ops per ancestor — ~8x less arithmetic and VMEM than
    the f32 min-plus kernel. Requires n_states <= 32. Sites are padded to a
    tile multiple with state 0, which provably contributes 0 events (all
    leaves agree at padded sites).

    ``site_weights`` (L,) float multiplies each site's event contribution —
    the kernel-speed path for compressed site patterns
    (``alignment.compress_alignment``) and bootstrap reweighting.

    Returns (B,) f32 scores, bit-equal to ``batched_sankoff_score`` with a
    Hamming cost matrix (equivalence of Fitch and unit-cost Sankoff).
    """
    batch = topologies.children.shape[0]
    n_anc = topologies.children.shape[-2]
    n_leaves = n_anc + 1
    n_all = 2 * n_leaves - 1
    length = leaf_sequences.shape[-1]

    if trees_per_block is None:
        trees_per_block = max(1, min(8, 512 // max(n_anc, 1)))

    if layout == "nodes2" and n_all > 0x7FFF:
        # Packed child pairs (c1 | c2 << 16) would shift c2 into the int32
        # sign bit and the kernel's `packed >> 16` decode would go negative.
        layout = "nodes"

    if site_packing == 4:
        if n_states > 8:
            raise ValueError("site_packing=4 requires n_states <= 8")
        if n_anc > 255:
            raise ValueError(
                "site_packing=4 requires <= 255 ancestors (byte counters)"
            )
        return _fitch_swar_impl(
            topologies, leaf_sequences, site_weights,
            trees=max(trees_per_block, 1), n_states=n_states,
            sequences_are_masks=sequences_are_masks, interpret=interpret,
        )
    if site_packing != 1:
        raise ValueError(f"site_packing must be 1 or 4, got {site_packing}")

    # Node tiles are (pack, 128); shrink pack for very large trees so the
    # per-instance state-set scratch stays within a VMEM budget.
    vmem_budget = 10 * 1024 * 1024
    pack = _SUBLANES_F32  # 8 rows of 128 lanes per node tile
    while (
        pack > 1
        and max(trees_per_block, 1) * n_all * pack * _LANES * 4 > vmem_budget
    ):
        pack //= 2
    sites_per_block = pack * _LANES

    padded_len = _round_up(length, sites_per_block)
    seqs = leaf_sequences.astype(jnp.int32)
    if padded_len != length:
        # Padded sites: state 0 on every leaf (mask 1), provably 0 events.
        pad_value = 1 if sequences_are_masks else 0
        seqs = jnp.pad(
            seqs, ((0, 0), (0, padded_len - length)), constant_values=pad_value
        )
    n_blocks = padded_len // sites_per_block

    # ``sequences_are_masks``: inputs are already int32 state-set bitmasks
    # (ambiguity/gap encoding); otherwise integer states -> singleton bits.
    masks = seqs if sequences_are_masks else (jnp.int32(1) << seqs).astype(jnp.int32)
    # (n_leaves, L) -> (n_blocks, n_leaves * pack, 128): node-major tiles.
    packed = (
        masks.reshape(n_leaves, n_blocks, pack, _LANES)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, n_leaves * pack, _LANES)
    )
    # Per-site weights (1.0 default), 0 at padded sites; packed like a node.
    if site_weights is None:
        weights = jnp.ones((length,), jnp.float32)
    else:
        weights = site_weights.astype(jnp.float32)
    weights = jnp.pad(weights, (0, padded_len - length))
    weights_packed = weights.reshape(n_blocks, pack, _LANES)

    children = topologies.children.astype(jnp.int32)
    # Multi-tree instances: pad the batch to a multiple of T (repeating the
    # last tree), score T trees per grid step, slice back.
    trees = max(trees_per_block, 1)
    padded_batch = _round_up(batch, trees)
    if padded_batch != batch:
        reps = padded_batch - batch
        children = jnp.concatenate(
            [children, jnp.broadcast_to(children[-1:], (reps, n_anc, 2))]
        )
    if layout == "slots":
        slots = _parent_slot_layout(children)[:, None, :]  # (B, 1, n_all)
        kernel = functools.partial(
            _fitch_kernel_slots, n_leaves=n_leaves, pack=pack, trees=trees,
        )
        block_counts = pl.pallas_call(
            kernel,
            grid=(padded_batch // trees, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (trees, 1, n_all), lambda b, l: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, n_leaves * pack, _LANES), lambda b, l: (l, 0, 0)
                ),
                pl.BlockSpec((1, pack, _LANES), lambda b, l: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((trees * n_all * pack, _LANES), jnp.int32),
            ],
            interpret=interpret,
        )(slots, packed, weights_packed)
        scores = jnp.sum(block_counts[:, :, :, 0, 0], axis=1)
        return scores.reshape(padded_batch)[:batch]
    if layout == "nodes2":
        pairs = (
            children[:, :, 0] | (children[:, :, 1] << 16)
        )[:, None, :]  # (B, 1, n_anc) packed child pairs
        kernel = functools.partial(
            _fitch_kernel_multi_carry, n_leaves=n_leaves, pack=pack,
            trees=trees, unroll=unroll,
        )
        block_counts = pl.pallas_call(
            kernel,
            grid=(padded_batch // trees, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (trees, 1, n_anc), lambda b, l: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, n_leaves * pack, _LANES), lambda b, l: (l, 0, 0)
                ),
                pl.BlockSpec((1, pack, _LANES), lambda b, l: (l, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((trees * n_all * pack, _LANES), jnp.int32),
            ],
            interpret=interpret,
        )(pairs, packed, weights_packed)
        scores = jnp.sum(block_counts[:, :, :, 0, 0], axis=1)
        return scores.reshape(padded_batch)[:batch]
    if layout != "nodes":
        raise ValueError(
            f"layout must be 'nodes', 'nodes2' or 'slots', got {layout!r}"
        )
    kernel = functools.partial(
        _fitch_kernel_multi, n_leaves=n_leaves, pack=pack, trees=trees,
        unroll=unroll,
    )
    block_counts = pl.pallas_call(
        kernel,
        grid=(padded_batch // trees, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (trees, n_anc, 2), lambda b, l: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, n_leaves * pack, _LANES), lambda b, l: (l, 0, 0)),
            pl.BlockSpec((1, pack, _LANES), lambda b, l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((trees * n_all * pack, _LANES), jnp.int32),
            pltpu.VMEM((trees * pack, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(children, packed, weights_packed)
    scores = jnp.sum(block_counts[:, :, :, 0, 0], axis=1)  # (B//T, T)
    return scores.reshape(padded_batch)[:batch]


def _fitch_swar_impl(
    topologies: Topology,
    leaf_sequences: jax.Array,
    site_weights: jax.Array | None,
    *,
    trees: int,
    n_states: int,
    sequences_are_masks: bool,
    interpret: bool,
) -> jax.Array:
    """Host side of the 4-sites-per-word SWAR Fitch path."""
    batch = topologies.children.shape[0]
    n_anc = topologies.children.shape[-2]
    n_leaves = n_anc + 1
    n_all = 2 * n_leaves - 1
    length = leaf_sequences.shape[-1]

    # Words per node tile; 4x fewer words than sites. Shrink the tile to
    # the alignment too: at e.g. 1024 sites only 256 words exist, and an
    # 8-sublane tile would pad the alignment 4x (measured 4.4x slower at
    # the 64x1k headline than the fitted 2-sublane tile).
    vmem_budget = 10 * 1024 * 1024
    pack = _SUBLANES_F32
    words_needed = max(1, -(-length // 4))
    while pack > 1 and pack * _LANES >= 2 * words_needed:
        pack //= 2
    while pack > 1 and trees * n_all * pack * _LANES * 4 > vmem_budget:
        pack //= 2
    words_per_block = pack * _LANES
    sites_per_block = 4 * words_per_block

    padded_len = _round_up(length, sites_per_block)
    seqs = leaf_sequences.astype(jnp.int32)
    pad_value = 1 if sequences_are_masks else 0
    if padded_len != length:
        seqs = jnp.pad(
            seqs, ((0, 0), (0, padded_len - length)), constant_values=pad_value
        )
    masks = seqs if sequences_are_masks else (jnp.int32(1) << seqs).astype(jnp.int32)

    # Byte-lane mapping: word j carries sites (k * W + j) for k in 0..3,
    # where W = padded_len // 4.
    w_total = padded_len // 4
    lanes = masks.reshape(n_leaves, 4, w_total)
    words = (
        lanes[:, 0] | (lanes[:, 1] << 8) | (lanes[:, 2] << 16)
        | (lanes[:, 3] << 24)
    )  # (n_leaves, W)
    n_blocks = w_total // words_per_block
    packed = (
        words.reshape(n_leaves, n_blocks, pack, _LANES)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, n_leaves * pack, _LANES)
    )

    if site_weights is None:
        weights = jnp.ones((length,), jnp.float32)
    else:
        weights = site_weights.astype(jnp.float32)
    weights = jnp.pad(weights, (0, padded_len - length))
    weights_lanes = (
        weights.reshape(4, n_blocks, pack, _LANES).transpose(1, 0, 2, 3)
    )  # (n_blocks, 4, pack, 128)

    children = topologies.children.astype(jnp.int32)
    padded_batch = _round_up(batch, trees)
    if padded_batch != batch:
        reps = padded_batch - batch
        children = jnp.concatenate(
            [children, jnp.broadcast_to(children[-1:], (reps, n_anc, 2))]
        )
    pairs = (children[:, :, 0] | (children[:, :, 1] << 16))[:, None, :]
    kernel = functools.partial(
        _fitch_kernel_swar, n_leaves=n_leaves, n_states=n_states,
        pack=pack, trees=trees,
    )
    block_counts = pl.pallas_call(
        kernel,
        grid=(padded_batch // trees, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (trees, 1, n_anc), lambda b, l: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, n_leaves * pack, _LANES), lambda b, l: (l, 0, 0)),
            pl.BlockSpec((1, 4, pack, _LANES), lambda b, l: (l, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, trees, 8, 128), lambda b, l: (b, l, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (padded_batch // trees, n_blocks, trees, 8, 128), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((trees * n_all * pack, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(pairs, packed, weights_lanes)
    scores = jnp.sum(block_counts[:, :, :, 0, 0], axis=1)
    return scores.reshape(padded_batch)[:batch]


def batched_sankoff_score_pallas(
    topologies: Topology,
    cost_matrix: jax.Array,
    leaf_sequences: jax.Array,
    *,
    site_weights: jax.Array | None = None,
    hamming: bool | None = None,
    site_block: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Score a batch of candidate trees with the fused kernel.

    Args:
        topologies: batched ``Topology`` with leading axis B.
        cost_matrix: (Q, Q) substitution costs.
        leaf_sequences: (n_leaves, L) int states; L must be lane-aligned
            (pad with ``trex_tpu.padding.pad_sites`` + mask the score
            contribution of padded sites upstream — padded state-0 sites add
            a constant 0 under Hamming only if all leaves agree, so pad
            *sequences with state 0 on every leaf*, which costs 0).
        hamming: force/deny the closed-form path; default auto-detects
            (host-side) whether ``cost_matrix`` equals ones - eye.
        site_block: VMEM site tile; default min(L, 2048).

    Returns:
        (B,) f32 parsimony scores.
    """
    if hamming is None:
        # Auto-detect only on concrete arrays (outside jit); a traced cost
        # matrix conservatively takes the general path.
        q = cost_matrix.shape[-1]
        try:
            import numpy as _np

            hamming = bool(
                _np.array_equal(
                    _np.asarray(cost_matrix), _np.ones((q, q)) - _np.eye(q)
                )
            )
        except jax.errors.TracerArrayConversionError:
            hamming = False
    return _batched_scores_pallas_impl(
        topologies,
        cost_matrix,
        leaf_sequences,
        site_weights,
        hamming=hamming,
        site_block=site_block,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("hamming", "site_block", "interpret")
)
def _batched_scores_pallas_impl(
    topologies: Topology,
    cost_matrix: jax.Array,
    leaf_sequences: jax.Array,
    site_weights: jax.Array | None,
    *,
    hamming: bool,
    site_block: int | None,
    interpret: bool,
) -> jax.Array:
    batch = topologies.children.shape[0]
    n_anc = topologies.children.shape[-2]
    n_leaves = n_anc + 1
    n_all = 2 * n_leaves - 1
    n_states = cost_matrix.shape[-1]
    length = leaf_sequences.shape[-1]
    q_pad = _round_up(n_states, _SUBLANES_F32)

    # Pad the site axis so blocks tile it exactly. Zero-padding is
    # score-neutral: a padded site has every leaf in state 0, so the root's
    # minimum there is 0 (same invariant the Fitch path relies on).
    if site_block is None:
        site_block = _round_up(length, _LANES) if length <= 2048 else 2048
    padded_len = _round_up(length, site_block)
    if site_weights is None:
        weights = jnp.ones((length,), jnp.float32)
    else:
        weights = site_weights.astype(jnp.float32)
    weights = jnp.pad(weights, (0, padded_len - length))
    if padded_len != length:
        leaf_sequences = jnp.pad(
            leaf_sequences, ((0, 0), (0, padded_len - length))
        )
        length = padded_len
    n_blocks = length // site_block
    # Row 0 carries the weights; rows 1..7 pad the f32 tile.
    weights_tiled = jnp.zeros((n_blocks, 8, site_block), jnp.float32)
    weights_tiled = weights_tiled.at[:, 0, :].set(
        weights.reshape(n_blocks, site_block)
    )

    # BIG-padded cost so padded states never win; layout [parent, child].
    cost_t = jnp.full((q_pad, q_pad), BIG_COST, dtype=jnp.float32)
    cost_t = cost_t.at[:n_states, :n_states].set(cost_matrix.astype(jnp.float32))

    kernel = functools.partial(
        _sankoff_kernel,
        n_leaves=n_leaves,
        n_states=n_states,
        q_pad=q_pad,
        hamming=hamming,
    )

    block_scores = pl.pallas_call(
        kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, n_anc, 2), lambda b, l: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((n_leaves, site_block), lambda b, l: (0, l)),
            pl.BlockSpec((q_pad, q_pad), lambda b, l: (0, 0)),
            pl.BlockSpec((1, 8, site_block), lambda b, l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, l: (b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, n_blocks, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_all * q_pad, site_block), jnp.float32)],
        interpret=interpret,
    )(
        topologies.children.astype(jnp.int32),
        leaf_sequences.astype(jnp.int32),
        cost_t,
        weights_tiled,
    )
    return jnp.sum(block_scores[:, :, 0, 0], axis=-1)
