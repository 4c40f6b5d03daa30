"""Fused Mosaic kernel for one stepwise-insertion scoring step.

The device stepwise-addition loop (``search/stepwise.py``) needs, per
insertion, the Fitch DOWN contexts of the pruned-variant tree plus the
per-edge join penalties delta(t, v) of the SPR identity
(``ops/spr_scan.py``). Formulated in lax, that down pass is a sequential
scan whose carry is the full (n_all, L) context table read AND written
with dynamic indices every step — and XLA cannot keep such a carry
in place when the surrounding insertion loop chains the buffers
(profiler-traced 2026-08-21: TWO full-buffer copies per scan step,
~390 of 416 ms per insertion at 2048 taxa x 4096 sites, in EVERY
formulation tried — nested scan, unrolled, barriered). Inside a Mosaic
kernel the table is an explicitly-managed VMEM scratch, so the loop is
just dynamic row reads/writes: the whole down pass plus the delta
reduction runs in ~1 ms per insertion.

Per grid step (one site block b):
  - zero the (n_all_pad, Lb) down scratch;
  - walk ancestors root->leaves: read the node's context row, combine
    with the up sets of each child's sibling, write the children's rows
    (pass-through rows forward, exactly ``ops.spr_scan:down_pass``);
  - ctx = combine0(up, down); delta_partial[v] = sum_sites
    w * [(up[t] & ctx[v]) == 0], accumulated across site blocks into the
    (n_all_pad, 128)-tiled output (every lane carries the same value).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _combine0(a, b):
    """Fitch combine with 0 = "no information" (ops/spr_scan.py:_combine0)."""
    inter = a & b
    merged = jnp.where(inter == 0, a | b, inter)
    merged = jnp.where(a == 0, b, merged)
    return jnp.where(b == 0, a, merged)


_VMEM_TARGET = 96 * 1024 * 1024  # keep under the 100 MB scoped-vmem request


def _auto_site_block(n_pad: int, requested: int) -> int:
    """Largest lane-aligned site block whose kernel VMEM footprint fits.

    Footprint model, matched against Mosaic's own accounting (8192 taxa,
    (16384, 512) blocks -> "103.80M" reported): the up block is
    double-buffered across grid steps (2 x 4 x n_pad x sb bytes), the down
    scratch persists (4 x n_pad x sb), and the (n_pad, 128) f32 output is
    resident once — footprint ~= 12*n_pad*sb + 4*n_pad*128. At 8192 taxa
    this shrinks the default 512 block to 384; by the same model even a
    128-lane block stops fitting once 2048*n_pad > _VMEM_TARGET, i.e.
    n_pad > 49,152 (~24.5k taxa), where the caller gets a clear error
    instead of a Mosaic OOM (boundary pinned in tests/test_stepwise.py).
    """
    cap = (_VMEM_TARGET - 4 * n_pad * _LANES) // (12 * n_pad)
    cap = cap // _LANES * _LANES
    if cap < _LANES:
        raise ValueError(
            f"insertion kernel cannot fit VMEM at n_pad={n_pad}: even a "
            "128-lane site block exceeds the scoped-VMEM budget "
            f"({_VMEM_TARGET} bytes); use the lax fallback path"
        )
    return min(requested, cap)


_SEG = 256  # ancestors per grid segment; bounds Mosaic's per-iteration
# SMEM cost (measured: the rolled dynamic-store loop books ~0.5 KB of SMEM
# per iteration, so a single 2047-long loop blows the 1 MiB budget)


def _insertion_kernel(
    children_ref,  # SMEM (1, _SEG, 2) int32 — one ancestor segment (reversed walk)
    tnode_ref,  # SMEM (1,) int32 — the inserted leaf t
    up_ref,  # VMEM (n_all_pad, Lb) int32 — flagless Fitch up sets
    w_ref,  # VMEM (1, 8, Lb) f32 — row 0 carries site weights
    out_ref,  # VMEM (n_all_pad, 128) f32 — delta rows (all lanes equal)
    down_ref,  # VMEM scratch (n_all_pad, Lb) int32, persists across segments
    *,
    n_leaves: int,
    n_segs: int,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    seg_idx = n_segs - 1 - s  # segments walk root -> leaves

    @pl.when(s == 0)
    def _():
        down_ref[...] = jnp.zeros_like(down_ref)

    def step(j, _):
        a_local = _SEG - 1 - j
        # Clamp keeps padded ancestor rows (beyond n_anc) in bounds; they
        # are (0, 0) pass-throughs that only forward zeros before any real
        # write lands, so the garbage read is never observed.
        node = jnp.minimum(
            n_leaves + seg_idx * _SEG + a_local, down_ref.shape[0] - 1
        )
        c1 = children_ref[0, a_local, 0]
        c2 = children_ref[0, a_local, 1]
        d = down_ref[pl.ds(node, 1), :]
        u1 = up_ref[pl.ds(c1, 1), :]
        u2 = up_ref[pl.ds(c2, 1), :]
        is_pass = c1 == c2
        ctx1 = jnp.where(is_pass, d, _combine0(d, u2))
        ctx2 = _combine0(d, u1)
        down_ref[pl.ds(c1, 1), :] = ctx1
        # Pass-through rows have c1 == c2; writing ctx2 there would
        # clobber the forwarded context, so write ctx1 again.
        down_ref[pl.ds(c2, 1), :] = jnp.where(is_pass, ctx1, ctx2)
        return 0

    jax.lax.fori_loop(0, _SEG, step, 0)

    @pl.when(s == n_segs - 1)
    def _():
        ctx = _combine0(up_ref[...], down_ref[...])  # (n_all_pad, Lb)
        tset = up_ref[pl.ds(tnode_ref[0], 1), :]  # (1, Lb)
        empty = ((tset & ctx) == 0).astype(jnp.float32)
        w = w_ref[0, 0:1, :]  # (1, Lb)
        partial = jnp.sum(empty * w, axis=1, keepdims=True)
        tile = jnp.broadcast_to(partial, out_ref.shape)

        @pl.when(b == 0)
        def _():
            out_ref[...] = tile

        @pl.when(b > 0)
        def _():
            out_ref[...] = out_ref[...] + tile


@functools.partial(
    jax.jit, static_argnames=("n_leaves", "site_block", "interpret")
)
def insertion_delta_pallas(
    var_children: jax.Array,
    up_states: jax.Array,
    t_node: jax.Array,
    weights: jax.Array,
    *,
    n_leaves: int,
    site_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(n_all,) join penalties delta(t, v) of inserting leaf ``t_node``.

    Args:
        var_children: (n_anc, 2) int32 children of the PRUNED variant
            (t's parent row already a pass-through pair).
        up_states: (n_all, L) int32 flagless Fitch up sets of the variant
            (leaf rows = masks; stale rows above the stepwise frontier are
            fine — their contexts only reach invalid positions).
        t_node: scalar int32 inserted leaf.
        weights: (L,) f32 site weights.

    Returns (n_all,) f32: delta[v] = weighted count of sites where t's
    set does not intersect the combined up/down context of the edge above
    v. Total candidate score = L(T minus t) + delta[v] (spr_scan identity).
    """
    n_all = up_states.shape[0]
    length = up_states.shape[-1]
    n_anc = n_leaves - 1
    n_pad = _round_up(n_all, _SUBLANES)
    # Shrink the site block when the taxon count would bust scoped VMEM.
    # Per-site terms are computed identically in every blocking; only the
    # f32 accumulation grouping changes, so results are bit-identical for
    # integer site weights (exact f32 sums) and numerically equivalent
    # otherwise — cross-block parity pinned in tests/test_stepwise.py.
    site_block = _auto_site_block(n_pad, site_block)
    padded_len = _round_up(length, site_block)
    n_segs = -(-n_anc // _SEG)
    anc_pad = n_segs * _SEG

    up = up_states.astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if padded_len != length:
        # Zero-set padding: combine0 treats 0 as "no info", the weight is
        # 0, and (tset & 0) == 0 contributes only weight-0 terms.
        up = jnp.pad(up, ((0, 0), (0, padded_len - length)))
        w = jnp.pad(w, (0, padded_len - length))
    if n_pad != n_all:
        up = jnp.pad(up, ((0, n_pad - n_all), (0, 0)))
    children = var_children.astype(jnp.int32)
    if anc_pad != n_anc:
        # Padded ancestor rows are (0, 0) pass-throughs processed before
        # any real write to row 0 lands, so they only forward zeros.
        children = jnp.pad(children, ((0, anc_pad - n_anc), (0, 0)))
    n_blocks = padded_len // site_block
    weights_tiled = jnp.zeros((n_blocks, 8, site_block), jnp.float32)
    weights_tiled = weights_tiled.at[:, 0, :].set(
        w.reshape(n_blocks, site_block)
    )

    kernel = functools.partial(
        _insertion_kernel, n_leaves=n_leaves, n_segs=n_segs
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_segs),
        in_specs=[
            pl.BlockSpec(
                (1, _SEG, 2),
                lambda b, s, n_segs=n_segs: (0, n_segs - 1 - s, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_pad, site_block), lambda b, s: (0, b)),
            pl.BlockSpec((1, 8, site_block), lambda b, s: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, _LANES), lambda b, s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_pad, site_block), jnp.int32)],
        # The up block + persistent down scratch + output exceed the 16 MB
        # scoped-VMEM default at 4096 taxa; v5e has 128 MB to spend.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        children.reshape(1, anc_pad, 2),
        jnp.asarray([t_node], jnp.int32).reshape(1),
        up,
        weights_tiled,
    )
    return out[:n_all, 0]
