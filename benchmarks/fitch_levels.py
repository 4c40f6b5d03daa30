"""Level-synchronous Fitch A/B — the one structural idea the roofline left.

The production Fitch kernels (`ops/sankoff_pallas.py`) walk the 63-ancestor
chain serially; the revised roofline (benchmarks/speed_of_light.md) argues
the measured 16.5 cycles/tree-step is dependent-address latency the chain
forces, and that level-synchronous scheduling would win < 2x even free.
That argument was prose. This experiment measures it, in the BEST case for
level scheduling: a perfectly balanced tree, where the level schedule is
static and every level's reads and writes are CONTIGUOUS at compile-time
addresses.

Construction: with leaves 0..n-1 and ancestors numbered level-by-level,
the canonical balanced topology has ``children[a] = (2a, 2a+1)`` in node
visit order — so storing level outputs in ancestor order makes each level
l+1 read exactly the contiguous region level l wrote, pairs pre-interleaved.
The kernel is then log2(n) wide tile ops with NO SMEM index loads and NO
dynamic addresses at all: the absolute minimum scheduling overhead any
Fitch evaluation of this shape can have on this hardware.

Reference parallelization question: /root/reference/src/trex/sankoff.py:87-92
(per-node fori_loop; the reference leaves cross-node parallelism to torch
batching). Parity: scores must equal `batched_fitch_score_pallas` on the
same balanced topology.

Usage: python benchmarks/fitch_levels.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trex_tpu.ops.sankoff_pallas import batched_fitch_score_pallas
from trex_tpu.topology import Topology

N_LEAVES, LENGTH, BATCH = 64, 1024, 2048
REPS, ROUNDS = 20, 4


def balanced_topology_levels(n_leaves: int) -> Topology:
    """Balanced topology with level-order ancestors: children[a] = (2a, 2a+1)."""
    assert n_leaves & (n_leaves - 1) == 0, "power of two only"
    n_anc = n_leaves - 1
    a = jnp.arange(n_anc, dtype=jnp.int32)
    children = jnp.stack([2 * a, 2 * a + 1], axis=-1)
    parents = jnp.zeros((2 * n_leaves - 1,), jnp.int32)
    parents = parents.at[2 * a].set(n_leaves + a)
    parents = parents.at[2 * a + 1].set(n_leaves + a)
    root = 2 * n_leaves - 2
    parents = parents.at[root].set(root)
    return Topology(children=children, parents=parents)


def _fitch_kernel_levels(
    leaf_ref,  # VMEM (1, n_leaves * P, 128) int32 — packed leaf bitmasks
    weight_ref,  # VMEM (1, P, 128) f32 — per-site weights
    out_ref,  # VMEM (1, 1, 8, 128) f32
    sets_ref,  # VMEM scratch ((2*n_leaves - 1) * P, 128) int32, level regions
    *,
    n_leaves: int,
    pack: int,
):
    sets_ref[0 : n_leaves * pack, :] = leaf_ref[0]
    counts = jnp.zeros((pack, 128), jnp.int32)
    off = 0
    w = n_leaves // 2
    while w >= 1:
        x = sets_ref[off : off + 2 * w * pack, :]
        x = x.reshape(w, 2 * pack, 128)
        d1 = x[:, :pack, :]
        d2 = x[:, pack:, :]
        inter = d1 & d2
        empty = inter == 0
        merged = jnp.where(empty, d1 | d2, inter)
        counts = counts + jnp.sum(empty.astype(jnp.int32), axis=0)
        off += 2 * w * pack
        sets_ref[off : off + w * pack, :] = merged.reshape(w * pack, 128)
        w //= 2
    total = jnp.sum(counts.astype(jnp.float32) * weight_ref[0])
    out_ref[0, 0, :, :] = jnp.full((8, 128), total, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_leaves", "batch", "interpret"))
def fitch_levels_balanced(
    leaf_bits: jax.Array,  # (n_leaves, L) int32 state-set bitmasks
    *,
    n_leaves: int,
    batch: int,
    interpret: bool = False,
) -> jax.Array:
    """(batch,) Fitch scores of the balanced level-order topology.

    All instances score the same tree (the A/B cares about scheduling cost,
    not topology variety); the grid still runs `batch` independent
    instances doing full independent work, exactly like the production
    kernel's grid does for distinct trees.
    """
    length = leaf_bits.shape[-1]
    site_block = min(length, 2048)
    pack = site_block // 128
    n_blocks = length // site_block
    leaf_rows = leaf_bits.reshape(1, n_leaves * pack, 128)
    weights = jnp.ones((1, pack, 128), jnp.float32)

    kernel = functools.partial(
        _fitch_kernel_levels, n_leaves=n_leaves, pack=pack
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec((1, n_leaves * pack, 128), lambda b, l: (0, l, 0)),
            pl.BlockSpec((1, pack, 128), lambda b, l: (0, l, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, l: (b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, n_blocks, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((2 * n_leaves - 1) * pack, 128), jnp.int32),
        ],
        interpret=interpret,
    )(leaf_rows, weights)
    return jnp.sum(out[:, :, 0, 0], axis=1)


def main() -> None:
    topo = balanced_topology_levels(N_LEAVES)
    topos = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (BATCH,) + x.shape), topo
    )
    leaf = jax.random.randint(
        jax.random.PRNGKey(1), (N_LEAVES, LENGTH), 0, 4
    )
    leaf_bits = (1 << leaf).astype(jnp.int32)

    ref = batched_fitch_score_pallas(topos, leaf)
    got = fitch_levels_balanced(leaf_bits, n_leaves=N_LEAVES, batch=BATCH)
    assert jnp.array_equal(ref, got), (
        f"parity broke: {ref[:4]} vs {got[:4]}"
    )
    print(f"parity OK (score {float(ref[0])})")

    def serial():
        return batched_fitch_score_pallas(topos, leaf)

    def levels():
        return fitch_levels_balanced(leaf_bits, n_leaves=N_LEAVES, batch=BATCH)

    def _time(fn):
        fn().block_until_ready()
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            out = None
            for _ in range(REPS):
                out = fn()
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        serial().block_until_ready()

    results = {"serial-dispatch": float("inf"), "level-sync": float("inf")}
    for _ in range(3):
        results["serial-dispatch"] = min(
            results["serial-dispatch"], _time(serial)
        )
        results["level-sync"] = min(results["level-sync"], _time(levels))
    print(f"fitch balanced {N_LEAVES} taxa x {LENGTH} sites, B={BATCH}:")
    for name, sec in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {name:16s} {sec * 1e3:7.3f} ms  {BATCH / sec:12,.0f} trees/s")


if __name__ == "__main__":
    main()
