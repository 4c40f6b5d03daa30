"""Interleaved A/B benchmark for fused-kernel variants on the real chip.

Compares the node-indexed kernels against the parent-slot layouts
(``layout='slots'``) with pipelined dispatch (queue ``reps`` calls, block
once) so the tunnel's ~20 ms RTT is amortized — per-call blocking timings
are latency-bound, not kernel-bound (benchmarks/speed_of_light.md).
Variants run round-robin within one process so chip warm-up drift cannot
masquerade as a kernel difference.

Usage: python benchmarks/kernel_ab.py [fitch|lik|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trex_tpu.ops.likelihood_pallas import batched_log_likelihood_pallas
from trex_tpu.ops.sankoff_pallas import batched_fitch_score_pallas
from trex_tpu.topology import random_topologies

N_LEAVES, LENGTH, BATCH = 64, 1024, 2048
REPS, ROUNDS = 20, 5


def _time(fn, reps=REPS, rounds=ROUNDS):
    fn().block_until_ready()  # compile
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def bench_fitch():
    topos = random_topologies(jax.random.PRNGKey(0), N_LEAVES, BATCH)
    leaf = jax.random.randint(
        jax.random.PRNGKey(1), (N_LEAVES, LENGTH), 0, 4
    )
    variants = {
        f"{layout}-T{t}": (layout, t)
        for layout in ("nodes", "nodes2", "slots")
        for t in (2, 4, 8)
    }

    def make(layout, t):
        return lambda: batched_fitch_score_pallas(
            topos, leaf, trees_per_block=t, layout=layout
        )

    # Parity gate first.
    ref = batched_fitch_score_pallas(topos, leaf, trees_per_block=4)
    for name, (layout, t) in variants.items():
        got = make(layout, t)()
        assert jnp.array_equal(ref, got), f"fitch parity broke: {name}"

    # Warm the chip to steady state.
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        make("nodes", 4)().block_until_ready()

    results = {name: float("inf") for name in variants}
    for _ in range(3):  # interleave whole measurement rounds
        for name, (layout, t) in variants.items():
            results[name] = min(results[name], _time(make(layout, t)))
    print(f"fitch {N_LEAVES} taxa x {LENGTH} sites, B={BATCH}:")
    for name, sec in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {name:12s} {sec * 1e3:7.3f} ms  {BATCH / sec:12,.0f} trees/s")


def bench_lik():
    b = 1024
    topos = random_topologies(jax.random.PRNGKey(0), N_LEAVES, b)
    leaf = jax.random.randint(
        jax.random.PRNGKey(1), (N_LEAVES, LENGTH), 0, 4
    )
    bl = jnp.full((b, 2 * N_LEAVES - 1), 0.1)
    p_shared = None  # filled per variant kind

    from trex_tpu.ops.likelihood import jc69_transition

    p_shared = jc69_transition(jnp.float32(0.1), 4)

    variants = {}
    for layout in ("nodes", "slots", "mxu"):
        for t in (1, 2, 4, 8):
            variants[f"shared-{layout}-T{t}"] = ("shared", layout, t)
            variants[f"perbranch-{layout}-T{t}"] = ("perbranch", layout, t)

    def make(kind, layout, t):
        if kind == "shared":
            return lambda: batched_log_likelihood_pallas(
                topos, bl, leaf, 4, shared_transition=p_shared,
                trees_per_block=t, layout=layout,
            )
        return lambda: batched_log_likelihood_pallas(
            topos, bl, leaf, 4, trees_per_block=t, layout=layout
        )

    # Per-layout references: the layouts legitimately differ by ~1 lnL on
    # chip because the nodes kernel takes n_anc TPU ``log``s per tree while
    # slots takes one (power-of-two rescale) — an f64 oracle shows slots is
    # ~13x MORE accurate (max err 0.058 vs 0.77 at 64x1024). Within a
    # layout, trees_per_block must not change the answer at all.
    refs = {
        layout: batched_log_likelihood_pallas(topos, bl, leaf, 4, layout=layout)
        for layout in ("nodes", "slots", "mxu")
    }
    results = {}
    for name, (kind, layout, t) in variants.items():
        try:
            got = make(kind, layout, t)()
            got.block_until_ready()
        except Exception as exc:  # compile failures (e.g. SMEM overflow)
            print(f"  {name}: FAILED {type(exc).__name__}")
            continue
        if kind == "shared":
            pass  # different P than per-branch ref; checked in tests
        else:
            # trees_per_block changes instruction scheduling (fma fusion),
            # so within-layout agreement is ~1e-5 relative, not bit-exact.
            err = float(jnp.max(jnp.abs(got - refs[layout])))
            assert err < 0.1, f"lik parity broke: {name} err={err}"
        results[name] = float("inf")

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        make("shared", "nodes", 2)().block_until_ready()

    for _ in range(3):
        for name in list(results):
            kind, layout, t = variants[name]
            results[name] = min(results[name], _time(make(kind, layout, t)))
    print(f"likelihood {N_LEAVES} taxa x {LENGTH} sites, B={b}:")
    for name, sec in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {name:22s} {sec * 1e3:7.3f} ms  {b / sec:12,.0f} trees/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("fitch", "both"):
        bench_fitch()
    if which in ("lik", "both"):
        bench_lik()
