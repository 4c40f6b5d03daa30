"""Shared-P likelihood kernel sweep: VMEM budget x T x unroll (slots layout).

The ranking regime (``search.ml``'s enumerating ranker and the scan seeds)
runs the fused kernel with one shared fixed-length P — the hot ML path.
This sweep probes the cheap knobs before structural kernel changes:

- ``vmem_budget_mb``: at the 8 MB default, T=2 already forces site_block
  512 (2x the grid instances and leaf-init overhead at L=1024); v5e has
  128 MB of VMEM.
- ``trees_per_block``: latency-hiding interleave (Fitch saturated at 8).
- ``unroll``: full unroll bought +6% on Fitch's dependent chain.

Usage: python benchmarks/lik_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trex_tpu.ops.likelihood import jc69_transition
from trex_tpu.ops.likelihood_pallas import batched_log_likelihood_pallas
from trex_tpu.topology import random_topologies

N_LEAVES, LENGTH, BATCH = 64, 1024, 1024
REPS, ROUNDS = 20, 4


def _time(fn):
    fn().block_until_ready()  # compile
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn()
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main() -> None:
    topos = random_topologies(jax.random.PRNGKey(0), N_LEAVES, BATCH)
    leaf = jax.random.randint(
        jax.random.PRNGKey(1), (N_LEAVES, LENGTH), 0, 4
    )
    bl = jnp.full((BATCH, 2 * N_LEAVES - 1), 0.1)
    p_shared = jc69_transition(jnp.float32(0.1), 4)

    variants = {}
    for t in (1, 2, 4):
        for mb in (8, 48):
            for unroll in (1, 8, -1):
                variants[f"T{t}-vmem{mb}-u{unroll}"] = (t, mb, unroll)

    def make(t, mb, unroll):
        return lambda: batched_log_likelihood_pallas(
            topos, bl, leaf, 4, shared_transition=p_shared,
            trees_per_block=t, layout="slots", vmem_budget_mb=mb,
            unroll=unroll,
        )

    ref = batched_log_likelihood_pallas(
        topos, bl, leaf, 4, shared_transition=p_shared, layout="slots"
    )
    results = {}
    for name, cfg in variants.items():
        try:
            got = make(*cfg)()
            got.block_until_ready()
        except Exception as exc:
            print(f"  {name}: FAILED {type(exc).__name__}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 0.1, f"parity broke: {name} err={err}"
        results[name] = float("inf")

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        make(2, 8, 1)().block_until_ready()

    for _ in range(3):
        for name in list(results):
            results[name] = min(results[name], _time(make(*variants[name])))
    print(f"shared-P likelihood {N_LEAVES} taxa x {LENGTH} sites, B={BATCH}:")
    for name, sec in sorted(results.items(), key=lambda kv: kv[1]):
        print(
            f"  {name:18s} {sec * 1e3:7.3f} ms  {BATCH / sec:12,.0f} trees/s"
        )


if __name__ == "__main__":
    main()
