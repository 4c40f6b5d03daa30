"""Phase-2 likelihood sweep: lanes layout vs best slots (shared-P)."""
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


def main() -> None:
    topos = random_topologies(jax.random.PRNGKey(0), N_LEAVES, BATCH)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (N_LEAVES, LENGTH), 0, 4)
    bl = jnp.full((BATCH, 2 * N_LEAVES - 1), 0.1)
    p_shared = jc69_transition(jnp.float32(0.1), 4)

    variants = {"slots-T2-ufull": dict(layout="slots", trees_per_block=2, unroll=-1)}
    for t in (2, 4, 8):
        for re in (1, 2, 4):
            for u in (1, -1):
                if re != 1 and u != 1:
                    continue  # re>1 is already a full python unroll
                variants[f"lanes-T{t}-re{re}-u{u}"] = dict(
                    layout="lanes", trees_per_block=t, rescale_every=re,
                    unroll=u,
                )

    def make(kw):
        return lambda: batched_log_likelihood_pallas(
            topos, bl, leaf, 4, shared_transition=p_shared, **kw
        )

    ref = batched_log_likelihood_pallas(
        topos, bl, leaf, 4, shared_transition=p_shared, layout="slots"
    )
    results = {}
    for name, kw in variants.items():
        try:
            got = make(kw)()
            got.block_until_ready()
        except Exception as exc:
            print(f"  {name}: FAILED {type(exc).__name__}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 0.1, f"parity broke: {name} err={err}"
        results[name] = float("inf")

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        make(variants["slots-T2-ufull"])().block_until_ready()

    for _ in range(3):
        for name in list(results):
            results[name] = min(results[name], _time(make(variants[name])))
    print(f"shared-P likelihood {N_LEAVES} taxa x {LENGTH} sites, B={BATCH}:")
    for name, sec in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {name:20s} {sec * 1e3:7.3f} ms  {BATCH / sec:12,.0f} trees/s")


if __name__ == "__main__":
    main()
