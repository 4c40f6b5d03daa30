"""Headline benchmark: candidate-tree evaluations/s/chip.

Config from BASELINE.md: 64 taxa x 1k sites, Hamming cost, batched candidate
topologies scored with the exact Sankoff DP. Target >= 10,000 trees/s/chip
(``vs_baseline`` = measured / 10,000; the reference publishes no numbers of
its own — SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "trees/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from trex_tpu.ops.dispatch import batched_scores_fastest
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel

    n_leaves, n_states, length, batch = 64, 4, 1024, 2048
    reps = 20

    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    cost = CostModel.hamming(n_states).matrix
    leaf = jax.random.randint(
        jax.random.PRNGKey(1), (n_leaves, length), 0, n_states
    )

    # NOTE: the dispatcher must NOT be wrapped in jax.jit — it inspects the
    # concrete cost matrix to pick the Fitch/Hamming fast paths, and its
    # targets are already jitted.
    score_fn = batched_scores_fastest
    # Warmup: compile, then run untimed until the chip reaches steady state
    # (the tunneled chip ramps over the first seconds after a claim; timing
    # too early under-reports by up to 2x).
    scores = score_fn(topos, cost, leaf)
    scores.block_until_ready()
    t_warm = time.perf_counter()
    while time.perf_counter() - t_warm < 3.0:
        scores = score_fn(topos, cost, leaf)
        scores.block_until_ready()

    # Best of 3 timed trials (steady-state throughput, robust to transient
    # tunnel stalls).
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            scores = score_fn(topos, cost, leaf)
        scores.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    trees_per_s = batch * reps / best
    print(
        json.dumps(
            {
                "metric": "candidate-tree evals/s/chip (64 taxa, 1k sites)",
                "value": round(trees_per_s, 1),
                "unit": "trees/s",
                "vs_baseline": round(trees_per_s / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
