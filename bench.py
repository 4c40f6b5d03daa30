"""Headline benchmark: candidate-tree evaluations/s/chip.

Config from BASELINE.md: 64 taxa x 1k sites, Hamming cost, batched candidate
topologies scored with the exact Sankoff DP. Target >= 10,000 trees/s/chip
(``vs_baseline`` = measured / 10,000; the reference publishes no numbers of
its own — SURVEY.md §6).

Prints one JSON line per metric; the HEADLINE metric is the LAST line
(the driver parses the final line):
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
The three canary lines before it capture the paths rounds 2-3 optimized:
ML ranking evals/s, topology-MCMC generations/s, and the differentiable
joint-search score vs the same-data true-tree score.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 3),
            }
        ),
        flush=True,
    )


def bench_ml() -> None:
    """Shared-P ML ranking throughput (lanes kernel, search.ml's config)."""
    from trex_tpu.ops.likelihood import jc69_transition
    from trex_tpu.ops.likelihood_pallas import batched_log_likelihood_pallas
    from trex_tpu.topology import random_topologies

    n, length, batch, reps = 64, 1024, 1024, 20
    topos = random_topologies(jax.random.PRNGKey(0), n, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (n, length), 0, 4)
    bl = jnp.full((batch, 2 * n - 1), 0.1)
    p0 = jc69_transition(jnp.float32(0.1), 4)

    def run():
        return batched_log_likelihood_pallas(
            topos, bl, leaf, 4, shared_transition=p0,
            layout="lanes", trees_per_block=4, rescale_every=4,
        )

    run().block_until_ready()
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        run().block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = run()
        np.asarray(out[:1])  # forced readback: tunnel-honest sync (CLAUDE.md)
        best = min(best, time.perf_counter() - t0)
    rate = batch * reps / best
    # Baseline = the round-1 fused-kernel measurement (96k trees/s).
    _emit("ML ranking evals/s (64 taxa, 1k sites)", rate, "trees/s",
          rate / 96000.0)


def bench_mcmc() -> None:
    """Topology MCMC generations/s, informed proposal, 64 x 2048 x 8."""
    from trex_tpu.io import sample_topologies
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.mcmc import mcmc_sample

    leaves_n, sites, chains = 64, 2048, 8
    truth = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(3, leaves_n, 1)
    )
    aln = simulate_alignment(
        jax.random.PRNGKey(0), truth,
        np.full(2 * leaves_n - 1, 0.1, np.float32), n_sites=sites,
    )
    leaves = jnp.asarray(aln.astype(np.int32))
    common = dict(
        n_runs=1, n_chains=chains, sample_every=20, burnin_frac=0.0,
        branch_moves_per_gen=2, topo_proposal="informed",
    )
    # mcmc_sample re-traces its generation program per call, but the XLA
    # executable is compile-cached across calls, so ONE warmup run with the
    # SAME generation count leaves no fresh compile inside the timed run
    # (the benchmarks/mcmc_bench.py pattern — the round-3 marginal-rate
    # scheme here differenced two COLD calls of different program sizes and
    # produced a 640e9 gen/s artifact, BENCH_r03).
    gens = 640

    def timed(seed):
        t0 = time.perf_counter()
        mcmc_sample(
            jax.random.PRNGKey(seed), leaves, 4, n_generations=gens, **common
        )
        return time.perf_counter() - t0

    timed(1)  # warmup: compiles every superblock size the run uses
    dt = timed(2)
    rate = gens / dt
    # Sanity envelope: speed_of_light.md records 57-131 gen/s at this
    # config; anything past 100x that (or a sub-100ms wall) is a
    # measurement artifact, not a rate — refuse to report it.
    if dt < 0.1 or rate > 100 * 131.0:
        print(
            json.dumps(
                {
                    "metric": "topology MCMC gen/s (64 taxa, 2048 sites, "
                    "8 chains)",
                    "error": "unstable-measurement",
                    "wall_s": round(dt, 4),
                }
            ),
            flush=True,
        )
        return
    # Baseline = round-1's 3.8 gen/s at this scale (host-side proposals).
    _emit("topology MCMC gen/s (64 taxa, 2048 sites, 8 chains)", rate,
          "gen/s", rate / 3.8)


def bench_diff_search() -> None:
    """Differentiable joint search score ratio vs the true tree's score."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.ops.dispatch import batched_scores_fastest
    from trex_tpu.ops.relax import project_topology, soft_topology
    from trex_tpu.search.joint import JointConfig, init_params, joint_optimize
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel

    n, length, q, iters, restarts = 64, 1024, 4, 600, 4
    n_all = 2 * n - 1
    cost = CostModel.hamming(q).matrix
    true_topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(0), n, 1)
    )
    seqs = jnp.asarray(
        simulate_alignment(
            jax.random.PRNGKey(1), true_topo, np.full(n_all, 0.15),
            n_sites=length, n_states=q,
        )
    )
    true_score = float(
        batched_scores_fastest(
            jax.tree_util.tree_map(lambda x: x[None], true_topo), cost, seqs
        )[0]
    )
    leaf_tensor = jnp.zeros((n_all, length, q))
    leaf_tensor = leaf_tensor.at[:n].set(jax.nn.one_hot(seqs, q))
    cfg = JointConfig(n_iterations=iters)

    def one_restart(key):
        k_init, k_run = jax.random.split(key)
        params = init_params(k_init, n, length, q)
        params, losses = joint_optimize(k_run, params, leaf_tensor, cfg)
        return params

    keys = jax.random.split(jax.random.PRNGKey(3), restarts)
    params_b = jax.jit(jax.vmap(one_restart))(keys)
    proj = jax.jit(
        jax.vmap(
            lambda p, k: project_topology(
                soft_topology(k, p["tree_params"], 0.01)
            )
        )
    )
    topos = proj(params_b, jax.random.split(jax.random.PRNGKey(4), restarts))
    score = float(batched_scores_fastest(topos, cost, seqs).min())
    # vs_baseline = true_score / score (1.0 would be exact recovery).
    _emit("diff joint-search best score (64 taxa, 1k sites)", score,
          "parsimony", true_score / max(score, 1.0))


def bench_fitch() -> None:
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
    # Drain the queue before the first timed trial: block_until_ready does
    # not sync through the tunnel, so without this readback the warmup
    # backlog lands on trial 0 (measured: 135k vs 915k median).
    np.asarray(scores[:1])

    # 5 timestamped trials (steady-state throughput). Protocol notes:
    #  - Each trial ends with a forced READBACK (np.asarray of one score):
    #    block_until_ready does NOT synchronize through the TPU tunnel
    #    (CLAUDE.md), so a block-only timer can stop while the device still
    #    computes. The one ~20 ms RTT is <2% of a trial's ~1-2 s compute.
    #  - Every trial's rate + start timestamp is emitted so a
    #    round-over-round headline shift is diagnosable as session noise vs
    #    a regression, and any trial >25% below the median is flagged as a
    #    tunnel stall rather than silently absorbed into a best-of
    #    (BENCH_r04's 47% spread was unadjudicable from the artifact).
    #  - Headline = max rate (continuity with rounds 1-4); median also
    #    reported.
    reps = 25
    bench_start = time.perf_counter()
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            scores = score_fn(topos, cost, leaf)
        np.asarray(scores[:1])  # force device completion through the tunnel
        trials.append((t0 - bench_start, time.perf_counter() - t0))

    rates = [batch * reps / t for _, t in trials]
    median = float(np.median(rates))
    stalls = [i for i, r in enumerate(rates) if r < 0.75 * median]
    print(
        json.dumps(
            {
                "metric": "candidate-tree evals/s trial protocol",
                "trials": [
                    {"t_start_s": round(ts, 2), "rate": round(r, 1)}
                    for (ts, _), r in zip(trials, rates)
                ],
                "median": round(median, 1),
                "spread_pct": round(
                    100 * (max(rates) - min(rates)) / max(rates), 2
                ),
                "stall_trials": stalls,
            }
        ),
        flush=True,
    )
    trees_per_s = max(rates)
    _emit("candidate-tree evals/s/chip (64 taxa, 1k sites)", trees_per_s,
          "trees/s", trees_per_s / 10000.0)


def main() -> None:
    for fn in (bench_ml, bench_mcmc, bench_diff_search):
        try:
            fn()
        except Exception as exc:  # canary metrics must never sink the headline
            print(
                json.dumps(
                    {"metric": fn.__name__, "error": type(exc).__name__}
                ),
                flush=True,
            )
    bench_fitch()


if __name__ == "__main__":
    main()
