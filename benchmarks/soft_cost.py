"""Soft-cost microbenchmark: gram-expansion vs naive O(N^2 L Q) evaluation.

Counterpart of the reference's ``benchmark_tree_cost.py`` sweep (N in
{10,50,100,200}, L=1000, Q=20): verifies the expanded quadratic form matches
a direct pairwise evaluation and reports the speedup. JSON lines output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def naive_soft_cost(sequences, adjacency, cost_matrix):
    """Direct pairwise evaluation — materializes the (N, N) difference terms."""
    diffs = sequences[:, None] - sequences[None, :]  # (N, N, L, Q)
    weighted = jnp.einsum("ijlq,qr->ijlr", diffs, cost_matrix)
    per_pair = jnp.einsum("ijlq,ijlq->ij", diffs, weighted)
    return jnp.sum(adjacency * per_pair) / 2.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[10, 50, 100, 200])
    parser.add_argument("--sites", type=int, default=1000)
    parser.add_argument("--states", type=int, default=20)
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args()

    from trex_tpu.ops.costs import soft_parsimony_cost
    from trex_tpu.utils.profiling import timed

    for n in args.sizes:
        key = jax.random.PRNGKey(n)
        k1, k2 = jax.random.split(key)
        seqs = jax.nn.softmax(
            jax.random.normal(k1, (n, args.sites, args.states)), axis=-1
        )
        adj = jax.nn.softmax(jax.random.normal(k2, (n, n)), axis=-1)
        cost = jnp.ones((args.states, args.states)) - jnp.eye(args.states)

        fast = jax.jit(soft_parsimony_cost)
        slow = jax.jit(naive_soft_cost)
        t_fast, v_fast = timed(fast, seqs, adj, cost, reps=args.reps)
        t_slow, v_slow = timed(slow, seqs, adj, cost, reps=max(args.reps // 2, 1))
        rel_err = abs(float(v_fast) - float(v_slow)) / max(abs(float(v_slow)), 1e-9)
        print(
            json.dumps(
                {
                    "n_nodes": n,
                    "fast_ms": round(t_fast * 1e3, 3),
                    "naive_ms": round(t_slow * 1e3, 3),
                    "speedup": round(t_slow / t_fast, 2),
                    "rel_err": rel_err,
                }
            )
        )


if __name__ == "__main__":
    main()
