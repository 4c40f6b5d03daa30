"""End-to-end Bayesian workflow: simulate -> MCMC -> posterior summaries.

Runs on CPU by default (forces 8 virtual devices like the tests); drop the
CPU override to use the accelerator. Mirrors `python -m trex_tpu.cli mcmc`.
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from trex_tpu.io import reroot_on_outgroup, sample_topologies
from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.search.bootstrap import subtree_leaf_sets
from trex_tpu.search.mcmc import mcmc_sample


def main() -> None:
    n_leaves = 12
    truth = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(1, n_leaves, 1)
    )
    rates = np.ones((4, 4), np.float32)
    rates[0, 2] = rates[2, 0] = 3.0  # transition bias
    rates[1, 3] = rates[3, 1] = 3.0
    freqs = np.array([0.3, 0.2, 0.2, 0.3], np.float32)
    aln = simulate_alignment(
        jax.random.PRNGKey(0), truth,
        np.full(2 * n_leaves - 1, 0.12, np.float32),
        n_sites=800, rates=rates, freqs=freqs,
    )

    print("sampling: 2 runs x 2 coupled chains, full Bayes over GTR ...")
    res = mcmc_sample(
        jax.random.PRNGKey(1), jnp.asarray(aln.astype(np.int32)), 4,
        n_generations=2500, n_runs=2, n_chains=2, sample_every=10,
        burnin_frac=0.4, branch_moves_per_gen=4,
        sample_model=True, model_tuning=200.0,
        leaf_names=[f"t{i}" for i in range(n_leaves)],
    )

    print(f"samples: {res.sample_lnl.size}  mean lnL: {res.sample_lnl.mean():.2f}")
    print(f"ASDSF: {res.asdsf:.4f}  ESS(lnL): {res.ess_lnl:.0f}")
    print("acceptance:", {k: round(v, 3) for k, v in res.acceptance.items()})
    print("posterior mean freqs:", res.sample_freqs.mean(0).round(3),
          "(truth 0.3/0.2/0.2/0.3)")
    print("consensus:", res.consensus_newick)

    truth0 = reroot_on_outgroup(truth, [0])[0]
    true_splits = set(subtree_leaf_sets(truth0))
    high = {s for s, p in res.split_posterior.items() if p > 0.9}
    print(f"splits with posterior > 0.9: {len(high)}; "
          f"all true: {high <= true_splits}")
    # Short demo run: runs should agree to well under the usual 0.05
    # threshold's "keep sampling" band.
    assert res.asdsf is not None and res.asdsf < 0.15


if __name__ == "__main__":
    main()
