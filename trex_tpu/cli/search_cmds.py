"""Search/benchmark commands: search, search-run, bench, ml, bootstrap, nk-bench."""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

def cmd_search(args) -> None:
    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.ops.sankoff import sankoff_score
    from trex_tpu.search.joint import JointConfig, joint_search
    from trex_tpu.topology import balanced_topology
    from trex_tpu.types import CostModel
    from trex_tpu.utils.metrics import MetricsLogger

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    cost = CostModel.hamming(args.states).matrix
    leaf = gt.all_sequences[: args.leaves].astype(jnp.int32)
    n_all = 2 * args.leaves - 1
    leaf_tensor = jnp.zeros((n_all, args.sites, args.states))
    leaf_tensor = leaf_tensor.at[: args.leaves].set(
        jax.nn.one_hot(leaf, args.states)
    )
    oracle = sankoff_score(balanced_topology(args.leaves), cost, leaf)

    cfg = JointConfig(n_iterations=args.iterations, learning_rate=args.lr)
    params, losses, score = joint_search(
        jax.random.PRNGKey(args.seed), leaf_tensor, cost, cfg,
        n_restarts=args.restarts,
    )
    with MetricsLogger(args.metrics_file) as log:
        log.log(
            args.iterations,
            loss=float(losses[-1]),
            best_discrete_score=float(score),
            sankoff_oracle=float(oracle),
        )
    print(
        json.dumps(
            {
                "best_discrete_score": float(score),
                "sankoff_oracle_on_true_tree": float(oracle),
                "final_loss": float(losses[-1]),
            }
        )
    )
def cmd_search_run(args) -> None:
    """Checkpointed, resumable joint search (see trex_tpu.search.runner)."""
    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.search.joint import JointConfig
    from trex_tpu.search.runner import RunnerConfig, run_search

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    n_all = 2 * args.leaves - 1
    leaf_tensor = jnp.zeros((n_all, args.sites, args.states))
    leaf_tensor = leaf_tensor.at[: args.leaves].set(
        jax.nn.one_hot(
            gt.all_sequences[: args.leaves].astype(jnp.int32), args.states
        )
    )
    cfg = RunnerConfig(
        workdir=args.workdir,
        n_iterations=args.iterations,
        checkpoint_every=args.checkpoint_every,
        seed=args.seed,
        joint=JointConfig(
            n_iterations=args.iterations, learning_rate=args.lr
        ),
    )
    run_search(cfg, leaf_tensor, resume=not args.no_resume)
    print(json.dumps({"workdir": args.workdir, "steps": args.iterations}))
def cmd_bench(args) -> None:
    from trex_tpu.ops.dispatch import batched_scores_fastest
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel
    from trex_tpu.utils.profiling import timed

    topos = random_topologies(
        jax.random.PRNGKey(args.seed), args.leaves, args.batch
    )
    cost = CostModel.hamming(args.states).matrix
    leaf = jax.random.randint(
        jax.random.PRNGKey(args.seed + 1),
        (args.leaves, args.sites),
        0,
        args.states,
    )
    mean_s, _ = timed(batched_scores_fastest, topos, cost, leaf, reps=args.reps)
    print(
        json.dumps(
            {
                "metric": f"tree evals/s ({args.leaves} taxa, {args.sites} sites)",
                "value": round(args.batch / mean_s, 1),
                "unit": "trees/s",
                "batch": args.batch,
                "ms_per_batch": round(mean_s * 1e3, 3),
            }
        )
    )
def cmd_ml(args) -> None:
    """Maximum-likelihood tree search (pruning likelihood, JC69)."""
    from trex_tpu.io import sample_topologies, save_newick
    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.search.ml import ml_hill_climb

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    leaf = gt.all_sequences[: args.leaves].astype(jnp.int32)
    start = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(args.seed, args.leaves, 1)
    )
    result, lengths, losses = ml_hill_climb(
        start, leaf, args.states, max_rounds=args.rounds
    )
    print(
        json.dumps(
            {
                "final_neg_log_likelihood": float(losses[-1]),
                "ranking_score": result.score,
                "evaluations": result.evaluations,
                "tree": save_newick(result.topology),
                "mean_branch_length": float(lengths.mean()),
            }
        )
    )
def cmd_bootstrap(args) -> None:
    """Bootstrap split support + majority-rule consensus on generated data."""
    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.search.bootstrap import bootstrap_analysis
    from trex_tpu.search.consensus import majority_rule_consensus
    from trex_tpu.topology import balanced_topology
    from trex_tpu.types import CostModel

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    leaf = gt.all_sequences[: args.leaves].astype(jnp.int32)
    cost = CostModel.hamming(args.states).matrix
    support, best = bootstrap_analysis(
        jax.random.PRNGKey(args.seed),
        balanced_topology(args.leaves),
        cost,
        leaf,
        n_replicates=args.replicates,
        search_rounds=args.search_rounds,
    )
    newick, _ = majority_rule_consensus(best)
    print(
        json.dumps(
            {
                "mean_support": float(support.mean()),
                "per_clade_support": [round(float(x), 3) for x in support],
                "consensus_newick": newick,
            }
        )
    )
def cmd_nk_bench(args) -> None:
    """NK accuracy benchmark: Sankoff vs gradient ASR over lambda values.

    With ``--replicates R > 1`` each (K, lambda) cell reports mean/std over R
    independent landscapes; ``--plot out.png`` writes the errorbar figure the
    reference's sweep ends in (/root/reference/src/trex/evals/benchmark.py:994-1048):
    accuracy vs lambda, one line per K, Sankoff mean as a dashed baseline.
    """
    from trex_tpu.models.nk import evolve_tree, make_landscape
    from trex_tpu.ops.sankoff import sankoff_reconstruct
    from trex_tpu.search.asr import (
        reconstruct_ancestors,
        reconstruct_ancestors_landscape_aware,
    )
    from trex_tpu.topology import balanced_topology, topology_to_adjacency
    from trex_tpu.types import CostModel

    key = jax.random.PRNGKey(args.seed)
    reps = max(1, getattr(args, "replicates", 1))
    topo = balanced_topology(args.leaves)
    adjacency = topology_to_adjacency(topo)
    n_all = 2 * args.leaves - 1
    cost = CostModel.hamming(2).matrix

    # raw[K][label] = list of per-replicate accuracies
    raw: dict[int, dict[str, list[float]]] = {}
    for k_epi in args.k_values:
        cells: dict[str, list[float]] = {"sankoff": []}
        for lam in args.lambdas:
            cells[f"gradient_asr(lambda={lam})"] = []
        for _rep in range(reps):
            key, k_land, k_root, k_tree, k_opt = jax.random.split(key, 5)
            landscape = make_landscape(args.sites, k_epi, k_land, n_states=2)
            root = jax.random.randint(k_root, (args.sites,), 0, 2)
            seqs = evolve_tree(
                landscape, topo, root, args.mutation_rate, k_tree,
                branch_length=args.branch_length,
            )
            leaf = seqs[: args.leaves].astype(jnp.int32)
            truth = seqs[args.leaves :].astype(jnp.int32)

            recon, _, _ = sankoff_reconstruct(topo, cost, leaf)
            cells["sankoff"].append(
                float(jnp.mean(recon[args.leaves :] == truth))
            )
            for lam in args.lambdas:
                if lam == 0.0:
                    learned = reconstruct_ancestors(
                        leaf, n_all, 2, adjacency, k_opt,
                        n_iterations=args.iterations,
                    )
                else:
                    learned = reconstruct_ancestors_landscape_aware(
                        leaf, n_all, 2, landscape, lam, adjacency, k_opt,
                        n_iterations=args.iterations,
                    )
                cells[f"gradient_asr(lambda={lam})"].append(
                    float(jnp.mean(learned == truth))
                )
        raw[k_epi] = cells
        print(json.dumps({f"K={k_epi}": cells}), file=sys.stderr)

    def _summ(vals: list[float]):
        if reps == 1:
            return vals[0]
        mean = sum(vals) / len(vals)
        var = sum((v - mean) ** 2 for v in vals) / len(vals)
        return {"mean": mean, "std": var**0.5}

    results = {
        f"K={k}": {label: _summ(vals) for label, vals in cells.items()}
        for k, cells in raw.items()
    }
    if getattr(args, "plot", None):
        _nk_bench_plot(args.plot, raw, args.lambdas)
    print(json.dumps(results))


def _nk_bench_plot(path: str, raw, lambdas) -> None:
    """Errorbar figure: accuracy vs lambda per K, Sankoff dashed baseline."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for k_epi, cells in raw.items():
        accs = np.array(
            [cells[f"gradient_asr(lambda={lam})"] for lam in lambdas]
        )  # (n_lambda, reps)
        line = ax.errorbar(
            lambdas, accs.mean(axis=1),
            yerr=accs.std(axis=1) if accs.shape[1] > 1 else None,
            marker="o", capsize=3, label=f"TREX K={k_epi}",
        )
        sank = np.array(cells["sankoff"])
        ax.axhline(
            sank.mean(), linestyle="--", linewidth=1,
            color=line.lines[0].get_color(), alpha=0.6,
        )
    ax.set_xlabel("landscape weight λ")
    ax.set_ylabel("ancestor reconstruction accuracy")
    ax.set_title("NK benchmark: gradient ASR vs exact Sankoff (dashed)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
