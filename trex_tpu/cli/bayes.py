"""Bayesian commands: mcmc, bayesfactor, date, concord."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from trex_tpu.cli._common import (
    _load_alignment,
    _make_cli_mesh,
    _outgroup_indices,
)

def cmd_mcmc(args) -> None:
    """Bayesian MCMC tree sampling: FASTA in, posterior summaries out.

    Substitution-model parameters are handled empirical-Bayes style: with
    ``--model`` other than jc they are fit by ML on an NJ starting tree
    (``ops.likelihood.optimize_model``) and held fixed while the MCMC
    samples topology + branch lengths. (MrBayes-style full model sampling
    is not implemented; +i / +rK models are rejected.)
    """
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import save_newick
    from trex_tpu.search.mcmc import mcmc_sample

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    patterns, weights = compress_alignment(masks)
    weights = jnp.asarray(weights, jnp.float32)
    patterns_np = np.asarray(patterns, dtype=np.int32)

    out: dict[str, object] = {
        "n_taxa": len(names),
        "n_sites": int(masks.shape[1]),
        "unique_patterns": int((np.asarray(weights) > 0).sum()),
        "generations": args.generations,
        "runs": args.runs,
        "chains": args.chains,
        "proposal": args.proposal,
        "model": args.model,
    }
    rates = freqs = None
    gamma_shape = None
    if args.full_bayes and args.model == "jc":
        # Full Bayes samples a GTR parameterization; ML-fit a seed first.
        args.model = "gtr"
        out["model"] = "gtr (full Bayes)"
    if args.model != "jc":
        if "+i" in args.model or "+r" in args.model:
            raise SystemExit(
                "mcmc supports jc / gtr-family models with optional +g "
                "(fit empirical-Bayes); +i and +rK are not supported"
            )
        from trex_tpu.ops.likelihood import optimize_model
        from trex_tpu.search.nj import nj_start_tree

        ints = np.zeros_like(patterns_np)
        lsb = patterns_np & -patterns_np
        for b in range(n_states):
            ints[lsb == (1 << b)] = b
        topo0, _ = nj_start_tree(ints, n_states, weights)
        params, _ = optimize_model(
            topo0, jnp.asarray(patterns_np), n_states, model=args.model,
            sequences_are_masks=True, site_weights=weights,
        )
        if "rates" in params:
            rates = jnp.asarray(params["rates"])
            freqs = jnp.asarray(params["freqs"])
        if "gamma_shape" in params:
            gamma_shape = float(params["gamma_shape"])
            out["gamma_shape"] = round(gamma_shape, 4)
        out["model_fit"] = (
            "ML on NJ start tree, chain seed (sampled during MCMC)"
            if args.full_bayes
            else "ML on NJ start tree, fixed during MCMC"
        )

    res = mcmc_sample(
        jax.random.PRNGKey(args.seed), jnp.asarray(patterns_np), n_states,
        n_generations=args.generations, n_runs=args.runs,
        n_chains=args.chains, heat=args.heat,
        sample_every=args.sample_every, burnin_frac=args.burnin,
        branch_moves_per_gen=args.branch_moves,
        topo_proposal=args.proposal,
        topo_informed_power=args.informed_power,
        brlen_prior_mean=args.brlen_prior_mean,
        site_weights=weights, sequences_are_masks=True,
        rates=rates, freqs=freqs, gamma_shape=gamma_shape,
        sample_model=args.full_bayes,
        leaf_names=names, progress_every=args.progress_every,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        stop_after_generations=args.stop_after,
        mesh=_make_cli_mesh(
            getattr(args, "mesh", None), divides=args.runs * args.chains
        ),
    )
    if args.full_bayes and res.sample_freqs is not None:
        out["posterior_freqs"] = [
            round(float(x), 4) for x in res.sample_freqs.mean(0)
        ]
        out["posterior_rates"] = [
            round(float(x), 4) for x in res.sample_rates.mean(0)
        ]
    # Samples are canonically rooted on leaf 0, so clades of size
    # n_taxa - 1 are the always-present root split — trivial, skip them.
    split_names = sorted(
        (
            (p, sorted(names[i] for i in s))
            for s, p in res.split_posterior.items()
            if 1 < len(s) < len(names) - 1
        ),
        key=lambda t: -t[0],
    )
    out.update(
        n_samples=int(res.sample_lnl.size),
        mean_lnl=round(float(res.sample_lnl.mean()), 4)
        if res.sample_lnl.size
        else None,
        acceptance={k: round(v, 4) for k, v in res.acceptance.items()},
        asdsf=None if res.asdsf is None else round(res.asdsf, 4),
        ess_lnl=round(res.ess_lnl, 1),
        consensus_tree=res.consensus_newick,
        top_splits=[
            {"posterior": round(float(p), 3), "clade": c}
            for p, c in split_names[:10]
        ],
    )
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(res.consensus_newick + "\n")
    if args.samples_out:
        from trex_tpu.topology import Topology as _Topo

        with open(args.samples_out, "w") as fh:
            for c, lens in zip(res.sample_children, res.sample_lengths):
                topo = _Topo(
                    children=jnp.asarray(c),
                    parents=jnp.zeros((2 * len(names) - 1,), jnp.int32),
                )
                fh.write(
                    save_newick(topo, names, branch_lengths=lens) + "\n"
                )
    if args.trace_out:
        # Tracer-compatible tab-separated log: state index + scalar traces.
        import numpy as np

        with open(args.trace_out, "w") as fh:
            cols = ["state", "lnL", "tree_length"]
            if res.sample_freqs is not None:
                cols += [f"freq{i}" for i in range(res.sample_freqs.shape[1])]
                cols += [f"rate{i}" for i in range(res.sample_rates.shape[1])]
            fh.write("\t".join(cols) + "\n")
            tl = res.sample_lengths[:, :-1].sum(axis=1)
            for i in range(res.sample_lnl.size):
                row = [str(i), f"{res.sample_lnl[i]:.6f}", f"{tl[i]:.6f}"]
                if res.sample_freqs is not None:
                    row += [f"{x:.6f}" for x in res.sample_freqs[i]]
                    row += [f"{x:.6f}" for x in res.sample_rates[i]]
                fh.write("\t".join(row) + "\n")
    print(json.dumps(out))
def cmd_bayesfactor(args) -> None:
    """Stepping-stone log marginal likelihoods + Bayes factors on a tree.

    Models: "jc" (fixed) or "gtr" (exchangeabilities + frequencies
    INTEGRATED over flat Dirichlet priors — honest Occam penalty); "+g"
    suffixes use a fixed ML-fit Gamma shape.
    """
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import align_leaf_order, load_newick
    from trex_tpu.search.marginal import stepping_stone

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    with open(args.tree) as fh:
        topo, _, tree_names = load_newick(fh.read())
    if sorted(tree_names) != sorted(names):
        raise SystemExit("tree and alignment taxa differ")
    topo = align_leaf_order(topo, tree_names, names)
    patterns, weights = compress_alignment(masks)
    patterns = jnp.asarray(np.asarray(patterns, dtype=np.int32))
    weights = jnp.asarray(weights, jnp.float32)

    results = {}
    for i, model in enumerate(m.strip() for m in args.models.split(",")):
        gamma_shape = None
        base = model
        if model.endswith("+g"):
            from trex_tpu.ops.likelihood import optimize_model

            base = model[:-2]
            params, _ = optimize_model(
                topo, patterns, n_states,
                model=("gtr+g" if base == "gtr" else "jc+g"),
                sequences_are_masks=True, site_weights=weights,
            )
            gamma_shape = float(params["gamma_shape"])
        if base not in ("jc", "gtr"):
            raise SystemExit(f"unsupported model {model!r} (jc/gtr[+g])")
        res = stepping_stone(
            jax.random.PRNGKey(args.seed + i), topo, patterns, n_states,
            n_rungs=args.rungs, n_generations=args.generations,
            sample_model=base == "gtr", gamma_shape=gamma_shape,
            site_weights=weights, sequences_are_masks=True,
            mesh=_make_cli_mesh(
                getattr(args, "mesh", None), divides=args.rungs
            ),
        )
        results[model] = {
            "log_marginal": round(res["log_marginal"], 4),
            "ess_min": round(res["ess_min"], 1),
            "acceptance": round(res["acceptance"], 3),
        }
        if gamma_shape is not None:
            results[model]["gamma_shape"] = round(gamma_shape, 4)
    best = max(results, key=lambda m: results[m]["log_marginal"])
    out = {
        "n_taxa": len(names),
        "n_sites": int(masks.shape[1]),
        "rungs": args.rungs,
        "models": results,
        "best": best,
        "log_bayes_factors_vs_best": {
            m: round(
                results[m]["log_marginal"] - results[best]["log_marginal"], 4
            )
            for m in results
        },
    }
    print(json.dumps(out))
def cmd_date(args) -> None:
    """Strict-clock analysis of a fixed tree: LRT + Bayesian node ages."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import align_leaf_order, load_newick
    from trex_tpu.ops.clock import clock_lrt
    from trex_tpu.search.dating import mcmc_date

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    with open(args.tree) as fh:
        topo, _, tree_names = load_newick(fh.read())
    if sorted(tree_names) != sorted(names):
        raise SystemExit("tree and alignment taxa differ")
    topo = align_leaf_order(topo, tree_names, names)
    patterns, weights = compress_alignment(masks)
    patterns = jnp.asarray(np.asarray(patterns, dtype=np.int32))
    weights = jnp.asarray(weights, jnp.float32)

    rates = freqs = None
    gamma_shape = None
    if args.model != "jc":
        from trex_tpu.ops.likelihood import optimize_model

        params, _ = optimize_model(
            topo, patterns, n_states, model=args.model,
            sequences_are_masks=True, site_weights=weights,
        )
        if "rates" in params:
            rates = jnp.asarray(params["rates"])
            freqs = jnp.asarray(params["freqs"])
        if "gamma_shape" in params:
            gamma_shape = float(params["gamma_shape"])

    lrt = clock_lrt(
        topo, patterns, n_states, sequences_are_masks=True,
        site_weights=weights, rates=rates, freqs=freqs,
    )
    tip_ages = None
    if args.tip_ages:
        import numpy as np

        tip_map = {}
        for pair in args.tip_ages.split(","):
            name_, _, age_s = pair.rpartition("=")
            if not name_ or name_ not in names:
                raise SystemExit(
                    f"--tip-ages entry {pair!r}: want 'taxon=age' with a "
                    "taxon from the alignment"
                )
            tip_map[name_] = float(age_s)
        missing = [n for n in names if n not in tip_map]
        if missing:
            raise SystemExit(f"--tip-ages missing taxa: {missing[:5]}")
        tip_ages = np.array([tip_map[n] for n in names], np.float32)

    calibrations = None
    if args.calibrate:
        calibrations = {}
        for spec in args.calibrate:
            parts = spec.rsplit(":", 2)
            if len(parts) != 3:
                raise SystemExit(
                    f"--calibrate wants 'taxa:min:max' or 'root:min:max', "
                    f"got {spec!r}"
                )
            who, lo_s, hi_s = parts
            key_ = (
                "root"
                if who.strip() == "root"
                else frozenset(_outgroup_indices(names, who))
            )
            calibrations[key_] = (float(lo_s), float(hi_s))

    res = mcmc_date(
        jax.random.PRNGKey(args.seed), topo, patterns, n_states,
        n_generations=args.generations, n_chains=args.chains,
        root_age_prior_mean=args.root_prior_mean,
        clock=args.clock, relaxed_sd=args.relaxed_sd,
        calibrations=calibrations, tip_ages=tip_ages,
        tree_prior=args.tree_prior, ne=args.ne,
        rates=rates, freqs=freqs, gamma_shape=gamma_shape,
        site_weights=weights, sequences_are_masks=True,
        leaf_names=names,
    )
    n_leaves = len(names)
    out = {
        "n_taxa": n_leaves,
        "n_sites": int(masks.shape[1]),
        "model": args.model,
        "clock": args.clock,
        "clock_lrt": {
            "statistic": round(lrt["statistic"], 3),
            "df": lrt["df"],
            "p_value": lrt["p_value"],
        },
        "generations": args.generations,
        "acceptance": {k: round(v, 4) for k, v in res.acceptance.items()},
        "ess_root_age": round(res.ess_root_age, 1),
        "root_age": {
            "mean": round(float(res.mean_ages[-1]), 5),
            "hpd95": [round(float(x), 5) for x in res.age_hpd[-1]],
        },
        "node_ages": [
            {
                "ancestor": a,
                "mean": round(float(res.mean_ages[n_leaves + a]), 5),
                "hpd95": [
                    round(float(x), 5) for x in res.age_hpd[n_leaves + a]
                ],
            }
            for a in range(n_leaves - 1)
        ],
        "tree": res.newick,
    }
    if res.sample_rates is not None:
        out["branch_rates"] = [
            round(float(r), 4) for r in res.sample_rates.mean(0)[:-1]
        ]
    if res.sample_clock_rate is not None:
        cr = res.sample_clock_rate
        out["clock_rate"] = {
            "mean": round(float(cr.mean()), 6),
            "hpd95": [
                round(float(np.percentile(cr, 2.5)), 6),
                round(float(np.percentile(cr, 97.5)), 6),
            ],
        }
        out["time_units"] = "calibrated (absolute)"
    if res.sample_ne is not None:
        ne_s = res.sample_ne
        out["coalescent_ne"] = {
            "mean": round(float(ne_s.mean()), 6),
            "hpd95": [
                round(float(np.percentile(ne_s, 2.5)), 6),
                round(float(np.percentile(ne_s, 97.5)), 6),
            ],
        }
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(res.newick + "\n")
    print(json.dumps(out))
def cmd_concord(args) -> None:
    """Gene/site concordance factors on a reference tree's branches."""
    import numpy as np

    from trex_tpu.io import load_newick, renumber_leaves, save_newick
    from trex_tpu.search.concordance import concordance_factors

    with open(args.tree) as fh:
        ref, _, names = load_newick(fh.read())
    order = {n: i for i, n in enumerate(names)}

    gene_trees = None
    if args.gene_trees:
        with open(args.gene_trees) as fh:
            text = fh.read()
        gene_trees = []
        for chunk in (c.strip() + ";" for c in text.split(";") if c.strip()):
            topo, _, gnames = load_newick(chunk)
            if sorted(gnames) != sorted(names):
                raise SystemExit("gene trees must cover the same taxa")
            gene_trees.append(renumber_leaves(topo, [order[n] for n in gnames]))

    masks = None
    if args.fasta:
        anames, masks, _ = _load_alignment(args.fasta, args.alphabet)
        if sorted(anames) != sorted(names):
            raise SystemExit("alignment and tree taxa differ")
        idx = [anames.index(n) for n in names]
        masks = masks[idx]
    if gene_trees is None and masks is None:
        raise SystemExit("need --gene-trees (gCF) and/or --fasta (sCF)")

    res = concordance_factors(
        ref, gene_trees=gene_trees, leaf_sequences=masks,
        n_quartets=args.quartets, seed=args.seed,
        sequences_are_masks=masks is not None,
    )

    def fmt(x):
        return None if x is None or np.isnan(x) else round(float(x) * 100, 1)

    n_anc = ref.n_leaves - 1
    labels = []
    per_branch = []
    for a in range(n_anc):
        g = fmt(res.gcf[a]) if res.gcf is not None else None
        s = fmt(res.scf[a]) if res.scf is not None else None
        per_branch.append({"ancestor": a, "gcf": g, "scf": s})
        parts = [str(v) for v in (g, s) if v is not None]
        labels.append("/".join(parts) if parts else "")
    out = {
        "n_taxa": len(names),
        "n_gene_trees": len(gene_trees) if gene_trees else 0,
        "quartets": args.quartets if masks is not None else 0,
        "branches": per_branch,
        "tree": save_newick(ref, names, support=labels),
    }
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(out["tree"] + "\n")
    print(json.dumps(out))
