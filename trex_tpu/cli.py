"""Command-line drivers: ``python -m trex_tpu.cli <command>``.

Commands
--------
score       Exact Sankoff scoring of generated data, or of a real alignment
            (``--fasta`` + optional ``--tree``) with full IUPAC/gap support.
infer       File-based tree inference: FASTA in, searched tree (newick) out —
            distance/stepwise starting trees + SPR/NNI hill climbing.
search      Joint topology + sequence optimization with restarts.
asr         Gradient ASR on a fixed topology, accuracy vs exact Sankoff.
bench       Throughput benchmark (same metric as bench.py, more knobs).
nk-bench    The reference's accuracy benchmark: NK data, Sankoff vs gradient
            ASR across lambda values (``evals/benchmark.py:902-1048``).
simulate    Simulate an alignment down a (given or generated) tree under
            JC/GTR/empirical (+G/+I) models — the seq-gen equivalent.
treedist    Robinson-Foulds distance between two newick files.
consensus   Majority-rule consensus of a multi-newick file.
topotest    KH/SH/AU/BP/ELW topology tests of candidate trees on an
            alignment (optional CONSEL site-lnL export).
treeprune   Induced subtree + alignment rows for a taxa subset.

The reference has no CLI at all (SURVEY.md §1); flags here use a plain
argparse tree so the module stays dependency-free.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--leaves", type=int, default=16)
    p.add_argument("--sites", type=int, default=128)
    p.add_argument("--states", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics-file", type=str, default=None)


def _load_alignment(path: str, alphabet_name: str):
    """Read an alignment -> (names, (n, L) int32 state-set masks, n_states).

    Format auto-detected: NEXUS (``#NEXUS`` header), PHYLIP (numeric
    ``ntax nchar`` header), else FASTA. Always encodes through the
    ambiguity-preserving path so gaps and IUPAC codes get standard
    missing-data semantics.
    """
    import numpy as np

    from trex_tpu.io import (
        DNA,
        PROTEIN,
        encode_alignment_masks,
        parse_fasta_masks,
        parse_nexus,
        parse_phylip,
    )

    alphabet = {"dna": DNA, "protein": PROTEIN}[alphabet_name]
    with open(path) as fh:
        text = fh.read()
    head = text.lstrip()[:40].lower()
    if head.startswith("#nexus"):
        names, rows, _ = parse_nexus(text)
        if rows is None:
            raise SystemExit(f"{path}: NEXUS file has no DATA/CHARACTERS block")
        masks = encode_alignment_masks(rows, alphabet)
    elif head.split()[:2] and head.split()[0].isdigit():
        names, rows = parse_phylip(text)
        masks = encode_alignment_masks(rows, alphabet)
    else:
        names, masks = parse_fasta_masks(text, alphabet)
    return names, np.asarray(masks, dtype=np.int32), len(alphabet)


def _outgroup_indices(names: list[str], outgroup: str) -> list[int]:
    """Resolve a comma-separated outgroup name list to leaf indices."""
    wanted = [s.strip() for s in outgroup.split(",") if s.strip()]
    missing = [w for w in wanted if w not in names]
    if missing:
        raise SystemExit(f"outgroup taxa not in the alignment: {missing}")
    return [names.index(w) for w in wanted]


def _start_tree(kind: str, masks, n_states: int, seed: int, weights, orders: int):
    """Build the requested starting topology from (possibly ambiguous) leaves."""
    import numpy as np

    from trex_tpu.search.nj import nj_start_tree
    from trex_tpu.search.stepwise import stepwise_addition_multi
    from trex_tpu.topology import balanced_topology, random_topologies

    n_leaves = masks.shape[0]
    if kind == "stepwise":
        topo, _ = stepwise_addition_multi(
            masks, n_states, n_orders=orders, seed=seed,
            sequences_are_masks=True, site_weights=weights,
        )
        return topo
    if kind in ("nj", "upgma"):
        # Distance matrices want integer states; resolve ambiguity to the
        # lowest allowed state (heuristic — the search refines from here).
        ints = np.zeros_like(masks)
        lsb = masks & -masks
        for b in range(n_states):
            ints[lsb == (1 << b)] = b
        topo, _ = nj_start_tree(ints, n_states, weights, method=kind)
        return topo
    if kind == "random":
        return jax.tree_util.tree_map(
            lambda x: x[0], random_topologies(jax.random.key(seed), n_leaves, 1)
        )
    if kind == "balanced":
        if n_leaves & (n_leaves - 1):
            raise SystemExit(
                f"--start balanced needs a power-of-two taxon count, got {n_leaves}"
            )
        return balanced_topology(n_leaves)
    raise SystemExit(f"unknown --start {kind!r}")


def cmd_score(args) -> None:
    from trex_tpu.ops.sankoff import sankoff_reconstruct
    from trex_tpu.topology import balanced_topology
    from trex_tpu.types import CostModel

    if args.fasta:
        import numpy as np

        from trex_tpu.io import align_leaf_order, load_newick
        from trex_tpu.ops.fitch import fitch_reconstruct

        names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
        if args.tree:
            with open(args.tree) as fh:
                topo, _, tree_names = load_newick(fh.read())
            if sorted(tree_names) != sorted(names):
                raise SystemExit("tree and alignment taxa differ")
            topo = align_leaf_order(topo, tree_names, names)
        else:
            from trex_tpu.search.stepwise import stepwise_addition

            topo, _ = stepwise_addition(
                masks, n_states, sequences_are_masks=True, seed=args.seed
            )
        out = {
            "n_taxa": len(names),
            "n_sites": int(masks.shape[1]),
            "tree_source": args.tree or "stepwise addition",
        }
        if args.criterion == "ml":
            from trex_tpu.ops.likelihood import tree_log_likelihood
            from trex_tpu.ops.likelihood_asr import (
                marginal_ancestral_posteriors,
            )

            rates = freqs = None
            if args.model != "jc":
                from trex_tpu.ops.likelihood import optimize_model

                fixed_rates = fixed_freqs = None
                if args.model_file:
                    from trex_tpu.io import parse_paml_rates

                    with open(args.model_file) as fh:
                        fixed_rates, fixed_freqs = parse_paml_rates(
                            fh.read(), n_states
                        )
                params, _ = optimize_model(
                    topo, jnp.asarray(masks), n_states, model=args.model,
                    sequences_are_masks=True,
                    fixed_rates=fixed_rates, fixed_freqs=fixed_freqs,
                )
                lengths = params["branch_lengths"]
                if "rates" in params:
                    rates = jnp.asarray(params["rates"])
                    freqs = jnp.asarray(params["freqs"])
                out["model"] = args.model
            else:
                from trex_tpu.ops.likelihood import optimize_branch_lengths

                lengths, _ = optimize_branch_lengths(
                    topo, jnp.asarray(masks), n_states,
                    sequences_are_masks=True,
                )
            posteriors, recon = marginal_ancestral_posteriors(
                topo, lengths, jnp.asarray(masks), n_states,
                rates, freqs, sequences_are_masks=True,
            )
            if args.asr == "joint":
                from trex_tpu.ops.likelihood_asr import (
                    joint_ancestral_reconstruction,
                )

                recon, joint_lp = joint_ancestral_reconstruction(
                    topo, lengths, jnp.asarray(masks), n_states,
                    rates, freqs, sequences_are_masks=True,
                )
                out["joint_log_probability"] = float(jnp.sum(joint_lp))
            ll = tree_log_likelihood(
                topo, lengths, jnp.asarray(masks), n_states,
                rates=rates, freqs=freqs, sequences_are_masks=True,
            )
            anc_conf = jnp.max(posteriors, axis=1)[len(names):]
            out.update(
                log_likelihood=float(ll),
                mean_branch_length=float(jnp.mean(lengths[:-1])),
                mean_ancestor_posterior=float(jnp.mean(anc_conf)),
            )
            if args.site_rates:
                from trex_tpu.ops.likelihood import posterior_site_rates

                if args.model == "jc" or (
                    "gamma_shape" not in params
                    and "category_rates" not in params
                ):
                    raise SystemExit(
                        "--site-rates needs a rate-mixture model "
                        "(e.g. --model gtr+g or gtr+r3)"
                    )
                mean_rates, _ = posterior_site_rates(
                    topo, lengths, jnp.asarray(masks), n_states,
                    params.get("gamma_shape", 1.0),
                    rates=rates, freqs=freqs,
                    category_rates=params.get("category_rates"),
                    category_weights=params.get("category_weights"),
                    sequences_are_masks=True,
                )
                with open(args.site_rates, "w") as fh:
                    fh.write("site\tmean_rate\n")
                    for i, r in enumerate(np.asarray(mean_rates)):
                        fh.write(f"{i + 1}\t{r:.6f}\n")
                out["site_rates"] = args.site_rates
                out["mean_site_rate"] = float(jnp.mean(mean_rates))
        else:
            recon, score = fitch_reconstruct(
                topo, jnp.asarray(masks), n_states=n_states,
                sequences_are_masks=True,
            )
            out["parsimony_score"] = float(score)
        if args.output_fasta:
            from trex_tpu.io import DNA, PROTEIN, write_fasta

            alphabet = {"dna": DNA, "protein": PROTEIN}[args.alphabet]
            anc_names = names + [
                f"anc{i}" for i in range(len(names) - 1)
            ]
            with open(args.output_fasta, "w") as fh:
                fh.write(write_fasta(anc_names, np.asarray(recon), alphabet))
            out["output_fasta"] = args.output_fasta
        print(json.dumps(out))
        return

    from trex_tpu.models.mutation_tree import generate_groundtruth

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    cost = CostModel.hamming(args.states).matrix
    leaf = gt.all_sequences[: args.leaves].astype(jnp.int32)
    recon, _, score = sankoff_reconstruct(
        balanced_topology(args.leaves), cost, leaf
    )
    acc = float(
        jnp.mean(recon[args.leaves :] == gt.all_sequences[args.leaves :])
    )
    print(
        json.dumps(
            {
                "parsimony_score": float(score),
                "ancestor_identity_vs_truth": acc,
            }
        )
    )


def cmd_infer(args) -> None:
    """FASTA in, inferred tree out: start tree + discrete hill climbing."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import save_newick
    from trex_tpu.ops.dispatch import batched_scores_fastest
    from trex_tpu.search.hillclimb import parsimony_hill_climb
    from trex_tpu.types import CostModel

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    patterns, weights = compress_alignment(masks)
    weights = jnp.asarray(weights, jnp.float32)
    patterns = np.asarray(patterns, dtype=np.int32)

    out: dict[str, object] = {
        "criterion": args.criterion,
        "start": args.start,
        "n_taxa": len(names),
        "n_sites": int(masks.shape[1]),
        "unique_patterns": int((np.asarray(weights) > 0).sum()),
    }
    if args.criterion == "distance":
        # Pure distance-method tree (NJ/UPGMA) with its own branch lengths:
        # no search. --start picks the agglomeration; default nj.
        from trex_tpu.search.nj import nj_bootstrap, nj_start_tree

        method = args.start if args.start in ("nj", "upgma") else "nj"
        ints = np.zeros_like(patterns)
        lsb = patterns & -patterns
        for b in range(n_states):
            ints[lsb == (1 << b)] = b
        support = None
        if args.bootstrap > 0:
            topo, blens, support = nj_bootstrap(
                jax.random.PRNGKey(args.seed), ints, n_states,
                n_replicates=args.bootstrap, method=method,
                site_weights=weights,
            )
            out["bootstrap_replicates"] = args.bootstrap
            out["split_support"] = [round(float(s), 3) for s in support]
        else:
            topo, blens = nj_start_tree(
                ints, n_states, weights, method=method
            )
        blens = np.clip(np.asarray(blens, dtype=np.float64), 0.0, None)
        if args.outgroup:
            from trex_tpu.io import reroot_on_outgroup

            # Supports are indexed by the pre-rerooting ancestors; drop
            # them from the newick when rerooting moves the indices.
            support = None
            topo, blens = reroot_on_outgroup(
                topo, _outgroup_indices(names, args.outgroup), blens
            )
            out["outgroup"] = args.outgroup
        newick = save_newick(
            topo, names, branch_lengths=blens, support=support
        )
        out.update(method=method, tree=newick,
                   tree_length=float(np.asarray(blens)[:-1].sum()))
        if args.output_tree:
            with open(args.output_tree, "w") as fh:
                fh.write(newick + "\n")
        print(json.dumps(out))
        return

    constraint_splits = None
    if args.constraint:
        from trex_tpu.io import load_newick
        from trex_tpu.search.bootstrap import subtree_leaf_sets
        from trex_tpu.search.hillclimb import constrained_start

        if args.neighborhood == "spr-scan":
            raise SystemExit(
                "--constraint needs an enumerating --neighborhood "
                "(nni/spr/tbr); the analytic spr-scan cannot filter moves"
            )
        if args.ratchet > 0:
            raise SystemExit("--constraint does not combine with --ratchet")
        if args.criterion == "ml" and args.model != "jc":
            raise SystemExit(
                "--constraint currently supports --model jc (the "
                "model-aware refinement rides the unfiltered scan)"
            )
        with open(args.constraint) as fh:
            ctopo, _, cnames = load_newick(fh.read())
        unknown = [n for n in cnames if n not in names]
        if unknown:
            raise SystemExit(f"constraint taxa not in alignment: {unknown[:5]}")
        cids = [names.index(n) for n in cnames]
        csets = subtree_leaf_sets(ctopo)
        taxa = frozenset(cids)
        constraint_splits = []
        for s in csets:
            mapped = frozenset(cids[i] for i in s)
            if 2 <= len(mapped) <= len(cids) - 2:
                constraint_splits.append(mapped)
        out["constraint_splits"] = len(constraint_splits)
        out["constraint_taxa"] = len(cids)
        # Starting topologies graft the remaining taxa onto the constraint
        # tree (new leaves never change the induced constraint subtree).
        starts = [
            constrained_start(
                ctopo, cids, len(names), seed=args.seed + 1000 * r
            )
            for r in range(max(args.restarts, 1))
        ]
        constraint_taxa = taxa
    else:
        constraint_taxa = None
        # Starting topologies: the requested --start, plus (--restarts - 1)
        # random-addition-order / random restarts (keep the best score).
        starts = [
            _start_tree(
                args.start, patterns, n_states, args.seed, weights,
                args.orders,
            )
        ]
        for r in range(1, args.restarts):
            kind = "stepwise" if args.start == "stepwise" else "random"
            starts.append(
                _start_tree(
                    kind, patterns, n_states, args.seed + 1000 * r, weights,
                    args.orders,
                )
            )
    if args.restarts > 1:
        out["restarts"] = args.restarts

    if args.criterion == "ml":
        from trex_tpu.search.ml import ml_hill_climb

        # Compressed patterns + weights are exact for ML too: the total
        # log-likelihood is a weighted per-site sum.
        best = None
        for st in starts:
            if args.ratchet > 0:
                from trex_tpu.search.ml import ml_iterated_search

                result, lengths, losses = ml_iterated_search(
                    jax.random.PRNGKey(args.seed + 13),
                    st,
                    jnp.asarray(patterns),
                    n_states,
                    n_iterations=args.ratchet,
                    max_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    sequences_are_masks=True,
                    site_weights=weights,
                )
                out["ml_iterations"] = args.ratchet
            else:
                result, lengths, losses = ml_hill_climb(
                    st,
                    jnp.asarray(patterns),
                    n_states,
                    max_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    sequences_are_masks=True,
                    site_weights=weights,
                    constraint_splits=constraint_splits,
                    constraint_taxa=constraint_taxa,
                )
            if best is None or float(losses[-1]) < float(best[2][-1]):
                best = (result, lengths, losses)
        result, lengths, losses = best
        if args.outgroup:
            import dataclasses

            from trex_tpu.io import reroot_on_outgroup

            topo2, lens2 = reroot_on_outgroup(
                result.topology,
                _outgroup_indices(names, args.outgroup),
                np.asarray(lengths),
            )
            result = dataclasses.replace(result, topology=topo2)
            lengths = jnp.asarray(lens2, jnp.float32)
            out["outgroup"] = args.outgroup
        out.update(
            neg_log_likelihood=float(losses[-1]),
            ranking_score=result.score,
            model=args.model,
        )
        if args.model != "jc":
            from trex_tpu.ops.likelihood import optimize_model

            fixed_rates = fixed_freqs = None
            if args.model_file:
                from trex_tpu.io import parse_paml_rates

                with open(args.model_file) as fh:
                    fixed_rates, fixed_freqs = parse_paml_rates(
                        fh.read(), n_states
                    )
            params, model_losses = optimize_model(
                result.topology, jnp.asarray(patterns), n_states,
                model=args.model, sequences_are_masks=True,
                site_weights=weights,
                fixed_rates=fixed_rates, fixed_freqs=fixed_freqs,
            )
            lengths = params["branch_lengths"]
            out["neg_log_likelihood"] = float(model_losses[-1])
            # Model <-> tree iteration (IQ-TREE-style): re-search ranking
            # candidates under the FITTED model (the analytic spr-scan is
            # model-aware too), then refit; stop when the topology is
            # stable.
            for _ in range(args.model_rounds):
                if "rates" not in params:
                    break  # jc+g etc.: ranking model unchanged
                prev_key = np.asarray(result.topology.children).tobytes()
                # Rate-mixture-aware ranking (scan neighborhood only):
                # +rK categories verbatim; +I as an extra rate-0 class.
                mix_kwargs: dict = {}
                if args.neighborhood == "spr-scan":
                    if "category_rates" in params:
                        mix_kwargs = dict(
                            category_rates=jnp.asarray(
                                params["category_rates"]
                            ),
                            category_weights=jnp.asarray(
                                params["category_weights"]
                            ),
                        )
                    elif "p_invariant" in params:
                        from trex_tpu.ops.likelihood import (
                            discrete_gamma_rates,
                        )

                        p_inv = float(params["p_invariant"])
                        g = (
                            np.asarray(
                                discrete_gamma_rates(
                                    float(params["gamma_shape"]), 4
                                )
                            )
                            if "gamma_shape" in params
                            else np.ones((1,))
                        )
                        mix_kwargs = dict(
                            category_rates=jnp.asarray(
                                np.concatenate([g, [0.0]]), jnp.float32
                            ),
                            category_weights=jnp.asarray(
                                np.concatenate(
                                    [
                                        np.full(
                                            g.size, (1.0 - p_inv) / g.size
                                        ),
                                        [p_inv],
                                    ]
                                ),
                                jnp.float32,
                            ),
                        )
                    elif "gamma_shape" in params:
                        mix_kwargs = dict(
                            gamma_shape=params["gamma_shape"]
                        )
                result, lengths, losses = ml_hill_climb(
                    result.topology,
                    jnp.asarray(patterns),
                    n_states,
                    max_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    sequences_are_masks=True,
                    site_weights=weights,
                    rates=jnp.asarray(params["rates"]),
                    freqs=jnp.asarray(params["freqs"]),
                    **mix_kwargs,
                )
                params, model_losses = optimize_model(
                    result.topology, jnp.asarray(patterns), n_states,
                    model=args.model, sequences_are_masks=True,
                    site_weights=weights,
                    fixed_rates=fixed_rates, fixed_freqs=fixed_freqs,
                )
                lengths = params["branch_lengths"]
                out["neg_log_likelihood"] = float(model_losses[-1])
                out["model_rounds"] = out.get("model_rounds", 0) + 1
                if (
                    np.asarray(result.topology.children).tobytes()
                    == prev_key
                ):
                    break
            if out.get("model_rounds") and args.outgroup:
                # Re-apply the outgroup rooting to whatever the iteration
                # settled on (idempotent when already rooted there).
                import dataclasses

                topo2, lens2 = reroot_on_outgroup(
                    result.topology,
                    _outgroup_indices(names, args.outgroup),
                    np.asarray(lengths),
                )
                result = dataclasses.replace(result, topology=topo2)
                lengths = jnp.asarray(lens2, jnp.float32)
            out["gtr_rates"] = np.round(
                np.asarray(params["rates"]), 5
            ).tolist() if not args.model.startswith("empirical") else None
            out["base_frequencies"] = np.round(
                np.asarray(params["freqs"]), 5
            ).tolist()
            if "gamma_shape" in params:
                out["gamma_shape"] = float(params["gamma_shape"])
            if "p_invariant" in params:
                out["p_invariant"] = float(params["p_invariant"])
            for kname in ("kappa", "kappa_purine", "kappa_pyrimidine"):
                if kname in params:
                    out[kname] = float(params[kname])
            if "category_rates" in params:
                out["category_rates"] = np.round(
                    np.asarray(params["category_rates"]), 4
                ).tolist()
                out["category_weights"] = np.round(
                    np.asarray(params["category_weights"]), 4
                ).tolist()
        alrt_support = None
        if args.alrt > 0:
            from trex_tpu.search.alrt import branch_supports

            fitted_rates = jnp.asarray(params["rates"]) if args.model != "jc" else None
            fitted_freqs = jnp.asarray(params["freqs"]) if args.model != "jc" else None
            sup = branch_supports(
                jax.random.PRNGKey(args.seed + 7),
                result.topology,
                jnp.asarray(patterns),
                n_states,
                rates=fitted_rates,
                freqs=fitted_freqs,
                site_weights=weights,
                n_replicates=args.alrt,
                sequences_are_masks=True,
            )
            alrt_support = sup.sh_alrt
            out["alrt"] = [
                None if np.isnan(v) else round(float(v), 3) for v in sup.alrt
            ]
            out["sh_alrt_support"] = [round(float(s), 3) for s in sup.sh_alrt]
            out["rell_support"] = [round(float(s), 3) for s in sup.rell]
        if args.ufboot > 0:
            from trex_tpu.search.ufboot import ultrafast_bootstrap

            fitted_rates = jnp.asarray(params["rates"]) if args.model != "jc" else None
            fitted_freqs = jnp.asarray(params["freqs"]) if args.model != "jc" else None
            ub = ultrafast_bootstrap(
                jax.random.PRNGKey(args.seed + 11),
                result.topology,
                jnp.asarray(patterns),
                n_states,
                rates=fitted_rates,
                freqs=fitted_freqs,
                site_weights=weights,
                n_replicates=args.ufboot,
                sequences_are_masks=True,
            )
            out["ufboot_support"] = [
                round(float(s), 3) for s in ub.support
            ]
            out["ufboot_candidates"] = ub.n_candidates
            out["ufboot_reference_wins"] = int(
                ub.winner_counts[ub.reference_index]
            )
            # UFBoot supports take precedence on the newick labels when both
            # support flavors were requested.
            alrt_support = ub.support
        newick = save_newick(
            result.topology, names, np.asarray(lengths), support=alrt_support
        )
        out["mean_branch_length"] = float(np.asarray(lengths).mean())
        if args.bootstrap > 0:
            from trex_tpu.search.bootstrap import ml_bootstrap_analysis

            support, _ = ml_bootstrap_analysis(
                jax.random.PRNGKey(args.seed + 1),
                result.topology,
                jnp.asarray(patterns),
                n_states,
                n_replicates=args.bootstrap,
                search_rounds=max(args.rounds // 4, 3),
                site_weights=weights,
                sequences_are_masks=True,
            )
            out["bootstrap_replicates"] = args.bootstrap
            out["mean_split_support"] = float(np.mean(support))
            out["split_support"] = [round(float(s), 3) for s in support]
    else:
        cost = CostModel.hamming(n_states).matrix

        def score_batch(topos, cost_m, leaves):
            return batched_scores_fastest(
                topos, cost_m, leaves, site_weights=weights,
                sequences_are_masks=True,
            )

        scan = args.neighborhood == "spr-scan"
        result = None
        for s_idx, st in enumerate(starts):
            if args.ratchet > 0:
                from trex_tpu.search.ratchet import parsimony_ratchet

                attempt = parsimony_ratchet(
                    jax.random.PRNGKey(args.seed + s_idx),
                    st,
                    cost,
                    jnp.asarray(patterns),
                    n_iterations=args.ratchet,
                    climb_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    site_weights=weights,
                    sequences_are_masks=True,
                )
                out["ratchet_iterations"] = args.ratchet
            else:
                attempt = parsimony_hill_climb(
                    st,
                    cost,
                    jnp.asarray(patterns),
                    max_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    score_batch_fn=None if scan else score_batch,
                    site_weights=weights if scan else None,
                    sequences_are_masks=scan,
                    constraint_splits=constraint_splits,
                    constraint_taxa=constraint_taxa,
                )
            if result is None or attempt.score < result.score:
                result = attempt
        out["parsimony_score"] = result.score
        if args.outgroup:
            import dataclasses

            from trex_tpu.io import reroot_on_outgroup

            # Unit-cost parsimony is rerooting-invariant, so the reported
            # score still holds for the rerooted tree.
            topo2, _ = reroot_on_outgroup(
                result.topology, _outgroup_indices(names, args.outgroup)
            )
            result = dataclasses.replace(result, topology=topo2)
            out["outgroup"] = args.outgroup
        if args.decay:
            from trex_tpu.search.bremer import spr_decay_support

            decay, _ = spr_decay_support(
                result.topology, jnp.asarray(patterns),
                site_weights=weights, sequences_are_masks=True,
            )
            out["decay"] = [
                None if np.isnan(d) else round(float(d), 1) for d in decay
            ]
        support = None
        if args.bootstrap > 0:
            from trex_tpu.search.bootstrap import bootstrap_analysis

            support, _ = bootstrap_analysis(
                jax.random.PRNGKey(args.seed + 1),
                result.topology,
                cost,
                jnp.asarray(patterns),
                n_replicates=args.bootstrap,
                search_rounds=max(args.rounds // 4, 3),
                neighborhood="nni",
                site_weights=weights,
                sequences_are_masks=True,
            )
            out["bootstrap_replicates"] = args.bootstrap
            out["mean_split_support"] = float(np.mean(support))
            out["split_support"] = [round(float(s), 3) for s in support]
        # Support values ride the newick as internal node labels.
        newick = save_newick(result.topology, names, support=support)
    out.update(
        search_rounds=result.rounds,
        evaluations=result.evaluations,
        tree=newick,
    )
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(newick + "\n")
    print(json.dumps(out))


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


def cmd_asr(args) -> None:
    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.ops.sankoff import sankoff_reconstruct
    from trex_tpu.search.asr import reconstruct_ancestors
    from trex_tpu.topology import balanced_topology
    from trex_tpu.types import CostModel

    gt = generate_groundtruth(
        args.leaves, args.states, args.mutations, args.sites, seed=args.seed
    )
    cost = CostModel.hamming(args.states).matrix
    leaf = gt.all_sequences[: args.leaves].astype(jnp.int32)
    n_all = 2 * args.leaves - 1
    sankoff_recon, _, _ = sankoff_reconstruct(
        balanced_topology(args.leaves), cost, leaf
    )
    learned = reconstruct_ancestors(
        leaf,
        n_all,
        args.states,
        gt.adjacency,
        jax.random.PRNGKey(args.seed),
        n_iterations=args.iterations,
        learning_rate=args.lr,
    )
    truth = gt.all_sequences[args.leaves :].astype(jnp.int32)
    print(
        json.dumps(
            {
                "sankoff_identity": float(
                    jnp.mean(sankoff_recon[args.leaves :] == truth)
                ),
                "gradient_asr_identity": float(jnp.mean(learned == truth)),
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


def cmd_partition(args) -> None:
    """Partitioned ML model fit: per-partition models, shared tree."""
    import numpy as np

    from trex_tpu.io import parse_partitions
    from trex_tpu.ops.likelihood import optimize_model_partitioned

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    with open(args.partitions) as fh:
        pids, part_names, part_types = parse_partitions(
            fh.read(), int(masks.shape[1])
        )
    if args.tree:
        from trex_tpu.io import align_leaf_order, load_newick

        with open(args.tree) as fh:
            topo, _, tree_names = load_newick(fh.read())
        if sorted(tree_names) != sorted(names):
            raise SystemExit("tree and alignment taxa differ")
        topo = align_leaf_order(topo, tree_names, names)
    else:
        from trex_tpu.search.stepwise import stepwise_addition

        topo, _ = stepwise_addition(
            masks, n_states, sequences_are_masks=True, seed=args.seed
        )
    n_parts = len(part_names)
    models = (
        [m.strip() for m in args.models.split(",")]
        if args.models
        else [args.model] * n_parts
    )
    result, losses = optimize_model_partitioned(
        topo,
        jnp.asarray(masks),
        n_states,
        jnp.asarray(pids),
        models=models,
        linked=args.linked,
        n_iterations=args.iterations,
        sequences_are_masks=True,
    )
    search_rounds = None
    if args.search:
        # Partitioned tree search: the joint ranking matrix is the SUM of
        # per-partition analytic scans (each with its own fitted model and
        # proportional rate multiplier); refit on the winning topology.
        from trex_tpu.search.ml import ml_partitioned_scan_climb

        parts = []
        for p in range(n_parts):
            pp = result["partitions"][p]
            parts.append(
                dict(
                    leaf_sequences=jnp.asarray(masks[:, pids == p]),
                    rates=(
                        jnp.asarray(pp["rates"]) if "rates" in pp else None
                    ),
                    freqs=(
                        jnp.asarray(pp["freqs"]) if "freqs" in pp else None
                    ),
                    gamma_shape=(
                        float(pp["gamma_shape"])
                        if "gamma_shape" in pp
                        else None
                    ),
                    rate_multiplier=float(result["rate_multipliers"][p]),
                )
            )
        sr = ml_partitioned_scan_climb(
            topo, parts, n_states, sequences_are_masks=True
        )
        search_rounds = sr.rounds
        if (
            np.asarray(sr.topology.children).tobytes()
            != np.asarray(topo.children).tobytes()
        ):
            topo = sr.topology
            result, losses = optimize_model_partitioned(
                topo,
                jnp.asarray(masks),
                n_states,
                jnp.asarray(pids),
                models=models,
                linked=args.linked,
                n_iterations=args.iterations,
                sequences_are_masks=True,
            )
    out = {
        "n_taxa": len(names),
        "n_sites": int(masks.shape[1]),
        "linked": args.linked,
        # Sum of per-partition lnLs at the FINAL parameters (losses[-1] is
        # one optimizer step behind).
        "log_likelihood": float(
            sum(
                float(result["partitions"][p]["log_likelihood"])
                for p in range(n_parts)
            )
        ),
        "tree_length": float(
            np.asarray(result["branch_lengths"])[:-1].sum()
        ),
        "partitions": [],
    }
    if search_rounds is not None:
        out["search_rounds"] = search_rounds
    for p in range(n_parts):
        entry = {
            "name": part_names[p],
            "type": part_types[p],
            "model": models[p],
            "n_sites": int((pids == p).sum()),
            "rate_multiplier": round(
                float(result["rate_multipliers"][p]), 4
            ),
            "log_likelihood": float(
                result["partitions"][p]["log_likelihood"]
            ),
        }
        part_params = result["partitions"][p]
        if "gamma_shape" in part_params:
            entry["gamma_shape"] = round(float(part_params["gamma_shape"]), 4)
        if "freqs" in part_params:
            entry["frequencies"] = np.round(
                np.asarray(part_params["freqs"]), 4
            ).tolist()
        out["partitions"].append(entry)
    if args.output_tree:
        from trex_tpu.io import save_newick

        with open(args.output_tree, "w") as fh:
            fh.write(
                save_newick(
                    topo, names, np.asarray(result["branch_lengths"])
                )
                + "\n"
            )
        out["output_tree"] = args.output_tree
    print(json.dumps(out))


def cmd_modeltest(args) -> None:
    """Substitution-model selection by AIC/AICc/BIC on a fixed topology."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.search.model_select import compare_models

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    patterns, weights = compress_alignment(masks)
    if args.tree:
        from trex_tpu.io import align_leaf_order, load_newick

        with open(args.tree) as fh:
            topo, _, tree_names = load_newick(fh.read())
        if sorted(tree_names) != sorted(names):
            raise SystemExit("tree and alignment taxa differ")
        topo = align_leaf_order(topo, tree_names, names)
    else:
        from trex_tpu.search.stepwise import stepwise_addition

        topo, _ = stepwise_addition(
            masks, n_states, sequences_are_masks=True, seed=args.seed
        )
    fixed_rates = fixed_freqs = None
    models = tuple(m.strip() for m in args.models.split(",") if m.strip())
    if args.model_file:
        from trex_tpu.io import parse_paml_rates

        with open(args.model_file) as fh:
            fixed_rates, fixed_freqs = parse_paml_rates(fh.read(), n_states)
    fits = compare_models(
        topo,
        jnp.asarray(np.asarray(patterns), jnp.int32),
        n_states,
        models=models,
        criterion=args.criterion,
        site_weights=jnp.asarray(weights, jnp.float32),
        sequences_are_masks=True,
        n_iterations=args.iterations,
        fixed_rates=fixed_rates,
        fixed_freqs=fixed_freqs,
    )
    print(
        json.dumps(
            {
                "criterion": args.criterion,
                "best": fits[0].model,
                "n_taxa": len(names),
                "n_sites": int(masks.shape[1]),
                "table": [
                    {
                        "model": f.model,
                        "log_likelihood": round(f.log_likelihood, 3),
                        "n_parameters": f.n_parameters,
                        "aic": round(f.aic, 3),
                        "aicc": round(f.aicc, 3),
                        "bic": round(f.bic, 3),
                    }
                    for f in fits
                ],
            }
        )
    )


def cmd_dnds(args) -> None:
    """GY94 codon-model fit (dN/dS) on a coding nucleotide alignment."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import save_newick
    from trex_tpu.models import codon as cd

    names, masks, n_states = _load_alignment(args.fasta, "dna")
    # Codon states want plain ints: single-bit mask -> base index, anything
    # ambiguous (gap/IUPAC multi-state) -> -1 so the whole codon goes missing.
    ints = np.full(masks.shape, -1, dtype=np.int32)
    for b in range(4):
        ints[masks == (1 << b)] = b
    codons = cd.encode_codons(ints, stops=args.stops)
    n_missing = int((codons < 0).sum())

    if args.tree:
        from trex_tpu.io import align_leaf_order, load_newick

        with open(args.tree) as fh:
            topo, _, tree_names = load_newick(fh.read())
        if sorted(tree_names) != sorted(names):
            raise SystemExit("tree and alignment taxa differ")
        topo = align_leaf_order(topo, tree_names, names)
        tree_source = args.tree
    else:
        from trex_tpu.search.stepwise import stepwise_addition

        topo, _ = stepwise_addition(
            masks, n_states, sequences_are_masks=True, seed=args.seed
        )
        tree_source = "stepwise addition (nucleotide parsimony)"

    freqs = cd.codon_frequencies(codons, mode=args.freqs, nuc_states=ints)
    patterns, weights = compress_alignment(codons)
    params, losses = cd.optimize_gy94(
        topo,
        jnp.asarray(patterns, jnp.int32),
        freqs=freqs,
        model=args.model,
        n_iterations=args.iterations,
        site_weights=jnp.asarray(weights, jnp.float32),
    )
    if args.search:
        # Codon-model tree search: rank SPR candidates under GY94 at the
        # fitted kappa/omega (the model-aware analytic scan works at Q=61
        # because GY94 is reversible: S_ij * pi_j generator), then refit
        # the full model on the winning topology.
        from trex_tpu.search.ml import ml_hill_climb

        s_matrix = cd.gy94_exchangeabilities(
            jnp.asarray(params["kappa"]), jnp.asarray(params["omega"])
        )
        result, _, _ = ml_hill_climb(
            topo,
            jnp.asarray(patterns, jnp.int32),
            cd.N_CODONS,
            neighborhood="spr-scan",
            site_weights=jnp.asarray(weights, jnp.float32),
            rates=jnp.asarray(s_matrix, jnp.float32),
            freqs=jnp.asarray(freqs, jnp.float32),
            optimize_final_lengths=False,
        )
        if (
            np.asarray(result.topology.children).tobytes()
            != np.asarray(topo.children).tobytes()
        ):
            topo = result.topology
            params, losses = cd.optimize_gy94(
                topo,
                jnp.asarray(patterns, jnp.int32),
                freqs=freqs,
                model=args.model,
                n_iterations=args.iterations,
                site_weights=jnp.asarray(weights, jnp.float32),
            )
        tree_source = f"{tree_source} + GY94 SPR-scan search"
    lengths = np.asarray(params["branch_lengths"])
    out = {
        "model": args.model,
        "codon_frequencies": args.freqs,
        "tree_source": tree_source,
        "n_taxa": len(names),
        "n_codons": int(codons.shape[1]),
        "unique_codon_patterns": int(patterns.shape[1]),
        "missing_codons": n_missing,
        "kappa": round(float(params["kappa"]), 4),
        "omega": round(float(params["omega"]), 4),
        "log_likelihood": -float(losses[-1]),
        "tree_length": float(lengths[:-1].sum()),
    }
    if "gamma_shape" in params:
        out["gamma_shape"] = round(float(params["gamma_shape"]), 4)
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(save_newick(topo, names, lengths) + "\n")
        out["output_tree"] = args.output_tree
    print(json.dumps(out))


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
    """NK accuracy benchmark: Sankoff vs gradient ASR over lambda values."""
    from trex_tpu.models.nk import evolve_tree, make_landscape
    from trex_tpu.ops.sankoff import sankoff_reconstruct
    from trex_tpu.search.asr import (
        reconstruct_ancestors,
        reconstruct_ancestors_landscape_aware,
    )
    from trex_tpu.topology import balanced_topology, topology_to_adjacency
    from trex_tpu.types import CostModel

    key = jax.random.PRNGKey(args.seed)
    results: dict[str, object] = {}
    topo = balanced_topology(args.leaves)
    adjacency = topology_to_adjacency(topo)
    n_all = 2 * args.leaves - 1
    cost = CostModel.hamming(2).matrix

    for k_epi in args.k_values:
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
        entry = {
            "sankoff": float(jnp.mean(recon[args.leaves :] == truth))
        }
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
            entry[f"gradient_asr(lambda={lam})"] = float(
                jnp.mean(learned == truth)
            )
        results[f"K={k_epi}"] = entry
        print(json.dumps({f"K={k_epi}": entry}), file=sys.stderr)
    print(json.dumps(results))


def cmd_simulate(args) -> None:
    """Simulate an alignment down a tree (seq-gen-style data generation)."""
    import numpy as np

    from trex_tpu.io import (
        DNA,
        PROTEIN,
        load_newick,
        parse_paml_rates,
        save_newick,
        write_fasta,
    )
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.topology import random_topologies

    alphabet = {"dna": DNA, "protein": PROTEIN}[args.alphabet]
    n_states = len(alphabet)
    rng = np.random.default_rng(args.seed)
    if args.coalescent_ne is not None:
        # Kingman genealogy (optionally serial via --sim-tip-ages); branch
        # lengths = clock rate x waiting times.
        from trex_tpu.models.simulate import simulate_coalescent

        tip_ages = None
        if args.sim_tip_ages:
            tip_ages = np.array(
                [float(x) for x in args.sim_tip_ages.split(",")], np.float64
            )
            if tip_ages.size != args.leaves:
                raise SystemExit(
                    f"--sim-tip-ages wants {args.leaves} comma values"
                )
        topo, node_ages = simulate_coalescent(
            args.seed, args.leaves, args.coalescent_ne, tip_ages=tip_ages
        )
        names = [f"t{i}" for i in range(args.leaves)]
        parents_np = np.asarray(topo.parents)
        blens = (
            node_ages[parents_np] - node_ages
        ).astype(np.float64) * args.clock_rate
        blens[-1] = 0.0
    elif args.tree:
        with open(args.tree) as fh:
            topo, blens, names = load_newick(fh.read())
        blens = np.asarray(blens, dtype=np.float64)
        blens = np.where(np.isfinite(blens), blens, 0.0)
        if not (blens[:-1] > 0).any():
            # Topology-only newick: zero lengths would copy the root to
            # every leaf. Substitute the default length instead.
            blens = np.full_like(blens, args.default_blen)
    else:
        topo = jax.tree_util.tree_map(
            lambda x: x[0],
            random_topologies(jax.random.key(args.seed), args.leaves, 1),
        )
        names = [f"t{i}" for i in range(args.leaves)]
        blens = rng.exponential(args.default_blen, size=(topo.n_all,))

    if args.model.lower() == "gy94":
        # Codon simulation: GY94 over the 61 sense codons, written back out
        # as in-frame nucleotide triplets (consumable by `cli dnds`).
        from trex_tpu.models import codon as cd

        codons = cd.simulate_gy94(
            jax.random.key(args.seed), topo, blens,
            kappa=args.kappa, omega=args.omega, n_sites=args.sites,
        )
        rows = [
            "".join(cd.SENSE_CODONS[c] for c in row) for row in codons
        ]
        fasta = "\n".join(
            f">{n}\n{seq}" for n, seq in zip(names, rows)
        ) + "\n"
        if args.output:
            with open(args.output, "w") as fh:
                fh.write(fasta)
        else:
            sys.stdout.write(fasta)
        if args.output_tree:
            with open(args.output_tree, "w") as fh:
                fh.write(save_newick(topo, names, branch_lengths=blens) + "\n")
        print(
            json.dumps(
                {
                    "leaves": int(topo.n_leaves),
                    "codons": args.sites,
                    "model": "gy94",
                    "kappa": args.kappa,
                    "omega": args.omega,
                    "output": args.output,
                }
            ),
            file=sys.stderr,
        )
        return

    rates = freqs = None
    gamma_shape = None
    p_inv = 0.0
    model = args.model.lower()
    parts = model.split("+")
    base = parts[0]
    for extra in parts[1:]:
        if extra == "g":
            gamma_shape = args.gamma_shape
        elif extra == "i":
            p_inv = args.p_inv
        else:
            raise SystemExit(f"unknown model suffix +{extra}")
    if base == "gtr":
        # Random-but-reproducible exchangeabilities/frequencies unless given.
        tri = (
            np.asarray(args.gtr_rates, dtype=np.float64)
            if args.gtr_rates
            else rng.gamma(2.0, 1.0, size=n_states * (n_states - 1) // 2)
        )
        rates = np.zeros((n_states, n_states))
        rates[np.triu_indices(n_states, 1)] = tri
        rates = rates + rates.T
        freqs = (
            np.asarray(args.freqs, dtype=np.float64)
            if args.freqs
            else rng.dirichlet(np.full(n_states, 10.0))
        )
    elif base == "empirical":
        if not args.model_file:
            raise SystemExit("--model empirical needs --model-file")
        with open(args.model_file) as fh:
            rates, freqs = parse_paml_rates(fh.read(), n_states)
    elif base != "jc":
        raise SystemExit(f"unknown model {args.model!r}")

    out = simulate_alignment(
        jax.random.key(args.seed),
        topo,
        blens,
        n_sites=args.sites,
        n_states=n_states,
        rates=rates,
        freqs=freqs,
        gamma_shape=gamma_shape,
        n_categories=args.categories,
        p_invariant=p_inv,
        return_ancestors=bool(args.output_ancestors),
    )
    leaves, ancestors = out if args.output_ancestors else (out, None)
    fasta = write_fasta(names, leaves, alphabet)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(fasta)
    else:
        sys.stdout.write(fasta)
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(save_newick(topo, names, branch_lengths=blens) + "\n")
    if args.output_ancestors:
        anc_names = [f"node{topo.n_leaves + i}" for i in range(topo.n_ancestors)]
        with open(args.output_ancestors, "w") as fh:
            fh.write(write_fasta(anc_names, ancestors, alphabet))
    print(
        json.dumps(
            {
                "leaves": int(topo.n_leaves),
                "sites": args.sites,
                "model": args.model,
                "output": args.output,
            }
        ),
        file=sys.stderr,
    )


def cmd_treedist(args) -> None:
    """Robinson-Foulds distance between two newick trees (shared leaf set)."""
    from trex_tpu.io import load_newick
    from trex_tpu.search.ratchet import unrooted_splits

    import numpy as np

    def named_splits(path):
        """Splits as name-sets, normalized to the side WITHOUT the
        lexicographically-first taxon (index-based sides differ per tree)."""
        with open(path) as fh:
            topo, blens, names = load_newick(fh.read())
        anchor = min(names)
        all_names = frozenset(names)
        splits = set()
        for split in unrooted_splits(topo):
            side = frozenset(names[i] for i in split)
            splits.add(all_names - side if anchor in side else side)
        return topo, blens, names, set(names), splits

    topo_a, blens_a, names_list_a, names_a, splits_a = named_splits(
        args.trees[0]
    )
    topo_b, blens_b, names_list_b, names_b, splits_b = named_splits(
        args.trees[1]
    )
    if names_a != names_b:
        raise SystemExit("trees have different leaf sets")
    rf = len(splits_a ^ splits_b)
    max_rf = 2 * (topo_a.n_leaves - 3)
    out = {
        "rf": int(rf),
        "max_rf": int(max_rf),
        "normalized": float(rf / max_rf) if max_rf > 0 else 0.0,
    }
    blens_a = np.asarray(blens_a, dtype=np.float64)
    blens_b = np.asarray(blens_b, dtype=np.float64)
    if np.isfinite(blens_a[:-1]).all() and np.isfinite(blens_b[:-1]).all():
        # Branch-length-aware metrics need one shared leaf numbering.
        from trex_tpu.io import renumber_leaves
        from trex_tpu.search.treedist import (
            branch_score_distance,
            path_difference_distance,
            weighted_rf_distance,
        )

        order = {n: i for i, n in enumerate(names_list_a)}
        # renumber_leaves permutes the topology; branch lengths are
        # indexed by node, so remap through the clade-free leaf identity:
        # pendant lengths follow their leaf, internal ones follow clades.
        # Simplest exact route: renumber b's LEAF ids only (the metrics
        # key by leaf-set, not node index).
        perm = [order[n] for n in names_list_b]
        topo_b2 = renumber_leaves(topo_b, perm)
        # Remap b's lengths to the renumbered node ids by clade identity.
        from trex_tpu.search.bootstrap import subtree_leaf_sets

        new_lens = np.zeros_like(blens_b)
        old_sets = subtree_leaf_sets(topo_b)
        new_sets = subtree_leaf_sets(topo_b2)
        mapped_old = [frozenset(perm[i] for i in s) for s in old_sets]
        lookup = {
            s: blens_b[topo_b.n_leaves + i] for i, s in enumerate(mapped_old)
        }
        for leaf_old, leaf_new in enumerate(perm):
            new_lens[leaf_new] = blens_b[leaf_old]
        for i, s in enumerate(new_sets):
            new_lens[topo_b2.n_leaves + i] = lookup[s]
        out["branch_score"] = round(
            branch_score_distance(topo_a, blens_a, topo_b2, new_lens), 6
        )
        out["weighted_rf"] = round(
            weighted_rf_distance(topo_a, blens_a, topo_b2, new_lens), 6
        )
        out["path_difference"] = round(
            path_difference_distance(topo_a, blens_a, topo_b2, new_lens), 6
        )
    print(json.dumps(out))


def cmd_consensus(args) -> None:
    """Majority-rule consensus of a file of newick trees (one per line or
    ;-separated), e.g. bootstrap replicate outputs or independent runs."""
    from trex_tpu.io import load_newick, renumber_leaves
    from trex_tpu.search.consensus import majority_rule_consensus

    with open(args.trees) as fh:
        text = fh.read()
    chunks = [c.strip() + ";" for c in text.split(";") if c.strip()]
    if not chunks:
        raise SystemExit(f"{args.trees}: no trees found")
    topos = []
    ref_names: list[str] | None = None
    order: dict[str, int] = {}
    for chunk in chunks:
        topo, _, names = load_newick(chunk)
        if ref_names is None:
            ref_names = names
            order = {n: i for i, n in enumerate(names)}
        elif sorted(names) != sorted(ref_names):
            raise SystemExit("trees have different leaf sets")
        topos.append(renumber_leaves(topo, [order[n] for n in names]))
    assert ref_names is not None
    newick, kept = majority_rule_consensus(
        topos, ref_names, threshold=args.threshold
    )
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(newick + "\n")
    print(
        json.dumps(
            {
                "n_trees": len(topos),
                "threshold": args.threshold,
                "n_splits": len(kept),
                "tree": newick,
            }
        )
    )


def cmd_topotest(args) -> None:
    """KH / SH / BP / ELW topology tests over a multi-newick candidate file."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import load_newick, renumber_leaves
    from trex_tpu.search.topotest import topology_tests
    from trex_tpu.topology import Topology

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    patterns, weights = compress_alignment(masks)
    order = {n: i for i, n in enumerate(names)}

    with open(args.trees) as fh:
        text = fh.read()
    chunks = [c.strip() + ";" for c in text.split(";") if c.strip()]
    topos = []
    for chunk in chunks:
        topo, _, tree_names = load_newick(chunk)
        if sorted(tree_names) != sorted(names):
            raise SystemExit("tree leaf set differs from the alignment")
        topos.append(renumber_leaves(topo, [order[n] for n in tree_names]))
    if len(topos) < 2:
        raise SystemExit("topotest needs at least two candidate trees")
    batch = Topology(
        children=jnp.stack([t.children for t in topos]),
        parents=jnp.stack([t.parents for t in topos]),
    )

    rates = freqs = None
    if args.model != "jc":
        from trex_tpu.ops.likelihood import optimize_model

        fixed_rates = fixed_freqs = None
        if args.model_file:
            from trex_tpu.io import parse_paml_rates

            with open(args.model_file) as fh:
                fixed_rates, fixed_freqs = parse_paml_rates(
                    fh.read(), n_states
                )
        # Fix the substitution model at its ML estimates on the first tree
        # (the standard topology-test protocol).
        params, _ = optimize_model(
            topos[0], jnp.asarray(np.asarray(patterns), jnp.int32), n_states,
            model=args.model, sequences_are_masks=True,
            site_weights=jnp.asarray(weights, jnp.float32),
            fixed_rates=fixed_rates, fixed_freqs=fixed_freqs,
        )
        rates = jnp.asarray(params["rates"])
        freqs = jnp.asarray(params["freqs"])

    res = topology_tests(
        jax.random.PRNGKey(args.seed),
        batch,
        jnp.asarray(np.asarray(patterns), jnp.int32),
        n_states,
        rates=rates,
        freqs=freqs,
        site_weights=jnp.asarray(weights, jnp.float32),
        n_replicates=args.replicates,
        sequences_are_masks=True,
    )
    if args.site_lnl:
        # Expand per-pattern lnLs back to original site order and write the
        # CONSEL/puzzle site-lnL matrix ("T L" header, one row per tree).
        _, first_idx, inverse = np.unique(
            masks, axis=1, return_index=True, return_inverse=True
        )
        order = np.argsort(first_idx)
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        site_lnl = res.per_site[:, rank[inverse.ravel()]]  # (T, L)
        with open(args.site_lnl, "w") as fh:
            fh.write(f"{site_lnl.shape[0]} {site_lnl.shape[1]}\n")
            for t in range(site_lnl.shape[0]):
                fh.write(
                    f"tree{t + 1} "
                    + " ".join(f"{v:.6f}" for v in site_lnl[t])
                    + "\n"
                )
    print(
        json.dumps(
            {
                "n_trees": len(topos),
                "replicates": args.replicates,
                "model": args.model,
                "best": res.best_index,
                "table": [
                    {
                        "tree": i,
                        "log_likelihood": round(float(res.log_likelihoods[i]), 3),
                        "delta": round(float(res.delta[i]), 3),
                        "p_kh": round(float(res.p_kh[i]), 4),
                        "p_sh": round(float(res.p_sh[i]), 4),
                        "p_au": (
                            None
                            if res.p_au is None
                            else round(float(res.p_au[i]), 4)
                        ),
                        "bp": round(float(res.bp[i]), 4),
                        "elw": round(float(res.elw[i]), 4),
                    }
                    for i in range(len(topos))
                ],
            }
        )
    )


def cmd_treeprune(args) -> None:
    """Extract the induced subtree (and optional alignment rows) for a
    taxa subset."""
    import numpy as np

    from trex_tpu.io import load_newick, prune_to_taxa, save_newick

    with open(args.tree) as fh:
        topo, blens, names = load_newick(fh.read())
    wanted = [s.strip() for s in args.taxa.split(",") if s.strip()]
    missing = [w for w in wanted if w not in names]
    if missing:
        raise SystemExit(f"taxa not in the tree: {missing}")
    if args.invert:
        wanted = [n for n in names if n not in set(wanted)]
    keep = [names.index(w) for w in wanted]
    has_lengths = np.isfinite(np.asarray(blens)[:-1]).all() and (
        np.asarray(blens)[:-1] > 0
    ).any()
    pruned, new_blens, kept = prune_to_taxa(
        topo, keep, np.asarray(blens) if has_lengths else None
    )
    new_names = [names[i] for i in kept]
    newick = save_newick(pruned, new_names, branch_lengths=new_blens)
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(newick + "\n")
    if args.alignment:
        from trex_tpu.io import _split_fasta

        with open(args.alignment) as fh:
            aln_names, rows = _split_fasta(fh.read())
        by_name = {n: r for n, r in zip(aln_names, rows)}
        missing_aln = [n for n in new_names if n not in by_name]
        if missing_aln:
            raise SystemExit(f"taxa not in the alignment: {missing_aln}")
        out_path = args.output_alignment or "pruned.fasta"
        with open(out_path, "w") as fh:
            for n in new_names:
                fh.write(f">{n}\n{by_name[n].tobytes().decode('ascii')}\n")
    print(
        json.dumps(
            {
                "kept": len(new_names),
                "dropped": len(names) - len(new_names),
                "tree": newick,
            }
        )
    )


def cmd_treedraw(args) -> None:
    """ASCII rendering of a newick tree (branch lengths as annotations)."""
    import numpy as np

    from trex_tpu.io import format_tree, load_newick

    with open(args.tree) as fh:
        topo, blens, names = load_newick(fh.read())
    annotations = None
    blens = np.asarray(blens)
    if np.isfinite(blens[:-1]).all() and (blens[:-1] > 0).any():
        annotations = {
            i: f":{blens[i]:.4g}" for i in range(topo.n_all - 1)
        }
    sys.stdout.write(format_tree(topo, names, annotations) + "\n")


def cmd_stats(args) -> None:
    """Alignment summary: site classes, composition, missing data."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.io import DNA, PROTEIN

    names, masks, n_states = _load_alignment(args.fasta, args.alphabet)
    alphabet = {"dna": DNA, "protein": PROTEIN}[args.alphabet]
    n, length = masks.shape
    full = (1 << n_states) - 1
    is_single = (masks & (masks - 1)) == 0  # one-bit masks = unambiguous
    is_missing = masks == full

    # Site classes over unambiguous cells only (the standard convention).
    constant = np.zeros(length, bool)
    informative = np.zeros(length, bool)
    variable = np.zeros(length, bool)
    counts_total = np.zeros(n_states, np.int64)
    for col in range(length):
        cells = masks[:, col][is_single[:, col]]
        if cells.size == 0:
            continue
        states, counts = np.unique(cells, return_counts=True)
        idx = np.log2(states).astype(int)
        counts_total[idx] += counts
        if states.size == 1:
            constant[col] = True
        else:
            variable[col] = True
            # Parsimony-informative: >= 2 states each seen >= 2 times.
            informative[col] = int((counts >= 2).sum()) >= 2
    patterns, weights = compress_alignment(masks)
    comp = counts_total / max(counts_total.sum(), 1)
    print(
        json.dumps(
            {
                "n_taxa": n,
                "n_sites": int(length),
                "unique_patterns": int(patterns.shape[1]),
                "constant_sites": int(constant.sum()),
                "variable_sites": int(variable.sum()),
                "parsimony_informative_sites": int(informative.sum()),
                "missing_fraction": round(float(is_missing.mean()), 4),
                "ambiguous_fraction": round(
                    float((~is_single & ~is_missing).mean()), 4
                ),
                "composition": {
                    alphabet[i]: round(float(comp[i]), 4)
                    for i in range(n_states)
                    if comp[i] > 0
                },
            }
        )
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
        brlen_prior_mean=args.brlen_prior_mean,
        site_weights=weights, sequences_are_masks=True,
        rates=rates, freqs=freqs, gamma_shape=gamma_shape,
        sample_model=args.full_bayes,
        leaf_names=names, progress_every=args.progress_every,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        stop_after_generations=args.stop_after,
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


def cmd_trait(args) -> None:
    """Discrete-trait ancestral states on a fixed tree (Mk model).

    Input: a branch-length-bearing newick + a taxon<TAB-or-comma>state
    table ('?' / '-' = missing). The Mk (symmetric k-state, Lewis 2001)
    rate is ML-fit as a single multiplier of the given branch lengths;
    marginal posterior state probabilities come from the inside-outside
    pass (``ops.likelihood_asr``).
    """
    import numpy as np

    from trex_tpu.io import load_newick, save_newick
    from trex_tpu.ops.likelihood import tree_log_likelihood
    from trex_tpu.ops.likelihood_asr import marginal_ancestral_posteriors

    with open(args.tree) as fh:
        topo, blens, names = load_newick(fh.read())
    blens = np.asarray(blens, dtype=np.float64)
    if not np.isfinite(blens[:-1]).all() or not (blens[:-1] > 0).any():
        raise SystemExit("trait analysis needs branch lengths on the tree")
    blens = np.clip(blens, 1e-6, None)
    blens[-1] = 0.0

    states: dict[str, str] = {}
    with open(args.traits) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = [p.strip() for p in line.replace(",", "\t").split("\t")]
            if len(parts) < 2:
                raise SystemExit(f"trait line needs 'taxon<sep>state': {line!r}")
            states[parts[0]] = parts[1]
    missing = [n for n in names if n not in states]
    if missing:
        raise SystemExit(f"traits missing for taxa: {missing[:5]}")
    labels = sorted(
        {v for v in states.values() if v not in ("?", "-", "NA", "")}
    )
    if len(labels) < 2:
        raise SystemExit("need at least two observed trait states")
    code = {v: i for i, v in enumerate(labels)}
    column = np.array(
        [code.get(states[n], -1) for n in names], np.int32
    ).reshape(-1, 1)
    q = len(labels)
    trait = jnp.asarray(column)

    # ML rate multiplier (1-D golden-section on log rate).
    lens_dev = jnp.asarray(blens.astype(np.float32))

    def lnl_at(log_r):
        return float(
            tree_log_likelihood(topo, lens_dev * np.exp(log_r), trait, q)
        )

    lo, hi = -6.0, 4.0
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    c = hi - gr * (hi - lo)
    d = lo + gr * (hi - lo)
    fc, fd = lnl_at(c), lnl_at(d)
    for _ in range(40):
        if fc > fd:
            hi, d, fd = d, c, fc
            c = hi - gr * (hi - lo)
            fc = lnl_at(c)
        else:
            lo, c, fc = c, d, fd
            d = lo + gr * (hi - lo)
            fd = lnl_at(d)
    rate = float(np.exp((lo + hi) / 2.0))
    lnl = lnl_at(np.log(rate))

    posteriors, map_states = marginal_ancestral_posteriors(
        topo, lens_dev * rate, trait, q
    )
    post = np.asarray(posteriors)[:, :, 0]  # (n_all, q)
    maps = np.asarray(map_states)[:, 0]
    n_leaves = len(names)
    node_labels = [
        f"{labels[int(maps[n_leaves + a])]}:"
        f"{post[n_leaves + a, int(maps[n_leaves + a])]:.2f}".replace(":", "=")
        for a in range(n_leaves - 1)
    ]
    out = {
        "n_taxa": n_leaves,
        "states": labels,
        "mk_rate": round(rate, 6),
        "log_likelihood": round(lnl, 4),
        "ancestral_nodes": [
            {
                "ancestor": a,
                "map_state": labels[int(maps[n_leaves + a])],
                "posterior": {
                    labels[s]: round(float(post[n_leaves + a, s]), 4)
                    for s in range(q)
                },
            }
            for a in range(n_leaves - 1)
        ],
        "tree": save_newick(
            topo, names, branch_lengths=blens, support=node_labels
        ),
    }
    if args.output_tree:
        with open(args.output_tree, "w") as fh:
            fh.write(out["tree"] + "\n")
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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="trex_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("score", help="exact Sankoff scoring + reconstruction")
    _add_common(p)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   default=None,
                   help="score a real alignment (FASTA/PHYLIP/NEXUS, "
                        "auto-detected) instead of generated data")
    p.add_argument("--tree", type=str, default=None,
                   help="newick tree to score (default: stepwise addition)")
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--criterion", choices=("parsimony", "ml"),
                   default="parsimony",
                   help="ml = ML branch lengths + marginal posterior ASR")
    p.add_argument("--model", type=str, default="jc",
                   help="substitution model for --criterion ml "
                        "(jc|k80|hky|f81|tn93|gtr|empirical, +g/+g+i/+rK; "
                        "fitted before the ASR)")
    p.add_argument("--model-file", type=str, default=None,
                   help="PAML-format rate file for --model empirical")
    p.add_argument("--site-rates", type=str, default=None,
                   help="write posterior mean per-site rates here "
                        "(needs a rate-mixture model, e.g. gtr+g)")
    p.add_argument("--asr", choices=("marginal", "joint"),
                   default="marginal",
                   help="ancestral reconstruction flavor for --criterion "
                        "ml: per-node marginal posteriors or the jointly "
                        "optimal assignment (Pupko max-product)")
    p.add_argument("--output-fasta", type=str, default=None,
                   help="write leaves + reconstructed ancestors here")
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser(
        "infer", help="infer a tree from an alignment file"
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True,
                   help="FASTA/PHYLIP/NEXUS alignment (auto-detected)")
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--criterion", choices=("parsimony", "ml", "distance"),
                   default="parsimony")
    p.add_argument("--model", default="jc",
                   help="substitution model fitted on the final ML tree: "
                        "jc|k80|hky|f81|tn93|gtr|empirical with optional "
                        "+g, +g+i, or +rK "
                        "(FreeRate, K=2..8); 'empirical' needs --model-file")
    p.add_argument("--model-file", type=str, default=None,
                   help="PAML-format rate file for --model empirical "
                        "(exchangeabilities + frequencies, e.g. LG/WAG .dat)")
    p.add_argument("--start",
                   choices=("stepwise", "nj", "upgma", "random", "balanced"),
                   default="stepwise")
    p.add_argument("--orders", type=int, default=4,
                   help="random addition orders for --start stepwise")
    p.add_argument("--constraint", type=str, default=None,
                   help="newick on a (subset of) taxa; the inferred tree's "
                        "induced subtree must contain its splits (IQ-TREE "
                        "-g); needs --neighborhood nni/spr/tbr")
    p.add_argument("--neighborhood",
                   choices=("spr-scan", "spr", "nni", "tbr"),
                   default="spr-scan",
                   help="spr-scan = analytic all-SPR evaluation (fastest; "
                        "exact under both criteria); tbr = sampled O(n^3) "
                        "TBR set (strongest)")
    p.add_argument("--rounds", type=int, default=100,
                   help="max hill-climb rounds")
    p.add_argument("--ratchet", type=int, default=0,
                   help="parsimony-ratchet iterations (0 = plain climb)")
    p.add_argument("--decay", action="store_true",
                   help="SPR-decay (approximate Bremer) support per "
                        "internal branch (parsimony criterion)")
    p.add_argument("--bootstrap", type=int, default=0,
                   help="bootstrap replicates for split support (0 = none)")
    p.add_argument("--alrt", type=int, default=0,
                   help="SH-aLRT branch supports with this many RELL "
                        "resamples (ML criterion only; 0 = none)")
    p.add_argument("--outgroup", type=str, default=None,
                   help="comma-separated taxa to root the final tree on "
                        "(must form a split of the inferred tree)")
    p.add_argument("--restarts", type=int, default=1,
                   help="independent searches: the --start tree plus N-1 "
                        "random-addition/random starts; best final score "
                        "wins")
    p.add_argument("--model-rounds", type=int, default=0,
                   help="ML model <-> tree iterations: re-search ranking "
                        "candidates under the fitted model, refit, repeat "
                        "until the topology is stable (needs a model with "
                        "free rates, e.g. gtr+g)")
    p.add_argument("--ufboot", type=int, default=0,
                   help="ultrafast bootstrap supports with this many RELL "
                        "replicates over a candidate tree set (ML criterion "
                        "only; 0 = none)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", type=str, default=None)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("search", help="joint topology+sequence search")
    _add_common(p)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--iterations", type=int, default=5000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--restarts", type=int, default=8)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("asr", help="gradient ASR vs Sankoff oracle")
    _add_common(p)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.set_defaults(fn=cmd_asr)

    p = sub.add_parser("search-run", help="checkpointed resumable search")
    _add_common(p)
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--iterations", type=int, default=10000)
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--no-resume", action="store_true")
    p.set_defaults(fn=cmd_search_run)

    p = sub.add_parser("bench", help="batched scoring throughput")
    _add_common(p)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--reps", type=int, default=20)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("ml", help="maximum-likelihood tree search")
    _add_common(p)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--rounds", type=int, default=30)
    p.set_defaults(fn=cmd_ml)

    p = sub.add_parser(
        "partition", help="partitioned ML fit (per-gene models, shared tree)"
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True)
    p.add_argument("--partitions", type=str, required=True,
                   help="RAxML-style partition file (TYPE, name = ranges)")
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--tree", type=str, default=None,
                   help="fixed newick topology (default: stepwise start)")
    p.add_argument("--model", type=str, default="gtr+g",
                   help="model for every partition (unless --models)")
    p.add_argument("--models", type=str, default=None,
                   help="comma-separated per-partition model strings")
    p.add_argument("--linked", choices=("proportional", "equal"),
                   default="proportional",
                   help="branch-length linking across partitions")
    p.add_argument("--iterations", type=int, default=600)
    p.add_argument("--search", action="store_true",
                   help="search topology under the fitted partitioned "
                        "model (summed per-partition analytic SPR scans), "
                        "then refit")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", type=str, default=None)
    p.set_defaults(fn=cmd_partition)

    p = sub.add_parser(
        "modeltest", help="model selection by AIC/AICc/BIC"
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True,
                   help="FASTA/PHYLIP/NEXUS alignment (auto-detected)")
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--tree", type=str, default=None,
                   help="fixed newick topology (default: stepwise start)")
    p.add_argument("--models", type=str,
                   default="jc,jc+g,k80,hky,hky+g,tn93+g,gtr,gtr+g,gtr+g+i,gtr+r3",
                   help="comma-separated candidates "
                        "(jc|k80|hky|f81|tn93|gtr|empirical with "
                        "+g/+g+i/+rK suffixes)")
    p.add_argument("--criterion", choices=("aic", "aicc", "bic"),
                   default="bic")
    p.add_argument("--iterations", type=int, default=500)
    p.add_argument("--model-file", type=str, default=None,
                   help="PAML-format rate file for 'empirical' candidates")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_modeltest)

    p = sub.add_parser(
        "dnds", help="GY94 codon-model fit (kappa, omega=dN/dS)"
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True,
                   help="in-frame coding nucleotide alignment "
                        "(FASTA/PHYLIP/NEXUS, auto-detected)")
    p.add_argument("--tree", type=str, default=None,
                   help="newick tree (default: stepwise-addition start)")
    p.add_argument("--model", choices=("gy94", "gy94+g"), default="gy94")
    p.add_argument("--freqs", choices=("f61", "f3x4", "f1x4"),
                   default="f3x4", help="codon frequency estimator")
    p.add_argument("--stops", choices=("error", "missing"), default="error",
                   help="how to treat in-frame stop codons")
    p.add_argument("--iterations", type=int, default=600)
    p.add_argument("--search", action="store_true",
                   help="search topology under GY94 (analytic SPR scan at "
                        "the fitted kappa/omega) instead of keeping the "
                        "start tree, then refit")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", type=str, default=None)
    p.set_defaults(fn=cmd_dnds)

    p = sub.add_parser("bootstrap", help="bootstrap support + consensus")
    _add_common(p)
    p.add_argument("--mutations", type=int, default=3)
    p.add_argument("--replicates", type=int, default=50)
    p.add_argument("--search-rounds", type=int, default=10)
    p.set_defaults(fn=cmd_bootstrap)

    p = sub.add_parser(
        "simulate",
        help="simulate an alignment down a tree (seq-gen equivalent)",
    )
    p.add_argument("--tree", type=str, default=None,
                   help="newick with branch lengths; omitted -> random "
                        "coalescent topology with exponential lengths")
    p.add_argument("--leaves", type=int, default=16,
                   help="taxon count for the generated tree (no --tree)")
    p.add_argument("--sites", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--model", type=str, default="jc",
                   help="jc|gtr|empirical with optional +g / +i suffixes, "
                        "or gy94 (codon simulation; --sites counts codons, "
                        "output is in-frame nucleotide triplets)")
    p.add_argument("--model-file", type=str, default=None,
                   help="PAML-format rate file for --model empirical")
    p.add_argument("--kappa", type=float, default=2.0,
                   help="GY94 transition/transversion ratio")
    p.add_argument("--omega", type=float, default=0.5,
                   help="GY94 dN/dS ratio")
    p.add_argument("--gtr-rates", type=float, nargs="+", default=None,
                   help="upper-triangle GTR exchangeabilities (default: "
                        "random, seeded)")
    p.add_argument("--freqs", type=float, nargs="+", default=None)
    p.add_argument("--gamma-shape", type=float, default=0.5)
    p.add_argument("--p-inv", type=float, default=0.2)
    p.add_argument("--categories", type=int, default=4)
    p.add_argument("--default-blen", type=float, default=0.1,
                   help="branch length for generated/length-free trees")
    p.add_argument("--output", type=str, default=None,
                   help="FASTA path (default stdout)")
    p.add_argument("--output-tree", type=str, default=None)
    p.add_argument("--output-ancestors", type=str, default=None,
                   help="also write the true ancestral sequences (FASTA)")
    p.add_argument("--coalescent-ne", type=float, default=None,
                   help="sample the genealogy from a Kingman coalescent "
                        "with this Ne (time units); overrides --tree")
    p.add_argument("--clock-rate", type=float, default=1.0,
                   help="substitutions/site/time-unit for coalescent "
                        "genealogies (branch lengths = rate x waiting time)")
    p.add_argument("--sim-tip-ages", type=str, default=None,
                   help="comma list of sampling ages for a SERIAL "
                        "coalescent (pairs with date --tip-ages)")
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser(
        "treedist",
        help="Robinson-Foulds distance between two newick trees",
    )
    p.add_argument("trees", nargs=2, help="two newick files")
    p.set_defaults(fn=cmd_treedist)

    p = sub.add_parser(
        "consensus",
        help="majority-rule consensus of a multi-newick file",
    )
    p.add_argument("trees", help="file with one newick per line")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--output-tree", type=str, default=None)
    p.set_defaults(fn=cmd_consensus)

    p = sub.add_parser(
        "treedraw",
        help="ASCII rendering of a newick tree",
    )
    p.add_argument("--tree", type=str, required=True)
    p.set_defaults(fn=cmd_treedraw)

    p = sub.add_parser(
        "stats",
        help="alignment summary: site classes, composition, missing data",
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True)
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser(
        "treeprune",
        help="extract the induced subtree (+ alignment rows) for a taxa set",
    )
    p.add_argument("--tree", type=str, required=True)
    p.add_argument("--taxa", type=str, required=True,
                   help="comma-separated taxa to keep")
    p.add_argument("--invert", action="store_true",
                   help="drop the listed taxa instead of keeping them")
    p.add_argument("--alignment", type=str, default=None,
                   help="also subset this FASTA to the kept taxa")
    p.add_argument("--output-tree", type=str, default=None)
    p.add_argument("--output-alignment", type=str, default=None)
    p.set_defaults(fn=cmd_treeprune)

    p = sub.add_parser(
        "topotest",
        help="KH/SH/ELW topology tests of candidate trees on one alignment",
    )
    p.add_argument("--alignment", "--fasta", dest="fasta", type=str,
                   required=True,
                   help="FASTA/PHYLIP/NEXUS alignment (auto-detected)")
    p.add_argument("--trees", type=str, required=True,
                   help="multi-newick candidate file")
    p.add_argument("--alphabet", choices=("dna", "protein"), default="dna")
    p.add_argument("--model", type=str, default="jc",
                   help="substitution model, fixed at its ML estimates on "
                        "the first tree (jc|k80|hky|f81|tn93|gtr|empirical)")
    p.add_argument("--model-file", type=str, default=None)
    p.add_argument("--replicates", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--site-lnl", type=str, default=None,
                   help="write per-tree per-site log-likelihoods here "
                        "(CONSEL/puzzle site-lnL format) for external "
                        "AU-test tools")
    p.set_defaults(fn=cmd_topotest)

    p = sub.add_parser(
        "trait",
        help="Mk ancestral states for a discrete trait on a fixed tree",
    )
    p.add_argument("--tree", required=True,
                   help="branch-length-bearing newick")
    p.add_argument("--traits", required=True,
                   help="taxon<TAB or ,>state table ('?' = missing)")
    p.add_argument("--output-tree", default=None,
                   help="newick with MAP-state node labels")
    p.set_defaults(fn=cmd_trait)

    p = sub.add_parser(
        "bayesfactor",
        help="stepping-stone marginal likelihoods / Bayes factors",
    )
    p.add_argument("--fasta", required=True)
    p.add_argument("--tree", required=True)
    p.add_argument("--alphabet", choices=["dna", "protein"], default="dna")
    p.add_argument("--models", default="jc,gtr",
                   help="comma list: jc, gtr, jc+g, gtr+g")
    p.add_argument("--rungs", type=int, default=32)
    p.add_argument("--generations", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_bayesfactor)

    p = sub.add_parser(
        "date",
        help="strict-clock LRT + Bayesian node-age dating of a fixed tree",
    )
    p.add_argument("--fasta", required=True)
    p.add_argument("--tree", required=True)
    p.add_argument("--alphabet", choices=["dna", "protein"], default="dna")
    p.add_argument("--model", default="jc",
                   help="jc or a gtr-family string (+g ok); ML-fit, fixed")
    p.add_argument("--generations", type=int, default=4000)
    p.add_argument("--chains", type=int, default=2)
    p.add_argument("--root-prior-mean", type=float, default=0.3,
                   help="Exponential prior mean on the root age "
                   "(expected substitutions per site)")
    p.add_argument("--clock", choices=["strict", "relaxed"],
                   default="strict",
                   help="relaxed = uncorrelated lognormal branch rates")
    p.add_argument("--relaxed-sd", type=float, default=0.3,
                   help="lognormal sd of the relaxed-clock rate prior")
    p.add_argument("--calibrate", action="append", default=None,
                   metavar="TAXA:MIN:MAX",
                   help="uniform age calibration on a clade's MRCA "
                   "(comma-separated taxa, or 'root'); repeatable; "
                   "switches ages to absolute time + samples the clock "
                   "rate")
    p.add_argument("--tip-ages", default=None,
                   metavar="taxon=age,taxon=age,...",
                   help="heterochronous sampling ages (0 = most recent) "
                   "for tip dating; all taxa required; samples the clock "
                   "rate (identified by the tip-age spread)")
    p.add_argument("--tree-prior", choices=["uniform", "coalescent"],
                   default="uniform",
                   help="coalescent = Kingman prior on node ages")
    p.add_argument("--ne", type=float, default=None,
                   help="fix the coalescent Ne (default: Gibbs-sample it)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", default=None,
                   help="write the posterior-mean ultrametric newick here")
    p.set_defaults(fn=cmd_date)

    p = sub.add_parser(
        "concord",
        help="gene/site concordance factors on a reference tree",
    )
    p.add_argument("--tree", required=True, help="reference newick file")
    p.add_argument("--gene-trees", default=None,
                   help="newick file of per-locus trees (gCF)")
    p.add_argument("--fasta", default=None, help="alignment for sCF")
    p.add_argument("--alphabet", choices=["dna", "protein"], default="dna")
    p.add_argument("--quartets", type=int, default=100,
                   help="random quartets per branch for sCF")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", default=None,
                   help="write the gCF/sCF-labelled newick here")
    p.set_defaults(fn=cmd_concord)

    p = sub.add_parser(
        "mcmc",
        help="Bayesian MCMC tree sampling (Metropolis-coupled chains)",
    )
    p.add_argument("--fasta", required=True)
    p.add_argument("--alphabet", choices=["dna", "protein"], default="dna")
    p.add_argument(
        "--model", default="jc",
        help="jc (default) or a gtr-family string (+g ok); non-jc models "
        "are ML-fit once and held fixed (empirical Bayes)",
    )
    p.add_argument("--generations", type=int, default=10_000)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--heat", type=float, default=0.1)
    p.add_argument("--sample-every", type=int, default=20)
    p.add_argument("--burnin", type=float, default=0.25)
    p.add_argument("--branch-moves", type=int, default=2,
                   help="branch-length moves per generation")
    p.add_argument("--proposal", choices=["informed", "nni"],
                   default="informed")
    p.add_argument("--full-bayes", action="store_true",
                   help="sample GTR exchangeabilities + frequencies in the "
                   "chain (flat Dirichlet priors) instead of fixing them "
                   "at the ML fit")
    p.add_argument("--brlen-prior-mean", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-tree", default=None,
                   help="write the consensus newick here")
    p.add_argument("--samples-out", default=None,
                   help="write sampled trees (newick, one per line) here")
    p.add_argument("--trace-out", default=None,
                   help="Tracer-compatible TSV of scalar traces (lnL, tree "
                   "length, model simplices)")
    p.add_argument("--progress-every", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None,
                   help="resumable state dir (bit-identical resume; keep "
                   "--generations constant across legs)")
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--stop-after", type=int, default=None,
                   help="run at most this many generations this "
                   "invocation, then checkpoint and exit")
    p.set_defaults(fn=cmd_mcmc)

    p = sub.add_parser("nk-bench", help="NK accuracy benchmark")
    _add_common(p)
    p.add_argument("--k-values", type=int, nargs="+", default=[1, 2, 5])
    p.add_argument("--lambdas", type=float, nargs="+", default=[0.0, 0.3, 3.0])
    p.add_argument("--mutation-rate", type=float, default=0.1)
    p.add_argument("--branch-length", type=int, default=1)
    p.add_argument("--iterations", type=int, default=10000)
    p.set_defaults(fn=cmd_nk_bench)
    return parser


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
