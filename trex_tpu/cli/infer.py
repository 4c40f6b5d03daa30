"""File-based tree inference: the `infer` command."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from trex_tpu.cli._common import (
    _load_alignment,
    _outgroup_indices,
    _start_tree,
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
    from trex_tpu.cli._common import _make_cli_mesh

    mesh = _make_cli_mesh(getattr(args, "mesh", None))
    if mesh is not None:
        out["mesh"] = dict(mesh.shape)
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
                    mesh=mesh,
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
                    mesh=mesh,
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
                    mesh=mesh,
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
                mesh=mesh,
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
                mesh=mesh,
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
                mesh=mesh,
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
                    mesh=mesh,
                )
                out["ratchet_iterations"] = args.ratchet
            else:
                attempt = parsimony_hill_climb(
                    st,
                    cost,
                    jnp.asarray(patterns),
                    max_rounds=args.rounds,
                    neighborhood=args.neighborhood,
                    # With a mesh the climb builds its own sharded scorer
                    # (weights/masks-aware), so the single-device wrapper
                    # must stand aside.
                    score_batch_fn=(
                        None if scan or mesh is not None else score_batch
                    ),
                    site_weights=weights if scan or mesh is not None else None,
                    sequences_are_masks=scan or mesh is not None,
                    constraint_splits=constraint_splits,
                    constraint_taxa=constraint_taxa,
                    mesh=mesh,
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
                mesh=mesh,
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
                mesh=mesh,
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
