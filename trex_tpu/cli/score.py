"""Scoring / reconstruction commands: score, asr, treedraw, stats, trait."""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from trex_tpu.cli._common import _load_alignment

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
