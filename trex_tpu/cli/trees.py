"""Tree-file utilities: treedist, consensus, topotest, treeprune."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from trex_tpu.cli._common import _load_alignment

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
    from trex_tpu.cli._common import _make_cli_mesh
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
        mesh=_make_cli_mesh(getattr(args, "mesh", None)),
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
