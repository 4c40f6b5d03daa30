"""Alignment simulation: the `simulate` command."""

from __future__ import annotations

import json
import sys

import jax

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
