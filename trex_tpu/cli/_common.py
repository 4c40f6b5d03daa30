"""Shared helpers for the CLI command modules."""

from __future__ import annotations

import argparse

import jax

def _make_cli_mesh(spec: str | None):
    """Build a ('tree', 'site') mesh from a ``--mesh T,S`` CLI spec.

    ``"T,S"`` = explicit axis sizes (T*S must equal the addressable device
    count); ``"auto"`` = the ``make_mesh`` heuristic over all devices;
    None = no mesh (single-device drivers).
    """
    if spec is None:
        return None
    from trex_tpu.parallel.mesh import make_mesh

    if spec == "auto":
        return make_mesh()
    try:
        t_str, s_str = spec.split(",")
        t, s = int(t_str), int(s_str)
    except ValueError:
        raise SystemExit(f"--mesh wants 'T,S' or 'auto', got {spec!r}")
    n = len(jax.devices())
    if t * s != n:
        raise SystemExit(
            f"--mesh {t},{s}: {t}*{s} != {n} addressable devices"
        )
    return make_mesh(tree_parallelism=t)


def _add_mesh_flag(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--mesh", type=str, default=None, metavar="T,S",
        help="shard work over a ('tree','site') device mesh: T,S axis "
        "sizes (product = device count) or 'auto'. Default: single device",
    )


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
