"""Constrained tree search (IQ-TREE -g style): required splits survive."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import sample_topologies
from trex_tpu.search.bootstrap import subtree_leaf_sets
from trex_tpu.search.hillclimb import constraint_mask, parsimony_hill_climb
from trex_tpu.search.ratchet import unrooted_splits
from trex_tpu.types import CostModel


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


def _unrooted(topo):
    n = topo.n_leaves
    every = frozenset(range(n))
    out = set()
    for s in unrooted_splits(topo):
        out.add(min(s, every - s, key=lambda x: (len(x), sorted(x))))
    return out


def test_constraint_mask_exact():
    topo = _single(3, 10)
    splits = [s for s in subtree_leaf_sets(topo) if 2 <= len(s) <= 8]
    check = constraint_mask(splits[:2], 10)
    batch = np.asarray(topo.children)[None]
    assert check(batch)[0]
    other = _single(11, 10)
    # A random other tree is unlikely to contain both splits; verify via
    # the exact set computation rather than assuming.
    want = {min(s, frozenset(range(10)) - s, key=lambda x: (len(x), sorted(x)))
            for s in splits[:2]}
    exact = want <= _unrooted(other)
    assert check(np.asarray(other.children)[None])[0] == exact


def test_constrained_climb_keeps_split_unconstrained_breaks_it():
    from trex_tpu.models.simulate import simulate_alignment

    truth = _single(9, 8)
    aln = simulate_alignment(
        jax.random.PRNGKey(4), truth, np.full(15, 0.15, np.float32),
        n_sites=400,
    )
    seqs = jnp.asarray(aln.astype(np.int32))
    cost = CostModel.hamming(4).matrix

    # Start from a wrong tree; constrain on one of ITS splits that the
    # true tree lacks.
    start = _single(21, 8)
    truth_splits = _unrooted(truth)
    every = frozenset(range(8))
    wrong_split = next(
        min(s, every - s, key=lambda x: (len(x), sorted(x)))
        for s in subtree_leaf_sets(start)
        if 2 <= len(s) <= 6
        and min(s, every - s, key=lambda x: (len(x), sorted(x)))
        not in truth_splits
    )

    free = parsimony_hill_climb(
        start, cost, seqs, neighborhood="spr", max_rounds=30
    )
    constrained = parsimony_hill_climb(
        start, cost, seqs, neighborhood="spr", max_rounds=30,
        constraint_splits=[wrong_split],
    )
    assert wrong_split in _unrooted(constrained.topology)
    assert wrong_split not in _unrooted(free.topology)
    # The constraint costs parsimony score but search still improves.
    assert constrained.score <= parsimony_hill_climb(
        start, cost, seqs, neighborhood="spr", max_rounds=0
    ).score
    assert free.score <= constrained.score


def test_constrained_start_violation_raises():
    truth = _single(9, 8)
    other = _single(21, 8)
    bad = next(
        s for s in subtree_leaf_sets(other)
        if 2 <= len(s) <= 6 and s not in set(subtree_leaf_sets(truth))
    )
    with pytest.raises(ValueError, match="violates"):
        parsimony_hill_climb(
            truth, CostModel.hamming(4).matrix,
            jnp.zeros((8, 16), jnp.int32), neighborhood="nni",
            constraint_splits=[bad],
        )


def test_constrained_ml_climb():
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.ml import ml_hill_climb

    truth = _single(9, 8)
    aln = simulate_alignment(
        jax.random.PRNGKey(4), truth, np.full(15, 0.15, np.float32),
        n_sites=300,
    )
    seqs = jnp.asarray(aln.astype(np.int32))
    start = _single(21, 8)
    every = frozenset(range(8))
    wrong_split = next(
        min(s, every - s, key=lambda x: (len(x), sorted(x)))
        for s in subtree_leaf_sets(start)
        if 2 <= len(s) <= 6
        and min(s, every - s, key=lambda x: (len(x), sorted(x)))
        not in _unrooted(truth)
    )
    result, lengths, _ = ml_hill_climb(
        start, seqs, 4, neighborhood="spr", max_rounds=20,
        constraint_splits=[wrong_split],
    )
    assert wrong_split in _unrooted(result.topology)
    with pytest.raises(ValueError, match="spr-scan"):
        ml_hill_climb(
            start, seqs, 4, neighborhood="spr-scan",
            constraint_splits=[wrong_split],
        )


def test_constrained_start_grafts_remaining_taxa():
    from trex_tpu.search.hillclimb import constrained_start

    constraint = _single(5, 5)  # on taxa ids below
    ids = [1, 3, 4, 6, 7]
    full = constrained_start(constraint, ids, 10, seed=0)
    assert full.n_leaves == 10
    # The induced splits survive grafting.
    every = frozenset(ids)
    wanted = [
        frozenset(ids[i] for i in s)
        for s in subtree_leaf_sets(constraint)
        if 2 <= len(s) <= 3
    ]
    check = constraint_mask(wanted, 10, constraint_taxa=every)
    assert check(np.asarray(full.children)[None])[0]


def test_cli_infer_constraint(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import write_fasta
    from trex_tpu.models.simulate import simulate_alignment

    truth = _single(9, 8)
    names = [f"t{i}" for i in range(8)]
    aln = simulate_alignment(
        jax.random.PRNGKey(4), truth, np.full(15, 0.15, np.float32),
        n_sites=300,
    )
    fasta = tmp_path / "aln.fasta"
    fasta.write_text(write_fasta(names, aln))

    # Constrain on a WRONG quartet over 4 taxa: pair two taxa the true
    # tree separates.
    every8 = frozenset(range(8))
    true_splits = _unrooted(truth)
    wrong_pair = next(
        frozenset(p)
        for p in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        if min(frozenset(p), every8 - frozenset(p),
               key=lambda x: (len(x), sorted(x))) not in true_splits
    )
    a, b = sorted(wrong_pair)
    others = [i for i in range(8) if i not in wrong_pair][:2]
    ctree = tmp_path / "constraint.nwk"
    ctree.write_text(
        f"((t{a},t{b}),(t{others[0]},t{others[1]}));\n"
    )
    out_tree = tmp_path / "out.nwk"
    main([
        "infer", "--fasta", str(fasta), "--constraint", str(ctree),
        "--neighborhood", "spr", "--output-tree", str(out_tree),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraint_splits"] >= 1
    from trex_tpu.io import load_newick, renumber_leaves

    topo, _, onames = load_newick(out_tree.read_text())
    order = {n: i for i, n in enumerate(names)}
    topo = renumber_leaves(topo, [order[n] for n in onames])
    taxa = frozenset([a, b] + others)
    check = constraint_mask([wrong_pair], 8, constraint_taxa=taxa)
    assert check(np.asarray(topo.children)[None])[0]
