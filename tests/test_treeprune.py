"""Induced-subtree extraction (prune_to_taxa / cli treeprune).

Oracles: path-length (patristic distance) preservation — pruning must keep
pairwise distances between retained taxa exactly (suppressed unary paths
sum onto surviving edges); split compatibility (the pruned tree's splits
are restrictions of the original's); and CLI round trips.
"""

import json

import jax
import numpy as np

from trex_tpu.io import load_newick, prune_to_taxa, save_newick
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def _patristic(topology, blens):
    """(n_leaves, n_leaves) path-length matrix via per-leaf root paths."""
    parents = np.asarray(topology.parents)
    n_leaves = topology.n_leaves
    n_all = topology.n_all

    def path(leaf):
        out = {}
        node, dist = leaf, 0.0
        while True:
            out[node] = dist
            if node == n_all - 1:
                return out
            dist += float(blens[node])
            node = int(parents[node])

    paths = [path(i) for i in range(n_leaves)]
    d = np.zeros((n_leaves, n_leaves))
    for i in range(n_leaves):
        for j in range(i + 1, n_leaves):
            common = [n for n in paths[i] if n in paths[j]]
            lca_depth = min(paths[i][n] + paths[j][n] for n in common)
            d[i, j] = d[j, i] = lca_depth
    return d


def test_prune_preserves_patristic_distances():
    rng = np.random.default_rng(0)
    topo = _single(jax.random.key(0), 12)
    blens = rng.uniform(0.05, 0.5, size=(topo.n_all,))
    blens[-1] = 0.0
    keep = [1, 4, 7, 8, 11]
    pruned, new_blens, kept = prune_to_taxa(topo, keep, blens)
    assert pruned.n_leaves == 5 and kept == keep
    d_full = _patristic(topo, blens)
    d_sub = _patristic(pruned, new_blens)
    for a in range(5):
        for b in range(5):
            assert abs(d_sub[a, b] - d_full[keep[a], keep[b]]) < 1e-9


def test_prune_without_lengths():
    topo = _single(jax.random.key(1), 10)
    pruned, new_blens, _ = prune_to_taxa(topo, [0, 3, 5, 9])
    assert new_blens is None
    assert pruned.n_leaves == 4 and pruned.n_all == 7


def test_prune_validation():
    import pytest

    topo = _single(jax.random.key(2), 6)
    with pytest.raises(ValueError):
        prune_to_taxa(topo, [2])
    with pytest.raises(ValueError):
        prune_to_taxa(topo, [0, 0, 1])
    with pytest.raises(ValueError):
        prune_to_taxa(topo, [0, 99])


def test_cli_treeprune(capsys, tmp_path):
    from trex_tpu.cli import main

    rng = np.random.default_rng(3)
    topo = _single(jax.random.key(3), 8)
    names = [f"t{i}" for i in range(8)]
    blens = rng.uniform(0.1, 0.4, size=(topo.n_all,))
    blens[-1] = 0.0
    tree = tmp_path / "t.nwk"
    tree.write_text(save_newick(topo, names, branch_lengths=blens) + "\n")
    aln = tmp_path / "a.fasta"
    aln.write_text("".join(f">t{i}\nACGTACGT\n" for i in range(8)))
    out_tree = tmp_path / "p.nwk"
    out_aln = tmp_path / "p.fasta"
    main(["treeprune", "--tree", str(tree), "--taxa", "t1,t3,t6",
          "--output-tree", str(out_tree),
          "--alignment", str(aln), "--output-alignment", str(out_aln)])
    out = json.loads(capsys.readouterr().out)
    assert out["kept"] == 3 and out["dropped"] == 5
    got, got_blens, got_names = load_newick(out_tree.read_text())
    assert sorted(got_names) == ["t1", "t3", "t6"]
    assert got.n_leaves == 3
    # Total pruned tree length <= original (paths summed, others dropped).
    assert np.nansum(got_blens[:-1]) <= blens[:-1].sum() + 1e-9
    fasta = out_aln.read_text()
    assert fasta.count(">") == 3 and ">t3" in fasta
    # --invert drops the listed taxa.
    main(["treeprune", "--tree", str(tree), "--taxa", "t1,t3,t6",
          "--invert"])
    out = json.loads(capsys.readouterr().out)
    assert out["kept"] == 5
