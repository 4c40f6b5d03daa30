"""Leaf renumbering and the standalone consensus CLI.

Oracles: renumbering with the identity permutation is a no-op; two newick
serializations of the SAME tree with different leaf name orders consense to
that tree with all-1.0 supports; a conflicting minority tree's splits drop
out of the majority rule.
"""

import json

import jax
import numpy as np

from trex_tpu.io import load_newick, renumber_leaves, save_newick
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def test_renumber_identity_preserves_structure():
    # Identity permutation: same tree (ancestor numbering re-canonicalized
    # to the structure-determined order, so compare clades, not arrays).
    from trex_tpu.search.ratchet import robinson_foulds

    topo = _single(jax.random.key(0), 8)
    same = renumber_leaves(topo, list(range(8)))
    assert robinson_foulds(same, topo) == 0
    # And re-canonicalizing a canonical tree IS a no-op.
    again = renumber_leaves(same, list(range(8)))
    np.testing.assert_array_equal(
        np.asarray(again.children), np.asarray(same.children)
    )


def test_renumber_aligns_name_orders():
    # Serialize, then parse: the parsed tree numbers leaves by file order,
    # which differs from the engine order unless renumbered back.
    topo = _single(jax.random.key(1), 10)
    names = [f"x{i}" for i in range(10)]
    parsed, _, parsed_names = load_newick(save_newick(topo, names))
    order = {n: i for i, n in enumerate(names)}
    aligned = renumber_leaves(parsed, [order[n] for n in parsed_names])
    assert rf_distance_unrooted(aligned, topo) == 0


def test_cli_consensus(capsys, tmp_path):
    from trex_tpu.cli import main

    topo = _single(jax.random.key(2), 8)
    names = [f"t{i}" for i in range(8)]
    other = _single(jax.random.key(3), 8)
    # 3 copies of `topo` + 1 conflicting tree: majority keeps topo's splits.
    path = tmp_path / "trees.nwk"
    path.write_text(
        "\n".join(
            [save_newick(topo, names)] * 3 + [save_newick(other, names)]
        )
        + "\n"
    )
    out_tree = tmp_path / "cons.nwk"
    main(["consensus", str(path), "--output-tree", str(out_tree)])
    out = json.loads(capsys.readouterr().out)
    assert out["n_trees"] == 4
    cons_text = out_tree.read_text()
    assert cons_text.strip() == out["tree"]
    # Every taxon appears; majority splits carry support >= 0.75.
    for n in names:
        assert n in cons_text
    # Unanimity case: all trees identical -> consensus == input topology.
    path2 = tmp_path / "same.nwk"
    path2.write_text("\n".join([save_newick(topo, names)] * 5) + "\n")
    main(["consensus", str(path2)])
    out2 = json.loads(capsys.readouterr().out)
    parsed, _, pnames = load_newick(out2["tree"])
    order = {n: i for i, n in enumerate(names)}
    aligned = renumber_leaves(parsed, [order[n] for n in pnames])
    assert rf_distance_unrooted(aligned, topo) == 0


def test_cli_consensus_rejects_mismatched_leafsets(tmp_path, capsys):
    import pytest

    from trex_tpu.cli import main

    path = tmp_path / "bad.nwk"
    path.write_text("((a,b),(c,d));\n((a,b),(c,e));\n")
    with pytest.raises(SystemExit):
        main(["consensus", str(path)])


def test_cli_infer_distance_criterion(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, load_newick, write_fasta
    from trex_tpu.models.simulate import simulate_alignment

    truth = _single(jax.random.key(20), 10)
    blens = np.full((truth.n_all,), 0.15)
    leaves = simulate_alignment(jax.random.key(21), truth, blens,
                                n_sites=3000)
    path = tmp_path / "a.fasta"
    names = [f"t{i}" for i in range(10)]
    path.write_text(write_fasta(names, leaves, DNA))
    main(["infer", "--fasta", str(path), "--criterion", "distance",
          "--start", "nj", "--outgroup", "t4"])
    out = json.loads(capsys.readouterr().out)
    assert out["method"] == "nj" and out["tree_length"] > 0
    topo, blens2, pnames = load_newick(out["tree"])
    # NJ on long clean data recovers the true unrooted topology.
    from trex_tpu.io import renumber_leaves

    order = {n: i for i, n in enumerate(names)}
    aligned = renumber_leaves(topo, [order[n] for n in pnames])
    assert rf_distance_unrooted(aligned, truth) == 0
    # Outgroup rooting applied.
    root_kids = np.asarray(topo.children)[-1]
    leaf_kids = [pnames[int(k)] for k in root_kids if int(k) < 10]
    assert "t4" in leaf_kids


def test_cli_infer_restarts(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta
    from trex_tpu.models.simulate import simulate_alignment

    truth = _single(jax.random.key(30), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(31), truth, blens, n_sites=200)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], leaves, DNA))
    # Single random start vs 4 restarts: more starts can only match or
    # improve the best parsimony score.
    main(["infer", "--fasta", str(path), "--start", "random",
          "--neighborhood", "nni"])
    one = json.loads(capsys.readouterr().out)
    main(["infer", "--fasta", str(path), "--start", "random",
          "--neighborhood", "nni", "--restarts", "4"])
    many = json.loads(capsys.readouterr().out)
    assert many["restarts"] == 4
    assert many["parsimony_score"] <= one["parsimony_score"]
    # ML criterion restarts run too.
    main(["infer", "--fasta", str(path), "--criterion", "ml", "--start",
          "random", "--neighborhood", "nni", "--restarts", "2"])
    ml = json.loads(capsys.readouterr().out)
    assert ml["restarts"] == 2 and "neg_log_likelihood" in ml
