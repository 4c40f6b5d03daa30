"""Discrete-trait (Mk) ancestral states through the CLI."""

from __future__ import annotations

import json

import jax
import numpy as np

from trex_tpu.io import sample_topologies, save_newick


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


def test_cli_trait_reconstructs_clade_state(capsys, tmp_path):
    """A trait carried by one clade: its MRCA reconstructs that state."""
    from trex_tpu.cli import main
    from trex_tpu.search.bootstrap import subtree_leaf_sets

    topo = _single(3, 8)
    rng = np.random.default_rng(0)
    lengths = rng.uniform(0.05, 0.15, size=topo.n_all)
    lengths[-1] = 0.0
    names = [f"t{i}" for i in range(8)]
    tree_file = tmp_path / "t.nwk"
    tree_file.write_text(save_newick(topo, names, branch_lengths=lengths))

    # Pick a non-root clade; give it state "winged", everyone else "wingless".
    clades = subtree_leaf_sets(topo)
    clade_idx, clade = next(
        (i, s) for i, s in enumerate(clades) if 2 <= len(s) <= 4
    )
    trait_file = tmp_path / "traits.tsv"
    trait_file.write_text(
        "".join(
            f"{n}\t{'winged' if i in clade else 'wingless'}\n"
            for i, n in enumerate(names)
        )
    )
    main([
        "trait", "--tree", str(tree_file), "--traits", str(trait_file),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["states"] == ["winged", "wingless"]
    assert out["mk_rate"] > 0
    node = next(
        b for b in out["ancestral_nodes"] if b["ancestor"] == clade_idx
    )
    assert node["map_state"] == "winged"
    assert node["posterior"]["winged"] > 0.8
    # The root (deepest ancestor) should lean wingless (majority state).
    root = out["ancestral_nodes"][-1]
    assert root["map_state"] == "wingless"
    assert "=" in out["tree"] or "winged" in out["tree"]


def test_cli_trait_missing_data(capsys, tmp_path):
    from trex_tpu.cli import main

    topo = _single(5, 6)
    rng = np.random.default_rng(1)
    lengths = rng.uniform(0.05, 0.15, size=topo.n_all)
    lengths[-1] = 0.0
    names = [f"s{i}" for i in range(6)]
    tree_file = tmp_path / "t.nwk"
    tree_file.write_text(save_newick(topo, names, branch_lengths=lengths))
    trait_file = tmp_path / "traits.csv"
    trait_file.write_text(
        "s0,red\ns1,red\ns2,?\ns3,blue\ns4,blue\ns5,?\n"
    )
    main([
        "trait", "--tree", str(tree_file), "--traits", str(trait_file),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["states"] == ["blue", "red"]
    for node in out["ancestral_nodes"]:
        total = sum(node["posterior"].values())
        assert abs(total - 1.0) < 0.01
