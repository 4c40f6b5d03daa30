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


def test_simulate_coalescent_statistics():
    """E[T_mrca] = 2 Ne (1 - 1/n); n=2 root ~ Exp(Ne) exactly; serial
    genealogies respect tip ages and parent>child ordering."""
    from trex_tpu.models.simulate import simulate_coalescent

    ne, n = 0.5, 8
    roots = [simulate_coalescent(s, n, ne)[1][-1] for s in range(300)]
    assert abs(np.mean(roots) - 2 * ne * (1 - 1 / n)) < 0.1

    r2 = np.array([simulate_coalescent(s, 2, 0.4)[1][-1] for s in range(1500)])
    assert abs(r2.mean() - 0.4) < 0.04
    assert abs(r2.std() - 0.4) < 0.05

    tips = np.array([0.0, 0.5, 1.0, 1.5, 0.2, 0.8])
    topo, ages = simulate_coalescent(1, 6, 0.3, tip_ages=tips)
    np.testing.assert_allclose(ages[:6], tips, atol=1e-6)
    parents = np.asarray(topo.parents)
    for v in range(10):
        assert ages[parents[v]] > ages[v] - 1e-9
    assert ages[-1] > tips.max()


def test_cli_simulate_coalescent_roundtrip(capsys, tmp_path):
    """simulate --coalescent-ne writes a serial alignment that date
    --tip-ages can consume end-to-end."""
    import jax.numpy as jnp

    from trex_tpu.cli import main

    fasta = tmp_path / "coal.fasta"
    tree = tmp_path / "coal.nwk"
    main([
        "simulate", "--coalescent-ne", "0.3", "--leaves", "6",
        "--sites", "400", "--clock-rate", "0.2", "--seed", "3",
        "--sim-tip-ages", "0,0.4,0.8,1.2,0.2,0.6",
        "--output", str(fasta), "--output-tree", str(tree),
    ])
    capsys.readouterr()
    text = fasta.read_text()
    assert text.count(">") == 6
    main([
        "date", "--fasta", str(fasta), "--tree", str(tree),
        "--generations", "800", "--chains", "1",
        "--tip-ages", ",".join(
            f"t{i}={a}" for i, a in enumerate([0, 0.4, 0.8, 1.2, 0.2, 0.6])
        ),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # Rate identified by the tip spread: truth 0.2 inside a loose window.
    assert 0.05 < out["clock_rate"]["mean"] < 0.6
