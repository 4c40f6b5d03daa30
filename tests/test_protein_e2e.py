"""End-to-end protein (20-state) workflow through the CLI.

Exercises the full amino-acid path: a PAML-format rate fixture (written in
the published .dat layout) -> `simulate --alphabet protein --model
empirical` -> `infer --alphabet protein` under parsimony and ML with the
same empirical matrix -> true-topology recovery (RF 0 on clean data).
"""

import json

import jax
import numpy as np
import pytest

from trex_tpu.io import PROTEIN, load_newick, renumber_leaves
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


@pytest.fixture(scope="module")
def paml_file(tmp_path_factory):
    """A random reversible AA model in the PAML .dat layout."""
    rng = np.random.default_rng(0)
    q = 20
    tri = rng.gamma(1.0, 1.0, size=q * (q - 1) // 2)
    freqs = rng.dirichlet(np.full(q, 5.0))
    lines = []
    k = 0
    for i in range(1, q):
        row = " ".join(f"{tri[k + j]:.5f}" for j in range(i))
        k += i
        lines.append(row)
    lines.append("")
    lines.append(" ".join(f"{f:.6f}" for f in freqs))
    lines.append("")
    lines.append("random test matrix (PAML layout)")
    path = tmp_path_factory.mktemp("paml") / "test_matrix.dat"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_protein_simulate_infer_roundtrip(capsys, tmp_path, paml_file):
    from trex_tpu.cli import main

    from trex_tpu.io import save_newick

    # Uniform modest branch lengths: parsimony is consistent here (the
    # CLI's generated trees draw exponential lengths, whose long-branch
    # draws can make a different topology genuinely more parsimonious).
    truth0 = _single(jax.random.key(40), 10)
    names = [f"p{i}" for i in range(10)]
    uniform = np.full((truth0.n_all,), 0.15)
    tree = tmp_path / "true.nwk"
    tree.write_text(save_newick(truth0, names, branch_lengths=uniform) + "\n")
    aln = tmp_path / "prot.fasta"
    main([
        "simulate", "--alphabet", "protein", "--model", "empirical",
        "--model-file", paml_file, "--tree", str(tree),
        "--sites", "600", "--seed", "4", "--output", str(aln),
    ])
    capsys.readouterr()
    text = aln.read_text()
    # All 20 amino acids in play on 6000 characters.
    used = {c for line in text.splitlines() if not line.startswith(">")
            for c in line}
    assert used <= set(PROTEIN)
    assert len(used) >= 18

    truth, _, truth_names = load_newick(tree.read_text())

    # Parsimony inference recovers the topology (SPR: NNI from the NJ
    # start parks at an RF-2 local optimum on this fixture).
    main(["infer", "--fasta", str(aln), "--alphabet", "protein",
          "--start", "nj", "--neighborhood", "spr"])
    out = json.loads(capsys.readouterr().out)
    got, _, got_names = load_newick(out["tree"])
    order = {n: i for i, n in enumerate(truth_names)}
    aligned = renumber_leaves(got, [order[n] for n in got_names])
    truth_aligned = renumber_leaves(truth, [order[n] for n in truth_names])
    assert rf_distance_unrooted(aligned, truth_aligned) == 0

    # ML with the same empirical matrix: recovers topology, reports lnL.
    main(["infer", "--fasta", str(aln), "--alphabet", "protein",
          "--criterion", "ml", "--start", "nj", "--neighborhood", "nni",
          "--model", "empirical", "--model-file", paml_file])
    out = json.loads(capsys.readouterr().out)
    got, _, got_names = load_newick(out["tree"])
    aligned = renumber_leaves(got, [order[n] for n in got_names])
    assert rf_distance_unrooted(aligned, truth_aligned) == 0
    assert out["neg_log_likelihood"] > 0


def test_protein_modeltest_empirical_vs_jc(capsys, tmp_path, paml_file):
    """Model selection prefers the true (empirical) matrix over JC."""
    from trex_tpu.cli import main

    aln = tmp_path / "p.fasta"
    main([
        "simulate", "--alphabet", "protein", "--model", "empirical",
        "--model-file", paml_file, "--leaves", "8", "--sites", "400",
        "--seed", "9", "--default-blen", "0.2", "--output", str(aln),
    ])
    capsys.readouterr()
    main(["modeltest", "--fasta", str(aln), "--alphabet", "protein",
          "--models", "jc,empirical", "--model-file", paml_file])
    out = json.loads(capsys.readouterr().out)
    assert out["best"] == "empirical"
