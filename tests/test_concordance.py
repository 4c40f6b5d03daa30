"""Gene/site concordance factors: null-case, signal, and CLI checks.

Oracles: (1) perfectly concordant inputs give 100% factors; (2) random
data gives the exact sCF null of 1/3 (three quartet resolutions, uniform);
(3) a known mixture of gene trees gives the mixture fraction.
"""

from __future__ import annotations

import json

import jax
import numpy as np
import pytest

from trex_tpu.io import sample_topologies
from trex_tpu.search.concordance import (
    _internal_branches,
    concordance_factors,
)


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


@pytest.mark.parametrize("seed,n_leaves", [(3, 8), (5, 12), (9, 6)])
def test_branch_groups_partition_leaves(seed, n_leaves):
    topo = _single(seed, n_leaves)
    branches = _internal_branches(topo)
    # Unrooted internal edges of an n-leaf binary tree: n - 3.
    assert len(branches) == n_leaves - 3
    for _, groups in branches:
        union = set().union(*(set(g) for g in groups))
        assert union == set(range(n_leaves))
        assert sum(len(g) for g in groups) == n_leaves


def test_scf_null_is_one_third_on_random_data():
    topo = _single(3, 8)
    rand = np.random.default_rng(0).integers(0, 4, size=(8, 4000))
    res = concordance_factors(topo, leaf_sequences=rand, n_quartets=60)
    vals = res.scf[~np.isnan(res.scf)]
    assert vals.size == 5
    np.testing.assert_allclose(vals, 1 / 3, atol=0.05)


def test_scf_high_on_concordant_simulated_data():
    from trex_tpu.models.simulate import simulate_alignment

    topo = _single(3, 8)
    aln = simulate_alignment(
        jax.random.PRNGKey(0), topo, np.full(15, 0.1, np.float32),
        n_sites=600,
    )
    res = concordance_factors(topo, leaf_sequences=aln)
    vals = res.scf[~np.isnan(res.scf)]
    assert np.all(vals > 0.5)


def test_gcf_matches_mixture_fraction():
    truth = _single(3, 8)
    others = [_single(s, 8) for s in (11, 12)]
    res = concordance_factors(truth, gene_trees=[truth] * 8 + others)
    vals = res.gcf[~np.isnan(res.gcf)]
    # Every true branch is in >= 8/10 trees (random trees may share some).
    assert np.all(vals >= 0.8)
    assert np.all(vals <= 1.0)
    # Fully concordant input: exactly 1 everywhere.
    res_all = concordance_factors(truth, gene_trees=[truth] * 5)
    np.testing.assert_allclose(res_all.gcf[~np.isnan(res_all.gcf)], 1.0)


def test_scf_respects_ambiguity_masks():
    """Sites where a quartet member is ambiguous must not count."""
    topo = _single(3, 6)
    # Mask encoding: all-ambiguous everywhere -> zero decisive sites.
    full = np.full((6, 50), 0b1111, dtype=np.int32)
    res = concordance_factors(
        topo, leaf_sequences=full, sequences_are_masks=True
    )
    vals = res.scf[~np.isnan(res.scf)]
    assert vals.size == 0  # nothing decisive anywhere


def test_cli_concord(capsys, tmp_path):
    """In-process CLI invocation (subprocess spawning starves under the
    full suite's CPU contention; main([...]) is the repo convention)."""
    from trex_tpu.cli import main
    from trex_tpu.io import save_newick, write_fasta
    from trex_tpu.models.simulate import simulate_alignment

    truth = _single(3, 8)
    names = [f"t{i}" for i in range(8)]
    tree_file = tmp_path / "ref.nwk"
    tree_file.write_text(save_newick(truth, names) + "\n")
    genes_file = tmp_path / "genes.nwk"
    genes_file.write_text(
        "".join(save_newick(truth, names) + "\n" for _ in range(4))
    )
    aln = simulate_alignment(
        jax.random.PRNGKey(0), truth, np.full(15, 0.1, np.float32),
        n_sites=300,
    )
    fasta = tmp_path / "aln.fasta"
    fasta.write_text(write_fasta(names, aln))

    main([
        "concord", "--tree", str(tree_file),
        "--gene-trees", str(genes_file),
        "--fasta", str(fasta), "--quartets", "30",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_gene_trees"] == 4
    internal = [b for b in out["branches"] if b["gcf"] is not None]
    assert len(internal) == 5
    assert all(b["gcf"] == 100.0 for b in internal)
    assert all(b["scf"] > 40 for b in internal)
    assert "/" in out["tree"]
