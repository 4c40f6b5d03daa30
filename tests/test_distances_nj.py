"""Distance matrices (MXU path) and distance-based starting trees.

Oracles: numpy double loops for the distance matrices; NJ's consistency
theorem (exact recovery from additive distances) and UPGMA's on ultrametric
distances for the builders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.distances import (
    hamming_distance_matrix,
    jc_distance_matrix,
    p_distance_matrix,
)
from trex_tpu.search.nj import neighbor_joining, nj_start_tree, upgma
from trex_tpu.search.ratchet import rf_distance_unrooted, unrooted_splits
from trex_tpu.topology import Topology, balanced_topology, random_topologies


def _numpy_hamming(seqs, weights=None):
    n, length = seqs.shape
    w = np.ones(length) if weights is None else np.asarray(weights, float)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            out[i, j] = (w * (seqs[i] != seqs[j])).sum()
    return out


def _single(topos: Topology, i: int) -> Topology:
    return jax.tree.map(lambda a: a[i], topos)


def _path_distances(topo: Topology, blens: np.ndarray) -> np.ndarray:
    """Exact additive leaf-to-leaf path lengths (host oracle)."""
    parents = np.asarray(topo.parents)
    n_leaves = topo.n_leaves
    n_all = topo.n_all
    # Cumulative distance from each node up to the root.
    up = np.zeros(n_all)
    for node in range(n_all - 2, -1, -1):
        up[node] = up[parents[node]] + blens[node]
    # Ancestor sets per leaf for LCA lookup.
    chains = []
    for leaf in range(n_leaves):
        chain = {}
        node = leaf
        while node != n_all - 1:
            chain[node] = None
            node = parents[node]
        chain[n_all - 1] = None
        chains.append(list(chain))
    out = np.zeros((n_leaves, n_leaves))
    for i in range(n_leaves):
        seti = set(chains[i])
        for j in range(n_leaves):
            lca = next(n for n in chains[j] if n in seti)
            out[i, j] = (up[i] - up[lca]) + (up[j] - up[lca])
    return out


@pytest.mark.parametrize("weighted", [False, True])
def test_hamming_matrix_matches_numpy(weighted):
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 4, size=(7, 33)).astype(np.int32)
    weights = rng.integers(1, 4, size=33).astype(np.float32) if weighted else None
    got = np.asarray(
        hamming_distance_matrix(
            jnp.asarray(seqs), 4,
            None if weights is None else jnp.asarray(weights),
        )
    )
    np.testing.assert_allclose(got, _numpy_hamming(seqs, weights), atol=1e-4)


def test_p_and_jc_distances():
    rng = np.random.default_rng(1)
    seqs = rng.integers(0, 4, size=(5, 40)).astype(np.int32)
    p = np.asarray(p_distance_matrix(jnp.asarray(seqs), 4))
    np.testing.assert_allclose(p, _numpy_hamming(seqs) / 40, atol=1e-6)
    jc = np.asarray(jc_distance_matrix(jnp.asarray(seqs), 4))
    expected = -0.75 * np.log1p(-np.minimum(p, 0.75 * (1 - 1e-6)) / 0.75)
    np.testing.assert_allclose(jc, expected, atol=1e-6)
    assert (np.diag(jc) == 0).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nj_recovers_tree_from_additive_distances(seed):
    rng = np.random.default_rng(seed)
    n_leaves = 10
    true = _single(random_topologies(jax.random.key(seed), n_leaves, 1), 0)
    blens = rng.uniform(0.5, 2.0, size=true.n_all)
    blens[-1] = 0.0
    d = _path_distances(true, blens)
    got, got_blens = neighbor_joining(d)
    assert rf_distance_unrooted(got, true) == 0
    # NJ's branch-length estimates reproduce the additive distances exactly.
    np.testing.assert_allclose(_path_distances(got, got_blens), d, atol=1e-9)


def test_upgma_recovers_ultrametric_tree():
    # Balanced tree with equal branch lengths is ultrametric.
    n_leaves = 8
    true = balanced_topology(n_leaves)
    blens = np.ones(true.n_all)
    blens[-1] = 0.0
    d = _path_distances(true, blens)
    got, got_blens = upgma(d)
    assert rf_distance_unrooted(got, true) == 0
    np.testing.assert_allclose(_path_distances(got, got_blens), d, atol=1e-9)


def test_nj_children_canonical():
    rng = np.random.default_rng(5)
    pts = rng.uniform(size=(9, 3))
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    topo, _ = neighbor_joining(d)
    children = np.asarray(topo.children)
    parents = np.asarray(topo.parents)
    for a in range(topo.n_ancestors):
        node = topo.n_leaves + a
        assert children[a, 0] < children[a, 1] < node
        assert parents[children[a, 0]] == node
        assert parents[children[a, 1]] == node
    assert parents[-1] == topo.n_all - 1


def test_nj_start_tree_recovers_groundtruth():
    # Low mutation count on a long alignment -> near-additive Hamming
    # distances; NJ should recover the generating topology.
    data = generate_groundtruth(
        n_leaves=16, n_states=4, n_mutations=4, seq_length=600, seed=7
    )
    from trex_tpu.topology import topology_from_adjacency

    true = topology_from_adjacency(data.adjacency, 16)
    seqs = data.masked_sequences[:16]
    for method in ("nj", "upgma"):
        topo, _ = nj_start_tree(seqs, 4, method=method, correction="p")
        assert rf_distance_unrooted(topo, true) == 0


def test_unrooted_splits_root_invariance():
    # The same unrooted tree rooted differently: balanced vs its NJ re-root.
    true = balanced_topology(8)
    blens = np.ones(true.n_all)
    blens[-1] = 0.0
    d = _path_distances(true, blens)
    rerooted, _ = neighbor_joining(d)
    assert unrooted_splits(rerooted) == unrooted_splits(true)


def test_nj_bootstrap_supports():
    """Clean long data -> ~1.0 supports; noisy short data -> depressed."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.nj import nj_bootstrap
    from trex_tpu.topology import random_topologies

    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(80), 8, 1)
    )
    blens = np.full((truth.n_all,), 0.2)
    clean = simulate_alignment(jax.random.key(81), truth, blens, n_sites=2000)
    topo, bl, support = nj_bootstrap(
        jax.random.key(82), np.asarray(clean), 4, n_replicates=50
    )
    assert support.shape == (7,)
    assert ((support >= 0) & (support <= 1)).all()
    assert support.mean() > 0.9

    noisy = simulate_alignment(
        jax.random.key(83), truth, blens * 0.1, n_sites=60
    )
    _, _, weak = nj_bootstrap(
        jax.random.key(84), np.asarray(noisy), 4, n_replicates=50
    )
    assert weak.mean() < support.mean()


def test_cli_distance_bootstrap(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.topology import random_topologies

    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(85), 8, 1)
    )
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(86), truth, blens, n_sites=800)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], leaves, DNA))
    main(["infer", "--fasta", str(path), "--criterion", "distance",
          "--bootstrap", "25"])
    out = json.loads(capsys.readouterr().out)
    assert out["bootstrap_replicates"] == 25
    assert len(out["split_support"]) == 7
