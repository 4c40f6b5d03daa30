"""I/O layer: newick/FASTA round trips, native vs Python parity, tree moves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import (
    DNA,
    load_newick,
    nni_neighbors,
    parse_fasta,
    sample_topologies,
    save_newick,
    spr_move,
    write_fasta,
)
from trex_tpu.io import fallback, native
from trex_tpu.ops.sankoff import batched_sankoff_score, sankoff_score
from trex_tpu.topology import Topology, balanced_topology
from trex_tpu.types import CostModel

NEWICK = "((A:0.1,B:0.2):0.3,(C:0.4,D:0.5):0.6);"


def _assert_valid(children, parents, n_leaves):
    n_all = 2 * n_leaves - 1
    flat = sorted(np.asarray(children).reshape(-1).tolist())
    assert flat == list(range(n_all - 1))
    for a in range(n_leaves - 1):
        assert children[a][0] < children[a][1] < n_leaves + a
    assert parents[n_all - 1] == n_all - 1


def test_newick_roundtrip():
    topo, blens, names = load_newick(NEWICK)
    assert names == ["A", "B", "C", "D"]
    _assert_valid(np.asarray(topo.children), np.asarray(topo.parents), 4)
    assert blens[np.asarray(topo.parents)[0]] in (0.3, 0.6)
    text = save_newick(topo, names)
    topo2, _, names2 = load_newick(text)
    np.testing.assert_array_equal(
        np.asarray(topo.children), np.asarray(topo2.children)
    )
    assert names2 == names


def test_native_python_parser_parity():
    if not native.available():
        pytest.skip("no native library")
    nc, npar, nbl, nnames = native.parse_newick(NEWICK)
    pc, ppar, pbl, pnames = fallback.py_parse_newick(NEWICK)
    np.testing.assert_array_equal(nc, pc)
    np.testing.assert_array_equal(npar, ppar)
    np.testing.assert_allclose(nbl, pbl)
    assert nnames == pnames


def test_native_python_nni_parity():
    if not native.available():
        pytest.skip("no native library")
    children = np.asarray(balanced_topology(8).children)
    nc, npar = native.nni_neighbors(children)
    pc, ppar = fallback.py_nni_neighbors(children)
    np.testing.assert_array_equal(nc, pc)
    np.testing.assert_array_equal(npar, ppar)


@pytest.mark.parametrize("n_leaves", [4, 8, 16])
def test_sampled_topologies_valid(n_leaves):
    topos = sample_topologies(7, n_leaves, 8)
    for b in range(8):
        _assert_valid(
            np.asarray(topos.children[b]), np.asarray(topos.parents[b]), n_leaves
        )


def test_nni_neighbors_valid_and_distinct():
    topo = balanced_topology(8)
    nbrs = nni_neighbors(topo)
    n_moves = nbrs.children.shape[0]
    # 6 internal edges (ancestors 8..13 as children of 12,13,14) x 2 moves.
    assert n_moves == 12
    seen = set()
    for b in range(n_moves):
        _assert_valid(np.asarray(nbrs.children[b]), np.asarray(nbrs.parents[b]), 8)
        seen.add(np.asarray(nbrs.children[b]).tobytes())
    assert len(seen) == n_moves  # all distinct


def test_nni_preserves_leaf_set_and_changes_score():
    """NNI neighbors score differently but stay valid trees."""
    n_leaves, q, length = 8, 4, 64
    topo = balanced_topology(n_leaves)
    leaf = jax.random.randint(jax.random.PRNGKey(0), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    base = float(sankoff_score(topo, cost, leaf))
    nbrs = nni_neighbors(topo)
    scores = batched_sankoff_score(nbrs, cost, leaf)
    assert np.isfinite(np.asarray(scores)).all()
    assert np.asarray(scores).min() >= 0


def test_spr_move():
    if not native.available():
        pytest.skip("no native library")
    topo = balanced_topology(4)
    moved = spr_move(topo, 0, 2)
    assert moved is not None
    _assert_valid(np.asarray(moved.children), np.asarray(moved.parents), 4)
    # Regraft inside pruned subtree is invalid.
    assert spr_move(topo, 4, 0) is None


def test_fasta_roundtrip():
    text = ">s1\nACGT\n>s2\nTTAA\n"
    names, seqs = parse_fasta(text, DNA)
    assert names == ["s1", "s2"]
    np.testing.assert_array_equal(seqs, [[0, 1, 2, 3], [3, 3, 0, 0]])
    out = write_fasta(names, seqs, DNA)
    names2, seqs2 = parse_fasta(out, DNA)
    np.testing.assert_array_equal(seqs, seqs2)


def test_fasta_validates_alignment():
    with pytest.raises(ValueError):
        parse_fasta(">a\nACGT\n>b\nAC\n")


def test_newick_to_scoring_pipeline():
    """End to end: newick text -> Topology -> exact score."""
    topo, _, names = load_newick("((A,B),((C,D),(E,F)));")
    assert topo.n_leaves == 6
    leaf = jax.random.randint(jax.random.PRNGKey(1), (6, 32), 0, 4)
    score = sankoff_score(topo, CostModel.hamming(4).matrix, leaf)
    assert float(score) >= 0


@pytest.mark.parametrize("n_leaves", [4, 8, 16, 32])
def test_newick_roundtrip_fuzz(n_leaves):
    """Random topologies survive save -> load after leaf-order alignment.

    Newick assigns leaf ids by appearance order, so the loaded tree's leaf
    numbering differs from the original; ``align_leaf_order`` restores it
    (leaf identity lives in the names).
    """
    from trex_tpu.io import align_leaf_order

    topos = sample_topologies(99, n_leaves, 6)
    target = [f"L{i}" for i in range(n_leaves)]
    for b in range(6):
        topo = jax.tree_util.tree_map(lambda x: x[b], topos)
        text = save_newick(topo)
        back, _, names = load_newick(text)
        aligned = align_leaf_order(back, names, target)
        # Same labeled tree == same canonical splits; children arrays match
        # because canonicalization is structure-determined.
        from trex_tpu.search.bootstrap import subtree_leaf_sets

        assert set(subtree_leaf_sets(aligned)) == set(subtree_leaf_sets(topo))


def test_spr_neighborhood_fuzz_validity():
    """Every SPR move of random 16-leaf trees is a valid canonical tree."""
    topos = sample_topologies(7, 16, 3)
    from trex_tpu.io import spr_neighborhood

    for b in range(3):
        topo = jax.tree_util.tree_map(lambda x: x[b], topos)
        nbrs = spr_neighborhood(topo)
        for i in range(nbrs.children.shape[0]):
            _assert_valid(
                np.asarray(nbrs.children[i]), np.asarray(nbrs.parents[i]), 16
            )


def test_tbr_move_validity_and_novelty():
    if not native.available():
        pytest.skip("no native library")
    from trex_tpu.io import spr_move, tbr_move

    topo = balanced_topology(8)
    # Degenerate TBR (reroot == prune) == SPR.
    a = tbr_move(topo, 8, 8, 2)
    b = spr_move(topo, 8, 2)
    np.testing.assert_array_equal(np.asarray(a.children), np.asarray(b.children))
    # Full TBR with rerooting: valid tree, distinct from plain SPR.
    moved = tbr_move(topo, 12, 0, 6)  # prune anc 12 (subtree {0,1,2,3,8,9}),
    assert moved is not None          # reroot at leaf 0's edge, regraft at 6
    _assert_valid(np.asarray(moved.children), np.asarray(moved.parents), 8)
    # Invalid: reroot outside the subtree / regraft inside it.
    assert tbr_move(topo, 12, 4, 6) is None
    assert tbr_move(topo, 12, 0, 1) is None


def test_tbr_fuzz_validity_and_scores():
    if not native.available():
        pytest.skip("no native library")
    from trex_tpu.io import tbr_move

    rng = np.random.default_rng(5)
    topos = sample_topologies(11, 16, 2)
    leaf = jax.random.randint(jax.random.PRNGKey(6), (16, 32), 0, 4)
    cost = CostModel.hamming(4).matrix
    for b in range(2):
        topo = jax.tree_util.tree_map(lambda x: x[b], topos)
        valid = 0
        for _ in range(120):
            args = rng.integers(0, 31, size=3)
            moved = tbr_move(topo, int(args[0]), int(args[1]), int(args[2]))
            if moved is None:
                continue
            valid += 1
            _assert_valid(
                np.asarray(moved.children), np.asarray(moved.parents), 16
            )
            s = sankoff_score(moved, cost, leaf)
            assert np.isfinite(float(s))
        assert valid > 5


def test_spr_neighborhood_truncating_cap():
    if not native.available():
        pytest.skip("no native library")
    from trex_tpu.io import spr_neighborhood

    nbrs = spr_neighborhood(balanced_topology(16))
    capped = native.spr_neighborhood(
        np.asarray(balanced_topology(16).children), max_trees=10
    )
    assert capped[0].shape[0] == 10
    np.testing.assert_array_equal(
        capped[0], np.asarray(nbrs.children[:10])
    )


def test_spr_neighborhood_matches_per_move_enumeration():
    """The single-call fast path == the per-move reference enumeration."""
    if not native.available():
        pytest.skip("no native library")
    for seed in range(3):
        topo = jax.tree_util.tree_map(
            lambda x: x[0], sample_topologies(40 + seed, 10, 1)
        )
        children = np.asarray(topo.children)
        n_all = topo.n_all
        expected = set()
        for prune in range(n_all - 1):
            for regraft in range(n_all - 1):
                if prune == regraft:
                    continue
                moved = native.spr_move(children, prune, regraft)
                if moved is None or np.array_equal(moved[0], children):
                    continue
                expected.add(moved[0].tobytes())
        fast_c, fast_p = native.spr_neighborhood(children)
        got = {fast_c[i].tobytes() for i in range(fast_c.shape[0])}
        assert got == expected
        # parents consistent with children for every emitted tree
        for i in range(fast_c.shape[0]):
            _assert_valid(fast_c[i], fast_p[i], 10)


def test_format_tree():
    from trex_tpu.io import format_tree

    text = format_tree(
        balanced_topology(4), list("ABCD"), annotations={6: "root", 0: "0.99"}
    )
    assert "root" in text and "A  0.99" in text
    assert text.count("`--") == 3  # one closing branch per internal node
    assert all(name in text for name in "ABCD")


def test_newick_real_world_extensions():
    """Comments, quoted labels, support values, escapes — all parse."""
    from trex_tpu.io import load_newick

    topo, bl, names = load_newick(
        "(('taxon a'[&rate=1.2]:1.0[&ci={0.5,1.5}],'it''s':2)95:0.5,"
        "(c:1,d:1)87:0.5);"
    )
    assert names == ["taxon a", "it's", "c", "d"]
    np.testing.assert_allclose(bl[:2], [1.0, 2.0])
    with pytest.raises(ValueError, match="unterminated .comment."):
        load_newick("((a[&x:1,b:2):0.5,c:1);")
    with pytest.raises(ValueError, match="unterminated quoted"):
        load_newick("(('a:1,b:2):0.5,c:1);")


def test_newick_quoting_roundtrip():
    """Names with metacharacters are quoted on write, restored on read."""
    from trex_tpu.io import load_newick, save_newick
    from trex_tpu.topology import balanced_topology

    names = ["plain", "has space", "it's", "we(ird):x"]
    text = save_newick(balanced_topology(4), names)
    _, _, back = load_newick(text)
    assert sorted(back) == sorted(names)


@pytest.mark.parametrize("n_leaves", [5, 8, 16])
def test_sampled_topologies_are_canonical(n_leaves):
    """Sampler output uses the structure-determined canonical numbering.

    Regression: the raw coalescent numbering is valid but not canonical, so
    the same topology could carry two byte identities (one from the sampler,
    one from the move generators), breaking bytes-level dedup/equality —
    observed as a 106-tree SPR closure at 5 leaves (105 rooted topologies).
    """
    topos = sample_topologies(11, n_leaves, 16)
    n_anc = n_leaves - 1
    for b in range(16):
        ch = np.asarray(topos.children[b])
        kids = {
            n_leaves + a: [int(ch[a, 0]), int(ch[a, 1])] for a in range(n_anc)
        }
        canon, _, _ = fallback._canonicalize(n_leaves, kids, 2 * n_leaves - 2)
        np.testing.assert_array_equal(ch, canon)


def test_nni_neighborhood_symmetric_over_closure():
    """y in NNI(x) <=> x in NNI(y) with constant neighborhood size.

    MCMC relies on this: a uniform draw from the NNI neighborhood is then a
    symmetric proposal (no Hastings correction). Checked over the full SPR
    closure (= all 105 rooted 5-leaf topologies, all canonical)."""
    from trex_tpu.io import nni_neighbors_host, spr_move

    start = jax.tree_util.tree_map(lambda x: x[0], sample_topologies(0, 5, 1))
    seen = {np.asarray(start.children).tobytes(): start}
    frontier = [start]
    while frontier:
        nxt = []
        for topo in frontier:
            for p in range(topo.n_all - 1):
                for v in range(topo.n_all - 1):
                    moved = spr_move(topo, p, v)
                    if moved is None:
                        continue
                    k = np.asarray(moved.children).tobytes()
                    if k not in seen:
                        seen[k] = moved
                        nxt.append(moved)
        frontier = nxt
    assert len(seen) == 105  # all rooted 5-leaf topologies, one identity each
    nbrs = {
        k: [c.tobytes() for c in np.asarray(nni_neighbors_host(t)[0])]
        for k, t in seen.items()
    }
    for k, ks in nbrs.items():
        assert len(ks) == 6 and len(set(ks)) == 6 and k not in ks
        for y in ks:
            assert k in nbrs[y]
