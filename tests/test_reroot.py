"""Outgroup rooting / edge rerooting.

Oracles: the pulley principle — rerooting a reversible-model tree must not
change its likelihood (checked numerically) — plus unrooted-split and
total-tree-length invariance, and the rooted postcondition (the outgroup is
exactly one child's leafset).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import reroot_at_edge, reroot_on_outgroup
from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.ops.likelihood import tree_log_likelihood
from trex_tpu.search.bootstrap import subtree_leaf_sets
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.topology import random_topologies


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


@pytest.mark.parametrize("edge_node", [0, 3, 9, 12])
def test_reroot_preserves_unrooted_structure_and_length(edge_node):
    topo = _single(jax.random.key(0), 10)
    rng = np.random.default_rng(1)
    blens = rng.uniform(0.05, 0.5, size=(topo.n_all,))
    blens[-1] = 0.0
    new, new_blens = reroot_at_edge(topo, edge_node, blens)
    assert rf_distance_unrooted(new, topo) == 0
    # Total unrooted tree length is conserved (root entry excluded).
    assert np.isclose(new_blens[:-1].sum(), blens[:-1].sum(), atol=1e-9)


def test_reroot_likelihood_invariant_pulley():
    topo = _single(jax.random.key(2), 8)
    rng = np.random.default_rng(3)
    blens = rng.uniform(0.05, 0.4, size=(topo.n_all,))
    blens[-1] = 0.0
    leaves = simulate_alignment(jax.random.key(4), topo, blens, n_sites=120)
    base = float(
        tree_log_likelihood(
            topo, jnp.asarray(blens, jnp.float32), jnp.asarray(leaves), 4
        )
    )
    for node in (0, 2, 5, 9):
        new, nb = reroot_at_edge(topo, node, blens)
        ll = float(
            tree_log_likelihood(
                new, jnp.asarray(nb, jnp.float32), jnp.asarray(leaves), 4
            )
        )
        assert abs(ll - base) < 0.05, node


def test_reroot_on_single_leaf_outgroup():
    topo = _single(jax.random.key(5), 12)
    new, _ = reroot_on_outgroup(topo, [7])
    root_children = np.asarray(new.children)[-1]
    assert 7 in root_children.tolist()


def test_reroot_on_clade_outgroup():
    topo = _single(jax.random.key(6), 12)
    # Pick a genuine clade from the tree itself (not containing leaf 0's
    # side entirely): the split below some mid ancestor.
    clades = subtree_leaf_sets(topo)
    target = next(
        c for c in clades if 2 <= len(c) <= 4 and len(c) < topo.n_leaves - 1
    )
    new, _ = reroot_on_outgroup(topo, sorted(target))
    sides = [
        frozenset(s)
        for s in subtree_leaf_sets(new)
    ]
    root_kids = np.asarray(new.children)[-1]
    n_leaves = new.n_leaves
    kid_sets = []
    for k in root_kids:
        k = int(k)
        if k < n_leaves:
            kid_sets.append(frozenset([k]))
        else:
            kid_sets.append(sides[k - n_leaves])
    assert frozenset(target) in kid_sets


def test_reroot_rejects_non_split_outgroup():
    topo = _single(jax.random.key(7), 10)
    clades = subtree_leaf_sets(topo)
    # Build a deliberately non-monophyletic set: a real clade plus one leaf
    # outside it (and not its unrooted complement).
    target = next(c for c in clades if 2 <= len(c) <= 3)
    extra = next(
        x for x in range(10) if x not in target
    )
    bad = sorted(target | {extra})
    if frozenset(bad) in {frozenset(c) for c in clades}:
        pytest.skip("random tree made the extended set a clade")
    comp = frozenset(range(10)) - frozenset(bad)
    if comp in {frozenset(c) for c in clades}:
        pytest.skip("complement is a clade (valid unrooted split)")
    with pytest.raises(ValueError):
        reroot_on_outgroup(topo, bad)


def test_cli_infer_outgroup(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, load_newick, write_fasta

    truth = _single(jax.random.key(8), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(9), truth, blens, n_sites=400)
    path = tmp_path / "a.fasta"
    names = [f"t{i}" for i in range(8)]
    path.write_text(write_fasta(names, leaves, DNA))
    main(["infer", "--fasta", str(path), "--start", "nj",
          "--neighborhood", "nni", "--outgroup", "t3"])
    out = json.loads(capsys.readouterr().out)
    topo, _, parsed_names = load_newick(out["tree"])
    root_kids = np.asarray(topo.children)[-1]
    leaf_kids = [parsed_names[int(k)] for k in root_kids if int(k) < 8]
    assert "t3" in leaf_kids
    # ML criterion path too (lengths follow the rerooting).
    main(["infer", "--fasta", str(path), "--criterion", "ml", "--start",
          "nj", "--neighborhood", "nni", "--outgroup", "t3"])
    out = json.loads(capsys.readouterr().out)
    topo, blens2, parsed_names = load_newick(out["tree"])
    root_kids = np.asarray(topo.children)[-1]
    leaf_kids = [parsed_names[int(k)] for k in root_kids if int(k) < 8]
    assert "t3" in leaf_kids


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_utility_chain_property(seed):
    """reroot -> prune -> reroot chains preserve patristic distances."""
    from trex_tpu.io import prune_to_taxa

    rng = np.random.default_rng(seed)
    n = 12
    topo = _single(jax.random.key(100 + seed), n)
    blens = rng.uniform(0.05, 0.5, size=(topo.n_all,))
    blens[-1] = 0.0

    def patristic(t, b, leaves):
        parents = np.asarray(t.parents)
        n_all = t.n_all

        def path(leaf):
            out, node, dist = {}, leaf, 0.0
            while True:
                out[node] = dist
                if node == n_all - 1:
                    return out
                dist += float(b[node])
                node = int(parents[node])

        paths = {x: path(x) for x in leaves}
        d = {}
        for i in leaves:
            for j in leaves:
                if i < j:
                    common = [k for k in paths[i] if k in paths[j]]
                    d[(i, j)] = min(
                        paths[i][k] + paths[j][k] for k in common
                    )
        return d

    base = patristic(topo, blens, list(range(n)))
    # Reroot on a random edge.
    node = int(rng.integers(0, topo.n_all - 1))
    r_topo, r_blens = reroot_at_edge(topo, node, blens)
    after = patristic(r_topo, r_blens, list(range(n)))
    for key_, v in base.items():
        assert abs(after[key_] - v) < 1e-9
    # Prune to a random subset; distances restrict exactly.
    keep = sorted(rng.choice(n, size=6, replace=False).tolist())
    p_topo, p_blens, _ = prune_to_taxa(r_topo, keep, r_blens)
    sub = patristic(p_topo, p_blens, list(range(6)))
    for a in range(6):
        for b_ in range(a + 1, 6):
            assert abs(sub[(a, b_)] - base[tuple(sorted((keep[a], keep[b_])))]) < 1e-9
