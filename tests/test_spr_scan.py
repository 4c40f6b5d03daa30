"""All-SPR scan (ops.spr_scan): exactness against brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.ops.fitch import fitch_score
from trex_tpu.ops.spr_scan import spr_scan, spr_scan_best
from trex_tpu.topology import Topology, random_topologies

Q = 4


def _single(topos, i):
    return jax.tree_util.tree_map(lambda a: a[i], topos)


def _score_rearranged(children, parents, leaf_masks, weights, p, v):
    """Exact score of prune-p-regraft-above-v via explicit reconstruction."""
    n_leaves = children.shape[0] + 1
    n_all = 2 * n_leaves - 1
    root = n_all - 1
    kids = {
        n_leaves + a: [int(children[a, 0]), int(children[a, 1])]
        for a in range(n_leaves - 1)
    }
    q = int(parents[p])
    sib = [c for c in kids[q] if c != p][0]
    kids_rem = {k: list(c) for k, c in kids.items() if k != q}
    if q == root:
        new_root = sib
    else:
        gp = int(parents[q])
        kids_rem[gp] = [sib if c == q else c for c in kids_rem[gp]]
        new_root = root
    # Re-collect S below p.
    kids_s = {}

    def collect(node):
        if node in kids:
            kids_s[node] = kids[node]
            for c in kids[node]:
                collect(c)

    collect(p)
    w = 10_000
    kids_new = {k: list(c) for k, c in kids_rem.items()}
    pv = [k for k, cs in kids_new.items() if v in cs][0]
    kids_new[pv] = [w if c == v else c for c in kids_new[pv]]
    kids_new[w] = [v, p]
    kids_new.update(kids_s)

    total = 0.0
    for site in range(leaf_masks.shape[1]):
        lm = {i: int(leaf_masks[i, site]) for i in range(n_leaves)}

        def go(node):
            if node not in kids_new:
                return lm[node], 0
            (s1, e1), (s2, e2) = go(kids_new[node][0]), go(kids_new[node][1])
            inter = s1 & s2
            if inter:
                return inter, e1 + e2
            return s1 | s2, e1 + e2 + 1

        _, events = go(new_root)
        total += events * float(weights[site])
    return total


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_entries_match_brute_force(seed):
    rng = np.random.default_rng(seed)
    n_leaves = int(rng.integers(5, 9))
    length = int(rng.integers(4, 12))
    topo = _single(random_topologies(jax.random.key(seed), n_leaves, 1), 0)
    children = np.asarray(topo.children)
    parents = np.asarray(topo.parents)
    states = rng.integers(0, Q, size=(n_leaves, length)).astype(np.int32)
    masks = (1 << states).astype(np.int32)
    masks[0, 0] = 0b1111  # some ambiguity
    weights = rng.integers(1, 3, size=length).astype(np.float32)

    scores, base = spr_scan(
        topo, jnp.asarray(masks), jnp.asarray(weights),
        sequences_are_masks=True,
    )
    scores = np.asarray(scores)
    expected_base = float(
        fitch_score(
            topo, jnp.asarray(masks), site_mask=jnp.asarray(weights),
            sequences_are_masks=True,
        )
    )
    assert float(base) == expected_base

    n_all = 2 * n_leaves - 1
    checked = 0
    for p in range(n_all - 1):
        for v in range(n_all):
            if not np.isfinite(scores[p, v]):
                continue
            exact = _score_rearranged(children, parents, masks, weights, p, v)
            assert scores[p, v] == exact, (p, v, scores[p, v], exact)
            checked += 1
    assert checked > 2 * n_all  # plenty of valid pairs exercised

    # Root prune row padded to inf.
    assert not np.isfinite(scores[-1]).any()


def test_prune_subset_and_chunking_match_full_scan():
    rng = np.random.default_rng(31)
    n_leaves = 9
    topo = _single(random_topologies(jax.random.key(31), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 20)).astype(np.int32))
    full, base = spr_scan(topo, leaf)
    chunked, base2 = spr_scan(topo, leaf, prune_chunk=5)  # 16 prunes, pad
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))
    assert float(base) == float(base2)
    subset = jnp.asarray([0, 3, 11], jnp.int32)
    part, _ = spr_scan(topo, leaf, prune_nodes=subset)
    np.testing.assert_array_equal(
        np.asarray(part), np.asarray(full)[np.asarray(subset)]
    )


def test_scan_min_matches_neighborhood_min():
    """The scan's optimum equals exhaustive neighborhood rescoring."""
    pytest.importorskip("trex_tpu.io.native")
    from trex_tpu.io import native, spr_neighborhood
    from trex_tpu.ops.fitch import batched_fitch_score

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for seed in range(3):
        n_leaves = 10
        topo = _single(random_topologies(jax.random.key(seed + 50), n_leaves, 1), 0)
        leaf = jnp.asarray(
            rng.integers(0, Q, size=(n_leaves, 24)).astype(np.int32)
        )
        nbrs = spr_neighborhood(topo)
        nbr_scores = batched_fitch_score(nbrs, leaf)
        scores, base = spr_scan(topo, leaf)
        scan_min = float(np.min(np.asarray(scores)))
        exact_min = float(min(float(jnp.min(nbr_scores)), float(base)))
        assert scan_min == exact_min


def test_spr_scan_climb_matches_enumerating_climb():
    from trex_tpu.io import native
    from trex_tpu.search.hillclimb import parsimony_hill_climb
    from trex_tpu.types import CostModel

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    cost = CostModel.hamming(Q).matrix
    for seed in range(3):
        n_leaves = 12
        topo = _single(
            random_topologies(jax.random.key(seed + 90), n_leaves, 1), 0
        )
        leaf = jnp.asarray(
            rng.integers(0, Q, size=(n_leaves, 40)).astype(np.int32)
        )
        scan = parsimony_hill_climb(
            topo, cost, leaf, neighborhood="spr-scan", max_rounds=50
        )
        enum = parsimony_hill_climb(
            topo, cost, leaf, neighborhood="spr", max_rounds=50
        )
        # Same neighborhood, same greedy rule: identical optima (tie paths
        # may differ, the reached score may not be worse either way).
        assert scan.score == enum.score
        # The scan result is a true SPR local optimum.
        scores, base = spr_scan(scan.topology, leaf)
        assert float(np.min(np.asarray(scores))) >= scan.score
    with pytest.raises(ValueError, match="custom"):
        parsimony_hill_climb(
            topo, cost, leaf, neighborhood="spr-scan",
            score_batch_fn=lambda *a: None,
        )


def test_scan_best_returns_applicable_move():
    from trex_tpu.io import native, spr_move

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n_leaves = 8
    topo = _single(random_topologies(jax.random.key(11), n_leaves, 1), 0)
    leaf = jnp.asarray(rng.integers(0, Q, size=(n_leaves, 30)).astype(np.int32))
    best, p, v, base = spr_scan_best(topo, leaf)
    assert float(best) <= float(base)
    moved = spr_move(topo, int(p), int(v))
    assert moved is not None
    rescored = float(fitch_score(moved, leaf))
    assert rescored == float(best)


def test_best_segmented_matches_full_table():
    """Device-reduced segmented best (tiny forced cap) == the full-table
    np.argmin (same move, same score, same finite-candidate count) — the
    round-5 path that never reads the O(n^2) table back to the host."""
    from trex_tpu.ops.spr_scan import (
        spr_scan_best_segmented,
        spr_scan_segmented,
    )
    from trex_tpu.topology import random_topologies

    rng = np.random.default_rng(17)
    for n in (8, 11):
        topo = jax.tree_util.tree_map(
            lambda x: x[0], random_topologies(jax.random.PRNGKey(n), n, 1)
        )
        leaf = jnp.asarray(rng.integers(0, 4, (n, 40)).astype(np.int32))
        table, base_t = spr_scan_segmented(topo, leaf, None)
        table = np.asarray(table)
        flat = int(np.argmin(table))
        p_ref, v_ref = divmod(flat, table.shape[-1])
        for cap in (3 * topo.n_all, 1):
            best, p, v, base, cnt = spr_scan_best_segmented(
                topo, leaf, None, max_cells=cap
            )
            assert (p, v) == (p_ref, v_ref)
            assert best == table[p_ref, v_ref]
            assert base == float(base_t)
            assert cnt == int(np.isfinite(table).sum())


def test_ml_best_segmented_matches_full_table():
    from trex_tpu.ops.likelihood_scan import (
        likelihood_spr_scan_best_segmented,
        likelihood_spr_scan_segmented,
    )
    from trex_tpu.topology import random_topologies

    rng = np.random.default_rng(19)
    n = 9
    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(3), n, 1)
    )
    leaf = jnp.asarray(rng.integers(0, 4, (n, 32)).astype(np.int32))
    table, base_t = likelihood_spr_scan_segmented(topo, leaf, 4, 0.1)
    table = np.asarray(table)
    flat = int(np.argmin(table))
    p_ref, v_ref = divmod(flat, table.shape[-1])
    best, p, v, base, cnt = likelihood_spr_scan_best_segmented(
        topo, leaf, 4, 0.1, max_cells=2 * topo.n_all
    )
    assert (p, v) == (p_ref, v_ref)
    assert best == table[p_ref, v_ref]
    assert base == float(base_t)
    assert cnt == int(np.isfinite(table).sum())
