"""Pure-Python SPR/TBR fallbacks vs the native move library.

The native enumerators are the oracle (themselves validated by closure and
brute-force tests in ``tests/test_io.py``); the Python fallbacks must match
move for move, so that a platform without the compiled library loses speed
but no capability. The last test runs a full search CLI workflow with the
native library force-disabled.
"""

from __future__ import annotations

import numpy as np
import pytest

from trex_tpu.io import fallback, native, sample_topologies


def _children(seed, n_leaves):
    topo = sample_topologies(seed, n_leaves, 1)
    return np.asarray(topo.children)[0]


needs_native = pytest.mark.skipif(
    not native.available(), reason="no native library"
)


@needs_native
@pytest.mark.parametrize("seed,n_leaves", [(0, 5), (1, 7), (2, 10)])
def test_spr_move_parity(seed, n_leaves):
    children = _children(seed, n_leaves)
    n_all = 2 * n_leaves - 1
    for prune in range(n_all):
        for regraft in range(n_all):
            want = native.spr_move(children, prune, regraft)
            got = fallback.py_spr_move(children, prune, regraft)
            if want is None:
                assert got is None, (prune, regraft)
            else:
                assert got is not None, (prune, regraft)
                np.testing.assert_array_equal(got[0], want[0])
                np.testing.assert_array_equal(got[1], want[1])


@needs_native
@pytest.mark.parametrize("seed,n_leaves", [(3, 6), (4, 8)])
def test_tbr_move_parity(seed, n_leaves):
    children = _children(seed, n_leaves)
    n_all = 2 * n_leaves - 1
    rng = np.random.default_rng(seed)
    # Exhaustive would be O(n^3) x O(n) work; fuzz 400 triples + all-SPR.
    triples = set()
    for _ in range(400):
        triples.add(tuple(int(x) for x in rng.integers(0, n_all, 3)))
    for prune in range(n_all - 1):
        for regraft in range(n_all - 1):
            triples.add((prune, prune, regraft))
    for prune, reroot, regraft in sorted(triples):
        want = native.tbr_move(children, prune, reroot, regraft)
        got = fallback.py_tbr_move(children, prune, reroot, regraft)
        if want is None:
            assert got is None, (prune, reroot, regraft)
        else:
            assert got is not None, (prune, reroot, regraft)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])


@needs_native
@pytest.mark.parametrize("seed,n_leaves", [(5, 5), (6, 8), (7, 11)])
def test_spr_neighborhood_parity(seed, n_leaves):
    children = _children(seed, n_leaves)
    want_c, want_p = native.spr_neighborhood(children)
    got_c, got_p = fallback.py_spr_neighborhood(children)
    # Same enumeration order -> identical arrays, not just same sets.
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_p, want_p)


@needs_native
@pytest.mark.parametrize("seed,n_leaves", [(8, 5), (9, 7)])
def test_tbr_neighborhood_set_parity(seed, n_leaves):
    children = _children(seed, n_leaves)
    want_c, _ = native.tbr_neighborhood(children, max_trees=200_000, seed=0)
    got_c, got_p = fallback.py_tbr_neighborhood(
        children, max_trees=200_000, seed=0
    )
    # Iteration orders are shuffled by different RNGs; the FULL
    # neighborhoods must be set-identical.
    want = {want_c[i].tobytes() for i in range(want_c.shape[0])}
    got = {got_c[i].tobytes() for i in range(got_c.shape[0])}
    assert got == want
    # Every returned parents array matches its children array.
    for i in range(got_c.shape[0]):
        for a in range(n_leaves - 1):
            assert got_p[i][got_c[i, a, 0]] == n_leaves + a
            assert got_p[i][got_c[i, a, 1]] == n_leaves + a


def test_tbr_neighborhood_truncation_unbiased_sample():
    children = _children(10, 9)
    full_c, _ = fallback.py_tbr_neighborhood(children, max_trees=200_000)
    sub_c, _ = fallback.py_tbr_neighborhood(children, max_trees=25, seed=3)
    assert sub_c.shape[0] == 25
    full = {full_c[i].tobytes() for i in range(full_c.shape[0])}
    assert {sub_c[i].tobytes() for i in range(sub_c.shape[0])} <= full


def test_full_search_without_native_library(monkeypatch):
    """The flagship search workflows work with the native library disabled.

    The SPR fallback enumerates the same candidates in the same order as
    the native library, so the whole greedy climb trajectory — every score,
    the final topology bytes — must be identical with the library removed.
    The TBR fallback shuffles differently; there the climb must still run
    and improve.
    """
    import jax
    import jax.numpy as jnp

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.hillclimb import parsimony_hill_climb
    from trex_tpu.topology import Topology

    truth_c = _children(11, 8)
    truth = Topology(children=truth_c, parents=np.zeros(15, np.int32))
    aln = simulate_alignment(
        jax.random.PRNGKey(0), truth, np.full(15, 0.1, np.float32),
        n_sites=400,
    )
    leaves = jnp.asarray(np.asarray(aln, dtype=np.int32))
    cost = jnp.ones((4, 4)) - jnp.eye(4)

    start = sample_topologies(12, 8, 1)
    start = jax.tree_util.tree_map(lambda x: x[0], start)

    with_native = None
    if native.available():
        with_native = parsimony_hill_climb(
            start, cost, leaves, neighborhood="spr", max_rounds=30,
        )

    monkeypatch.setattr(native, "load_library", lambda: None)
    assert not native.available()

    res = parsimony_hill_climb(
        start, cost, leaves, neighborhood="spr", max_rounds=30,
    )
    assert res.score <= res.trace[0]
    if with_native is not None:
        assert res.trace == with_native.trace
        np.testing.assert_array_equal(
            np.asarray(res.topology.children),
            np.asarray(with_native.topology.children),
        )

    res_tbr = parsimony_hill_climb(
        start, cost, leaves, neighborhood="tbr", max_rounds=10,
        tbr_budget=400,
    )
    assert res_tbr.score <= res.score + 1e-6 or res_tbr.evaluations > 0
    assert res_tbr.score < res_tbr.trace[0]
