"""SH-aLRT / RELL branch supports: alternatives enumeration + discrimination.

Oracle design: data simulated down a known tree must support every true
branch (~1.0); i.i.d. noise must not. The root's two children share one
unrooted edge and must carry identical values; re-rootings (unrooted no-ops)
must never appear as alternatives.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.ops.likelihood import jc69_transition
from trex_tpu.search.alrt import _nni_alternatives_by_edge, branch_supports
from trex_tpu.topology import balanced_topology


def _simulate_jc(topo, blens, length, seed):
    rng = np.random.default_rng(seed)
    children = np.asarray(topo.children)
    states = np.zeros((topo.n_all, length), int)
    states[-1] = rng.integers(0, 4, length)
    for a in range(topo.n_ancestors - 1, -1, -1):
        parent = topo.n_leaves + a
        for c in children[a]:
            p = np.asarray(jc69_transition(jnp.asarray(blens[c]), 4))
            cum = np.cumsum(p[states[parent]], 1)
            states[c] = (rng.random(length)[:, None] > cum).sum(1)
    return jnp.asarray(states[: topo.n_leaves], jnp.int32)


def test_alternatives_per_edge():
    topo = balanced_topology(8)
    _, by_edge = _nni_alternatives_by_edge(topo)
    # Every internal edge has exactly the 2 alternative quartet resolutions;
    # the root itself is untested.
    assert [len(rows) for rows in by_edge] == [2, 2, 2, 2, 2, 2, 0]
    # The root's two children describe the same unrooted edge.
    assert by_edge[4] == by_edge[5]


def test_supports_signal_vs_noise():
    topo = balanced_topology(8)
    leaf = _simulate_jc(topo, np.full(15, 0.25), 800, seed=0)
    sup = branch_supports(
        jax.random.PRNGKey(0), topo, leaf, 4, n_replicates=300
    )
    tested = ~np.isnan(sup.alrt)
    assert tested.sum() == 6 and not tested[-1]
    assert (sup.alrt[tested] > 5.0).all()
    assert (sup.sh_alrt[tested] > 0.9).all()
    assert (sup.rell[tested] > 0.9).all()
    # Root-edge pair carries one edge's value twice.
    assert sup.alrt[4] == sup.alrt[5]
    assert sup.sh_alrt[4] == sup.sh_alrt[5]

    noise = jnp.asarray(
        np.random.default_rng(1).integers(0, 4, (8, 200)), jnp.int32
    )
    sup2 = branch_supports(
        jax.random.PRNGKey(1), topo, noise, 4, n_replicates=300
    )
    assert float(np.mean(sup2.sh_alrt[tested])) < 0.5
    assert float(np.mean(sup2.rell[tested])) < 0.6


def test_supports_weighted_patterns_match_expanded():
    # Compressed patterns + weights give the same supports as the full
    # alignment (the engine-wide exactness contract).
    from trex_tpu.alignment import compress_alignment

    topo = balanced_topology(8)
    leaf = _simulate_jc(topo, np.full(15, 0.3), 120, seed=3)
    patterns, weights = compress_alignment(np.asarray(leaf))
    full = branch_supports(
        jax.random.PRNGKey(2), topo, leaf, 4, n_replicates=150
    )
    comp = branch_supports(
        jax.random.PRNGKey(2),
        topo,
        jnp.asarray(patterns),
        4,
        site_weights=jnp.asarray(weights, jnp.float32),
        n_replicates=150,
    )
    import pytest

    assert full.log_likelihood == pytest.approx(comp.log_likelihood, rel=1e-4)
    tested = ~np.isnan(full.alrt)
    np.testing.assert_allclose(
        full.alrt[tested], comp.alrt[tested], rtol=1e-2, atol=0.05
    )
