"""Device-side NNI machinery (``ops.tree_moves``) vs the host move library.

Oracles:

- the host NNI enumerator (native C++ / Python fallback, itself validated by
  exhaustive closure tests in ``tests/test_io.py``) — the device neighborhood
  must produce the SAME MULTISET of topologies;
- the host clade-identity length carry (``search.mcmc.carry_lengths_nni``) —
  the device pointer-swap carry must assign every persisting clade its old
  length exactly;
- the engine's topological-index invariant (children < parent) must hold on
  every emitted neighbor, since the batched scorers schedule ancestors in
  index order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import (
    canonicalize_topology,
    nni_neighbors_host,
    sample_topologies,
)
from trex_tpu.ops.tree_moves import (
    nni_neighbor_device,
    nni_neighborhood_device,
    parents_from_children,
    renumber_topological,
)
from trex_tpu.search.mcmc import carry_lengths_nni
from trex_tpu.topology import Topology


def _single(seed, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(seed, n_leaves, 1)
    )


@pytest.mark.parametrize("seed,n_leaves", [(0, 4), (1, 5), (2, 8), (3, 13)])
def test_device_neighborhood_matches_host_multiset(seed, n_leaves):
    t = _single(seed, n_leaves)
    n_all = 2 * n_leaves - 1
    lengths = np.arange(n_all, dtype=np.float32)  # distinct -> carry visible
    dev_c, dev_l = nni_neighborhood_device(
        jnp.asarray(t.children), jnp.asarray(lengths), n_leaves
    )
    dev_c, dev_l = np.asarray(dev_c), np.asarray(dev_l)
    host_c, _ = nni_neighbors_host(t)
    assert dev_c.shape[0] == host_c.shape[0] == 2 * (n_leaves - 2)

    dev_keys = []
    for j in range(dev_c.shape[0]):
        # Every neighbor obeys the index invariant (children < parent).
        for a in range(n_leaves - 1):
            assert int(dev_c[j, a, 0]) < n_leaves + a
            assert int(dev_c[j, a, 1]) < n_leaves + a
        cc, ll = canonicalize_topology(dev_c[j], dev_l[j])
        dev_keys.append(cc.tobytes())
        # Length carry == the host clade-identity carry, slot for slot.
        want = carry_lengths_nni(
            t, lengths,
            Topology(children=cc, parents=np.zeros(n_all, np.int32)),
        )
        np.testing.assert_allclose(ll, want, rtol=1e-6)
        # Carry preserves the length multiset (prior invariance).
        np.testing.assert_allclose(np.sort(ll), np.sort(lengths), rtol=1e-6)
    host_keys = [host_c[j].tobytes() for j in range(host_c.shape[0])]
    assert sorted(dev_keys) == sorted(host_keys)


def test_single_neighbor_indexing_matches_neighborhood():
    t = _single(7, 9)
    n_leaves = 9
    lengths = jnp.asarray(np.linspace(0.1, 1.7, 17, dtype=np.float32))
    all_c, all_l = nni_neighborhood_device(
        jnp.asarray(t.children), lengths, n_leaves
    )
    for e in range(n_leaves - 2):
        for v in range(2):
            c1, l1 = nni_neighbor_device(
                jnp.asarray(t.children), lengths,
                jnp.int32(e), jnp.int32(v), n_leaves,
            )
            np.testing.assert_array_equal(
                np.asarray(c1), np.asarray(all_c[2 * e + v])
            )
            np.testing.assert_array_equal(
                np.asarray(l1), np.asarray(all_l[2 * e + v])
            )


def test_renumber_identity_on_canonical_shuffle():
    """Renumbering a valid (ordered) tree yields another VALID ordering of
    the SAME topology, and parents_from_children inverts children."""
    t = _single(11, 12)
    n_leaves = 12
    ch = jnp.asarray(t.children)
    par = parents_from_children(ch, n_leaves)
    # parents round-trips: each ancestor is the parent of both its children.
    par_np = np.asarray(par)
    ch_np = np.asarray(ch)
    for a in range(n_leaves - 1):
        assert par_np[ch_np[a, 0]] == n_leaves + a
        assert par_np[ch_np[a, 1]] == n_leaves + a
    assert par_np[-1] == 2 * n_leaves - 2

    new_ch, order = renumber_topological(ch, n_leaves)
    new_np = np.asarray(new_ch)
    for a in range(n_leaves - 1):
        assert new_np[a, 0] < n_leaves + a and new_np[a, 1] < n_leaves + a
    # Same topology (canonical bytes equal).
    cc_old, _ = canonicalize_topology(ch_np)
    cc_new, _ = canonicalize_topology(new_np)
    assert cc_old.tobytes() == cc_new.tobytes()


def test_neighborhood_is_symmetric_on_device():
    """y in N(x) => x in N(y), with x's exact lengths (carry involution) —
    the property the MCMC reverse-proposal density relies on."""
    n_leaves = 7
    t = _single(3, n_leaves)
    n_all = 2 * n_leaves - 1
    rng = np.random.default_rng(0)
    lengths = rng.exponential(0.1, n_all).astype(np.float32)
    lengths[-1] = 0.0
    x_key = canonicalize_topology(np.asarray(t.children))[0].tobytes()
    x_lens = canonicalize_topology(
        np.asarray(t.children), lengths
    )[1].tobytes()
    nbr_c, nbr_l = map(
        np.asarray,
        nni_neighborhood_device(
            jnp.asarray(t.children), jnp.asarray(lengths), n_leaves
        ),
    )
    for j in range(nbr_c.shape[0]):
        back_c, back_l = map(
            np.asarray,
            nni_neighborhood_device(
                jnp.asarray(nbr_c[j]), jnp.asarray(nbr_l[j]), n_leaves
            ),
        )
        found = False
        for i in range(back_c.shape[0]):
            cc, ll = canonicalize_topology(back_c[i], back_l[i])
            if cc.tobytes() == x_key and ll.tobytes() == x_lens:
                found = True
                break
        assert found, f"neighbor {j}: x not recoverable with exact lengths"
