"""Parity of the level-synchronous Fitch experiment kernel.

`benchmarks/fitch_levels.py` is the measured A/B that closed the
level-scheduling question in benchmarks/speed_of_light.md; this test keeps
its kernel honest (interpret-mode score parity vs the production kernel on
the canonical balanced topology) so the recorded experiment stays
reproducible.
"""

from __future__ import annotations

import importlib.util
import os

import jax
import jax.numpy as jnp
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "fitch_levels",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "fitch_levels.py",
    ),
)
fitch_levels = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(fitch_levels)


@pytest.mark.parametrize("n_leaves", [8, 16, 32])
def test_level_sync_matches_production(n_leaves):
    from trex_tpu.ops.sankoff_pallas import batched_fitch_score_pallas

    batch, length = 4, 256
    topo = fitch_levels.balanced_topology_levels(n_leaves)
    topos = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), topo
    )
    leaf = jax.random.randint(
        jax.random.PRNGKey(n_leaves), (n_leaves, length), 0, 4
    )
    ref = batched_fitch_score_pallas(topos, leaf, interpret=True)
    got = fitch_levels.fitch_levels_balanced(
        (1 << leaf).astype(jnp.int32),
        n_leaves=n_leaves,
        batch=batch,
        interpret=True,
    )
    assert jnp.array_equal(ref, got)


def test_balanced_topology_is_valid():
    topo = fitch_levels.balanced_topology_levels(16)
    children = topo.children
    n_anc = children.shape[0]
    # Children precede their parent (index order = topological order).
    parents = jnp.arange(16, 16 + n_anc)
    assert bool(jnp.all(children[:, 0] < parents))
    assert bool(jnp.all(children[:, 1] < parents))
    # Every non-root node appears exactly once as a child.
    flat = jnp.sort(children.reshape(-1))
    assert jnp.array_equal(flat, jnp.arange(2 * 16 - 2))
