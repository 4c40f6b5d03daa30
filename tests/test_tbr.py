"""TBR neighborhood enumeration and TBR hill climbing.

Oracles: the (already brute-force-validated) single-move ``tbr_move``
reproduces every enumerated tree; the SPR neighborhood is a strict subset;
exact Fitch scores of TBR optima are <= NNI optima on the same data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import (
    native,
    spr_neighborhood_host,
    tbr_neighborhood_host,
)
from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.search.hillclimb import parsimony_hill_climb
from trex_tpu.topology import Topology, random_topologies

pytestmark = pytest.mark.skipif(
    not native.available(), reason="needs the native library"
)


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def test_tbr_superset_of_spr():
    topo = _single(jax.random.key(0), 8)
    tc, tp = tbr_neighborhood_host(topo)
    sc, _ = spr_neighborhood_host(topo)
    tbr_keys = {t.tobytes() for t in np.asarray(tc)}
    spr_keys = {s.tobytes() for s in np.asarray(sc)}
    assert spr_keys < tbr_keys  # strict: reroots add genuinely new trees
    assert len(tbr_keys) == tc.shape[0]  # deduplicated
    # Identity excluded.
    assert np.asarray(topo.children).tobytes() not in tbr_keys


def test_tbr_trees_are_canonical():
    topo = _single(jax.random.key(1), 10)
    tc, tp = tbr_neighborhood_host(topo)
    n_leaves = 10
    for t, p in zip(np.asarray(tc), np.asarray(tp)):
        for a, (c0, c1) in enumerate(t):
            assert c0 < c1 < n_leaves + a
            assert p[c0] == n_leaves + a and p[c1] == n_leaves + a
        assert p[2 * n_leaves - 2] == 2 * n_leaves - 2  # root self-parent


def test_tbr_moves_reproducible_by_single_move():
    """Every enumerated neighbor is reachable via some tbr_move triple."""
    topo = _single(jax.random.key(2), 6)
    tc, _ = tbr_neighborhood_host(topo)
    enumerated = {t.tobytes() for t in np.asarray(tc)}
    children = np.asarray(topo.children)
    n_all = topo.n_all
    reachable = set()
    for prune in range(n_all - 1):
        for reroot in range(n_all):
            for regraft in range(n_all - 1):
                moved = native.tbr_move(children, prune, reroot, regraft)
                if moved is not None:
                    reachable.add(moved[0].tobytes())
    reachable.discard(children.tobytes())
    assert enumerated == reachable


def test_tbr_truncation_and_seeding():
    topo = _single(jax.random.key(3), 16)
    full_c, _ = tbr_neighborhood_host(topo, max_trees=200_000)
    cap_c, _ = tbr_neighborhood_host(topo, max_trees=50)
    assert cap_c.shape[0] == 50 < full_c.shape[0]
    # The host wrappers return views into shared buffers: snapshot each
    # sample's keys before the next same-shape call overwrites them.
    keys_a = {t.tobytes() for t in np.asarray(
        tbr_neighborhood_host(topo, max_trees=50, seed=1)[0]
    )}
    keys_b = {t.tobytes() for t in np.asarray(
        tbr_neighborhood_host(topo, max_trees=50, seed=2)[0]
    )}
    assert keys_a != keys_b
    # All samples come from the full set.
    full_keys = {t.tobytes() for t in np.asarray(full_c)}
    assert keys_a <= full_keys


def test_tbr_climb_beats_or_matches_nni():
    truth = _single(jax.random.key(4), 12)
    blens = np.full((truth.n_all,), 0.15)
    leaves = simulate_alignment(jax.random.key(5), truth, blens, n_sites=300)
    start = _single(jax.random.key(6), 12)
    cost = jnp.ones((4, 4)) - jnp.eye(4)
    seqs = jnp.asarray(leaves)
    nni = parsimony_hill_climb(start, cost, seqs, neighborhood="nni")
    tbr = parsimony_hill_climb(start, cost, seqs, neighborhood="tbr")
    assert tbr.score <= nni.score


def test_cli_infer_tbr(capsys, tmp_path):
    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    truth = _single(jax.random.key(7), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(8), truth, blens, n_sites=200)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], leaves, DNA))
    main(["infer", "--fasta", str(path), "--neighborhood", "tbr",
          "--start", "nj"])
    import json

    out = json.loads(capsys.readouterr().out)
    assert out["parsimony_score"] > 0
