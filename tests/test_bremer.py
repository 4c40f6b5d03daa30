"""SPR-decay (approximate Bremer) support.

Oracle: exhaustive tree-space enumeration on 6 taxa (the SPR graph is
connected, so BFS closure over SPR moves from any tree visits all 105
unrooted topologies). True decay of a split = best score among trees
LACKING it minus the optimum; the scan-based value must upper-bound it and
match exactly whenever some best split-lacking tree is one SPR away.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import native, spr_move
from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.ops.fitch import fitch_score
from trex_tpu.search.bremer import spr_decay_support
from trex_tpu.search.ratchet import unrooted_splits
from trex_tpu.topology import Topology, random_topologies

pytestmark = pytest.mark.skipif(
    not native.available(), reason="needs the native library"
)


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def _all_trees(start: Topology) -> dict[bytes, Topology]:
    """BFS closure of the SPR graph (all unrooted topologies, canonical)."""
    seen = {np.asarray(start.children).tobytes(): start}
    frontier = [start]
    n_all = start.n_all
    while frontier:
        nxt = []
        for topo in frontier:
            for p in range(n_all - 1):
                for v in range(n_all - 1):
                    moved = spr_move(topo, p, v)
                    if moved is None:
                        continue
                    k = np.asarray(moved.children).tobytes()
                    if k not in seen:
                        seen[k] = moved
                        nxt.append(moved)
        frontier = nxt
    return seen


@pytest.mark.parametrize("seed", [0, 1])
def test_spr_decay_vs_exhaustive(seed):
    n = 6
    truth = _single(jax.random.key(seed), n)
    blens = np.full((truth.n_all,), 0.25)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.key(seed + 10), truth, blens, n_sites=40)
    )

    trees = _all_trees(truth)
    # Unrooted topologies on 6 taxa: 105 (rooted canonical forms may
    # repeat unrooted structures; dedup by split signature).
    by_splits: dict[frozenset, float] = {}
    for topo in trees.values():
        score = float(fitch_score(topo, leaves))
        sig = frozenset(unrooted_splits(topo))
        by_splits[sig] = min(by_splits.get(sig, np.inf), score)
    assert len(by_splits) == 105

    best_sig = min(by_splits, key=by_splits.get)
    best_score = by_splits[best_sig]
    # Use a rooted representative of the optimum as the reference.
    ref = next(
        t for t in trees.values()
        if frozenset(unrooted_splits(t)) == best_sig
        and float(fitch_score(t, leaves)) == best_score
    )

    decay, base = spr_decay_support(ref, leaves)
    assert base == best_score

    from trex_tpu.search.bootstrap import subtree_leaf_sets

    every = frozenset(range(n))
    clades = subtree_leaf_sets(ref)
    exact, total = 0, 0
    for i, clade in enumerate(clades):
        side = every - clade if 0 in clade else clade
        if not (1 < len(side) < n - 1):
            continue  # trivial (root) split: no decay defined
        true_best_without = min(
            s for sig, s in by_splits.items() if side not in sig
        )
        true_decay = true_best_without - best_score
        total += 1
        assert np.isfinite(decay[i])
        # Scan value upper-bounds the true decay...
        assert decay[i] >= true_decay - 1e-6
        if abs(decay[i] - true_decay) < 1e-6:
            exact += 1
    # ...and is exact for most splits at this size (some best
    # split-lacking tree is usually within one SPR).
    assert total >= 3 and exact >= total - 1


def test_spr_decay_signal_strength():
    """Long clean alignment -> larger decay than a short noisy one."""
    truth = _single(jax.random.key(5), 8)
    blens = np.full((truth.n_all,), 0.2)
    strong = jnp.asarray(
        simulate_alignment(jax.random.key(6), truth, blens, n_sites=1000)
    )
    weak = jnp.asarray(
        simulate_alignment(jax.random.key(7), truth, blens * 0.2, n_sites=60)
    )
    d_strong, _ = spr_decay_support(truth, strong)
    d_weak, _ = spr_decay_support(truth, weak)
    s = np.nanmean(d_strong)
    w = np.nanmean(d_weak)
    assert s > w
    assert s > 5.0  # plenty of steps behind every strong split


def test_cli_infer_decay(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    truth = _single(jax.random.key(20), 8)
    blens = np.full((truth.n_all,), 0.25)
    leaves = simulate_alignment(jax.random.key(21), truth, blens, n_sites=400)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], np.asarray(leaves), DNA))
    main(["infer", "--fasta", str(path), "--start", "nj", "--decay"])
    out = json.loads(capsys.readouterr().out)
    vals = [d for d in out["decay"] if d is not None]
    assert len(vals) >= 4
    assert all(v >= 0 for v in vals)
