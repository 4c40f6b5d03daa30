"""Partitioned ML: partition-file parsing + per-partition model fitting.

Oracles: a single all-sites partition must reproduce ``optimize_model``
exactly (same init, same optimizer, same loss sequence); data simulated with
one partition evolving 3x faster must recover a >1 rate multiplier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.io import parse_partitions
from trex_tpu.ops.likelihood import (
    jc69_transition,
    optimize_model,
    optimize_model_partitioned,
)
from trex_tpu.topology import balanced_topology


def test_parse_partitions():
    ids, names, types = parse_partitions(
        "DNA, gene1 = 1-6\nDNA, gene2 = 7-10, 12\nWAG, odd = 11\n", 12
    )
    assert names == ["gene1", "gene2", "odd"]
    assert types == ["DNA", "DNA", "WAG"]
    np.testing.assert_array_equal(
        ids, [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 1]
    )


def test_parse_partitions_codon_stride():
    ids, names, _ = parse_partitions(
        "DNA, pos1 = 1-6\\3\nDNA, pos2 = 2-6\\3\nDNA, pos3 = 3-6\\3\n", 6
    )
    np.testing.assert_array_equal(ids, [0, 1, 2, 0, 1, 2])


def test_parse_partitions_errors():
    with pytest.raises(ValueError, match="assigned twice"):
        parse_partitions("DNA, a = 1-4\nDNA, b = 3-6\n", 6)
    with pytest.raises(ValueError, match="not covered"):
        parse_partitions("DNA, a = 1-4\n", 6)
    with pytest.raises(ValueError, match="outside"):
        parse_partitions("DNA, a = 1-9\n", 6)
    with pytest.raises(ValueError, match="TYPE, name"):
        parse_partitions("gene1 = 1-6\n", 6)


def test_single_partition_matches_optimize_model():
    topo = balanced_topology(4)
    seqs = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, (4, 50)), jnp.int32
    )
    params, losses = optimize_model(
        topo, seqs, 4, model="gtr+g", n_iterations=60
    )
    result, part_losses = optimize_model_partitioned(
        topo, seqs, 4, jnp.zeros((50,), jnp.int32),
        models=["gtr+g"], n_iterations=60,
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(part_losses), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["branch_lengths"]),
        np.asarray(result["branch_lengths"]),
        rtol=1e-4,
    )
    assert float(result["rate_multipliers"][0]) == 1.0


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
    return states[: topo.n_leaves].astype(np.int32)


def test_recovers_partition_rate_multiplier():
    topo = balanced_topology(8)
    slow = _simulate_jc(topo, np.full(15, 0.1), 300, seed=1)
    fast = _simulate_jc(topo, np.full(15, 0.4), 300, seed=2)  # 4x rate
    seqs = jnp.asarray(np.concatenate([slow, fast], axis=1))
    pids = jnp.asarray([0] * 300 + [1] * 300, jnp.int32)
    result, losses = optimize_model_partitioned(
        topo, seqs, 4, pids, models=["jc", "jc"], n_iterations=250,
    )
    mult = float(result["rate_multipliers"][1])
    assert float(losses[-1]) < float(losses[0])
    assert 2.0 < mult < 8.0, mult
    # Equal linking pins every multiplier at 1.
    result_eq, _ = optimize_model_partitioned(
        topo, seqs, 4, pids, models=["jc", "jc"], linked="equal",
        n_iterations=30,
    )
    assert float(result_eq["rate_multipliers"][1]) == 1.0


def test_per_partition_models_and_errors():
    topo = balanced_topology(4)
    seqs = jnp.asarray(
        np.random.default_rng(3).integers(0, 4, (4, 40)), jnp.int32
    )
    pids = jnp.asarray([0] * 20 + [1] * 20, jnp.int32)
    result, _ = optimize_model_partitioned(
        topo, seqs, 4, pids, models=["jc", "gtr+g"], n_iterations=40,
    )
    p0, p1 = result["partitions"]
    assert "rates" not in p0 and "rates" in p1 and "gamma_shape" in p1
    assert np.isfinite(float(p0["log_likelihood"]))
    with pytest.raises(ValueError, match="model strings"):
        optimize_model_partitioned(topo, seqs, 4, pids, models=["jc"])
    with pytest.raises(ValueError, match="linked"):
        optimize_model_partitioned(
            topo, seqs, 4, pids, models=["jc", "jc"], linked="nope"
        )


def test_partitioned_scan_climb_recovers_topology():
    """Summed per-partition scans recover the shared true topology."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.ml import ml_partitioned_scan_climb
    from trex_tpu.search.ratchet import rf_distance_unrooted
    from trex_tpu.topology import random_topologies

    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(70), 10, 1)
    )
    blens = np.full((truth.n_all,), 0.15)
    # Two partitions, different models and rates.
    rates_a = np.ones((4, 4)) - np.eye(4)
    rates_a[0, 2] = rates_a[2, 0] = 6.0
    part_a = simulate_alignment(
        jax.random.key(71), truth, blens, n_sites=300, rates=rates_a
    )
    part_b = simulate_alignment(
        jax.random.key(72), truth, blens * 3.0, n_sites=300
    )
    start = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(73), 10, 1)
    )
    parts = [
        dict(
            leaf_sequences=jnp.asarray(part_a),
            rates=jnp.asarray(rates_a, jnp.float32),
            freqs=jnp.full((4,), 0.25),
        ),
        dict(leaf_sequences=jnp.asarray(part_b), rate_multiplier=3.0),
    ]
    res = ml_partitioned_scan_climb(start, parts, 4)
    assert rf_distance_unrooted(res.topology, truth) == 0
    # Joint score improves monotonically along the trace.
    assert all(b <= a + 1e-6 for a, b in zip(res.trace, res.trace[1:]))


def test_cli_partition_search(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, load_newick, renumber_leaves, save_newick, write_fasta
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.ratchet import rf_distance_unrooted
    from trex_tpu.topology import random_topologies

    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(74), 8, 1)
    )
    names = [f"g{i}" for i in range(8)]
    blens = np.full((truth.n_all,), 0.2)
    a = simulate_alignment(jax.random.key(75), truth, blens, n_sites=200)
    b = simulate_alignment(jax.random.key(76), truth, blens * 2, n_sites=200)
    aln = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    fasta = tmp_path / "p.fasta"
    fasta.write_text(write_fasta(names, aln, DNA))
    pfile = tmp_path / "parts.txt"
    pfile.write_text("DNA, g1 = 1-200\nDNA, g2 = 201-400\n")
    out_tree = tmp_path / "out.nwk"
    main(["partition", "--fasta", str(fasta), "--partitions", str(pfile),
          "--model", "jc", "--search", "--output-tree", str(out_tree)])
    out = json.loads(capsys.readouterr().out)
    assert "search_rounds" in out
    got, _, got_names = load_newick(out_tree.read_text())
    order = {n: i for i, n in enumerate(names)}
    aligned = renumber_leaves(got, [order[n] for n in got_names])
    assert rf_distance_unrooted(aligned, truth) == 0
