"""Multi-device sharding on the 8-device virtual CPU mesh.

Validates that sharded programs produce the same numbers as single-device
runs — the collectives (psum over sites, tree-batch data parallelism) must be
numerically transparent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trex_tpu.models.mutation_tree import generate_groundtruth
from trex_tpu.ops.sankoff import batched_sankoff_score
from trex_tpu.parallel.mesh import SITE_AXIS, TREE_AXIS, make_mesh
from trex_tpu.parallel.sharded import make_sharded_joint_step, sharded_batch_scores
from trex_tpu.search.optimizers import make_optimizer
from trex_tpu.topology import random_topologies
from trex_tpu.types import CostModel


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh(tree_parallelism=2)  # 2 x 4 (tree x site)


def test_mesh_shape(mesh):
    assert mesh.shape[TREE_AXIS] == 2
    assert mesh.shape[SITE_AXIS] == 4


def test_sharded_scores_match_single_device(mesh):
    n_leaves, q, length, batch = 8, 4, 64, 16
    topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(1), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix

    single = batched_sankoff_score(topos, cost, leaf)
    sharded = sharded_batch_scores(mesh, topos, cost, leaf)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_sharded_joint_step_matches_single_device(mesh):
    """One sharded optimizer step == one unsharded step (same numbers)."""
    n_leaves, length, q = 4, 32, 4
    n_all = 2 * n_leaves - 1
    gt = generate_groundtruth(n_leaves, q, 2, length, seed=0)
    leaf_tensor = jnp.zeros((n_all, length, q))
    leaf_tensor = leaf_tensor.at[:n_leaves].set(
        jax.nn.one_hot(gt.all_sequences[:n_leaves].astype(jnp.int32), q)
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {
        "tree_params": jax.random.normal(k1, (n_all - 1, n_leaves - 1)),
        "ancestors": jax.random.normal(k2, (n_leaves - 1, length, q)),
    }
    optimizer = make_optimizer("adam", 0.01, clip_global_norm=None)
    opt_state = optimizer.init(params)

    # Single-device oracle step.
    from trex_tpu.ops.costs import surrogate_cost
    from trex_tpu.ops.relax import binary_tree_penalty, soft_sequences, soft_topology
    import optax

    step_key = jax.random.PRNGKey(9)

    def loss_fn(p):
        seqs = soft_sequences(p["ancestors"], leaf_tensor, n_leaves, 1.0)
        tree = soft_topology(step_key, p["tree_params"])
        return surrogate_cost(seqs, tree) + 1.0 * binary_tree_penalty(tree, 10.0)

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    step = make_sharded_joint_step(mesh, optimizer, n_leaves, constraint_scale=10.0)
    params_out, _, loss_out = step(
        params, opt_state, leaf_tensor, step_key, jnp.asarray(1.0)
    )

    assert float(loss_out) == pytest.approx(float(loss_ref), rel=1e-5)
    for name in ("tree_params", "ancestors"):
        np.testing.assert_allclose(
            np.asarray(params_out[name]), np.asarray(params_ref[name]),
            atol=1e-5,
        )


def test_scaling_more_trees_than_devices(mesh):
    """Batches larger than the tree axis shard in blocks and still agree."""
    n_leaves, q, length, batch = 4, 2, 32, 64
    topos = random_topologies(jax.random.PRNGKey(5), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(6), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    single = batched_sankoff_score(topos, cost, leaf)
    sharded = sharded_batch_scores(mesh, topos, cost, leaf)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_scaling_harness_smoke(mesh, capsys):
    """benchmarks/scaling.py logic runs on the virtual mesh."""
    import sys, subprocess, json, os

    from trex_tpu.parallel.mesh import make_mesh
    from trex_tpu.parallel.sharded import sharded_batch_scores
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel

    topos = random_topologies(jax.random.PRNGKey(0), 8, 16)
    cost = CostModel.hamming(4).matrix
    leaf = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 0, 4)
    for n in (1, 4):
        m = make_mesh(jax.devices()[:n])
        scores = sharded_batch_scores(m, topos, cost, leaf)
        assert scores.shape == (16,)


def test_dispatch_falls_back_to_lax(mesh):
    from trex_tpu.ops.dispatch import batched_scores_fastest
    from trex_tpu.ops.sankoff import batched_sankoff_score
    from trex_tpu.topology import random_topologies
    from trex_tpu.types import CostModel

    topos = random_topologies(jax.random.PRNGKey(0), 8, 4)
    cost = CostModel.hamming(4).matrix
    leaf = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 0, 4)
    got = batched_scores_fastest(topos, cost, leaf)
    want = batched_sankoff_score(topos, cost, leaf)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_scores_fitch_path_matches(mesh):
    """Sharded Fitch path == sharded min-plus path == single device."""
    n_leaves, q, length, batch = 8, 4, 64, 16
    topos = random_topologies(jax.random.PRNGKey(8), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(9), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    single = batched_sankoff_score(topos, cost, leaf)
    fitch = sharded_batch_scores(mesh, topos, cost, leaf, use_fitch=True)
    minplus = sharded_batch_scores(mesh, topos, cost, leaf, use_fitch=False)
    np.testing.assert_allclose(np.asarray(fitch), np.asarray(single), atol=1e-5)
    np.testing.assert_allclose(np.asarray(minplus), np.asarray(single), atol=1e-5)


def test_sharded_best_tree_matches_host_argmin(mesh):
    n_leaves, q, length, batch = 8, 4, 64, 32
    topos = random_topologies(jax.random.PRNGKey(10), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(11), (n_leaves, length), 0, q)
    cost = CostModel.hamming(q).matrix
    from trex_tpu.parallel.sharded import sharded_best_tree

    idx, score = sharded_best_tree(mesh, topos, cost, leaf)
    scores = np.asarray(batched_sankoff_score(topos, cost, leaf))
    assert float(score) == scores.min()
    assert scores[int(idx)] == scores.min()


def test_sharded_log_likelihoods_match_single_device(mesh):
    from trex_tpu.ops.likelihood import tree_log_likelihood
    from trex_tpu.parallel.sharded import sharded_log_likelihoods

    n_leaves, q, length, batch = 8, 4, 64, 16
    topos = random_topologies(jax.random.PRNGKey(3), n_leaves, batch)
    leaf = jax.random.randint(jax.random.PRNGKey(4), (n_leaves, length), 0, q)
    blens = jnp.full((batch, 2 * n_leaves - 1), 0.2)

    single = jnp.stack(
        [
            tree_log_likelihood(
                jax.tree_util.tree_map(lambda a, i=i: a[i], topos),
                blens[i], leaf, q,
            )
            for i in range(batch)
        ]
    )
    sharded = sharded_log_likelihoods(mesh, topos, blens, leaf, q)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=2e-5)

    # Ambiguity masks shard identically.
    masks = (jnp.int32(1) << leaf).astype(jnp.int32)
    masks = masks.at[0, :8].set(0b1111)
    single_m = jnp.stack(
        [
            tree_log_likelihood(
                jax.tree_util.tree_map(lambda a, i=i: a[i], topos),
                blens[i], masks, q, sequences_are_masks=True,
            )
            for i in range(batch)
        ]
    )
    sharded_m = sharded_log_likelihoods(
        mesh, topos, blens, masks, q, sequences_are_masks=True
    )
    np.testing.assert_allclose(
        np.asarray(sharded_m), np.asarray(single_m), rtol=2e-5
    )


def test_sharded_spr_scan_matches_single_device(mesh):
    """Prune-axis-sharded scan == single-device scan, both criteria."""
    import numpy as np

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.ops.likelihood_scan import likelihood_spr_scan
    from trex_tpu.ops.spr_scan import spr_scan
    from trex_tpu.parallel.sharded import sharded_spr_scan
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(90), 9, 1)
    )
    blens = np.full((topo.n_all,), 0.2)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.key(91), topo, blens, n_sites=64)
    )
    ref_scores, ref_base = spr_scan(topo, leaves, None)
    sh_scores, sh_base = sharded_spr_scan(mesh, topo, leaves)
    np.testing.assert_allclose(
        np.asarray(sh_scores), np.asarray(ref_scores), rtol=1e-6
    )
    np.testing.assert_allclose(float(sh_base), float(ref_base), rtol=1e-6)

    ml_ref, ml_base = likelihood_spr_scan(topo, leaves, 4, 0.1)
    ml_sh, ml_sh_base = sharded_spr_scan(
        mesh, topo, leaves, criterion="ml", n_states=4
    )
    np.testing.assert_allclose(
        np.asarray(ml_sh), np.asarray(ml_ref), rtol=1e-5
    )
    np.testing.assert_allclose(float(ml_sh_base), float(ml_base), rtol=1e-5)


def test_sharded_spr_scan_with_weights(mesh):
    """Compressed patterns + weights match the single-device weighted scan."""
    import numpy as np

    from trex_tpu.alignment import compress_alignment
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.ops.spr_scan import spr_scan
    from trex_tpu.parallel.sharded import sharded_spr_scan
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(95), 8, 1)
    )
    blens = np.full((topo.n_all,), 0.3)
    leaves = np.asarray(
        simulate_alignment(jax.random.key(96), topo, blens, n_sites=96)
    )
    patterns, weights = compress_alignment(leaves)
    pw = jnp.asarray(np.asarray(patterns), jnp.int32)
    w = jnp.asarray(weights, jnp.float32)
    ref_scores, ref_base = spr_scan(topo, pw, w)
    sh_scores, sh_base = sharded_spr_scan(mesh, topo, pw, w)
    np.testing.assert_allclose(
        np.asarray(sh_scores), np.asarray(ref_scores), rtol=1e-6
    )
    np.testing.assert_allclose(float(sh_base), float(ref_base), rtol=1e-6)


def test_sharded_spr_scan_segments_bit_identical(mesh):
    """A forcibly tiny per-dispatch cell cap (multi-segment mesh scan) is
    BIT-identical to the one-dispatch mesh scan, both criteria.

    Guards the runtime-kill fix through the mesh path: sharded_spr_scan must
    cap each dispatch's per-device prune extent (ops/spr_scan.py:248-257's
    bisect) without changing a single bit of the score table."""
    import numpy as np

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.parallel.sharded import sharded_spr_scan
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(97), 9, 1)
    )
    blens = np.full((topo.n_all,), 0.2)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.key(98), topo, blens, n_sites=64)
    )
    n_all = topo.n_all  # 17; local_prune = 8 on the 2-device tree axis
    one, one_base = sharded_spr_scan(mesh, topo, leaves)
    # cap -> 3 prune rows/device/dispatch -> 3 segments (3 + 3 + 2 padded)
    seg, seg_base = sharded_spr_scan(mesh, topo, leaves, max_cells=3 * n_all)
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(one))
    assert float(seg_base) == float(one_base)

    ml_one, ml_one_base = sharded_spr_scan(
        mesh, topo, leaves, criterion="ml", n_states=4
    )
    ml_seg, ml_seg_base = sharded_spr_scan(
        mesh, topo, leaves, criterion="ml", n_states=4, max_cells=3 * n_all
    )
    np.testing.assert_array_equal(np.asarray(ml_seg), np.asarray(ml_one))
    assert float(ml_seg_base) == float(ml_one_base)

    # A cap of one row per dispatch (the degenerate extreme) also holds.
    tiny, tiny_base = sharded_spr_scan(mesh, topo, leaves, max_cells=1)
    np.testing.assert_array_equal(np.asarray(tiny), np.asarray(one))
    assert float(tiny_base) == float(one_base)


def test_dating_chains_shard_bit_identically(mesh):
    """mcmc_date chains are pure data parallelism over the mesh: sharded
    and unsharded runs must produce IDENTICAL traces (same key)."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.ops.clock import ages_to_lengths, increments_to_ages
    from trex_tpu.search.dating import mcmc_date
    from trex_tpu.io import sample_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], sample_topologies(3, 6, 1)
    )
    inc = jnp.asarray(np.full(5, 0.08, np.float32))
    ages = increments_to_ages(topo, inc)
    aln = simulate_alignment(
        jax.random.PRNGKey(0), topo,
        np.asarray(ages_to_lengths(topo, ages)), n_sites=200,
    )
    seqs = jnp.asarray(aln.astype(np.int32))
    kwargs = dict(n_generations=300, n_chains=4, sample_every=3)
    plain = mcmc_date(jax.random.PRNGKey(1), topo, seqs, 4, **kwargs)
    sharded = mcmc_date(
        jax.random.PRNGKey(1), topo, seqs, 4, mesh=mesh, **kwargs
    )
    np.testing.assert_allclose(
        sharded.sample_ages, plain.sample_ages, atol=1e-6
    )
    np.testing.assert_allclose(
        sharded.sample_lnl, plain.sample_lnl, rtol=1e-5
    )


def test_hill_climb_mesh_matches_single_device(mesh):
    """A mesh-routed hill climb is bit-identical to single-device.

    Both neighborhoods: enumerating NNI (candidate batch sharded over
    'tree', sites over 'site' — integer-valued site sums make the psum
    reorder exact) and spr-scan (prune axis sharded). The site length 56
    is deliberately NOT divisible by the 4-wide site axis, exercising the
    weight-0 state-0 column padding.
    """
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.hillclimb import parsimony_hill_climb
    from trex_tpu.topology import random_topologies

    n_leaves, q = 10, 4
    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(40), n_leaves, 1)
    )
    blens = np.full((truth.n_all,), 0.25, np.float32)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.PRNGKey(41), truth, blens, n_sites=56)
    )
    start = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(42), n_leaves, 1)
    )
    cost = CostModel.hamming(q).matrix
    for nbhd in ("nni", "spr-scan"):
        plain = parsimony_hill_climb(
            start, cost, leaves, neighborhood=nbhd, max_rounds=6
        )
        meshed = parsimony_hill_climb(
            start, cost, leaves, neighborhood=nbhd, max_rounds=6, mesh=mesh
        )
        assert meshed.score == plain.score, nbhd
        assert meshed.trace == plain.trace, nbhd
        np.testing.assert_array_equal(
            np.asarray(meshed.topology.children),
            np.asarray(plain.topology.children),
        )


def test_ml_scan_climb_mesh_matches_single_device(mesh):
    """ML ranking rounds (analytic likelihood scan) across the mesh."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.ml import ml_hill_climb
    from trex_tpu.topology import random_topologies

    n_leaves = 8
    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(50), n_leaves, 1)
    )
    blens = np.full((truth.n_all,), 0.2, np.float32)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.PRNGKey(51), truth, blens, n_sites=64)
    )
    start = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(52), n_leaves, 1)
    )
    plain, plain_len, _ = ml_hill_climb(
        start, leaves, 4, neighborhood="spr-scan", max_rounds=4
    )
    meshed, mesh_len, _ = ml_hill_climb(
        start, leaves, 4, neighborhood="spr-scan", max_rounds=4, mesh=mesh
    )
    np.testing.assert_allclose(meshed.score, plain.score, rtol=1e-6)
    assert len(meshed.trace) == len(plain.trace)
    np.testing.assert_array_equal(
        np.asarray(meshed.topology.children),
        np.asarray(plain.topology.children),
    )
    np.testing.assert_allclose(
        np.asarray(mesh_len), np.asarray(plain_len), rtol=1e-5
    )


def test_mcmc_mesh_bit_identical(mesh):
    """mcmc_sample with the chain axis sharded over 'tree' reproduces the
    single-device trajectories exactly (same key): every float op in the
    generation step is per-chain; only the integer acceptance counters and
    the MC^3 swap permutation cross shards."""
    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.mcmc import mcmc_sample
    from trex_tpu.topology import random_topologies

    n_leaves = 6
    truth = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.PRNGKey(60), n_leaves, 1)
    )
    blens = np.full((truth.n_all,), 0.2, np.float32)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.PRNGKey(61), truth, blens, n_sites=64)
    )
    kwargs = dict(
        n_generations=200, n_runs=1, n_chains=4, sample_every=5,
        burnin_frac=0.1, branch_moves_per_gen=1,
    )
    plain = mcmc_sample(jax.random.PRNGKey(62), leaves, 4, **kwargs)
    meshed = mcmc_sample(jax.random.PRNGKey(62), leaves, 4, mesh=mesh, **kwargs)
    assert len(plain.sample_lnl) == len(meshed.sample_lnl) > 0
    np.testing.assert_array_equal(
        np.stack(meshed.sample_children), np.stack(plain.sample_children)
    )
    np.testing.assert_allclose(
        np.asarray(meshed.sample_lnl), np.asarray(plain.sample_lnl),
        rtol=1e-7,
    )
    assert meshed.acceptance == plain.acceptance


def test_replicate_tooling_sharded_matches_single_device(mesh):
    """Round-5: the replicate/support tooling shards over the mesh —
    ufboot, topotest, stepping-stone, and both bootstrap analyses must
    reproduce their single-device results (bit-identical for the integer
    parsimony paths, rtol-tight for float likelihood paths)."""
    import numpy as np

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(101), 8, 1)
    )
    blens = np.full((topo.n_all,), 0.2)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.key(102), topo, blens, n_sites=64)
    )

    # --- ufboot: candidate axis over 'tree' ---
    from trex_tpu.search.ufboot import ultrafast_bootstrap

    kw = dict(n_replicates=50, extra_tbr=8, n_sweeps=2)
    ub1 = ultrafast_bootstrap(jax.random.key(5), topo, leaves, 4, **kw)
    ub2 = ultrafast_bootstrap(
        jax.random.key(5), topo, leaves, 4, mesh=mesh, **kw
    )
    np.testing.assert_allclose(
        ub2.log_likelihoods, ub1.log_likelihoods, rtol=2e-6
    )
    np.testing.assert_array_equal(ub2.winner_counts, ub1.winner_counts)
    np.testing.assert_array_equal(ub2.support, ub1.support)

    # --- topotest: tree axis over 'tree' ---
    from trex_tpu.search.topotest import topology_tests

    cands = random_topologies(jax.random.key(103), 8, 4)
    tt1 = topology_tests(
        jax.random.key(6), cands, leaves, 4, n_replicates=200, n_sweeps=2,
        au_scales=None,
    )
    tt2 = topology_tests(
        jax.random.key(6), cands, leaves, 4, n_replicates=200, n_sweeps=2,
        au_scales=None, mesh=mesh,
    )
    np.testing.assert_allclose(tt2.per_site, tt1.per_site, rtol=2e-6)
    assert tt2.best_index == tt1.best_index
    np.testing.assert_allclose(tt2.p_kh, tt1.p_kh, atol=1e-12)
    np.testing.assert_allclose(tt2.p_sh, tt1.p_sh, atol=1e-12)

    # --- stepping stone: rung batch over 'tree' ---
    from trex_tpu.search.marginal import stepping_stone

    ss_kw = dict(n_rungs=8, n_generations=60, burnin_frac=0.3)
    ss1 = stepping_stone(jax.random.key(7), topo, leaves, 4, **ss_kw)
    ss2 = stepping_stone(
        jax.random.key(7), topo, leaves, 4, mesh=mesh, **ss_kw
    )
    np.testing.assert_allclose(
        ss2["log_ratios"], ss1["log_ratios"], rtol=1e-6
    )
    assert ss2["acceptance"] == ss1["acceptance"]

    # --- bootstrap analyses: per-replicate climbs score over the mesh ---
    from trex_tpu.search.bootstrap import (
        bootstrap_analysis,
        ml_bootstrap_analysis,
    )
    from trex_tpu.types import CostModel

    cost = CostModel.hamming(4).matrix
    bs_kw = dict(n_replicates=6, search_rounds=3)
    b1, trees1 = bootstrap_analysis(
        jax.random.key(8), topo, cost, leaves, **bs_kw
    )
    b2, trees2 = bootstrap_analysis(
        jax.random.key(8), topo, cost, leaves, mesh=mesh, **bs_kw
    )
    np.testing.assert_array_equal(b2, b1)
    for t1, t2 in zip(trees1, trees2):
        np.testing.assert_array_equal(
            np.asarray(t2.children), np.asarray(t1.children)
        )

    m1, _ = ml_bootstrap_analysis(
        jax.random.key(9), topo, leaves, 4, **bs_kw
    )
    m2, _ = ml_bootstrap_analysis(
        jax.random.key(9), topo, leaves, 4, mesh=mesh, **bs_kw
    )
    np.testing.assert_array_equal(m2, m1)


def test_alrt_and_bremer_sharded_match_single_device(mesh):
    """Round-5 follow-up: aLRT branch supports and SPR-decay also shard
    over the mesh (candidate axis / prune axis) with identical results."""
    import numpy as np

    from trex_tpu.models.simulate import simulate_alignment
    from trex_tpu.search.alrt import branch_supports
    from trex_tpu.search.bremer import spr_decay_support
    from trex_tpu.topology import random_topologies

    topo = jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(jax.random.key(111), 9, 1)
    )
    blens = np.full((topo.n_all,), 0.2)
    leaves = jnp.asarray(
        simulate_alignment(jax.random.key(112), topo, blens, n_sites=64)
    )

    s1 = branch_supports(
        jax.random.key(5), topo, leaves, 4, n_replicates=100, n_sweeps=2
    )
    s2 = branch_supports(
        jax.random.key(5), topo, leaves, 4, n_replicates=100, n_sweeps=2,
        mesh=mesh,
    )
    np.testing.assert_allclose(s2.alrt, s1.alrt, rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(s2.sh_alrt, s1.sh_alrt)
    np.testing.assert_array_equal(s2.rell, s1.rell)

    d1, b1 = spr_decay_support(topo, leaves)
    d2, b2 = spr_decay_support(topo, leaves, mesh=mesh)
    np.testing.assert_array_equal(d2, d1)
    assert b2 == b1


def test_joint_restarts_shard_identically(mesh):
    """joint_search / fit_topology restart batches shard over 'tree' via
    input shardings with results identical to the unsharded vmap."""
    import numpy as np

    from trex_tpu.models.mutation_tree import generate_groundtruth
    from trex_tpu.search.joint import JointConfig, fit_topology, joint_search
    from trex_tpu.types import CostModel

    n_leaves, q, length = 4, 4, 32
    n_all = 2 * n_leaves - 1
    gt = generate_groundtruth(n_leaves, q, 2, length, seed=1)
    leaf_tensor = jnp.zeros((n_all, length, q))
    leaf_tensor = leaf_tensor.at[:n_leaves].set(
        jax.nn.one_hot(gt.all_sequences[:n_leaves].astype(jnp.int32), q)
    )
    cost = CostModel.hamming(q).matrix
    cfg = JointConfig(n_iterations=40)
    _, losses1, score1 = joint_search(
        jax.random.key(2), leaf_tensor, cost, cfg, n_restarts=4
    )
    _, losses2, score2 = joint_search(
        jax.random.key(2), leaf_tensor, cost, cfg, n_restarts=4, mesh=mesh
    )
    assert float(score2) == float(score1)
    np.testing.assert_allclose(
        np.asarray(losses2), np.asarray(losses1), rtol=1e-6
    )

    seqs = jax.nn.one_hot(gt.all_sequences.astype(jnp.int32), q)
    p1, l1 = fit_topology(jax.random.key(3), seqs, n_iterations=40,
                          n_restarts=4)
    p2, l2 = fit_topology(jax.random.key(3), seqs, n_iterations=40,
                          n_restarts=4, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(p2["tree_params"]), np.asarray(p1["tree_params"]),
        rtol=1e-5, atol=1e-6,
    )

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        joint_search(
            jax.random.key(2), leaf_tensor, cost, cfg, n_restarts=3,
            mesh=mesh,
        )
