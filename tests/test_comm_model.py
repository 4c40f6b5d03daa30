"""Collective-volume model vs actual shard layouts on a virtual mesh."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from trex_tpu.parallel.comm_model import (
    Collective,
    batch_scoring_collectives,
    best_tree_collectives,
    joint_step_collectives,
    predicted_efficiency,
    shard_sizes,
)
from trex_tpu.parallel.mesh import SITE_AXIS, TREE_AXIS, make_mesh
from trex_tpu.topology import random_topologies


def test_shard_sizes_match_device_layout():
    devices = jax.devices()[:8]
    for tree_par in (1, 2, 4, 8):
        mesh = make_mesh(devices, tree_parallelism=tree_par)
        n_tree, n_site = mesh.shape[TREE_AXIS], mesh.shape[SITE_AXIS]
        batch, n_leaves, length = 2 * n_tree, 8, 16 * max(n_site, 1)
        topos = random_topologies(jax.random.PRNGKey(0), n_leaves, batch)
        leaf = jnp.zeros((n_leaves, length), jnp.int32)
        want = shard_sizes(
            {TREE_AXIS: n_tree, SITE_AXIS: n_site}, batch, n_leaves, length
        )
        children = jax.device_put(
            topos.children, NamedSharding(mesh, P(TREE_AXIS))
        )
        leaf_s = jax.device_put(leaf, NamedSharding(mesh, P(None, SITE_AXIS)))
        assert children.addressable_shards[0].data.shape == want["children"]
        assert leaf_s.addressable_shards[0].data.shape == want["leaf_sequences"]


def test_ring_wire_volumes():
    # All-reduce over k devices ships 2(k-1)/k of the payload per device.
    c = Collective("psum", "site", 4, 1024)
    assert c.wire_bytes_per_device == 2 * 3 * 1024 // 4
    g = Collective("all_gather", "tree", 8, 8 * 4)
    assert g.wire_bytes_per_device == 7 * 8 * 4 // 8
    assert Collective("psum", "site", 1, 1 << 20).wire_bytes_per_device == 0


def test_collective_sets_match_sharded_programs():
    mesh_shape = {"tree": 2, "site": 4}
    score = batch_scoring_collectives(mesh_shape, batch=64)
    assert len(score) == 1 and score[0].op == "psum"
    assert score[0].payload_bytes == (64 // 2) * 4

    best = best_tree_collectives(mesh_shape, batch=64)
    assert [c.op for c in best] == ["psum", "all_gather", "all_gather"]

    joint = joint_step_collectives(
        mesh_shape, n_restarts=4, n_all=7, n_anc=3
    )
    # Loss psum + replicated topology-grad psum.
    assert [c.payload_bytes for c in joint] == [16, 4 * 6 * 3 * 4]


def test_efficiency_model_limits():
    cs = batch_scoring_collectives({"tree": 1, "site": 8}, batch=1024)
    # Infinite bandwidth -> perfect efficiency; tiny bandwidth -> ~0.
    assert predicted_efficiency(cs, 1e-3, 1e18) > 0.999
    assert predicted_efficiency(cs, 1e-6, 1e3) < 0.01
    # Monotone in bandwidth.
    e1 = predicted_efficiency(cs, 1e-3, 1e9)
    e2 = predicted_efficiency(cs, 1e-3, 1e10)
    assert e2 > e1


def test_round4_driver_collectives():
    """Rows for the mesh-native driver paths (hill-climb scan, MCMC)."""
    from trex_tpu.parallel.comm_model import (
        mcmc_generation_collectives,
        spr_scan_collectives,
    )

    mesh_shape = {"tree": 4, "site": 2}
    scan = spr_scan_collectives(mesh_shape, n_all=127)
    assert [c.op for c in scan] == ["all_gather"]
    assert scan[0].payload_bytes == 126 * 127 * 4
    # 4-way ring all_gather ships 3/4 of the result per device.
    assert scan[0].wire_bytes_per_device == (3 * 126 * 127 * 4) // 4

    gen = mcmc_generation_collectives(
        mesh_shape, n_runs=2, n_chains=4, n_anc=63, n_all=127,
        branch_moves_per_gen=2,
    )
    ops = [c.op for c in gen]
    assert ops.count("psum") == 3  # branch + topo + swap counters
    assert ops.count("permute") == 1
    perm = next(c for c in gen if c.op == "permute")
    # Worst case: both runs' swapped pairs straddle shard boundaries.
    assert perm.payload_bytes == 2 * 2 * (63 * 2 * 4 + 127 * 4 + 4)
    # Single-chain runs have no swap.
    solo = mcmc_generation_collectives(
        mesh_shape, n_runs=2, n_chains=1, n_anc=63, n_all=127
    )
    assert all(c.op == "psum" for c in solo)


def test_round5_tooling_collectives():
    """Round-5 replicate/support paths: RELL per-site matrix all_gather +
    stepping-stone counter psums / trace gather."""
    from trex_tpu.parallel.comm_model import (
        per_site_matrix_collectives,
        stepping_stone_collectives,
    )

    mesh_shape = {"tree": 4, "site": 2}
    # 10 candidates pad to 12 (three rows per tree shard) x 256 sites f32.
    ps = per_site_matrix_collectives(mesh_shape, n_candidates=10, length=256)
    assert [c.op for c in ps] == ["all_gather"]
    assert ps[0].payload_bytes == 12 * 256 * 4
    assert ps[0].wire_bytes_per_device == (3 * 12 * 256 * 4) // 4

    ss = stepping_stone_collectives(mesh_shape, n_rungs=8, total_steps=100)
    ops = [c.op for c in ss]
    assert ops.count("psum") == 100 and ops.count("all_gather") == 1
    assert ss[-1].payload_bytes == 100 * 8 * 4
