"""Balanced mutation-tree ground-truth generator.

Behavioral counterpart of ``/root/reference/src/trex/ground_truth.py``: a
balanced binary tree whose root is the all-zeros sequence and where every
child differs from its parent at exactly ``n_mutations`` uniformly chosen
sites (offset substitutions, never silent). Node numbering follows the engine
contract: leaves first, root last, ancestor ``n_leaves + p`` has children
``2p`` and ``2p + 1`` (``ground_truth.py:155-170, 183-191``).

Implementation is a single ``lax.scan`` over ancestors in descending index
order (root first) — children always have smaller node indices than their
parent, so every parent row is written before its children read it. The
reference's ``fori_loop`` + in-loop key indexing is equivalent; the scan keeps
the whole generator one fused XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from trex_tpu.topology import balanced_topology, topology_to_adjacency
from trex_tpu.types import PhyloData, default_dtype


@partial(jax.jit, static_argnames=("n_states", "n_mutations"))
def mutate(
    key: jax.Array,
    sequence: jax.Array,
    n_states: int,
    n_mutations: int,
) -> jax.Array:
    """Substitute exactly ``n_mutations`` distinct sites of an int sequence.

    Each hit site moves by a uniform offset in ``1..n_states-1`` (mod Q), so
    a mutation never maps a state to itself — the property the reference's
    tests assert (``tests/test_ground_truth.py:31-33``; cf.
    ``ground_truth.py:39-52``).
    """
    site_key, offset_key = jax.random.split(key)
    length = sequence.shape[-1]
    hit = jnp.zeros(length, dtype=bool)
    if n_mutations > 0:
        sites = jax.random.choice(site_key, length, (n_mutations,), replace=False)
        hit = hit.at[sites].set(True)
    offsets = jax.random.randint(offset_key, sequence.shape, 1, n_states)
    return jnp.where(hit, (sequence + offsets) % n_states, sequence).astype(jnp.int8)


def generate_groundtruth(
    n_leaves: int,
    n_states: int,
    n_mutations: int,
    seq_length: int,
    seed: int = 42,
) -> PhyloData:
    """Generate a balanced mutation tree and its alignment.

    Args:
        n_leaves: leaf count, must be a power of two.
        n_states: alphabet size Q.
        n_mutations: exact substitutions per parent->child edge.
        seq_length: alignment length L.
        seed: PRNG seed.

    Returns:
        ``PhyloData`` with masked leaves-only sequences, the full ground-truth
        sequence set, and the balanced adjacency (A[child, parent] = 1).
    """
    if n_leaves <= 0 or (n_leaves & (n_leaves - 1)) != 0:
        raise ValueError("n_leaves must be a power of 2.")

    n_ancestors = n_leaves - 1
    n_all = n_leaves + n_ancestors
    topo = balanced_topology(n_leaves)

    key = jax.random.PRNGKey(seed)
    edge_keys = jax.random.split(key, n_ancestors)  # one key per ancestor

    seqs0 = jnp.zeros((n_all, seq_length), dtype=jnp.int8)  # root row = zeros

    def fill_children(seqs, inputs):
        anc_offset, child_pair, anc_key = inputs
        parent_seq = seqs[n_leaves + anc_offset]
        k1, k2 = jax.random.split(anc_key)
        seqs = seqs.at[child_pair[0]].set(mutate(k1, parent_seq, n_states, n_mutations))
        seqs = seqs.at[child_pair[1]].set(mutate(k2, parent_seq, n_states, n_mutations))
        return seqs, None

    offsets = jnp.arange(n_ancestors, dtype=jnp.int32)
    all_seqs, _ = jax.lax.scan(
        fill_children, seqs0, (offsets, topo.children, edge_keys), reverse=True
    )

    masked = jnp.zeros_like(all_seqs).at[:n_leaves].set(all_seqs[:n_leaves])
    dtype = default_dtype()
    return PhyloData(
        masked_sequences=masked.astype(dtype),
        all_sequences=all_seqs.astype(dtype),
        adjacency=topology_to_adjacency(topo, dtype=dtype),
    )
