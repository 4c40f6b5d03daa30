"""Padding/bucketing: bucket ladders, masks, recompile prevention.

Ports the intent of ``/root/reference/tests/test_padding.py`` including its
recompilation-prevention test (``:177-200``), against the open-ended ladders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.padding import (
    SITE_BUCKETS,
    k_bucket,
    masked_mean,
    masked_sum,
    next_bucket,
    node_bucket,
    pad_adjacency,
    pad_axis,
    pad_nk_tables,
    pad_sites,
    site_bucket,
    site_mask,
)


def test_bucket_selection():
    assert site_bucket(1) == 32
    assert site_bucket(32) == 32
    assert site_bucket(33) == 64
    assert site_bucket(1000) == 1024
    assert k_bucket(3) == 4
    assert node_bucket(15) == 15
    assert node_bucket(100) == 127


def test_bucket_open_ended():
    """Unlike the reference (caps at 256 sites / 63 nodes), large sizes work."""
    assert site_bucket(20000) == 32768
    assert node_bucket(5000) == 8191


def test_next_bucket_monotone():
    prev = 0
    for v in [1, 31, 32, 100, 256, 300, 16384, 100000]:
        b = next_bucket(v, SITE_BUCKETS)
        assert b >= v
        assert b >= prev
        prev = b


def test_pad_sites_and_mask():
    seqs = jnp.arange(12).reshape(2, 6)
    padded = pad_sites(seqs, 10)
    assert padded.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(padded[:, 6:]), np.zeros((2, 4)))
    mask = site_mask(6, 10)
    assert int(mask.sum()) == 6
    assert bool(mask[5]) and not bool(mask[6])


def test_pad_adjacency():
    adj = jnp.ones((3, 3))
    out = pad_adjacency(adj, 7)
    assert out.shape == (7, 7)
    assert float(out.sum()) == 9.0


def test_pad_axis_validates():
    import pytest

    with pytest.raises(ValueError):
        pad_axis(jnp.ones((4,)), 0, 2)


def test_pad_nk_tables():
    tables = jnp.ones((5, 2 ** 3))  # L=5, K=2, q=2
    inter = jnp.zeros((5, 2), dtype=jnp.int32)
    t, i = pad_nk_tables(tables, inter, target_sites=8, target_k=4, n_states=2)
    assert t.shape == (8, 2 ** 5)
    assert i.shape == (8, 4)


def test_masked_reductions():
    vals = jnp.array([1.0, 2.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    assert float(masked_sum(vals, mask)) == 6.0
    assert float(masked_mean(vals, mask)) == 2.0


def test_no_recompilation_within_bucket():
    """Two lengths in the same bucket reuse one compiled program."""
    compile_count = 0

    @jax.jit
    def score_padded(seqs):
        nonlocal compile_count
        compile_count += 1  # traces only on (re)compile
        return seqs.sum()

    for real_len in (40, 50, 60):
        bucket = site_bucket(real_len)  # all -> 64
        seqs = jnp.zeros((4, real_len), dtype=jnp.int32)
        score_padded(pad_sites(seqs, bucket))
    assert compile_count == 1
