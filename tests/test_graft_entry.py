"""Driver contract: entry() compile check and multi-chip dry run."""

import jax
import numpy as np

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    scores = jax.jit(fn)(*args)
    assert scores.shape == (32,)
    assert np.isfinite(np.asarray(scores)).all()


def test_dryrun_multichip_various_device_counts():
    for n in (1, 2, 5, 8):
        graft.dryrun_multichip(n)
