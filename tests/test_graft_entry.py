"""Driver-contract smoke tests for __graft_entry__.py."""
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    warped, flow = jax.jit(fn)(*args)
    assert warped.shape == (1, 1, 40, 40, 40)
    assert flow.shape == (1, 3, 40, 40, 40)
    assert np.isfinite(np.asarray(warped)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
