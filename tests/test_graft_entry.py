"""Driver-contract tests: entry() compiles; dryrun_multichip(8) runs."""

import numpy as np
import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == args[0].shape and out.dtype == np.uint8


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # asserts internally
