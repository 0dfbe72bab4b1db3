"""Driver-contract smoke tests for __graft_entry__.py.

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(N)`` on N virtual CPU devices; nothing else in the suite
imports the module, so a regression there would otherwise only surface at
round end.
"""

import importlib
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

graft = importlib.import_module("__graft_entry__")


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    loss, grad = jax.jit(fn)(*args)
    assert jnp.isfinite(loss)
    assert grad.shape == args[0].shape
    assert jnp.isfinite(grad).all()


def test_dryrun_multichip_8():
    # conftest forces 8 virtual CPU devices; the dryrun exercises the GSPMD
    # and shard_map data-parallel S-LBFGS paths plus the param-sharded
    # L-BFGS (loop and compact/bf16-ring) and asserts finiteness itself.
    graft.dryrun_multichip(8)
