"""Driver-contract tests: __graft_entry__ and bench smoke on CPU."""

import subprocess
import sys

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_traces():
    """entry() must return a jittable fn; trace it with eval_shape (full
    compile of the 2B model is exercised on the TPU by the driver)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    cfg_horizon = 16
    assert out.shape == (1, cfg_horizon, 7)
