"""Multi-chip sharding: full train step over an 8-device (data x rays) mesh
on the virtual CPU backend, plus sharded inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__  # noqa: E402


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8


def test_dryrun_multichip():
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert bool(jnp.isfinite(out).all())
