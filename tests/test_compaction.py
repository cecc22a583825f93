"""Pallas stream compaction vs the XLA cumsum+scatter reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.nerf.renderer import _compact_indices


def _ref(mask, cap):
    idx, valid = _compact_indices(jnp.asarray(mask), cap)
    return np.asarray(idx), np.asarray(valid)


@pytest.mark.parametrize("n,cap,p", [
    (4096, 512, 0.05),
    (4096, 512, 0.5),      # overflow: more survivors than cap
    (8192, 8192, 0.0),     # empty
    (5000, 1024, 0.1),     # n not a multiple of the block size
    (1024, 128, 1.0),      # all survive
])
def test_compact_matches_reference(n, cap, p):
    from sherf_tpu.kernels.compaction import compact_mask

    rng = np.random.RandomState(int(n + cap + p * 100))
    mask = rng.uniform(size=n) < p
    idx, valid = compact_mask(jnp.asarray(mask), cap)
    ridx, rvalid = _ref(mask, cap)
    np.testing.assert_array_equal(np.asarray(idx), ridx)
    np.testing.assert_array_equal(np.asarray(valid), rvalid)


def test_compact_order_and_sentinel():
    from sherf_tpu.kernels.compaction import compact_mask

    n, cap = 4096, 256
    mask = np.zeros(n, bool)
    hits = np.asarray([3, 100, 1023, 1024, 2047, 4095])
    mask[hits] = True
    idx, valid = compact_mask(jnp.asarray(mask), cap)
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx[:6], hits)
    assert (idx[6:] == n).all()
    assert np.asarray(valid)[:6].all() and not np.asarray(valid)[6:].any()
