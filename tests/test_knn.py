"""KNN (K=1) correctness vs torch.cdist brute force."""

import numpy as np
import jax.numpy as jnp
import torch

from sherf_tpu.kernels import nn_1, nn_1_ref


def _oracle(q, r):
    d = torch.cdist(torch.from_numpy(q)[None], torch.from_numpy(r)[None])[0]
    dist, idx = d.min(dim=1)
    return (dist.numpy() ** 2), idx.numpy()


def test_nn_small():
    rng = np.random.RandomState(0)
    q = rng.randn(257, 3).astype(np.float32)
    r = rng.randn(689, 3).astype(np.float32)
    d2, idx = nn_1_ref(jnp.asarray(q), jnp.asarray(r))
    od2, oidx = _oracle(q, r)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-4)


def test_nn_chunked():
    rng = np.random.RandomState(1)
    q = (rng.randn(10000, 3) * 0.5).astype(np.float32)
    r = (rng.randn(6890, 3) * 0.5).astype(np.float32)
    d2, idx = nn_1(jnp.asarray(q), jnp.asarray(r), chunk=4096)
    od2, oidx = _oracle(q, r)
    # distance ties can produce different argmin; compare distances everywhere
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-4)
    assert (np.asarray(idx) == oidx).mean() > 0.999


def test_nn_pallas_interpret_matches_ref():
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas
    rng = np.random.RandomState(2)
    q = (rng.randn(1000, 3) * 0.5).astype(np.float32)
    r = (rng.randn(689, 3) * 0.5).astype(np.float32)
    d2, idx = nn_1_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    od2, oidx = _oracle(q, r)
    np.testing.assert_allclose(np.asarray(d2), od2, atol=1e-3)
    assert (np.asarray(idx) == oidx).mean() > 0.995
