"""weighted_gather: sum_k w[...,k]*table[ids[...,k]] with an MXU
multi-hot-matmul adjoint for the table gradient.

Parity target: jnp fancy-index + weighted-sum forward and scatter-add
backward (the default adjoint XLA would emit), cf. the reference's
.dense()+grid_sample sparse-volume readouts at renderer.py:744-797.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sherf_tpu.kernels.segment_accum import (
    weighted_gather, weighted_accumulate, _scatter_accumulate)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _ref_forward(table, ids, w):
    rows = table[ids.reshape(-1)].reshape(*ids.shape, table.shape[-1])
    return jnp.sum(rows.astype(w.dtype) * w[..., None], axis=-2)


def test_forward_matches_weighted_indexing(rng):
    table = jnp.asarray(rng.randn(731, 33).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 731, size=(170, 8)).astype(np.int32))
    w = jnp.asarray(rng.rand(170, 8).astype(np.float32))
    out = weighted_gather(table, ids, w)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_forward(table, ids, w)))


def test_backward_matches_scatter_add(rng):
    S, C, N, K = 997, 40, 20000, 8
    table = jnp.asarray(rng.randn(S, C).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, S, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.rand(N, K).astype(np.float32))
    g = jnp.asarray(rng.randn(N, C).astype(np.float32))
    d = jax.grad(lambda t: jnp.sum(weighted_gather(t, ids, w) * g))(table)
    # tight check: against scatter-add at the kernel's declared precision
    # (bf16-rounded inputs, f32 accumulation)
    dq = _scatter_accumulate(ids, w, g, S)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dq),
                               rtol=1e-4, atol=1e-4)
    # sanity vs full-f32 scatter-add: bf16 rounding noise only (atol covers
    # cancellation-heavy near-zero sums of ~160 rounded terms per row)
    dref = jax.grad(lambda t: jnp.sum(_ref_forward(t, ids, w) * g))(table)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                               rtol=5e-2, atol=1.5e-1)


def test_weight_gradient_exact(rng):
    S, C, N, K = 311, 16, 500, 8
    table = jnp.asarray(rng.randn(S, C).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, S, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.rand(N, K).astype(np.float32))
    g = jnp.asarray(rng.randn(N, C).astype(np.float32))
    dw = jax.grad(lambda ww: jnp.sum(weighted_gather(table, ids, ww) * g))(w)
    dwref = jax.grad(
        lambda ww: jnp.sum(_ref_forward(table, ids, ww) * g))(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dwref),
                               rtol=1e-5, atol=1e-5)


def test_backward_preserves_dtype(rng):
    table = jnp.asarray(rng.randn(123, 8)).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, 123, size=(50, 4)).astype(np.int32))
    w = jnp.asarray(rng.rand(50, 4).astype(np.float32))
    d = jax.grad(lambda t: jnp.sum(weighted_gather(t, ids, w)))(table)
    assert d.dtype == jnp.bfloat16


def test_weighted_accumulate_direct(rng):
    S, C, N, K = 300, 16, 5000, 8
    ids = jnp.asarray(rng.randint(0, S, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.rand(N, K).astype(np.float32))
    g = jnp.asarray(rng.randn(N, C).astype(np.float32))
    d = weighted_accumulate(ids, w, g, S)
    dref = _scatter_accumulate(ids, w, g, S)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                               rtol=1e-4, atol=1e-4)


def test_grad_through_jit_and_vmap(rng):
    table = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 64, size=(3, 11, 2)).astype(np.int32))
    w = jnp.asarray(rng.rand(3, 11, 2).astype(np.float32))

    @jax.jit
    def loss(t):
        return jnp.sum(jax.vmap(
            lambda i, ww: weighted_gather(t, i, ww))(ids, w) ** 2)

    d = jax.grad(loss)(table)
    dref = jax.grad(
        lambda t: jnp.sum(_ref_forward(t, ids, w) ** 2))(table)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                               rtol=2e-2, atol=2e-3)
