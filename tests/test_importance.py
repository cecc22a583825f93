"""Importance sampling invariants (dead code in shipped configs; kept
API-complete, reference renderer.py:483-542)."""

import numpy as np
import jax
import jax.numpy as jnp

from sherf_tpu.nerf import sample_pdf, sample_importance


def test_sample_pdf_det_in_range_and_monotonic():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(16, 9).astype(np.float32) * 4, axis=1)
    weights = rng.rand(16, 8).astype(np.float32)
    s = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32, det=True))
    assert s.shape == (16, 32)
    assert (s >= bins[:, :1] - 1e-5).all() and (s <= bins[:, -1:] + 1e-5).all()
    assert (np.diff(s, axis=1) >= -1e-5).all()


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32)[None].repeat(4, 0))
    w = np.full((4, 10), 1e-4, np.float32)
    w[:, 7] = 100.0  # nearly all mass in bin [0.7, 0.8]
    s = np.asarray(sample_pdf(bins, jnp.asarray(w), 64, det=True))
    frac = ((s >= 0.7) & (s <= 0.8)).mean()
    assert frac > 0.9


def test_sample_pdf_random_mode():
    rng = jax.random.PRNGKey(0)
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32)[None].repeat(3, 0))
    w = jnp.ones((3, 8))
    s = sample_pdf(bins, w, 16, det=False, rng=rng)
    assert s.shape == (3, 16)
    assert bool(((s >= 0) & (s <= 1)).all())


def test_sample_importance_shapes():
    rng = np.random.RandomState(1)
    z = np.sort(rng.rand(8, 12).astype(np.float32) * 2 + 2, axis=1)
    w = rng.rand(8, 12).astype(np.float32)
    out = np.asarray(sample_importance(jnp.asarray(z), jnp.asarray(w), 24))
    assert out.shape == (8, 24)
    assert (out >= z[:, :1] - 1e-4).all() and (out <= z[:, -1:] + 1e-4).all()
