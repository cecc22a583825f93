"""SMPL LBS golden tests: our jnp implementation vs the reference's host
NumPy SMPL (used as an oracle via a synthetic model pickle)."""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from sherf_tpu.smpl import (
    synthetic_smpl, load_smpl, smpl_forward, transform_params,
    rodrigues, big_pose_params,
)
from conftest import add_reference_path


def _write_reference_pickle(model, path):
    import scipy.sparse as sp
    data = {
        "J_regressor": sp.csr_matrix(np.asarray(model.J_regressor)),
        "weights": np.asarray(model.weights).astype(np.float64),
        "posedirs": np.asarray(model.posedirs).astype(np.float64),
        "v_template": np.asarray(model.v_template).astype(np.float64),
        "shapedirs": np.asarray(model.shapedirs).astype(np.float64),
        "f": np.asarray(model.faces).astype(np.int64),
        "kintree_table": np.stack([
            np.concatenate([[2 ** 32 - 1], np.asarray(model.parents)[1:]]).astype(np.int64),
            np.arange(24, dtype=np.int64),
        ]),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl(seed=0)


def test_rodrigues_matches_cv2(model):
    import cv2
    rng = np.random.RandomState(1)
    vecs = rng.randn(24, 3).astype(np.float32)
    ours = np.asarray(rodrigues(jnp.asarray(vecs)))
    for i in range(24):
        ref, _ = cv2.Rodrigues(vecs[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_rodrigues_zero_safe():
    out = np.asarray(rodrigues(jnp.zeros((2, 3))))
    np.testing.assert_allclose(out, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_smpl_forward_matches_reference_numpy(model, tmp_path):
    add_reference_path()
    from smpl.smpl_numpy import SMPL as RefSMPL, MALE_PATH

    _write_reference_pickle(model, tmp_path / MALE_PATH)
    ref = RefSMPL(sex="male", model_dir=str(tmp_path))

    rng = np.random.RandomState(2)
    pose = (rng.randn(72) * 0.3).astype(np.float32)
    beta = (rng.randn(10) * 0.5).astype(np.float32)

    ref_verts, ref_joints = ref(pose, beta)
    verts, joints = smpl_forward(model, jnp.asarray(pose), jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(verts), ref_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), ref_joints, atol=2e-5)


def test_smpl_forward_bigpose(model, tmp_path):
    add_reference_path()
    from smpl.smpl_numpy import SMPL as RefSMPL, MALE_PATH

    _write_reference_pickle(model, tmp_path / MALE_PATH)
    ref = RefSMPL(sex="male", model_dir=str(tmp_path))
    bp = big_pose_params()
    ref_verts, _ = ref(bp["poses"], bp["shapes"])
    verts, _ = smpl_forward(model, jnp.asarray(bp["poses"]), jnp.asarray(bp["shapes"]))
    np.testing.assert_allclose(np.asarray(verts), ref_verts, atol=2e-5)


def test_load_smpl_roundtrip(model, tmp_path):
    _write_reference_pickle(model, tmp_path / "model.pkl")
    loaded = load_smpl(str(tmp_path / "model.pkl"))
    np.testing.assert_allclose(np.asarray(loaded.v_template),
                               np.asarray(model.v_template), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(loaded.parents), np.asarray(model.parents))


def test_transform_params_consistent_with_forward(model):
    """Skinning v_posed with A from transform_params must reproduce
    smpl_forward's vertices (internal consistency of the two paths the
    reference also maintains: smpl_numpy vs get_transform_params_torch)."""
    rng = np.random.RandomState(3)
    pose = jnp.asarray((rng.randn(72) * 0.4).astype(np.float32))
    beta = jnp.asarray((rng.randn(10) * 0.5).astype(np.float32))

    A, joints = transform_params(model, pose, beta)
    from sherf_tpu.smpl import pose_offsets_table, shape_offsets_table
    v_posed = (model.v_template + shape_offsets_table(model, beta)
               + pose_offsets_table(model, pose))
    T = jnp.einsum("vj,jab->vab", model.weights, A)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]

    ref_verts, _ = smpl_forward(model, pose, beta)
    np.testing.assert_allclose(np.asarray(verts), np.asarray(ref_verts), atol=1e-5)
