"""SMPL model constants.

Loads the standard SMPL pickle (the reference loads ``assets/SMPL_NEUTRAL.pkl``
at ``renderer.py:283-284`` and ``smpl/smpl_numpy.py:24-35``) into an immutable
pytree of jnp arrays.  Also provides a deterministic synthetic model with the
real kinematic tree for tests/benchmarks where the licensed asset is absent.
"""

from __future__ import annotations

import pickle

import numpy as np
from flax import struct
import jax.numpy as jnp

N_VERTS = 6890
N_JOINTS = 24
N_POSEDIRS = 207  # 23 joints x 9 rotation-matrix residuals
N_SHAPES = 10
N_FACES = 13776

# Standard SMPL kinematic tree (parent of each of the 24 joints; root's
# parent is itself and is never used by the FK chain).
SMPL_PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)


@struct.dataclass
class SMPLModel:
    v_template: jnp.ndarray   # (6890, 3)
    shapedirs: jnp.ndarray    # (6890, 3, 10)
    posedirs: jnp.ndarray     # (6890, 3, 207)
    J_regressor: jnp.ndarray  # (24, 6890)
    weights: jnp.ndarray      # (6890, 24) LBS blend weights
    faces: jnp.ndarray        # (13776, 3) int32
    # static tuple: the FK chain is unrolled over it at trace time
    parents: tuple = struct.field(pytree_node=False,
                                  default=tuple(SMPL_PARENTS.tolist()))


def _dense(x) -> np.ndarray:
    if hasattr(x, "todense"):
        x = x.todense()
    elif hasattr(x, "toarray"):
        x = x.toarray()
    return np.asarray(x)


def load_smpl(path: str) -> SMPLModel:
    """Load a SMPL .pkl (chumpy-free fields only, latin1 encoded)."""
    with open(path, "rb") as f:
        raw = pickle.load(f, encoding="latin1")
    kintree = np.asarray(_dense(raw["kintree_table"])).astype(np.int64)
    # kintree_table[1] is the joint id column; standard models have it equal
    # to arange(24), but remap defensively (smpl_numpy.py:34-35).
    id_to_col = {int(kintree[1, i]): i for i in range(kintree.shape[1])}
    parents = np.zeros(N_JOINTS, dtype=np.int32)
    for i in range(1, kintree.shape[1]):
        parents[i] = id_to_col[int(kintree[0, i])]
    return SMPLModel(
        v_template=jnp.asarray(_dense(raw["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(_dense(raw["shapedirs"])[..., :N_SHAPES], jnp.float32),
        posedirs=jnp.asarray(_dense(raw["posedirs"]), jnp.float32),
        J_regressor=jnp.asarray(_dense(raw["J_regressor"]), jnp.float32),
        weights=jnp.asarray(_dense(raw["weights"]), jnp.float32),
        parents=tuple(int(p) for p in parents),
        faces=jnp.asarray(_dense(raw["f"]).astype(np.int32)),
    )


def synthetic_smpl(seed: int = 0, n_verts: int = N_VERTS) -> SMPLModel:
    """Deterministic fake SMPL with the real kinematic tree.

    Vertices form a rough humanoid point cloud around the joints so that LBS
    warps, KNN pruning and voxelization behave like the real asset.
    """
    rng = np.random.RandomState(seed)

    # Joint rest positions: a rough humanoid skeleton (meters, y-up).
    joints = np.array([
        [0.00, 0.00, 0.00],    # 0 pelvis
        [0.07, -0.07, 0.00],   # 1 L hip
        [-0.07, -0.07, 0.00],  # 2 R hip
        [0.00, 0.12, 0.00],    # 3 spine1
        [0.10, -0.45, 0.00],   # 4 L knee
        [-0.10, -0.45, 0.00],  # 5 R knee
        [0.00, 0.25, 0.00],    # 6 spine2
        [0.09, -0.85, -0.02],  # 7 L ankle
        [-0.09, -0.85, -0.02], # 8 R ankle
        [0.00, 0.32, 0.00],    # 9 spine3
        [0.11, -0.92, 0.10],   # 10 L foot
        [-0.11, -0.92, 0.10],  # 11 R foot
        [0.00, 0.45, 0.00],    # 12 neck
        [0.08, 0.40, 0.00],    # 13 L collar
        [-0.08, 0.40, 0.00],   # 14 R collar
        [0.00, 0.55, 0.03],    # 15 head
        [0.18, 0.42, 0.00],    # 16 L shoulder
        [-0.18, 0.42, 0.00],   # 17 R shoulder
        [0.42, 0.40, 0.00],    # 18 L elbow
        [-0.42, 0.40, 0.00],   # 19 R elbow
        [0.66, 0.40, 0.00],    # 20 L wrist
        [-0.66, 0.40, 0.00],   # 21 R wrist
        [0.74, 0.40, 0.00],    # 22 L hand
        [-0.74, 0.40, 0.00],   # 23 R hand
    ], dtype=np.float32)

    # Vertices: sample around bones (segments joint->parent) with small radius.
    per = n_verts // N_JOINTS
    pts, wts = [], []
    for j in range(N_JOINTS):
        cnt = per if j < N_JOINTS - 1 else n_verts - per * (N_JOINTS - 1)
        p = SMPL_PARENTS[j]
        t = rng.rand(cnt, 1).astype(np.float32)
        base = joints[j] * t + joints[p] * (1 - t)
        pts.append(base + rng.randn(cnt, 3).astype(np.float32) * 0.04)
        w = np.zeros((cnt, N_JOINTS), dtype=np.float32)
        w[:, j] = t[:, 0]
        w[:, p] += 1 - t[:, 0]
        wts.append(w)
    v_template = np.concatenate(pts, 0)
    weights = np.concatenate(wts, 0)
    weights = weights / weights.sum(-1, keepdims=True)

    # J_regressor: joints regress exactly to the rest joints via the nearest
    # few vertices (rows sum to 1).
    J_regressor = np.zeros((N_JOINTS, n_verts), dtype=np.float32)
    for j in range(N_JOINTS):
        d = np.linalg.norm(v_template - joints[j], axis=1)
        idx = np.argsort(d)[:8]
        w = np.exp(-d[idx] * 20)
        J_regressor[j, idx] = w / w.sum()

    shapedirs = (rng.randn(n_verts, 3, N_SHAPES) * 0.01).astype(np.float32)
    posedirs = (rng.randn(n_verts, 3, N_POSEDIRS) * 0.002).astype(np.float32)
    faces = rng.randint(0, n_verts, size=(N_FACES, 3)).astype(np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        weights=jnp.asarray(weights),
        parents=tuple(SMPL_PARENTS.tolist()),
        faces=jnp.asarray(faces),
    )
