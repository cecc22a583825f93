"""Capsule prune: conservative superset of the exact vertex-distance test
(replaces the occupancy-grid prune on the hot path; both feed the exact KNN
re-test — reference renderer.py:315-321)."""

import numpy as np
import jax
import jax.numpy as jnp

from sherf_tpu.kernels.capsules import capsule_mask, capsule_radii, prune_mask
from sherf_tpu.kernels.knn import nn_1_ref
from sherf_tpu.smpl import synthetic_smpl, smpl_forward


def _posed(seed=0, pose_seed=1):
    smpl = synthetic_smpl(seed)
    rng = np.random.RandomState(pose_seed)
    poses = (rng.randn(72) * 0.3).astype(np.float32)
    shapes = (rng.randn(10) * 0.5).astype(np.float32)
    verts, joints = smpl_forward(smpl, jnp.asarray(poses), jnp.asarray(shapes))
    return smpl, verts, joints


def test_every_vertex_inside_its_capsule():
    smpl, verts, joints = _posed()
    radii = capsule_radii(verts, joints, smpl, margin=0.0)
    hit = capsule_mask(verts, joints, radii + 1e-5, smpl.parents)
    assert bool(jnp.all(hit))


def test_superset_of_exact_prune():
    """Points within `radius` of any vertex MUST be inside some capsule —
    for several random poses (the guarantee is per-frame, pose-free)."""
    for pose_seed in (1, 2, 3):
        smpl, verts, joints = _posed(pose_seed=pose_seed)
        rng = np.random.RandomState(pose_seed + 10)
        pts = jnp.asarray(rng.uniform(-1.5, 1.5, (20000, 3)).astype(np.float32))
        radius = 0.05
        mask = prune_mask(pts, verts, joints, smpl, radius)
        d2, _ = nn_1_ref(pts, verts)
        exact = d2 < radius ** 2
        # conservative: no exact-pass point may be pruned
        missed = np.asarray(exact & ~mask)
        assert missed.sum() == 0
        # and it must actually prune far-away space
        far = np.asarray(d2 > 0.4 ** 2)
        kept_far = np.asarray(mask)[far].mean()
        assert kept_far < 0.35


def test_survivor_rate_reasonable():
    """Capsules should not blow up the compaction budget vs the exact test
    on body-centered samples (the perf-mode sizing assumption)."""
    smpl, verts, joints = _posed()
    rng = np.random.RandomState(0)
    lo = np.asarray(verts).min(0) - 0.3
    hi = np.asarray(verts).max(0) + 0.3
    pts = jnp.asarray(
        (rng.uniform(0, 1, (50000, 3)) * (hi - lo) + lo).astype(np.float32))
    mask = prune_mask(pts, verts, joints, smpl, 0.05)
    d2, _ = nn_1_ref(pts, verts)
    exact = (np.asarray(d2) < 0.05 ** 2).mean()
    sup = np.asarray(mask).mean()
    assert sup < max(6.0 * exact, 0.25), (exact, sup)


def test_unassigned_bones_never_hit():
    smpl, verts, joints = _posed()
    radii = jnp.full((24,), -1.0)
    hit = capsule_mask(verts, joints, radii, smpl.parents)
    assert not bool(jnp.any(hit))


def test_distance_grid_exact_within_window():
    """The truncated separable EDT must equal the brute-force squared
    cell distance wherever that distance is within the window."""
    from sherf_tpu.kernels.occupancy import distance_grid

    rng = np.random.RandomState(3)
    G, cell, w = 24, 0.05, 6
    verts = jnp.asarray(rng.uniform(0.1, G * 0.05 - 0.1,
                                    (40, 3)).astype(np.float32))
    lo = jnp.zeros(3)
    d2 = np.asarray(distance_grid(verts, lo, w, cell=cell, grid_size=G))

    vidx = np.floor(np.asarray(verts) / cell).astype(np.int64)
    grid = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1)
    brute = ((grid[..., None, :] - vidx) ** 2).sum(-1).min(-1)
    inside = brute <= w * w
    assert (d2[inside] == brute[inside]).all()
    assert (d2[~inside] > w * w).all()


def test_occupancy_ball_superset_and_tighter_than_box():
    """EDT-ball mask: contains every exact-within-radius point, and admits
    meaningfully less volume than the old separable box dilation did."""
    from sherf_tpu.kernels.occupancy import occupancy_mask

    smpl, verts, _ = _posed()
    rng = np.random.RandomState(7)
    lo = np.asarray(verts).min(0) - 0.3
    hi = np.asarray(verts).max(0) + 0.3
    pts = jnp.asarray(
        (rng.uniform(0, 1, (60000, 3)) * (hi - lo) + lo).astype(np.float32))
    radius = 0.05
    mask = np.asarray(occupancy_mask(pts, verts, radius=radius))
    d2 = np.asarray(nn_1_ref(pts, verts)[0])
    exact = d2 < radius ** 2
    assert (mask | ~exact).all(), "ball mask missed exact survivors"
    # tightness: nothing beyond radius + sqrt(3)*cell + cell diagonal slack
    # may be admitted (the box corners used to reach ~2.4x the radius)
    from sherf_tpu.kernels.occupancy import CELL
    limit = (radius + 2.0 * np.sqrt(3.0) * CELL) ** 2
    admitted_far = mask & (d2 > limit)
    assert admitted_far.sum() == 0, admitted_far.sum()


def test_strided_occupancy_superset_of_exact():
    """The strided voxel mask must contain every sample within the exact
    5cm-of-a-vertex set whenever the per-ray depth step <= the margin."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sherf_tpu.kernels.knn import nn_1_ref
    from sherf_tpu.kernels.occupancy import strided_occupancy
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    verts = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                         jnp.asarray(bp["shapes"]))[0]
    lo = jnp.min(verts, 0) - 0.3
    hi = jnp.max(verts, 0) + 0.3
    rs = np.random.RandomState(0)
    N, D = 64, 48
    o = jnp.asarray(lo + (hi - lo) * rs.uniform(0, 1, (N, 3)))
    d = jnp.asarray(rs.normal(size=(N, 3)))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # step = 2.4m span / 47 ~ 0.051 <= margin 0.06
    t = jnp.linspace(0.0, 2.4, D)
    pts = o[:, None] + t[None, :, None] * d[:, None]

    mask = np.asarray(strided_occupancy(pts, verts, radius=0.05, stride=3,
                                        step_margin=0.06))
    d2 = np.asarray(nn_1_ref(pts.reshape(-1, 3), verts)[0])
    exact = d2 < 0.05 ** 2
    assert (mask | ~exact).all(), "strided mask missed exact survivors"
