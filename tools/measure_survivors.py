"""Count capsule-prune survivors vs exact 5cm survivors on the bench scene.

Decides whether a second compaction after the exact KNN test (before the
expensive per-point feature banks) pays: the banks' cost is linear in the
compacted point count, and dropping exact-test failures early is
semantically free (they already composite as sigma -80 -> 0).

Run: python tools/measure_survivors.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(H=512, W=512, D=48):
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.kernels.capsules import prune_mask
    from sherf_tpu.kernels.knn import nn_1
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    smpl = synthetic_smpl(0)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)

    ray_o = batch.ray_o[0]
    ray_d = batch.ray_d[0]
    near = batch.near[0]
    far = batch.far[0]
    mask_box = np.asarray(batch.mask_at_box[0]).astype(bool).reshape(-1)
    verts = batch.vertices[0]

    bp = big_pose_params()
    joints = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                          jnp.asarray(bp["shapes"]))[1]
    # target pose contexts of the synthetic batch use the same pose as t
    steps = jnp.linspace(0.0, 1.0, D)
    depths = near[:, None] + (far - near)[:, None] * steps
    pts = (ray_o[:, None] + depths[..., None] * ray_d[:, None]).reshape(-1, 3)

    caps = jax.jit(lambda p: prune_mask(p, verts, joints, smpl, 0.05))(pts)
    caps = np.asarray(caps).astype(bool)
    M = pts.shape[0]
    hit_rays = mask_box.mean()
    print(f"M={M}  rays hitting AABB: {hit_rays:.3f}")
    print(f"capsule survivors: {caps.sum()}  ({caps.mean():.4f} of M, "
          f"{caps.sum() / M * 24:.2f}x of cap M/24)")

    # exact test on capsule survivors, chunked
    idxs = np.nonzero(caps)[0]
    exact = 0
    f = jax.jit(lambda q, v: nn_1(q, v)[0])
    for i in range(0, len(idxs), 262144):
        chunk = jnp.asarray(pts[idxs[i:i + 262144]])
        d2 = np.asarray(f(chunk, verts))
        exact += int((d2 < 0.05 ** 2).sum())
    print(f"exact 5cm survivors: {exact}  ({exact / M:.4f} of M, "
          f"{exact / max(caps.sum(), 1):.3f} of capsule set, "
          f"{exact / M * 24:.2f}x of cap M/24)")


if __name__ == "__main__":
    main()
