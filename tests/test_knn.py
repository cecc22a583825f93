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


def test_nn_1_tables_matches_gather():
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.kernels.knn import nn_1_ref, nn_1_tables
    from sherf_tpu.kernels.knn_pallas import nn_1_tables_pallas

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
    v = jnp.asarray(rng.randn(900, 3).astype(np.float32))
    tab = jnp.asarray(rng.randn(900, 33).astype(np.float32))

    d_ref, i_ref = nn_1_ref(q, v)
    pay_ref = np.asarray(tab)[np.asarray(i_ref)]

    d, i, pay = nn_1_tables(q, v, tab)  # dispatches to jnp path on CPU
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(pay), pay_ref)

    # the pallas kernel itself, in interpreter mode.  Its distance contract
    # is the EXACT elementwise difference form (per-coordinate f32
    # subtract/square/sum on the VPU — no matmul expansion, no MXU
    # precision involvement), so it must match the jnp reference to f32
    # rounding of the same expression.
    d2, i2, pay2 = nn_1_tables_pallas(q, v, tab, interpret=True)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(pay2), pay_ref, atol=1e-5)


def test_nn_shortlist_matches_full_scan():
    """The per-tile cluster-shortlist kernel is EXACT whenever needed_max
    <= s_cap: identical d2 to the full scan, and the argmin points at a
    vertex with that exact distance (visit order over clusters may break
    distance ties differently)."""
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas, nn_1_shortlist_pallas

    rng = np.random.RandomState(6)
    v = (rng.randn(1500, 3) * 0.4).astype(np.float32)
    # production-like queries: ray-major tiles hug one body region at a
    # time — emulate with sorted surface offsets (spatially coherent)
    q = v[np.argsort(v[:, 0])][rng.randint(0, 1500, 1024) // 2 * 2]
    q = q + rng.randn(1024, 3).astype(np.float32) * 0.03
    d_full, _ = nn_1_pallas(jnp.asarray(q), jnp.asarray(v), interpret=True)
    d_s, i_s, overflow = nn_1_shortlist_pallas(jnp.asarray(q),
                                               jnp.asarray(v),
                                               interpret=True)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_full),
                               rtol=2e-6, atol=1e-9)
    # idx must realize the reported distance exactly (f64 check)
    q64, v64 = q.astype(np.float64), v.astype(np.float64)
    d_at_idx = ((q64 - v64[np.asarray(i_s)]) ** 2).sum(-1)
    d64_min = ((q64[:, None] - v64[None]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(d_at_idx, d64_min, rtol=1e-5, atol=1e-7)


def test_nn_shortlist_exact_on_incoherent_tiles():
    """Tiles whose points straddle the whole domain (image-scanline wraps
    in production) must degrade to visiting more clusters — the dynamic
    visit count keeps results EXACT instead of overflowing a fixed
    shortlist (r4: the fixed-cap variant overflowed on scanline wraps)."""
    from sherf_tpu.kernels.knn_pallas import nn_1_shortlist_pallas

    rng = np.random.RandomState(7)
    v = (rng.randn(2048, 3) * 0.5).astype(np.float32)
    q = rng.uniform(-1.5, 1.5, (512, 3)).astype(np.float32)  # incoherent
    d_s, i_s, _ = nn_1_shortlist_pallas(jnp.asarray(q), jnp.asarray(v),
                                        interpret=True)
    q64, v64 = q.astype(np.float64), v.astype(np.float64)
    d64 = ((q64[:, None] - v64[None]) ** 2).sum(-1)
    d_at_idx = ((q64 - v64[np.asarray(i_s)]) ** 2).sum(-1)
    np.testing.assert_allclose(d_at_idx, d64.min(1), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d_s), d64.min(1), rtol=1e-5,
                               atol=1e-7)


def test_nn_clustered_matches_full_scan():
    """The branch-and-bound clustered kernel (Morton clusters + bound-
    justified skipping) is EXACT: identical d2 (same elementwise f32
    expression) and identical argmin as the full-scan kernel, surface-like
    and far-away queries alike."""
    from sherf_tpu.kernels.knn_pallas import (nn_1_clustered_pallas,
                                              nn_1_pallas)

    rng = np.random.RandomState(4)
    v = (rng.randn(1500, 3) * 0.4).astype(np.float32)
    # surface-hugging queries (the production distribution after the voxel
    # prune) + uniform far-field queries
    q = np.concatenate([
        v[rng.randint(0, 1500, 700)] + rng.randn(700, 3).astype(np.float32) * 0.05,
        rng.uniform(-1.5, 1.5, (324, 3)).astype(np.float32),
    ])
    d_full, i_full = nn_1_pallas(jnp.asarray(q), jnp.asarray(v),
                                 interpret=True)
    d_c, i_c = nn_1_clustered_pallas(jnp.asarray(q), jnp.asarray(v),
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_full),
                               rtol=2e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_full))
    # and against the f64 oracle
    d64 = ((q.astype(np.float64)[:, None] - v.astype(np.float64)[None]) ** 2
           ).sum(-1)
    np.testing.assert_array_equal(np.asarray(i_c), d64.argmin(1))
    np.testing.assert_allclose(np.asarray(d_c), d64.min(1), rtol=1e-5,
                               atol=1e-7)


def test_ray_body_mask_clustered_matches_full():
    """Clustered ray prune == full-scan ray prune on every ray (bound-
    justified cluster skipping cannot change the boolean)."""
    from sherf_tpu.kernels.knn_pallas import (ray_body_mask_clustered_pallas,
                                              ray_body_mask_pallas)

    rng = np.random.RandomState(5)
    verts = jnp.asarray((rng.randn(1300, 3) * 0.3).astype(np.float32))
    N = 512
    o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 2.0)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    near = jnp.asarray(rng.uniform(0.5, 1.0, N).astype(np.float32))
    far = near + jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    thr = 0.05 ** 2
    full = np.asarray(ray_body_mask_pallas(o, d, near, far, verts, thr,
                                           interpret=True))
    clus = np.asarray(ray_body_mask_clustered_pallas(o, d, near, far, verts,
                                                     thr, interpret=True))
    # borderline rays (line_min within f32 slop of thr) may flip with the
    # centering difference; exclude them like the superset test does
    ov = np.asarray(o)[:, None] - np.asarray(verts)[None]
    dn = np.asarray(d)
    dd = (dn * dn).sum(-1)[:, None]
    b = -(ov * dn[:, None]).sum(-1)
    line_min = ((ov ** 2).sum(-1) - b * b / dd).min(axis=1)
    clear = np.abs(line_min - thr) > 1e-6
    np.testing.assert_array_equal(clus[clear], full[clear])


def test_payload_warps_match_vid_warps():
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.smpl import synthetic_smpl
    from sherf_tpu.core.types import SMPLPose
    from sherf_tpu.nerf.warp import (
        make_pose_context, deform_target2c, deform_c2source,
        deform_target2c_from_tables, deform_c2source_from_tables,
        target2c_tables, c2source_tables)

    smpl = synthetic_smpl(0)
    rng = np.random.RandomState(1)

    def pose(seed):
        r = np.random.RandomState(seed)
        return SMPLPose(poses=jnp.asarray(r.randn(72).astype(np.float32)) * 0.2,
                        shapes=jnp.asarray(r.randn(10).astype(np.float32)) * 0.3,
                        R=jnp.eye(3), Th=jnp.asarray(r.randn(3).astype(np.float32)))

    ctx_t = make_pose_context(smpl, pose(2))
    ctx_b = make_pose_context(smpl, pose(3))
    q = jnp.asarray(rng.randn(500, 3).astype(np.float32))
    qd = jnp.asarray(rng.randn(500, 3).astype(np.float32))
    vid = jnp.asarray(rng.randint(0, 6890, 500).astype(np.int32))

    a1, d1 = deform_target2c(smpl, ctx_t, ctx_b, vid, q, qd)
    pay = target2c_tables(smpl, ctx_t, ctx_b)[vid]
    a2, d2 = deform_target2c_from_tables(ctx_t, ctx_b, pay, q, qd)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    s1, w1, b1 = deform_c2source(smpl, ctx_t, ctx_b, vid, q)
    pay2 = c2source_tables(smpl, ctx_t, ctx_b)[vid]
    s2, w2, b2 = deform_c2source_from_tables(ctx_t, ctx_b, pay2, q)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)


def test_ray_body_mask_superset_and_tight():
    """ray_body_mask_pallas (segment-level body prune) must be a strict
    SUPERSET of 'any discrete sample survives the exact 5cm test' and must
    match the brute-force segment distance exactly."""
    from sherf_tpu.kernels.knn_pallas import ray_body_mask_pallas

    rng = np.random.RandomState(3)
    V = 200
    verts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.3)
    N, D = 256, 16
    o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 2.0)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    near = jnp.asarray(rng.uniform(0.5, 1.0, N).astype(np.float32))
    far = near + jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    thr = 0.05 ** 2

    mask = np.asarray(ray_body_mask_pallas(o, d, near, far, verts, thr,
                                           interpret=True))

    # brute-force LINE distance oracle (the kernel prunes on the infinite
    # line: line min <= segment min <= sample min, superset either way)
    ov = np.asarray(o)[:, None] - np.asarray(verts)[None]      # (N, V, 3)
    dn = np.asarray(d)
    dd = (dn * dn).sum(-1)[:, None]
    b = -(ov * dn[:, None]).sum(-1)                             # d.(v-o)
    dist = (ov ** 2).sum(-1) - b * b / dd
    line_min = dist.min(axis=1)
    clear = np.abs(line_min - thr) > 1e-6  # exclude f32-order borderline
    np.testing.assert_array_equal(mask[clear], (line_min < thr)[clear])

    # superset of the sample-level test at any sampling
    ts = np.asarray(near)[:, None] + (np.asarray(far) - np.asarray(near))[:, None] \
        * np.linspace(0, 1, D)[None]
    pts = np.asarray(o)[:, None] + ts[..., None] * dn[:, None]  # (N, D, 3)
    d2 = ((pts[:, :, None] - np.asarray(verts)[None, None]) ** 2).sum(-1)
    sample_hit = (d2.min(axis=(1, 2)) < thr)
    assert not np.any(sample_hit & ~mask), "mask dropped a surviving ray"


def test_ray_body_mask_active_tile_skip():
    """With an `active` mask, all-inactive 256-ray tiles skip the scan and
    return False; tiles containing ANY active ray compute the full result
    (the caller ANDs with `active`, so combined output is unchanged)."""
    from sherf_tpu.kernels.knn_pallas import RSEG_P, ray_body_mask_pallas

    rng = np.random.RandomState(5)
    V = 200
    verts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.3)
    N = 3 * RSEG_P
    o = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 2.0)
    d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    near = jnp.asarray(rng.uniform(0.5, 1.0, N).astype(np.float32))
    far = near + 1.0
    thr = 0.3 ** 2

    active = np.ones(N, bool)
    active[:RSEG_P] = False                 # tile 0 fully inactive
    active[RSEG_P] = False                  # tile 1 mixed
    full = np.asarray(ray_body_mask_pallas(o, d, near, far, verts, thr,
                                           interpret=True))
    gated = np.asarray(ray_body_mask_pallas(o, d, near, far, verts, thr,
                                            interpret=True,
                                            active=jnp.asarray(active)))
    assert not gated[:RSEG_P].any(), "inactive tile must be skipped"
    np.testing.assert_array_equal(gated[RSEG_P:], full[RSEG_P:])
    np.testing.assert_array_equal(gated & active, full & active)
