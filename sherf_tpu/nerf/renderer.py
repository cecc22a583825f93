"""The SHERF volumetric renderer — the hot path.

TPU-first re-design of the reference ImportanceRenderer.forward
(renderer.py:286-437):

  stratified depths -> sample points -> KNN prune vs posed SMPL verts ->
  static-capacity point compaction -> inverse-LBS warp to canonical ->
  hierarchical feature bank (triplane + pixel-aligned 2D + sparse-voxel 3D)
  -> transformer fusion -> NeRF decoder -> scatter back -> alpha compositing.

Key differences from the CUDA/torch reference, chosen for XLA:
  * no boolean indexing anywhere — pruning keeps static shapes via a
    cumsum-compaction to a fixed point budget (cfg.render.point_capacity_frac);
    with frac == 1.0 every sample is computed and masked, which is the
    bit-parity mode (pruned points get density -80, renderer.py:368);
  * the prune KNN and the target2c blend-weight KNN are one fused query
    (the reference runs knn_points twice on identical inputs,
    renderer.py:315 + :564);
  * per-frame bone transforms / blendshape tables are computed once
    (PoseContext) instead of per warp call.

All inputs are batched (leading B); pure geometry is vmapped, parameterized
submodules are batch-agnostic or lifted with nn.vmap.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from sherf_tpu.core.config import ModelConfig
from sherf_tpu.core.types import SMPLPose
from sherf_tpu.features.encoding import positional_encoding
from sherf_tpu.features.sparseconv import SparseConvNet, world_to_voxel_f
from sherf_tpu.features.transformer import PlaneTransformer
from sherf_tpu.geometry.rays import project_points
from sherf_tpu.kernels.grid_sample import (
    grid_sample_2d, grid_sample_2d_packed, grid_sample_2d_xpacked,
    grid_sample_2d_xpacked_wg, pack_corners_2d, pack_x_2d)
from sherf_tpu.kernels.capsules import prune_mask
from sherf_tpu.kernels.compaction import compact_mask
from sherf_tpu.kernels.knn import (nn_1, nn_1_diag, nn_1_tables,
                                   nn_1_tables_diag)
from sherf_tpu.kernels.occupancy import occupancy_mask, strided_occupancy
from sherf_tpu.nerf.decoders import NeRFDecoder, OSGDecoder
from sherf_tpu.nerf.march import ray_march, ray_march_segmented
from sherf_tpu.nerf.warp import (
    PoseContext, c2source_tables, deform_c2source_from_tables,
    deform_target2c_from_tables, target2c_tables,
)
from sherf_tpu.smpl.model import SMPLModel


def sample_from_planes(planes: jnp.ndarray, pts_norm: jnp.ndarray) -> jnp.ndarray:
    """Triplane lookup (reference sample_from_planes/project_onto_planes,
    renderer.py:218-243, with the SHERF-fixed plane axes of
    generate_planes:192-216: xy / xz / zy).

    planes: (3, H, W, C); pts_norm: (M, 3) in [-1, 1].  Returns (3, M, C).
    Corner-packs each plane first (one-time, tiny vs the per-point lookups)
    so a bilinear sample costs ONE row gather — measured 4.7x faster than
    the 4-tap form at 32 channels (tools/profile_pack_variants.py).
    """
    uv0 = pts_norm[:, (0, 1)]
    uv1 = pts_norm[:, (0, 2)]
    uv2 = pts_norm[:, (2, 1)]
    return jnp.stack([
        grid_sample_2d_packed(pack_corners_2d(planes[0]), uv0, align_corners=False),
        grid_sample_2d_packed(pack_corners_2d(planes[1]), uv1, align_corners=False),
        grid_sample_2d_packed(pack_corners_2d(planes[2]), uv2, align_corners=False),
    ])


def _rot3(pts: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 rotation out[..., d] = sum_c pts[..., c] * R[c, d] as
    EXPLICIT elementwise f32 fma chains on the VPU — numerically at least
    as accurate as the Precision.HIGHEST einsum it replaces (every product
    exactly rounded, 3-term f32 sum) and ~100x cheaper: the (N, 3)x(3, 3)
    HIGHEST matmul lowers to 6-pass MXU passes on a shape the systolic
    array is hopeless at (~1.3 ms/frame across the four call sites for
    ~50 MFLOP of work).

    pts: (B, N, 3); R: (B, 3, 3).
    """
    p = pts.astype(jnp.float32)
    r = R.astype(jnp.float32)[:, None]              # (B, 1, 3, 3)
    return jnp.stack(
        [p[..., 0] * r[..., 0, d] + p[..., 1] * r[..., 1, d]
         + p[..., 2] * r[..., 2, d] for d in range(3)], axis=-1)


def _compact_indices(mask: jnp.ndarray, cap: int):
    """Stable compaction: indices of the first ``cap`` True entries.

    Returns (idx (cap,) int32 — garbage-free gather indices (clipped),
    valid (cap,) bool)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1  # position of each True among Trues
    slot = jnp.where(mask & (pos < cap), pos, cap)
    idx = jnp.full((cap,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    valid = idx < n
    # idx == n for empty slots: gathers must clip it, scatters with
    # mode="drop" discard it
    return idx, valid


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SHERFRenderer(nn.Module):
    """Feature fusion + decoding + compositing (reference ImportanceRenderer
    renderer.py:260-437 and run_model:400-437)."""

    cfg: ModelConfig
    out_sh: Tuple[int, int, int] = (128, 352, 416)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def setup(self):
        cdt = self.compute_dtype
        if self.cfg.use_3d_feature:
            # applied per batch item in a python loop (params shared):
            # vmapping its gather/scatter graph over even a unit batch axis
            # makes XLA loop-ify the site lookups (~190ms/frame measured)
            self.encoder_3d = SparseConvNet(
                num_layers=self.cfg.sparse_conv_layers, out_sh=self.out_sh,
                caps=self.cfg.resolved_sparse_caps, dtype=cdt,
                name="encoder_3d")
            # 192 -> 96 (renderer.py:271)
            self.conv1d_projection = nn.Dense(96, dtype=cdt,
                                              name="conv1d_projection")
        n_banks = int(self.cfg.use_1d_feature) + int(self.cfg.use_2d_feature) \
            + int(self.cfg.use_3d_feature)
        if n_banks > 1:
            # 96 (or 64) -> 32 fusion (renderer.py:272-275)
            self.conv1d_reprojection = nn.Dense(32, dtype=cdt,
                                                name="conv1d_reprojection")
        if self.cfg.use_trans:
            self.transformer = PlaneTransformer(dim=self.cfg.plane_channels,
                                                dtype=cdt, name="transformer")
        if self.cfg.use_nerf_decoder:
            self.decoder = NeRFDecoder(dtype=cdt, name="decoder")
        else:
            self.decoder = OSGDecoder(dtype=cdt, name="decoder")

    def _sow_overflow(self, name: str, excess):
        """Record a budget-overflow count (VERDICT r1: silent truncation).

        ``excess`` = survivors - capacity, per batch item; clamped at 0 and
        max-reduced into the 'diag' collection.  Read with
        ``model.apply(..., mutable=["diag"])`` — a nonzero value means the
        static budget truncated real body samples and the output is
        corrupted; recalibrate (core.calibrate) with a larger margin."""
        self.sow("diag", name,
                 jnp.max(jnp.maximum(excess, 0)).astype(jnp.int32),
                 init_fn=lambda: jnp.zeros((), jnp.int32),
                 reduce_fn=jnp.maximum)

    def __call__(self,
                 planes: Optional[jnp.ndarray],      # (B, 3, Hp, Wp, C)
                 obs_img: jnp.ndarray,               # (B, H, W, 3)
                 obs_feat: Optional[jnp.ndarray],    # (B, Hf, Wf, 64)
                 vol_feats: Optional[jnp.ndarray],   # (B, S, 32)
                 vol_coords: Optional[jnp.ndarray],  # (B, S, 3) int
                 min_dhw: jnp.ndarray,               # (B, 3)
                 ray_o: jnp.ndarray, ray_d: jnp.ndarray,   # (B, N, 3)
                 near: jnp.ndarray, far: jnp.ndarray,      # (B, N)
                 ctx_target: PoseContext, ctx_big: PoseContext,
                 ctx_obs: PoseContext,               # batched contexts
                 vertices: jnp.ndarray,              # (B, 6890, 3) posed world
                 t_vertices: jnp.ndarray,            # (B, 6890, 3) canonical
                 t_bounds: jnp.ndarray,              # (B, 2, 3)
                 obs_K: jnp.ndarray, obs_R: jnp.ndarray,   # (B, 3, 3)
                 obs_T: jnp.ndarray,                 # (B, 3, 1)
                 smpl: SMPLModel,
                 train: bool = False,
                 ray_mask: Optional[jnp.ndarray] = None):  # (B, N) bool
        cfg = self.cfg
        rc = cfg.render
        cdt = self.compute_dtype
        B, N = ray_o.shape[:2]
        D = rc.depth_resolution

        if rc.depth_resolution_importance > 0:
            # hierarchical fine pass (clean version of the reference's dead
            # fine-pass code, renderer.py:374-393).  Budgeted mode routes
            # both passes through the prune/compaction machinery; parity
            # mode (frac == 1) stays full-compute dense.
            if rc.point_capacity_frac < 1.0:
                return self._forward_importance_budgeted(
                    planes, obs_img, obs_feat, vol_feats, vol_coords,
                    min_dhw, ray_o, ray_d, near, far, ctx_target, ctx_big,
                    ctx_obs, vertices, t_vertices, t_bounds, obs_K, obs_R,
                    obs_T, smpl, train, ray_mask)
            return self._forward_importance(
                planes, obs_img, obs_feat, vol_feats, vol_coords, min_dhw,
                ray_o, ray_d, near, far, ctx_target, ctx_big, ctx_obs,
                vertices, t_vertices, t_bounds, obs_K, obs_R, obs_T, smpl,
                train)

        # ---- ray compaction: rays whose AABB test missed (mask_at_box
        # False) march to background exactly (all their samples are > 5 cm
        # from the body), so restrict the whole per-sample pipeline to a
        # static budget of hitting rays and scatter the composited pixels
        # back at the end.  Full-N outputs are bit-equal as long as the
        # budget covers every hitting ray.
        N_full = N
        ray_sel = None
        if (ray_mask is not None and rc.ray_capacity_frac < 1.0
                and rc.point_capacity_frac < 1.0):
            ray_o, ray_d, near, far, ray_sel, N = self._compact_rays(
                ray_o, ray_d, near, far, ray_mask, vertices)
        if planes is not None:
            planes = planes.astype(cdt)
        if obs_feat is not None:
            obs_feat = obs_feat.astype(cdt)
        if vol_feats is not None:
            vol_feats = vol_feats.astype(cdt)

        # ---- stratified depths (renderer.py:299, jitter disabled upstream)
        steps = jnp.linspace(0.0, 1.0, D)
        depths = near[..., None] + (far - near)[..., None] * steps  # (B, N, D)

        pts = ray_o[:, :, None] + depths[..., None] * ray_d[:, :, None]
        pts = pts.reshape(B, N * D, 3)
        tar_smpl = _rot3(vertices - ctx_target.Th[:, None], ctx_target.R)

        # ---- prune + compaction + blend-weight KNN
        M = N * D
        if rc.point_capacity_frac < 1.0:
            # Conservative prune (strict superset of the exact 5cm test),
            # then compact to the static budget — the world->SMPL transform
            # and the exact KNN run only on the survivors.
            radius = float(np.sqrt(rc.prune_threshold_sq))
            if rc.prune_mode == "capsule":
                # pure-compute capsule test in the SMPL frame (zero gathers)
                q_all = _rot3(pts - ctx_target.Th[:, None], ctx_target.R)
                occ = jax.vmap(
                    lambda qq, vv, jj: prune_mask(qq, vv, jj, smpl, radius)
                )(q_all, tar_smpl, ctx_target.joints)
            else:
                # dilated occupancy grid in WORLD coordinates (global R is a
                # rotation, so distances match the SMPL-frame test); python
                # loop over B — vmapped gathers loop-ify (see setup note).
                # The depth-stride trick is only sound when the per-ray step
                # stays within prune_step_margin — calibrate_budgets fits
                # the margin to the scene's measured max step, and the
                # step_overflow diag below catches a frame that exceeds it
                # (in mm, like the capacity counters); coarse grids (D < 24:
                # steps can reach ~1m through a body AABB) silently dropped
                # exact-surviving samples, so they test every sample.
                stride = rc.prune_stride if D >= 24 else 1
                if stride > 1:
                    step_f = (far - near) / (D - 1)               # (B, N)
                    self._sow_overflow(
                        "step_overflow",
                        jnp.ceil((jnp.max(step_f, axis=1)
                                  - rc.prune_step_margin) * 1e3
                                 ).astype(jnp.int32))
                occ = jnp.stack([
                    strided_occupancy(pts[b].reshape(N, D, 3), vertices[b],
                                      radius=radius, stride=stride,
                                      step_margin=rc.prune_step_margin)
                    for b in range(B)])
            # capacity is defined on the FULL candidate set so that ray
            # compaction does not silently shrink the point budget
            cap = _round_up(max(int(N_full * D * rc.point_capacity_frac), 128),
                            128)
            cap = min(cap, M)
            self._sow_overflow("point_overflow",
                               jnp.sum(occ.astype(jnp.int32), axis=1) - cap)
            if jax.default_backend() in ("tpu", "axon"):
                # pallas streaming compaction (kernels/compaction.py); python
                # loop over the small static batch — the kernel's sequential
                # overwrite trick must not be vmapped
                pairs = [compact_mask(occ[b], cap) for b in range(B)]
                idx = jnp.stack([p[0] for p in pairs])
                valid = jnp.stack([p[1] for p in pairs])
            else:
                idx, valid = jax.vmap(lambda m: _compact_indices(m, cap))(occ)
            gidx = jnp.minimum(idx, M - 1)
            # ONE per-ray row gather instead of two per-sample gathers from
            # the (M,)-sized tables: recompute the sample position from
            # [o | d | near | far] with the identical op sequence (and the
            # same linspace steps), so values are bit-equal to pts[gidx]
            ray_tab = jnp.concatenate([ray_o, ray_d, near[..., None],
                                       far[..., None]], axis=-1)  # (B, N, 8)
            rrows = jnp.take_along_axis(ray_tab, (gidx // D)[..., None],
                                        axis=1)
            o_s, dirs_s = rrows[..., 0:3], rrows[..., 3:6]
            near_s, far_s = rrows[..., 6], rrows[..., 7]
            step_s = steps[gidx % D]
            depth_s = near_s + (far_s - near_s) * step_s
            pts_s = o_s + depth_s[..., None] * dirs_s
            q_s = _rot3(pts_s - ctx_target.Th[:, None], ctx_target.R)
            qd_s = _rot3(dirs_s, ctx_target.R)
            tab_t2c = jax.vmap(
                lambda ct, cb: target2c_tables(smpl, ct, cb)
            )(ctx_target, ctx_big)
            # compacted queries are ray-major and body-proximal; the
            # cluster-shortlist kernel applies when rc.knn_shortlist > 0
            # (default off — see config; the full scan measured faster).
            # Python loop over the static batch only when the shortlist's
            # scalar-prefetch kernel is in play; the vmapped full scan is
            # the production form (restructuring it to a loop + stack
            # measured +36 ms/frame of broken fusion, r4).
            slc = rc.knn_shortlist
            if rc.exact_capacity_frac < 1.0:
                # plain KNN only (the payload is gathered from the small
                # per-vertex table AFTER the second compaction — cheaper
                # than carrying a (cap, 33) payload through it)
                if slc > 0:
                    outs = [nn_1_diag(q_s[b], tar_smpl[b], slc)
                            for b in range(B)]
                    d2_s = jnp.stack([o[0] for o in outs])
                    vid_s = jnp.stack([o[1] for o in outs])
                    self._sow_overflow(
                        "knn_shortlist_overflow",
                        jnp.stack([o[-1] for o in outs]))
                else:
                    d2_s, vid_s = jax.vmap(nn_1)(q_s, tar_smpl)
                pay_t2c = None
            else:
                if slc > 0:
                    outs = [nn_1_tables_diag(q_s[b], tar_smpl[b],
                                             tab_t2c[b], slc)
                            for b in range(B)]
                    d2_s = jnp.stack([o[0] for o in outs])
                    vid_s = jnp.stack([o[1] for o in outs])
                    pay_t2c = jnp.stack([o[2] for o in outs])
                    self._sow_overflow(
                        "knn_shortlist_overflow",
                        jnp.stack([o[-1] for o in outs]))
                else:
                    d2_s, vid_s, pay_t2c = jax.vmap(nn_1_tables)(
                        q_s, tar_smpl, tab_t2c)
            exact_s = valid & (d2_s < rc.prune_threshold_sq)

            # ---- second compaction: exact-test failures composite as empty
            # space (sigma -80 -> relu -> 0 == a hole in the segmented
            # march), so drop them BEFORE the expensive per-point feature
            # banks and run everything downstream on a tighter budget.
            if rc.exact_capacity_frac < 1.0:
                cap2 = _round_up(
                    max(int(N_full * D * rc.exact_capacity_frac), 128), 128)
                cap2 = min(cap2, cap)
                self._sow_overflow(
                    "exact_overflow",
                    jnp.sum(exact_s.astype(jnp.int32), axis=1) - cap2)
                if jax.default_backend() in ("tpu", "axon"):
                    pairs = [compact_mask(exact_s[b], cap2) for b in range(B)]
                    idx2 = jnp.stack([p[0] for p in pairs])
                    valid2 = jnp.stack([p[1] for p in pairs])
                else:
                    idx2, valid2 = jax.vmap(
                        lambda m: _compact_indices(m, cap2))(exact_s)
                g2 = jnp.minimum(idx2, cap - 1)

                # one packed row gather instead of 4 separate ones (each
                # gather op costs ~rows x 8-20ns regardless of width):
                # [q (3) | qd (3) | vid | flat idx] — ints are exact in f32
                # below 2^24 (M = 12.6M < 2^24, vid < 6890)
                packed = jnp.concatenate([
                    q_s, qd_s, vid_s[..., None].astype(jnp.float32),
                    jnp.minimum(idx, M - 1)[..., None].astype(jnp.float32),
                ], axis=-1)
                rows = jnp.take_along_axis(packed, g2[..., None], axis=1)
                q_s, qd_s = rows[..., 0:3], rows[..., 3:6]
                vid2 = rows[..., 6].astype(jnp.int32)
                pay_t2c = jnp.stack([tab_t2c[b][vid2[b]] for b in range(B)])
                # compose the flat sample index: idx is ascending and idx2
                # picks ascending slots of it, so gidx stays ascending
                # (stable ray-major order, as the segmented march requires)
                idx = jnp.where(valid2, rows[..., 7].astype(jnp.int32), M)
                valid, exact_s = valid2, valid2
                cap = cap2
        else:
            # parity mode: exact full KNN, mask-only (no dropped compute)
            q = _rot3(pts - ctx_target.Th[:, None], ctx_target.R)
            dirs = jnp.broadcast_to(ray_d[:, :, None],
                                    (B, N, D, 3)).reshape(B, M, 3)
            qd = _rot3(dirs, ctx_target.R)
            tab_t2c = jax.vmap(
                lambda ct, cb: target2c_tables(smpl, ct, cb)
            )(ctx_target, ctx_big)
            d2, vid, pay_t2c = jax.vmap(nn_1_tables)(q, tar_smpl, tab_t2c)
            pts_mask = d2 < rc.prune_threshold_sq  # (B, N*D)
            cap = M
            idx, valid = None, jnp.ones((B, M), bool)
            q_s, qd_s, vid_s = q, qd, vid
            exact_s = pts_mask

        # ---- warp to canonical (renderer.py:323)
        can, can_dir = jax.vmap(
            lambda ct, cb, pay, qq, qq_d: deform_target2c_from_tables(
                ct, cb, pay, qq, qq_d)
        )(ctx_target, ctx_big, pay_t2c, q_s, qd_s)

        out = self.decode_points(
            planes, obs_img, obs_feat, vol_feats, vol_coords, min_dhw,
            can, can_dir, ctx_obs, ctx_big, t_vertices, t_bounds,
            obs_K, obs_R, obs_T, smpl, train=train)
        rgb_pts = out["rgb"]                          # (B, cap, 3)
        sigma_pts = out["sigma"][..., 0]              # (B, cap)

        if train and rc.density_noise > 0:
            noise = jax.random.normal(self.make_rng("density"), sigma_pts.shape)
            sigma_pts = sigma_pts + noise * rc.density_noise

        if idx is not None:
            # ---- composite the compacted points directly (segmented march):
            # equivalent to the reference's scatter-back-with-density--80 +
            # dense march (renderer.py:364-371), without materializing the
            # (N, D) sample grid.
            clip = (None if ray_sel is None
                    else (ray_sel[2], ray_sel[3]))
            rgb, depth, acc = jax.vmap(
                lambda c, s, gi, va, nr, fr, rd, *cl: ray_march_segmented(
                    c, s, gi, va, nr, fr, rd, D, clamp_mode=rc.clamp_mode,
                    white_back=rc.white_back,
                    depth_clip=(cl if cl else None))
            )(rgb_pts, jnp.where(exact_s, sigma_pts, -80.0), idx,
              valid, near, far, ray_d, *(clip if clip else ()))
            if ray_sel is None:
                return rgb, depth, acc
            # scatter the composited pixels back to the full ray set
            return self._scatter_rays_back(rgb, depth, acc, ray_sel, N_full)

        # ---- parity mode: scatter-free dense grid march (renderer.py:364-371)
        colors = rgb_pts * exact_s[..., None]
        dens = jnp.where(exact_s, sigma_pts, -80.0)

        colors = colors.reshape(B, N, D, 3)
        dens = dens.reshape(B, N, D)
        depths_r = depths.reshape(B, N, D)

        rgb, depth, weights = jax.vmap(
            lambda c, s, t, rd: ray_march(c, s, t, rd, clamp_mode=rc.clamp_mode,
                                          white_back=rc.white_back)
        )(colors, dens, depths_r, ray_d)
        return rgb, depth, jnp.sum(weights, axis=-1)

    # ------------------------------------------------------------------
    def _compact_rays(self, ray_o, ray_d, near, far, ray_mask, vertices):
        """Static-budget ray compaction: AABB-hitting rays that also pass
        the segment-level body-proximity test (see ray_body_mask_pallas).

        A ray whose SEGMENT [near, far] never comes within the prune radius
        of ANY posed vertex has every sample fail the exact 5cm test
        (renderer.py:315-321) and composites to background — so it need not
        consume ray budget.  Distances are world == SMPL-frame (global R is
        a rotation); min over continuous t <= min over the discrete
        samples, so this is a strict superset of "any sample survives".

        Returns (ray_o, ray_d, near, far, ray_sel, rcap) with the ray
        tensors gathered down to the budget; ray_sel = (ridx, rvalid,
        depth_lo, depth_hi) for the final scatter-back.
        """
        from sherf_tpu.kernels import knn_pallas as kp

        rc = self.cfg.render
        B, N = ray_o.shape[:2]
        ray_mask = ray_mask.reshape(B, -1).astype(bool)
        # +1mm of slack on the ray-level radius: the kernel's line-distance
        # expression and the per-sample KNN distance round differently in
        # f32, and a borderline ray (line_min ~ threshold) must never be
        # dropped while one of its samples passes the exact test (measured:
        # ~30 silhouette pixels flipped at 512^2 without the slack)
        thr_ray = (float(np.sqrt(rc.prune_threshold_sq)) + 1e-3) ** 2
        # clustered only on real TPU backends: in interpret mode (CPU
        # oracle tests) the per-cluster pl.when emulation is far slower
        # than the plain kernel, and the clustered/full equivalence has its
        # own dedicated tests (test_knn.py)
        if (kp.CLUSTERED and vertices.shape[1] >= 8 * kp.C_SIZE
                and jax.default_backend() in ("tpu", "axon")):
            ray_mask = ray_mask & jnp.stack([
                kp.ray_body_mask_clustered_pallas(
                    ray_o[b], ray_d[b], near[b], far[b], vertices[b],
                    thr_ray)
                for b in range(B)])
        else:
            # AABB mask forwarded so all-miss ray tiles skip the scan
            ray_mask = ray_mask & jnp.stack([
                kp.ray_body_mask_pallas(ray_o[b], ray_d[b], near[b],
                                        far[b], vertices[b], thr_ray,
                                        active=ray_mask[b])
                for b in range(B)])
        depth_lo = jnp.min(near, axis=1)           # (B,) dense-path clip
        depth_hi = jnp.max(far, axis=1)
        rcap = _round_up(max(int(N * rc.ray_capacity_frac), 128), 128)
        if jax.default_backend() in ("tpu", "axon"):
            pairs = [compact_mask(ray_mask[b], rcap) for b in range(B)]
            ridx = jnp.stack([p[0] for p in pairs])
            rvalid = jnp.stack([p[1] for p in pairs])
        else:
            ridx, rvalid = jax.vmap(
                lambda m: _compact_indices(m, rcap))(ray_mask)
        self._sow_overflow("ray_overflow",
                           jnp.sum(ray_mask, axis=1) - rcap)
        gr = jnp.minimum(ridx, N - 1)
        # invalid tail rays park far outside the body so the prune drops
        # every one of their samples (zero budget consumed)
        ray_o = jnp.where(rvalid[..., None],
                          jnp.take_along_axis(ray_o, gr[..., None], axis=1),
                          1e6)
        ray_d = jnp.take_along_axis(ray_d, gr[..., None], axis=1)
        near = jnp.take_along_axis(near, gr, axis=1)
        far = jnp.take_along_axis(far, gr, axis=1)
        return ray_o, ray_d, near, far, (ridx, rvalid, depth_lo, depth_hi), rcap

    # ------------------------------------------------------------------
    def _eval_points_full(self, pts, dirs, ctx_target, ctx_big, tab_t2c,
                          tar_smpl, planes, obs_img, obs_feat, vol_feats,
                          vol_coords, min_dhw, ctx_obs, t_vertices, t_bounds,
                          obs_K, obs_R, obs_T, smpl, train):
        """Full-compute (mask-only, no compaction) sample evaluation:
        world points -> (colors, densities) with the reference's pruned-point
        semantics (rgb zeroed, density -80, renderer.py:364-368).

        pts/dirs: (B, M, 3) world-space sample positions / ray directions.
        """
        rc = self.cfg.render
        q = _rot3(pts - ctx_target.Th[:, None], ctx_target.R)
        qd = _rot3(dirs, ctx_target.R)
        d2, vid, pay = jax.vmap(nn_1_tables)(q, tar_smpl, tab_t2c)
        mask = d2 < rc.prune_threshold_sq
        can, can_dir = jax.vmap(
            lambda ct, cb, pp, qq, qq_d: deform_target2c_from_tables(
                ct, cb, pp, qq, qq_d)
        )(ctx_target, ctx_big, pay, q, qd)
        out = self.decode_points(
            planes, obs_img, obs_feat, vol_feats, vol_coords, min_dhw,
            can, can_dir, ctx_obs, ctx_big, t_vertices, t_bounds,
            obs_K, obs_R, obs_T, smpl, train=train)
        rgb = out["rgb"]
        sigma = out["sigma"][..., 0]
        if train and rc.density_noise > 0:
            noise = jax.random.normal(self.make_rng("density"), sigma.shape)
            sigma = sigma + noise * rc.density_noise
        colors = rgb * mask[..., None]
        dens = jnp.where(mask, sigma, -80.0)
        return colors, dens

    def _eval_points_budgeted(self, depths, ray_o, ray_d, vertices,
                              ctx_target, ctx_big, tab_t2c, tar_smpl,
                              bank_args, cap_frac, n_total, smpl, train,
                              name):
        """Budgeted point evaluation over an ARBITRARY (B, N, Dx) depth
        grid: stride-1 occupancy prune -> static-capacity compaction ->
        fused exact-KNN+payload -> LBS warp -> feature banks + decoder.

        The importance depths are irregular (PDF-sampled), so every sample
        is tested against the dilated occupancy grid directly (no stride
        trick) and positions are gathered, not recomputed.  Returns
        (colors (B, cap, 3), dens (B, cap), idx (B, cap) flat sample ids
        with sentinel M, valid (B, cap)); pruned/exact-failed samples
        composite as density -80 through the caller's scatter.
        """
        rc = self.cfg.render
        B, N, Dx = depths.shape
        M = N * Dx
        pts = (ray_o[:, :, None] + depths[..., None] * ray_d[:, :, None]
               ).reshape(B, M, 3)
        radius = float(np.sqrt(rc.prune_threshold_sq))
        occ = jnp.stack([occupancy_mask(pts[b], vertices[b], radius=radius)
                         for b in range(B)])
        cap = _round_up(max(int(n_total * cap_frac), 128), 128)
        cap = min(cap, M)
        self._sow_overflow(name, jnp.sum(occ.astype(jnp.int32), axis=1) - cap)
        if jax.default_backend() in ("tpu", "axon"):
            pairs = [compact_mask(occ[b], cap) for b in range(B)]
            idx = jnp.stack([p[0] for p in pairs])
            valid = jnp.stack([p[1] for p in pairs])
        else:
            idx, valid = jax.vmap(lambda m: _compact_indices(m, cap))(occ)
        gidx = jnp.minimum(idx, M - 1)

        dirs = jnp.broadcast_to(ray_d[:, :, None], (B, N, Dx, 3)
                                ).reshape(B, M, 3)
        packed = jnp.concatenate([pts, dirs], axis=-1)       # (B, M, 6)
        rows = jnp.take_along_axis(packed, gidx[..., None], axis=1)
        pts_s, dirs_s = rows[..., 0:3], rows[..., 3:6]
        q_s = _rot3(pts_s - ctx_target.Th[:, None], ctx_target.R)
        qd_s = _rot3(dirs_s, ctx_target.R)
        if rc.knn_shortlist > 0:
            outs = [nn_1_tables_diag(q_s[b], tar_smpl[b], tab_t2c[b],
                                     rc.knn_shortlist) for b in range(B)]
            d2_s = jnp.stack([o[0] for o in outs])
            pay_t2c = jnp.stack([o[2] for o in outs])
            self._sow_overflow("knn_shortlist_overflow",
                               jnp.stack([o[-1] for o in outs]))
        else:
            d2_s, _, pay_t2c = jax.vmap(nn_1_tables)(q_s, tar_smpl,
                                                     tab_t2c)
        exact_s = valid & (d2_s < rc.prune_threshold_sq)

        can, can_dir = jax.vmap(
            lambda ct, cb, pay, qq, qq_d: deform_target2c_from_tables(
                ct, cb, pay, qq, qq_d)
        )(ctx_target, ctx_big, pay_t2c, q_s, qd_s)
        out = self.decode_points(*bank_args[:6], can, can_dir, *bank_args[6:],
                                 train=train)
        sigma = out["sigma"][..., 0]
        if train and rc.density_noise > 0:
            noise = jax.random.normal(self.make_rng("density"), sigma.shape)
            sigma = sigma + noise * rc.density_noise
        colors = out["rgb"] * exact_s[..., None]
        dens = jnp.where(exact_s, sigma, -80.0)
        return colors, dens, idx, valid

    def _forward_importance(self, planes, obs_img, obs_feat, vol_feats,
                            vol_coords, min_dhw, ray_o, ray_d, near, far,
                            ctx_target, ctx_big, ctx_obs, vertices,
                            t_vertices, t_bounds, obs_K, obs_R, obs_T, smpl,
                            train):
        """Two-pass hierarchical rendering (reference renderer.py:374-393 —
        dead code there with a stale run_model signature; implemented cleanly
        here): coarse stratified pass -> smoothed-PDF importance depths
        (sample_importance, renderer.py:483-542) -> second decode at the fine
        points -> unify_samples depth sort -> one combined march.

        Runs the full-compute dense pipeline (every sample evaluated, pruned
        points masked) — the importance knob is off in all shipped configs,
        so this path favors fidelity over the compaction machinery."""
        from sherf_tpu.nerf.importance import sample_importance

        cfg = self.cfg
        rc = cfg.render
        cdt = self.compute_dtype
        B, N = ray_o.shape[:2]
        D = rc.depth_resolution
        Di = rc.depth_resolution_importance

        if planes is not None:
            planes = planes.astype(cdt)
        if obs_feat is not None:
            obs_feat = obs_feat.astype(cdt)
        if vol_feats is not None:
            vol_feats = vol_feats.astype(cdt)

        tar_smpl = _rot3(vertices - ctx_target.Th[:, None], ctx_target.R)
        tab_t2c = jax.vmap(
            lambda ct, cb: target2c_tables(smpl, ct, cb)
        )(ctx_target, ctx_big)
        eval_args = (ctx_target, ctx_big, tab_t2c, tar_smpl, planes, obs_img,
                     obs_feat, vol_feats, vol_coords, min_dhw, ctx_obs,
                     t_vertices, t_bounds, obs_K, obs_R, obs_T, smpl, train)

        # ---- coarse pass (renderer.py:299-371)
        steps = jnp.linspace(0.0, 1.0, D)
        depths = near[..., None] + (far - near)[..., None] * steps  # (B, N, D)
        pts = (ray_o[:, :, None] + depths[..., None] * ray_d[:, :, None]
               ).reshape(B, N * D, 3)
        dirs = jnp.broadcast_to(ray_d[:, :, None], (B, N, D, 3)
                                ).reshape(B, N * D, 3)
        col_c, den_c = self._eval_points_full(pts, dirs, *eval_args)
        col_c = col_c.reshape(B, N, D, 3)
        den_c = den_c.reshape(B, N, D)

        _, _, w = jax.vmap(
            lambda c, s, t, rd: ray_march(c, s, t, rd,
                                          clamp_mode=rc.clamp_mode,
                                          white_back=rc.white_back)
        )(col_c, den_c, depths, ray_d)

        # ---- importance depths (no gradient through the PDF, matching the
        # reference's no_grad block); deterministic stratified u at eval,
        # random u during training (reference sample_pdf det=False default)
        rng = (self.make_rng("density")
               if train and self.has_rng("density") else None)
        z_fine = sample_importance(
            depths.reshape(B * N, D),
            jax.lax.stop_gradient(w).reshape(B * N, D),
            Di, det=rng is None, rng=rng).reshape(B, N, Di)
        z_fine = jax.lax.stop_gradient(z_fine)

        # ---- fine pass
        pts_f = (ray_o[:, :, None] + z_fine[..., None] * ray_d[:, :, None]
                 ).reshape(B, N * Di, 3)
        dirs_f = jnp.broadcast_to(ray_d[:, :, None], (B, N, Di, 3)
                                  ).reshape(B, N * Di, 3)
        col_f, den_f = self._eval_points_full(pts_f, dirs_f, *eval_args)
        col_f = col_f.reshape(B, N, Di, 3)
        den_f = den_f.reshape(B, N, Di)

        # ---- unify_samples (renderer.py:443-456): concat + sort by depth
        all_d = jnp.concatenate([depths, z_fine], axis=-1)
        order = jnp.argsort(all_d, axis=-1)
        all_d = jnp.take_along_axis(all_d, order, axis=-1)
        all_c = jnp.take_along_axis(
            jnp.concatenate([col_c, col_f], axis=2), order[..., None], axis=2)
        all_s = jnp.take_along_axis(
            jnp.concatenate([den_c, den_f], axis=2), order, axis=2)

        rgb, depth, weights = jax.vmap(
            lambda c, s, t, rd: ray_march(c, s, t, rd,
                                          clamp_mode=rc.clamp_mode,
                                          white_back=rc.white_back)
        )(all_c, all_s, all_d, ray_d)
        return rgb, depth, jnp.sum(weights, axis=-1)

    def _forward_importance_budgeted(self, planes, obs_img, obs_feat,
                                     vol_feats, vol_coords, min_dhw, ray_o,
                                     ray_d, near, far, ctx_target, ctx_big,
                                     ctx_obs, vertices, t_vertices, t_bounds,
                                     obs_K, obs_R, obs_T, smpl, train,
                                     ray_mask):
        """Hierarchical pass through the production budget machinery
        (VERDICT r2 weak #6 / next #7: the dense `_forward_importance` is
        ~an order of magnitude slower at shipped shapes and had no budget
        story).  Structure:

          ray compaction (same combined AABB+segment mask as __call__)
          -> coarse pass via `_eval_points_budgeted` at the uniform grid
          -> scatter to the dense (N, D) grid -> march for weights
          -> smoothed-PDF importance depths
          -> fine pass via `_eval_points_budgeted` at the PDF depths
          -> depth-sorted union march (unify_samples, renderer.py:443-456)
          -> scatter composited pixels back to the full ray set.

        Overflow counters: imp_coarse_overflow / imp_fine_overflow (budget
        fracs: point_capacity_frac / importance_capacity_frac).
        """
        from sherf_tpu.nerf.importance import sample_importance

        cfg = self.cfg
        rc = cfg.render
        cdt = self.compute_dtype
        B, N_full = ray_o.shape[:2]
        D = rc.depth_resolution
        Di = rc.depth_resolution_importance
        fine_frac = (rc.importance_capacity_frac
                     if rc.importance_capacity_frac is not None
                     else rc.point_capacity_frac)

        if planes is not None:
            planes = planes.astype(cdt)
        if obs_feat is not None:
            obs_feat = obs_feat.astype(cdt)
        if vol_feats is not None:
            vol_feats = vol_feats.astype(cdt)

        ray_sel = None
        N = N_full
        if ray_mask is not None and rc.ray_capacity_frac < 1.0:
            ray_o, ray_d, near, far, ray_sel, N = self._compact_rays(
                ray_o, ray_d, near, far, ray_mask, vertices)

        tar_smpl = _rot3(vertices - ctx_target.Th[:, None], ctx_target.R)
        tab_t2c = jax.vmap(
            lambda ct, cb: target2c_tables(smpl, ct, cb)
        )(ctx_target, ctx_big)
        bank_args = (planes, obs_img, obs_feat, vol_feats, vol_coords,
                     min_dhw, ctx_obs, ctx_big, t_vertices, t_bounds,
                     obs_K, obs_R, obs_T, smpl)

        # ---- coarse pass at the uniform stratified grid
        steps = jnp.linspace(0.0, 1.0, D)
        depths = near[..., None] + (far - near)[..., None] * steps  # (B, N, D)
        col_s, den_s, idx_c, _ = self._eval_points_budgeted(
            depths, ray_o, ray_d, vertices, ctx_target, ctx_big, tab_t2c,
            tar_smpl, bank_args, rc.point_capacity_frac, N_full * D, smpl,
            train, "imp_coarse_overflow")

        bi = jnp.arange(B)[:, None]
        col_c = jnp.zeros((B, N * D, 3)).at[bi, idx_c].set(
            col_s.astype(jnp.float32), mode="drop").reshape(B, N, D, 3)
        den_c = jnp.full((B, N * D), -80.0).at[bi, idx_c].set(
            den_s.astype(jnp.float32), mode="drop").reshape(B, N, D)

        _, _, w = jax.vmap(
            lambda c, s, t, rd: ray_march(c, s, t, rd,
                                          clamp_mode=rc.clamp_mode,
                                          white_back=rc.white_back)
        )(col_c, den_c, depths, ray_d)

        rng = (self.make_rng("density")
               if train and self.has_rng("density") else None)
        z_fine = sample_importance(
            depths.reshape(B * N, D),
            jax.lax.stop_gradient(w).reshape(B * N, D),
            Di, det=rng is None, rng=rng).reshape(B, N, Di)
        z_fine = jax.lax.stop_gradient(z_fine)

        # ---- fine pass at the PDF depths
        col_fs, den_fs, idx_f, _ = self._eval_points_budgeted(
            z_fine, ray_o, ray_d, vertices, ctx_target, ctx_big, tab_t2c,
            tar_smpl, bank_args, fine_frac, N_full * Di, smpl, train,
            "imp_fine_overflow")
        col_f = jnp.zeros((B, N * Di, 3)).at[bi, idx_f].set(
            col_fs.astype(jnp.float32), mode="drop").reshape(B, N, Di, 3)
        den_f = jnp.full((B, N * Di), -80.0).at[bi, idx_f].set(
            den_fs.astype(jnp.float32), mode="drop").reshape(B, N, Di)

        # ---- unify_samples: concat + sort by depth, one combined march
        all_d = jnp.concatenate([depths, z_fine], axis=-1)
        order = jnp.argsort(all_d, axis=-1)
        all_d = jnp.take_along_axis(all_d, order, axis=-1)
        all_c = jnp.take_along_axis(
            jnp.concatenate([col_c, col_f], axis=2), order[..., None], axis=2)
        all_s = jnp.take_along_axis(
            jnp.concatenate([den_c, den_f], axis=2), order, axis=2)

        rgb, depth, weights = jax.vmap(
            lambda c, s, t, rd: ray_march(c, s, t, rd,
                                          clamp_mode=rc.clamp_mode,
                                          white_back=rc.white_back)
        )(all_c, all_s, all_d, ray_d)
        acc = jnp.sum(weights, axis=-1)
        if ray_sel is None:
            return rgb, depth, acc
        return self._scatter_rays_back(rgb, depth, acc, ray_sel, N_full)

    def _scatter_rays_back(self, rgb, depth, acc, ray_sel, N_full):
        """Composited compacted-ray pixels -> the full ray set; dropped
        rays get the dense path's empty-ray values.  (A single packed
        [rgb|depth|acc] scatter was tried and measured ~7ms SLOWER than
        the three separate scatters — the 5-wide mixed scatter defeats the
        per-field fusions.)"""
        rc = self.cfg.render
        B = rgb.shape[0]
        ridx, rvalid, depth_lo, depth_hi = ray_sel
        empty_rgb = 1.0 if rc.white_back else -1.0
        bi = jnp.arange(B)[:, None]
        rgb_f = jnp.full((B, N_full, 3), empty_rgb).at[bi, ridx].set(
            jnp.where(rvalid[..., None], rgb, empty_rgb), mode="drop")
        depth_f = jnp.broadcast_to(depth_hi[:, None], (B, N_full)).at[
            bi, ridx].set(jnp.where(rvalid, depth, depth_hi[:, None]),
                          mode="drop")
        acc_f = jnp.zeros((B, N_full)).at[bi, ridx].set(
            jnp.where(rvalid, acc, 0.0), mode="drop")
        return rgb_f, depth_f, acc_f

    # ------------------------------------------------------------------
    def decode_points(self,
                      planes: Optional[jnp.ndarray],
                      obs_img: jnp.ndarray,
                      obs_feat: Optional[jnp.ndarray],
                      vol_feats: Optional[jnp.ndarray],
                      vol_coords: Optional[jnp.ndarray],
                      min_dhw: jnp.ndarray,
                      can: jnp.ndarray,               # (B, M, 3) canonical pts
                      can_dir: jnp.ndarray,           # (B, M, 3) canonical dirs
                      ctx_obs: PoseContext, ctx_big: PoseContext,
                      t_vertices: jnp.ndarray, t_bounds: jnp.ndarray,
                      obs_K: jnp.ndarray, obs_R: jnp.ndarray,
                      obs_T: jnp.ndarray, smpl: SMPLModel,
                      train: bool = False):
        """Feature bank lookup + fusion + decoder at canonical-space points
        (reference run_model, renderer.py:400-437).  Shared by the ray-path
        ``__call__`` and by direct density-field queries (shape export,
        gen_samples --shapes)."""
        cfg = self.cfg
        B = can.shape[0]

        # ---- pixel-aligned 2D features (renderer.py:325-343)
        if cfg.use_2d_feature:
            tab_c2s = jax.vmap(
                lambda cs, cb: c2source_tables(smpl, cs, cb)
            )(ctx_obs, ctx_big)
            # budgeted-mode queries arrive compacted (ray-major, body-
            # proximal) -> cluster shortlist when enabled; the vmapped
            # full scan is the production form (see __call__ note)
            slc = (cfg.render.knn_shortlist
                   if cfg.render.point_capacity_frac < 1.0 else 0)
            if slc > 0:
                outs = [nn_1_tables_diag(can[b], t_vertices[b],
                                         tab_c2s[b], slc)
                        for b in range(can.shape[0])]
                pay_c2s = jnp.stack([o[2] for o in outs])
                self._sow_overflow(
                    "knn_shortlist_overflow",
                    jnp.stack([o[-1] for o in outs]))
            else:
                _, _, pay_c2s = jax.vmap(nn_1_tables)(can, t_vertices,
                                                      tab_c2s)
            _, world_src, _ = jax.vmap(
                lambda cs, cb, pay, qq: deform_c2source_from_tables(
                    cs, cb, pay, qq)
            )(ctx_obs, ctx_big, pay_c2s, can)
            uv, _ = jax.vmap(project_points)(world_src, obs_K, obs_R, obs_T)
            wh = jnp.asarray([obs_img.shape[2], obs_img.shape[1]], jnp.float32)
            uv_n = 2.0 * uv / wh - 1.0
            # (grid_sample_2d_xpacked_wg — multi-hot MXU adjoint for the
            # obs-feature table — was A/B'd for the train path and measured
            # 292.7 vs 278.8 ms/step: at 65k table rows the obs-image
            # projections are not id-coherent enough for the range-skipped
            # multi-hot to beat XLA's scatter-add.  Plain form everywhere.)
            pix_feat = jnp.stack([
                grid_sample_2d_xpacked(pack_x_2d(obs_feat[b]), uv_n[b],
                                       align_corners=True)
                for b in range(B)])
            pix_rgb = jnp.stack([
                grid_sample_2d_packed(pack_corners_2d(obs_img[b]), uv_n[b],
                                      align_corners=True)
                for b in range(B)])
            rgb_feat = positional_encoding(pix_rgb, 5)[..., :32]  # 33 -> 32 quirk
            p2d = jnp.concatenate([pix_feat, rgb_feat], axis=-1)  # (B, cap, 96)
        else:
            p2d = None

        # ---- sparse-voxel 3D features (renderer.py:345-350); python loop
        # over the static batch — see setup() note on vmap loop-ification
        if cfg.use_3d_feature:
            qdhw = jax.vmap(
                lambda c, m: world_to_voxel_f(c, m, cfg.voxel_size)
            )(can, min_dhw)
            f3 = jnp.stack([
                self.encoder_3d(vol_feats[b], vol_coords[b], qdhw[b],
                                train=train)
                for b in range(B)])                 # (B, cap, 192)
            p3d = self.conv1d_projection(f3)  # (B, cap, 96)
        else:
            p3d = None

        # ---- triplane features (renderer.py:402, sample_from_planes)
        if cfg.use_1d_feature:
            lo = t_bounds[:, 0][:, None]
            hi = t_bounds[:, 1][:, None]
            norm = 2.0 * (can - lo) / (hi - lo) - 1.0
            f1d = jnp.stack([sample_from_planes(planes[b], norm[b])
                             for b in range(B)])
        else:
            f1d = None

        # ---- fusion (renderer.py:405-427): 96 -> 3 plane tokens of 32
        def to_tokens(f96):  # (B, cap, 96) -> (B, 3, cap, 32)
            return jnp.moveaxis(f96.reshape(B, -1, 3, 32), 2, 1)

        banks = []
        if f1d is not None:
            banks.append(f1d)
        if p2d is not None:
            banks.append(to_tokens(p2d))
        if p3d is not None:
            banks.append(to_tokens(p3d))
        fused = jnp.concatenate(banks, axis=-1)  # (B, 3, cap, 32*n_banks)
        if len(banks) > 1:
            fused = self.conv1d_reprojection(fused)  # (B, 3, cap, 32)

        if cfg.use_trans:
            tok = jnp.moveaxis(fused, 1, 2)          # (B, cap, 3, 32)
            tok = self.transformer(tok)
            fused = jnp.moveaxis(tok, 2, 1)

        # ---- decoder (renderer.py:429-432)
        sf = jnp.moveaxis(fused, 1, 0)               # (3, B, cap, 32)
        if cfg.use_nerf_decoder:
            return self.decoder(positional_encoding(can, 6), sf,
                                positional_encoding(can_dir, 4))
        return self.decoder(sf, can_dir)
