"""SHERFGenerator — the flagship single-image generalizable human NeRF.

TPU-native equivalent of the reference TriPlaneGenerator (triplane.py:30-237):
two ResNet18 encoders, a StyleGAN2 triplane backbone conditioned on the
observation image (mapping replaces z with the image embedding,
triplane.py:73-79), a sparse canonical feature volume built from
pixel-aligned observation vertex features (triplane.py:105-137), and the
volumetric renderer.

API mirrors the reference: ``mapping`` / ``synthesis`` / ``__call__``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sherf_tpu.core.config import ModelConfig
from sherf_tpu.core.types import SHERFBatch
from sherf_tpu.features.encoding import positional_encoding
from sherf_tpu.features.resnet import ResNet18
from sherf_tpu.features.sparseconv import voxelize_coords
from sherf_tpu.features.stylegan2 import StyleGAN2Backbone
from sherf_tpu.geometry.rays import backface_mask, project_points
from sherf_tpu.kernels.grid_sample import grid_sample_2d
from sherf_tpu.nerf.renderer import SHERFRenderer
from sherf_tpu.nerf.warp import make_pose_context, deform_target2c
from sherf_tpu.smpl.model import SMPLModel


class SHERFGenerator(nn.Module):
    cfg: ModelConfig
    out_sh: Tuple[int, int, int] = (128, 352, 416)

    def setup(self):
        import jax.numpy as jnp

        use_bf16 = self.cfg.compute_dtype == "bfloat16"
        enc_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        self.encoder_2d = ResNet18(dtype=enc_dtype, name="encoder_2d")
        self.encoder_2d_feature = ResNet18(dtype=enc_dtype,
                                           name="encoder_2d_feature")
        self.backbone = StyleGAN2Backbone(
            z_dim=self.cfg.z_dim, w_dim=self.cfg.w_dim,
            img_resolution=self.cfg.backbone_resolution,
            img_channels=self.cfg.n_planes * self.cfg.plane_channels,
            mapping_layers=self.cfg.mapping_layers,
            channel_base=self.cfg.channel_base, channel_max=self.cfg.channel_max,
            use_bf16=use_bf16, name="backbone")
        # obs vertex feature projection 96 -> 32 (triplane.py:58)
        self.conv1d_projection = nn.Dense(self.cfg.plane_channels,
                                          name="conv1d_projection")
        self.renderer = SHERFRenderer(self.cfg, self.out_sh, name="renderer")
        if self.cfg.use_sr_module:
            from sherf_tpu.features.superresolution import SuperresolutionHybrid

            self.superresolution = SuperresolutionHybrid(
                img_resolution=self.cfg.img_resolution, channels=3,
                name="superresolution")

    # ------------------------------------------------------------------
    def mapping(self, obs_img: jnp.ndarray, truncation_psi: float = 1.0,
                truncation_cutoff: Optional[int] = None, train: bool = False,
                update_emas: bool = False) -> jnp.ndarray:
        """obs_img (B, H, W, 3) -> ws (B, num_ws, w_dim).  The latent z is the
        ResNet18 embedding of the observation image (triplane.py:73-79)."""
        z = self.encoder_2d(obs_img, train=train)
        return self.backbone.mapping(z, truncation_psi=truncation_psi,
                                     truncation_cutoff=truncation_cutoff,
                                     update_emas=update_emas)

    # ------------------------------------------------------------------
    def _observation_volume(self, batch: SHERFBatch, obs_feat: jnp.ndarray,
                            smpl: SMPLModel, min_dhw: jnp.ndarray,
                            ctx_obs, ctx_big):
        """Pixel-aligned vertex features -> canonical sparse volume
        (triplane.py:105-137)."""
        B = batch.obs_img.shape[0]
        H, W = batch.obs_img.shape[1:3]

        uv, _ = jax.vmap(project_points)(batch.obs_vertices, batch.obs_K,
                                         batch.obs_R, batch.obs_T)
        vis = jax.vmap(lambda v, K, R, T: backface_mask(v, smpl.faces, K, R, T))(
            batch.obs_vertices, batch.obs_K, batch.obs_R, batch.obs_T)
        uv_n = 2.0 * uv / jnp.asarray([W, H], jnp.float32) - 1.0

        vert_feat = jax.vmap(lambda im, c: grid_sample_2d(im, c, align_corners=True))(
            obs_feat, uv_n)                                       # (B, 6890, 64)
        vert_rgb = jax.vmap(lambda im, c: grid_sample_2d(im, c, align_corners=True))(
            batch.obs_img, uv_n)                                  # (B, 6890, 3)
        rgb_enc = positional_encoding(vert_rgb, 5)[..., :32]
        feats = jnp.concatenate([vert_feat, rgb_enc], axis=-1)    # (B, 6890, 96)
        feats = self.conv1d_projection(feats)                     # (B, 6890, 32)
        feats = feats * vis[..., None]  # backface culling (triplane.py:126)

        # observation verts -> SMPL frame -> canonical big-pose space.  The
        # KNN inside the reference warp is the identity here (query == ref).
        smpl_obs = jnp.einsum("bvc,bcd->bvd",
                              batch.obs_vertices - ctx_obs.Th[:, None],
                              ctx_obs.R,
                              precision=jax.lax.Precision.HIGHEST)
        vid = jnp.tile(jnp.arange(smpl_obs.shape[1])[None], (B, 1))
        warped = jax.vmap(
            lambda co, cb, v, qq: deform_target2c(smpl, co, cb, v, qq)
        )(ctx_obs, ctx_big, vid, smpl_obs)
        coords = jax.vmap(
            lambda w, m: voxelize_coords(w, m, self.cfg.voxel_size)
        )(warped, min_dhw)                                        # (B, 6890, 3)
        return feats, coords

    # ------------------------------------------------------------------
    def synthesis(self, ws: jnp.ndarray, batch: SHERFBatch, smpl: SMPLModel,
                  noise_mode: str = "none", train: bool = False,
                  use_cached_planes: Optional[jnp.ndarray] = None,
                  flat_output: bool = False):
        cfg = self.cfg
        B = batch.obs_img.shape[0]

        # triplanes from the StyleGAN2 backbone (triplane.py:101,150)
        if use_cached_planes is not None:
            planes = use_cached_planes
        else:
            planes = self.backbone.synthesis(
                ws, noise_mode=noise_mode,
                fused_modconv=(not train))  # 'inference_only' default
        Hp, Wp = planes.shape[1:3]
        planes = planes.reshape(B, Hp, Wp, cfg.n_planes, cfg.plane_channels)
        planes = jnp.moveaxis(planes, 3, 1)  # (B, 3, Hp, Wp, C)

        obs_feat = self.encoder_2d_feature(batch.obs_img, extract_feature=True,
                                           train=train)

        ctx_target = jax.vmap(lambda p: make_pose_context(smpl, p))(batch.pose)
        ctx_big = jax.vmap(lambda p: make_pose_context(smpl, p))(batch.t_pose)
        ctx_obs = jax.vmap(lambda p: make_pose_context(smpl, p))(batch.obs_pose)

        # static canonical volume origin (prepare_sp_input, triplane.py:174-217)
        t_min = jnp.min(batch.t_vertices, axis=1) - 0.05
        min_dhw = t_min[:, (2, 1, 0)]

        if cfg.use_3d_feature:
            vol_feats, vol_coords = self._observation_volume(
                batch, obs_feat, smpl, min_dhw, ctx_obs, ctx_big)
        else:
            vol_feats = vol_coords = None

        rgb, depth, acc = self.renderer(
            planes if cfg.use_1d_feature else None,
            batch.obs_img, obs_feat, vol_feats, vol_coords, min_dhw,
            batch.ray_o, batch.ray_d, batch.near, batch.far,
            ctx_target, ctx_big, ctx_obs,
            batch.vertices, batch.t_vertices, batch.t_bounds,
            batch.obs_K, batch.obs_R, batch.obs_T, smpl, train=train,
            ray_mask=batch.mask_at_box)

        if flat_output:
            # per-ray outputs for sharded callers (shard_map over the 'rays'
            # mesh axis holds N/rm rays per shard — not an image rectangle;
            # the caller all_gathers and re-orders before any image-space op)
            assert not cfg.use_sr_module, \
                "flat_output is incompatible with the SR module"
            return {"image_raw": rgb, "image_depth": depth,
                    "weights_image": acc, "image": rgb}
        H, W = batch.img.shape[1:3]
        out = {
            "image_raw": rgb.reshape(B, H, W, 3),
            "image_depth": depth.reshape(B, H, W),
            "weights_image": acc.reshape(B, H, W),
        }
        if cfg.use_sr_module:
            out["image"] = self.superresolution(
                out["image_raw"], out["image_raw"], ws,
                noise_mode=noise_mode if noise_mode != "none" else "none",
                fused_modconv=(not train))
        else:
            out["image"] = out["image_raw"]
        return out

    # ------------------------------------------------------------------
    def query_canonical(self, batch: SHERFBatch, smpl: SMPLModel,
                        pts: jnp.ndarray, dirs: Optional[jnp.ndarray] = None):
        """Probe the radiance field at canonical (big-pose) points.

        pts: (B, M, 3) canonical-space positions.  Returns the decoder dict
        {"rgb": (B, M, 3), "sigma": (B, M, 1)}.  This is the shape-export
        path (reference gen_samples.py --shapes samples the density on a
        grid through the same run_model stack, renderer.py:400-437).
        """
        cfg = self.cfg
        B = batch.obs_img.shape[0]
        ws = self.mapping(batch.obs_img)
        if cfg.use_1d_feature:
            planes = self.backbone.synthesis(ws, noise_mode="none",
                                             fused_modconv=True)
            Hp, Wp = planes.shape[1:3]
            planes = planes.reshape(B, Hp, Wp, cfg.n_planes, cfg.plane_channels)
            planes = jnp.moveaxis(planes, 3, 1)
        else:
            planes = None
        obs_feat = self.encoder_2d_feature(batch.obs_img, extract_feature=True,
                                           train=False)
        ctx_big = jax.vmap(lambda p: make_pose_context(smpl, p))(batch.t_pose)
        ctx_obs = jax.vmap(lambda p: make_pose_context(smpl, p))(batch.obs_pose)
        t_min = jnp.min(batch.t_vertices, axis=1) - 0.05
        min_dhw = t_min[:, (2, 1, 0)]
        if cfg.use_3d_feature:
            vol_feats, vol_coords = self._observation_volume(
                batch, obs_feat, smpl, min_dhw, ctx_obs, ctx_big)
        else:
            vol_feats = vol_coords = None
        if dirs is None:
            dirs = jnp.zeros_like(pts)
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        return self.renderer.decode_points(
            None if planes is None else planes.astype(cdt),
            batch.obs_img,
            None if obs_feat is None else obs_feat.astype(cdt),
            None if vol_feats is None else vol_feats.astype(cdt),
            vol_coords, min_dhw, pts, dirs, ctx_obs, ctx_big,
            batch.t_vertices, batch.t_bounds,
            batch.obs_K, batch.obs_R, batch.obs_T, smpl)

    # ------------------------------------------------------------------
    def __call__(self, batch: SHERFBatch, smpl: SMPLModel,
                 truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 noise_mode: str = "none", train: bool = False,
                 update_emas: bool = False, flat_output: bool = False):
        ws = self.mapping(batch.obs_img, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff, train=train,
                          update_emas=update_emas)
        return self.synthesis(ws, batch, smpl, noise_mode=noise_mode,
                              train=train, flat_output=flat_output)
