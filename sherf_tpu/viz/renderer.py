"""Visualizer render backend — the counterpart of reference
viz/renderer.py:125-440 (``Renderer``), rebuilt for JAX on TPU.

Same contract as the reference: a stateful object whose ``render(**args)``
takes the merged widget state and returns a dict with ``image`` (uint8 HWC),
``render_time`` and, on failure, ``error`` (the reference wraps errors in
CapturedException, viz/renderer.py:29-47).  Differences are all TPU-native:

- networks are cached per checkpoint path (reference ``get_network``,
  viz/renderer.py:159) but the compiled render function is *also* cached per
  static shape key — recompiles only when resolution/depth/flags change;
- layer capture uses flax ``capture_intermediates`` instead of torch forward
  hooks (reference ``run_synthesis_net``, viz/renderer.py:411-440);
- scalar outputs (depth/acc/cross-section/layers) are colormapped on host
  with an embedded viridis ramp (reference ``_apply_cmap``,
  viz/renderer.py:227-237, uses matplotlib).
"""

from __future__ import annotations

import time
import traceback
from typing import Dict, Optional, Tuple

import numpy as np

# 11-anchor viridis ramp (matplotlib values, embedded so the visualizer has
# no plotting dependency); linearly interpolated in _apply_cmap.
_VIRIDIS = np.array([
    [0.267004, 0.004874, 0.329415], [0.282623, 0.140926, 0.457517],
    [0.253935, 0.265254, 0.529983], [0.206756, 0.371758, 0.553117],
    [0.163625, 0.471133, 0.558148], [0.127568, 0.566949, 0.550556],
    [0.134692, 0.658636, 0.517649], [0.266941, 0.748751, 0.440573],
    [0.477504, 0.821444, 0.318195], [0.741388, 0.873449, 0.149561],
    [0.993248, 0.906157, 0.143936]], np.float32)


def _apply_cmap(x: np.ndarray) -> np.ndarray:
    """Normalize a scalar field to [0,1] and map through viridis → float rgb."""
    x = np.asarray(x, np.float32)
    lo, hi = float(np.nanmin(x)), float(np.nanmax(x))
    t = (x - lo) / max(hi - lo, 1e-8)
    idx = t * (len(_VIRIDIS) - 1)
    i0 = np.clip(idx.astype(np.int32), 0, len(_VIRIDIS) - 2)
    frac = (idx - i0)[..., None]
    return _VIRIDIS[i0] * (1 - frac) + _VIRIDIS[i0 + 1] * frac


def _orbit_KRT(H: int, W: int, yaw: float, pitch: float, radius: float,
               fov: float, center: np.ndarray):
    """World->cam K/R/T for a camera orbiting ``center`` (the widget-driven
    pose, reference viz/pose_widget.py drag state → LookAtPoseSampler)."""
    pitch = float(np.clip(pitch, -1.4, 1.4))
    cam = center + radius * np.array([
        np.cos(pitch) * np.sin(yaw), np.sin(pitch), np.cos(pitch) * np.cos(yaw),
    ], np.float32)
    fwd = center - cam
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up)
    nr = np.linalg.norm(right)
    if nr < 1e-6:  # looking straight up/down
        right = np.array([1, 0, 0], np.float32)
    else:
        right = right / nr
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd]).astype(np.float32)
    T = (-R @ cam).reshape(3, 1).astype(np.float32)
    f = 0.5 * max(H, W) / np.tan(np.radians(fov) / 2.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return K, R, T


def sample_cross_section(model, variables, batch, smpl, resolution: int = 64,
                         w: float = 1.2, axis: int = 0,
                         offset: float = 0.0) -> np.ndarray:
    """Density on an axis-aligned plane through the canonical volume
    (reference training/crosssection_utils.py:13-23 ``sample_cross_section``:
    a (res, res) sigma slab at ``axis``=0; here the slice axis/offset are
    selectable).  Returns (res, res) float32 sigma."""
    import jax
    import jax.numpy as jnp

    center = np.asarray(batch.t_bounds[0]).mean(0)
    a = np.linspace(w / 2, -w / 2, resolution, dtype=np.float32)
    b = np.linspace(-w / 2, w / 2, resolution, dtype=np.float32)
    A, B = np.meshgrid(a, b, indexing="ij")
    cols = [A.reshape(-1), B.reshape(-1)]
    cols.insert(axis, np.full(resolution * resolution, offset, np.float32))
    pts = np.stack(cols, -1) + center

    query = jax.jit(lambda v, bt, p: model.apply(
        v, bt, smpl, p, method=model.query_canonical)["sigma"])
    sigma = query(variables, batch, jnp.asarray(pts[None]))
    return np.asarray(sigma[0, :, 0], np.float32).reshape(resolution, resolution)


class VizRenderer:
    """Stateful render backend; one instance per visualizer session."""

    def __init__(self, smpl_path: Optional[str] = None):
        self._smpl_path = smpl_path
        self._smpl = None
        self._models: Dict[tuple, tuple] = {}     # cfg key -> (model, out_sh)
        self._variables: Dict[tuple, dict] = {}   # (ckpt, cfg key) -> vars
        self._scenes: Dict[tuple, tuple] = {}     # scene key -> (batch, bounds)
        self._render_fns: Dict[tuple, object] = {}
        self._layer_names: Dict[tuple, list] = {}

    # -- caches --------------------------------------------------------
    def _get_smpl(self):
        if self._smpl is None:
            from sherf_tpu.cli.common import resolve_smpl
            self._smpl = resolve_smpl(self._smpl_path)
        return self._smpl

    def _cfg_key(self, depth_resolution: int, white_back: bool):
        return (int(depth_resolution), bool(white_back))

    def _get_model(self, depth_resolution: int, white_back: bool):
        key = self._cfg_key(depth_resolution, white_back)
        if key not in self._models:
            from sherf_tpu.cli.common import build_model
            from sherf_tpu.core.config import ModelConfig, RenderConfig

            cfg = ModelConfig(render=RenderConfig(
                depth_resolution=depth_resolution,
                point_capacity_frac=0.25, density_noise=0.0,
                white_back=white_back))
            model, out_sh, _cfg = build_model(cfg, self._get_smpl())
            self._models[key] = (model, out_sh)
        return self._models[key]

    def _get_scene(self, seed: int, resolution: int, pose_scale: float):
        """Synthetic subject + base batch (the visualizer's 'latent':
        reference latent_widget seed → here the synthetic-body seed)."""
        key = (int(seed), int(resolution), float(pose_scale))
        if key not in self._scenes:
            from sherf_tpu.data import make_synthetic_batch

            batch = make_synthetic_batch(self._get_smpl(), batch_size=1,
                                         H=resolution, W=resolution,
                                         seed=seed, pose_scale=pose_scale)
            verts = np.asarray(batch.vertices[0])
            wb = np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05])
            self._scenes[key] = (batch, wb)
        return self._scenes[key]

    def _get_variables(self, ckpt: Optional[str], model, base_batch):
        import jax

        key = (ckpt or "", self._cfg_key(model.cfg.render.depth_resolution,
                                         model.cfg.render.white_back))
        if key in self._variables:
            return self._variables[key]
        smpl = self._get_smpl()
        variables = jax.jit(lambda b: model.init(
            jax.random.PRNGKey(0), b, smpl))(base_batch)
        if ckpt and ckpt.endswith((".pkl", ".pt", ".pth")):
            # reference snapshot (viz/pickle_widget.py -> get_network)
            from sherf_tpu.compat.legacy_import import (
                import_sherf_generator, load_reference_pickle)

            nets = load_reference_pickle(ckpt)
            sd = nets.get("G_ema", nets.get("G"))
            params, stats, noise, _ = import_sherf_generator(sd)
            variables = {"params": params, "batch_stats": stats,
                         "noise": noise}
        elif ckpt:
            from sherf_tpu.core.config import TrainConfig
            from sherf_tpu.train.checkpoint import restore_checkpoint
            from sherf_tpu.train.train_state import create_train_state

            params = dict(variables)["params"]
            extra = {k: v for k, v in variables.items() if k != "params"}
            state = restore_checkpoint(
                ckpt, create_train_state(params, extra, TrainConfig()))
            variables = {"params": state.ema_params, **state.extra_vars}
        self._variables[key] = variables
        return variables

    def _get_render_fn(self, depth_resolution, white_back, capture: bool):
        import jax

        key = (self._cfg_key(depth_resolution, white_back), capture)
        if key in self._render_fns:
            return self._render_fns[key]
        model, _ = self._get_model(depth_resolution, white_back)
        smpl = self._get_smpl()

        def fn(variables, batch):
            if capture:
                out, inter = model.apply(
                    variables, batch, smpl, capture_intermediates=True,
                    mutable=["intermediates"])
                return out, inter["intermediates"]
            return model.apply(variables, batch, smpl), None

        jitted = jax.jit(fn)
        self._render_fns[key] = jitted
        return jitted

    # -- main entry ----------------------------------------------------
    def render(self, **args) -> dict:
        """Render one frame from merged widget state.  Never raises: errors
        come back in res['error'] (reference viz/renderer.py:138-157)."""
        res: dict = {}
        t0 = time.perf_counter()
        try:
            self._render_impl(res, **args)
        except Exception:
            res["error"] = traceback.format_exc()
        res["render_time"] = time.perf_counter() - t0
        return res

    def _render_impl(self, res, ckpt: Optional[str] = None,
                     resolution: int = 128, depth_resolution: int = 24,
                     yaw: float = 0.0, pitch: float = 0.0,
                     radius: float = 3.0, fov: float = 42.0,
                     seed: int = 0, pose_scale: float = 0.25,
                     render_type: str = "rgb", white_back: bool = False,
                     layer_name: Optional[str] = None,
                     list_layers: bool = False,
                     crosssection_axis: int = 0,
                     crosssection_width: float = 1.2, **_unused):
        import jax.numpy as jnp

        from sherf_tpu.geometry.rays import get_rays_np, near_far_aabb_np

        H = W = int(resolution)
        model, _ = self._get_model(depth_resolution, white_back)
        base, wb = self._get_scene(seed, H, pose_scale)
        variables = self._get_variables(ckpt, model, base)

        if render_type == "crosssection":
            sigma = sample_cross_section(
                model, variables, base, self._get_smpl(), resolution=H,
                w=crosssection_width, axis=int(crosssection_axis))
            res["image"] = (np.clip(_apply_cmap(sigma), 0, 1)
                            * 255).astype(np.uint8)
            return

        center = 0.5 * (wb[0] + wb[1])
        K, R, T = _orbit_KRT(H, W, yaw, pitch, radius, fov, center)
        ro, rd = get_rays_np(H, W, K, R, T)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        near, far, mask = near_far_aabb_np(wb, ro, rd)
        batch = base.replace(
            ray_o=jnp.asarray(ro[None]), ray_d=jnp.asarray(rd[None]),
            near=jnp.asarray(near[None]), far=jnp.asarray(far[None]),
            mask_at_box=jnp.asarray(mask[None]))

        capture = bool(layer_name or list_layers)
        out, inter = self._get_render_fn(depth_resolution, white_back,
                                         capture)(variables, batch)

        if capture:
            flat = _flatten_intermediates(inter)
            res["layers"] = [
                dict(name=k, shape=list(np.shape(v)), dtype=str(v.dtype))
                for k, v in flat]
            if layer_name:
                sel = dict(flat).get(layer_name)
                if sel is None:
                    res["error"] = f"no such layer: {layer_name}"
                    return
                res["image"] = _layer_to_image(np.asarray(sel, np.float32))
                return

        img = np.asarray(out["image_raw"][0], np.float32) / 2.0 + 0.5
        if render_type == "depth":
            img = _apply_cmap(np.asarray(out["image_depth"][0]))
        elif render_type == "acc":
            img = _apply_cmap(np.asarray(out["weights_image"][0]))
        elif render_type == "normals":
            # screen-space normals from the depth buffer (reference
            # render_type_widget's 'Normals' mode approximated without a
            # second gradient pass)
            d = np.asarray(out["image_depth"][0], np.float32)
            dy, dx = np.gradient(d)
            n = np.stack([-dx, -dy, np.full_like(d, 1.0 / max(H, W))], -1)
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
            img = n * 0.5 + 0.5
        res["image"] = (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _flatten_intermediates(tree, prefix: str = "") -> list:
    """flax intermediates pytree -> [(dotted_name, array)] with image-like
    arrays only (the reference lists conv outputs, viz/layer_widget.py)."""
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out += _flatten_intermediates(tree[k],
                                          f"{prefix}{k}." if k else prefix)
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            suffix = "" if len(tree) == 1 else f"{i}."
            out += _flatten_intermediates(v, f"{prefix}{suffix}")
    else:
        if hasattr(tree, "shape") and getattr(tree, "ndim", 0) >= 2:
            out.append((prefix.rstrip("."), tree))
    return out


def _layer_to_image(x: np.ndarray) -> np.ndarray:
    """Mean-over-channels heatmap of an intermediate activation
    (reference layer_widget channel browser, simplified to the mean map)."""
    x = np.asarray(x, np.float32)
    while x.ndim > 3:
        x = x[0]
    if x.ndim == 3:  # HWC or CHW -> HW mean
        x = x.mean(axis=-1 if x.shape[-1] <= x.shape[0] else 0)
    if x.ndim == 1:
        n = int(np.ceil(np.sqrt(x.size)))
        x = np.pad(x, (0, n * n - x.size)).reshape(n, n)
    return (np.clip(_apply_cmap(x), 0, 1) * 255).astype(np.uint8)
