"""Run the reference SHERF model on CPU for end-to-end parity testing.

The reference (``/root/reference/sherf``) imports two CUDA-only native
libraries at module scope — ``pytorch3d.ops.knn`` (``renderer.py:25``) and
``spconv.pytorch`` (``renderer.py:26``, ``triplane.py:22``) — and pins its
SMPL constants to a CUDA device in the renderer ctor (``renderer.py:284``).
This module installs *pure-torch stand-ins* with identical semantics so the
assembled reference ``TriPlaneGenerator.forward`` can execute on CPU and be
compared numerically against :class:`sherf_tpu.models.SHERFGenerator` with
shared (imported) weights.

Stand-in semantics:
  * ``knn_points(p1, p2, K=1)`` returns **squared** L2 distances and the
    first-minimal index, matching pytorch3d's contract as consumed at
    ``renderer.py:315,564,627`` (only ``dists``/``idx`` are used, always
    with K=1).
  * The fake spconv implements SubMConv3d (kernel 3, pad 1: outputs at the
    input site set only), SparseConv3d (kernel 3, stride 2, pad 1: output
    shape ``(s-1)//2+1``) and ``SparseConvTensor.dense()`` as gather-based
    sparse ops — the exact semantics our JAX site-list implementation was
    validated against dense ``F.conv3d`` oracles for
    (``tests/test_sparseconv.py``).  Weight layout follows spconv 2.x
    native ``(out, kd, kh, kw, in)``, correlation orientation (no kernel
    flip), consistent with ``legacy_import._spconv_w``.
  * Duplicate voxel indices (several SMPL vertices can share a voxel,
    ``triplane.py:196``) resolve last-row-wins in both the hash grid and
    ``dense()``, mirroring our ``build_index_grid`` scatter.
"""

from __future__ import annotations

import contextlib
import os
import pickle
import sys
import types
from typing import Dict, Optional

import numpy as np

REFERENCE_ROOT = "/root/reference/sherf"


# ---------------------------------------------------------------------------
# fake pytorch3d


def _make_fake_pytorch3d():
    import torch

    def knn_points(p1, p2, K=1, **kwargs):
        """Brute-force K-NN with exact squared distances (chunked over p1)."""
        assert p1.dim() == 3 and p2.dim() == 3
        B = p1.shape[0]
        dists, idxs = [], []
        for b in range(B):
            a, r = p1[b], p2[b]
            r2 = (r * r).sum(-1)  # (M,)
            d_rows, i_rows = [], []
            for s in range(0, a.shape[0], 16384):
                ac = a[s:s + 16384]
                d2 = (ac * ac).sum(-1, keepdim=True) - 2.0 * ac @ r.T + r2
                dmin, imin = d2.min(dim=1)
                d_rows.append(dmin)
                i_rows.append(imin)
            dists.append(torch.cat(d_rows))
            idxs.append(torch.cat(i_rows))
        dists = torch.stack(dists)[..., None]
        idxs = torch.stack(idxs)[..., None]
        if K != 1:
            raise NotImplementedError("reference only uses K=1")
        return dists, idxs, None

    pytorch3d = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    knn = types.ModuleType("pytorch3d.ops.knn")
    knn.knn_points = knn_points
    ops.knn = knn
    ops.knn_points = knn_points
    pytorch3d.ops = ops
    return {"pytorch3d": pytorch3d, "pytorch3d.ops": ops,
            "pytorch3d.ops.knn": knn}


# ---------------------------------------------------------------------------
# fake torchvision (not in this environment) — resnet18 with the torchvision
# module layout/state_dict keys (conv1/bn1/layer{1-4}.{0,1}.conv*/downsample,
# avgpool/fc), which is all ResNet18Classifier touches (triplane.py:320-343)


def _make_fake_torchvision():
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet18(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)

            def layer(cin, cout, stride):
                down = None
                if stride != 1 or cin != cout:
                    down = nn.Sequential(
                        nn.Conv2d(cin, cout, 1, stride, bias=False),
                        nn.BatchNorm2d(cout))
                return nn.Sequential(BasicBlock(cin, cout, stride, down),
                                     BasicBlock(cout, cout))

            self.layer1 = layer(64, 64, 1)
            self.layer2 = layer(64, 128, 2)
            self.layer3 = layer(128, 256, 2)
            self.layer4 = layer(256, 512, 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet18(pretrained=False, weights=None, **kwargs):
        # no egress: 'pretrained' weights are unavailable; callers import
        # real weights via state_dict afterwards
        return ResNet18(**kwargs)

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    # picklable by class path (see the fake-spconv note)
    for _cls in (BasicBlock, ResNet18):
        _cls.__module__ = "torchvision.models"
        _cls.__qualname__ = _cls.__name__
    models.BasicBlock = BasicBlock
    models.ResNet18 = ResNet18
    models.resnet18 = resnet18
    tv.models = models
    return {"torchvision": tv, "torchvision.models": models}


# ---------------------------------------------------------------------------
# fake spconv


def _make_fake_spconv():
    import torch
    import torch.nn as nn

    def _flat(idx, spatial_shape):
        D, H, W = spatial_shape
        return ((idx[:, 0].long() * D + idx[:, 1].long()) * H
                + idx[:, 2].long()) * W + idx[:, 3].long()

    def _index_grid(indices, spatial_shape, batch_size):
        D, H, W = spatial_shape
        grid = torch.full((batch_size * D * H * W,), -1, dtype=torch.long)
        grid[_flat(indices, spatial_shape)] = torch.arange(indices.shape[0])
        return grid

    class SparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size):
            self.features = features                       # (N, C)
            self.indices = indices                         # (N, 4) [b,z,y,x]
            self.spatial_shape = [int(s) for s in spatial_shape]
            self.batch_size = int(batch_size)
            self._grid = None

        def grid(self):
            if self._grid is None:
                self._grid = _index_grid(self.indices, self.spatial_shape,
                                         self.batch_size)
            return self._grid

        def dense(self):
            B, C = self.batch_size, self.features.shape[1]
            D, H, W = self.spatial_shape
            out = torch.zeros(B, C, D, H, W, dtype=self.features.dtype)
            i = self.indices.long()
            out[i[:, 0], :, i[:, 1], i[:, 2], i[:, 3]] = self.features
            return out

        def replace_features(self, feats):
            t = SparseConvTensor(feats, self.indices, self.spatial_shape,
                                 self.batch_size)
            t._grid = self._grid
            return t

    class SubMConv3d(nn.Module):
        """Submanifold conv: outputs at the input site set only; empty
        neighbors contribute zero (spconv SubMConv3d semantics)."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     bias=False, indice_key=None, **kwargs):
            super().__init__()
            self.kernel_size = int(kernel_size)
            self.weight = nn.Parameter(torch.zeros(
                out_channels, self.kernel_size, self.kernel_size,
                self.kernel_size, in_channels))
            nn.init.normal_(self.weight, std=0.02)
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

        def forward(self, x: SparseConvTensor) -> SparseConvTensor:
            k = self.kernel_size
            if k == 1:
                out = x.features @ self.weight[:, 0, 0, 0, :].T
            else:
                assert k == 3
                D, H, W = x.spatial_shape
                grid = x.grid()
                idx = x.indices
                feats = x.features
                zero = torch.zeros(1, feats.shape[1], dtype=feats.dtype)
                feats_pad = torch.cat([feats, zero], 0)
                out = None
                for dz in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            nz = idx[:, 1].long() + dz
                            ny = idx[:, 2].long() + dy
                            nx = idx[:, 3].long() + dx
                            ok = ((nz >= 0) & (nz < D) & (ny >= 0) & (ny < H)
                                  & (nx >= 0) & (nx < W))
                            flat = ((idx[:, 0].long() * D + nz.clamp(0, D - 1))
                                    * H + ny.clamp(0, H - 1)) * W \
                                + nx.clamp(0, W - 1)
                            nid = grid[flat]
                            nid = torch.where(ok & (nid >= 0), nid,
                                              torch.full_like(nid, len(feats)))
                            w = self.weight[:, dz + 1, dy + 1, dx + 1, :]
                            contrib = feats_pad[nid] @ w.T
                            out = contrib if out is None else out + contrib
            if self.bias is not None:
                out = out + self.bias
            return x.replace_features(out)

    class SparseConv3d(nn.Module):
        """Strided sparse conv (kernel 3, stride 2, pad 1): output sites are
        every position whose stride-2 input window touches an input site;
        output spatial shape (s-1)//2+1 (spconv rulebook semantics)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride,
                     padding=1, bias=False, indice_key=None, **kwargs):
            super().__init__()
            assert kernel_size == 3 and stride == 2 and padding == 1
            self.weight = nn.Parameter(torch.zeros(
                out_channels, 3, 3, 3, in_channels))
            nn.init.normal_(self.weight, std=0.02)
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

        def forward(self, x: SparseConvTensor) -> SparseConvTensor:
            import torch

            D, H, W = x.spatial_shape
            so = [(D - 1) // 2 + 1, (H - 1) // 2 + 1, (W - 1) // 2 + 1]
            idx = x.indices
            # candidate output sites from each input site: o = (i + 1 - k)/2
            cand = []
            for kz in (0, 1, 2):
                oz2 = idx[:, 1].long() + 1 - kz
                for ky in (0, 1, 2):
                    oy2 = idx[:, 2].long() + 1 - ky
                    for kx in (0, 1, 2):
                        ox2 = idx[:, 3].long() + 1 - kx
                        ok = ((oz2 % 2 == 0) & (oy2 % 2 == 0) & (ox2 % 2 == 0)
                              & (oz2 >= 0) & (oy2 >= 0) & (ox2 >= 0)
                              & (oz2 < 2 * so[0]) & (oy2 < 2 * so[1])
                              & (ox2 < 2 * so[2]))
                        c = torch.stack([idx[:, 0].long(), oz2 // 2,
                                         oy2 // 2, ox2 // 2], 1)[ok]
                        cand.append(c)
            cand = torch.cat(cand, 0)
            flat = ((cand[:, 0] * so[0] + cand[:, 1]) * so[1]
                    + cand[:, 2]) * so[2] + cand[:, 3]
            uniq = torch.unique(flat, sorted=True)
            b = uniq // (so[0] * so[1] * so[2])
            rem = uniq % (so[0] * so[1] * so[2])
            oz = rem // (so[1] * so[2])
            oy = (rem // so[2]) % so[1]
            ox = rem % so[2]
            out_idx = torch.stack([b, oz, oy, ox], 1).to(torch.int32)

            grid = x.grid()
            feats = x.features
            zero = torch.zeros(1, feats.shape[1], dtype=feats.dtype)
            feats_pad = torch.cat([feats, zero], 0)
            out = None
            for kz in (0, 1, 2):
                iz = out_idx[:, 1].long() * 2 + kz - 1
                for ky in (0, 1, 2):
                    iy = out_idx[:, 2].long() * 2 + ky - 1
                    for kx in (0, 1, 2):
                        ix = out_idx[:, 3].long() * 2 + kx - 1
                        ok = ((iz >= 0) & (iz < D) & (iy >= 0) & (iy < H)
                              & (ix >= 0) & (ix < W))
                        flat_in = ((out_idx[:, 0].long() * D
                                    + iz.clamp(0, D - 1)) * H
                                   + iy.clamp(0, H - 1)) * W + ix.clamp(0, W - 1)
                        nid = grid[flat_in]
                        nid = torch.where(ok & (nid >= 0), nid,
                                          torch.full_like(nid, len(feats)))
                        w = self.weight[:, kz, ky, kx, :]
                        contrib = feats_pad[nid] @ w.T
                        out = contrib if out is None else out + contrib
            if self.bias is not None:
                out = out + self.bias
            return SparseConvTensor(out, out_idx, so, x.batch_size)

    class SparseSequential(nn.Module):
        def __init__(self, *modules):
            super().__init__()
            for i, m in enumerate(modules):
                self.add_module(str(i), m)

        def forward(self, x):
            for m in self._modules.values():
                if isinstance(m, (SubMConv3d, SparseConv3d, SparseSequential)):
                    x = m(x)
                else:
                    x = x.replace_features(m(x.features))
            return x

    mod = types.ModuleType("spconv.pytorch")
    # pickle resolves classes by (__module__, __qualname__): give the fakes
    # the identities the REAL spconv classes ship with, so a snapshot of a
    # model built on the fakes round-trips exactly like a released
    # checkpoint built on real spconv (persistence pickles the library
    # layers by class path, not by source)
    for _cls in (SparseConvTensor, SubMConv3d, SparseConv3d,
                 SparseSequential):
        _cls.__module__ = "spconv.pytorch"
        _cls.__qualname__ = _cls.__name__
    mod.SparseConvTensor = SparseConvTensor
    mod.SubMConv3d = SubMConv3d
    mod.SparseConv3d = SparseConv3d
    mod.SparseSequential = SparseSequential
    core = types.ModuleType("spconv.core")
    core.SparseConvTensor = SparseConvTensor
    mod.core = core
    root = types.ModuleType("spconv")
    root.pytorch = mod
    root.core = core
    return {"spconv": root, "spconv.pytorch": mod, "spconv.core": core}


# ---------------------------------------------------------------------------
# environment patching


def install_reference_modules():
    """Put the reference tree + fake native deps on sys.path/sys.modules."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    fakes = {**_make_fake_pytorch3d(), **_make_fake_spconv()}
    try:
        import torchvision  # noqa: F401
    except ImportError:
        fakes.update(_make_fake_torchvision())
    for name, mod in fakes.items():
        sys.modules.setdefault(name, mod)


def patch_torch_cpu():
    """Neutralize the reference's hard-coded CUDA pins (renderer.py:52,284,
    628-666 `.cuda()` calls) so its forward runs on CPU.  Idempotent."""
    import torch

    if getattr(torch, "_sherf_cpu_patched", False):
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.current_device = lambda: 0
    torch._sherf_cpu_patched = True


def write_reference_smpl_pickle(model, path: str):
    """Serialize an SMPLModel to the reference's ``SMPL_NEUTRAL.pkl`` schema
    (consumed by ``read_pickle``/``SMPL_to_tensor``, renderer.py:34-74, and
    ``smpl/smpl_numpy.py:24-35``)."""
    import scipy.sparse as sp

    data = {
        "J_regressor": sp.csr_matrix(np.asarray(model.J_regressor)),
        "weights": np.asarray(model.weights).astype(np.float64),
        "posedirs": np.asarray(model.posedirs).astype(np.float64),
        "v_template": np.asarray(model.v_template).astype(np.float64),
        "shapedirs": np.asarray(model.shapedirs).astype(np.float64),
        "f": np.asarray(model.faces).astype(np.int64),
        "kintree_table": np.stack([
            np.concatenate([[2 ** 32 - 1],
                            np.asarray(model.parents)[1:]]).astype(np.int64),
            np.arange(24, dtype=np.int64),
        ]),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=2)


@contextlib.contextmanager
def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def default_rendering_kwargs(depth_resolution: int = 48,
                             white_back: bool = False,
                             density_noise: float = 0.0) -> Dict:
    """The shipped human-config rendering_kwargs (train.py:328-351)."""
    return {
        "image_resolution": 512,
        "disparity_space_sampling": False,
        "clamp_mode": "relu",
        "superresolution_module":
            "training.superresolution.SuperresolutionHybrid8XDC",
        "white_back": white_back,
        "c_gen_conditioning_zero": True,
        "gpc_reg_prob": None,
        "c_scale": 1.0,
        "superresolution_noise_mode": "none",
        "density_reg": 0.25,
        "density_reg_p_dist": 0.004,
        "density_noise": density_noise,
        "reg_type": "l1",
        "decoder_lr_mul": 1.0,
        "sr_antialias": True,
        "depth_resolution": depth_resolution,
        "depth_resolution_importance": 0,
        "box_warp": 1.0,
    }


def load_reference_generator(smpl_model, workdir: str,
                             use_nerf_decoder: bool = True,
                             use_trans: bool = True,
                             use_1d_feature: bool = True,
                             use_2d_feature: bool = True,
                             use_3d_feature: bool = True,
                             rendering_kwargs: Optional[Dict] = None,
                             seed: int = 0,
                             backbone_resolution: int = 256):
    """Construct the reference ``TriPlaneGenerator`` on CPU.

    Writes ``workdir/assets/SMPL_NEUTRAL.pkl`` from ``smpl_model`` (the
    renderer ctor loads it relative to cwd, renderer.py:283), installs the
    CPU stand-ins, and returns the generator in eval mode.

    ``backbone_resolution``: the reference hardcodes the StyleGAN2 triplane
    backbone at 256 (triplane.py:59); tests shrink it (the backbone is
    weight-layout-identical at any power-of-two size).
    """
    install_reference_modules()
    patch_torch_cpu()
    import torch

    write_reference_smpl_pickle(
        smpl_model, os.path.join(workdir, "assets", "SMPL_NEUTRAL.pkl"))

    import torchvision.models

    import torch_utils.persistence as persistence_mod

    import training.triplane as triplane_mod
    import training.volumetric_rendering.renderer as renderer_mod

    # the persistence ctor check pickles every submodule (persistence.py:233);
    # the fake spconv stand-ins are deliberately unpicklable local classes —
    # parity runs never snapshot the reference module, so skip the check
    persistence_mod._check_pickleable = lambda obj: None

    # no egress: replace the pretrained-weight download (triplane.py:323)
    triplane_mod.resnet18 = (
        lambda *a, **k: torchvision.models.resnet18(weights=None))
    if backbone_resolution != 256:
        orig_backbone = triplane_mod.StyleGAN2Backbone

        def _sized_backbone(z_dim, c_dim, w_dim, img_resolution=256, **kw):
            return orig_backbone(z_dim, c_dim, w_dim,
                                 img_resolution=backbone_resolution, **kw)

        triplane_mod.StyleGAN2Backbone = _sized_backbone
    # the renderer ctor pins SMPL constants to CUDA (renderer.py:284)
    _orig_to_tensor = renderer_mod.SMPL_to_tensor

    def _cpu_to_tensor(params, device=None):
        return _orig_to_tensor(params, torch.device("cpu"))

    renderer_mod.SMPL_to_tensor = _cpu_to_tensor

    torch.manual_seed(seed)
    rk = rendering_kwargs or default_rendering_kwargs()
    with _chdir(workdir):
        # c_dim=0 and fused_modconv_default as in the production config
        # (training_loop.py:192, train.py:280,312,427-428)
        G = triplane_mod.TriPlaneGenerator(
            z_dim=512, c_dim=0, w_dim=512,
            use_1d_feature=use_1d_feature, use_2d_feature=use_2d_feature,
            use_3d_feature=use_3d_feature,
            use_trans=use_trans, use_NeRF_decoder=use_nerf_decoder,
            img_resolution=512, img_channels=3,
            mapping_kwargs={"num_layers": 2},
            fused_modconv_default="inference_only",
            num_fp16_res=0, conv_clamp=None,
            rendering_kwargs=rk)
    G.eval()
    # f32 end to end (training_loop disables TF32 similarly, :169-171)
    G.float()
    return G


def reference_input_from_batch(batch) -> Dict:
    """SHERFBatch (jnp, NHWC) -> the reference ``input_data`` dict (torch,
    NCHW, with the datasets' extra obs-view axis; THuman_dataset.py:399-428)."""
    import torch

    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))

    def img(x):  # (B, H, W, 3) -> (B, 1, 3, H, W)
        return t(x).permute(0, 3, 1, 2)[:, None]

    def pose_dict(p):
        return {
            "poses": t(p.poses)[:, None],      # (B, 1, 72)
            "shapes": t(p.shapes)[:, None],    # (B, 1, 10)
            "R": t(p.R),                        # (B, 3, 3)
            "Th": t(p.Th)[:, None],            # (B, 1, 3)
        }

    return {
        "t_params": pose_dict(batch.t_pose),
        "t_vertices": t(batch.t_vertices),
        "t_world_bounds": t(batch.t_bounds),
        "params": pose_dict(batch.pose),
        "vertices": t(batch.vertices),
        "img_all": img(batch.img),
        "ray_o_all": t(batch.ray_o)[:, None],
        "ray_d_all": t(batch.ray_d)[:, None],
        "near_all": t(batch.near)[:, None, :, None],
        "far_all": t(batch.far)[:, None, :, None],
        "mask_at_box_all": t(batch.mask_at_box)[:, None],
        "obs_params": pose_dict(batch.obs_pose),
        "obs_vertices": t(batch.obs_vertices),
        "obs_img_all": img(batch.obs_img),
        "obs_K_all": t(batch.obs_K)[:, None],
        "obs_R_all": t(batch.obs_R)[:, None],
        "obs_T_all": t(batch.obs_T)[:, None],
    }
