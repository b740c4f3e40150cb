"""torch -> flax weight transplantation.

Two jobs (VERDICT round-1 items 3 & 8):
  1. Parity evidence: load the reference PyTorch MicFormer
     (MicFormer/models/MICFormer_self.py:881-1055), transplant its state_dict
     into the flax MicFormer, and assert the forward logits match —
     tests/test_torch_parity.py. This converts "studied, not translated"
     from a claim into a measurement.
  2. Pretrained-weight import: the same mapping layer lets users bring torch
     checkpoints (reference training runs, VT-Unet load_from-style inflation)
     into this framework.

Kernel layout rules (validated numerically on the CPU backend):
  - Linear:          flax kernel [in, out]        = W.T
  - LayerNorm:       scale = weight, bias = bias
  - Conv3d:          flax kernel [kd,kh,kw,in,out] = W.transpose(2,3,4,1,0)
                     (torch W is [out, in, kd, kh, kw]; both correlate)
  - ConvTranspose3d: flax ConvTranspose (transpose_kernel=False) correlates
                     the zero-dilated input with its kernel AS IS, while torch
                     places the kernel un-flipped — so the torch weight
                     [in, out, kd, kh, kw] must be SPATIALLY FLIPPED:
                     flax kernel = W[:, :, ::-1, ::-1, ::-1].transpose(2,3,4,0,1)
  - Conv3x3ViaDot:   kernel [27, in, out]; tap i = dz*9 + dy*3 + dx equals
                     torch W[:, :, dz, dy, dx].T (same correlation indexing).
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# primitive kernel conversions
# ---------------------------------------------------------------------------

def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear.weight [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d.weight [out, in, kd, kh, kw] -> flax [kd, kh, kw, in, out]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 4, 1, 0))


def conv_transpose3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d.weight [in, out, kd, kh, kw] ->
    flax ConvTranspose kernel [kd, kh, kw, in, out] (spatially flipped)."""
    w = np.asarray(w)[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 0, 1))


def conv3x3_via_dot_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d.weight [out, in, 3, 3, 3] -> Conv3x3ViaDot [27, in, out]."""
    w = np.asarray(w)
    out_c, in_c = w.shape[:2]
    taps = np.empty((27, in_c, out_c), w.dtype)
    i = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                taps[i] = w[:, :, dz, dy, dx].T
                i += 1
    return taps


# ---------------------------------------------------------------------------
# reference-model loading (timm is not installed; shim the one symbol used)
# ---------------------------------------------------------------------------

def _install_timm_shim():
    """The reference imports `from timm.models.layers import DropPath`
    (MICFormer_self.py:5). timm is not in this image; provide a functional
    stand-in (identity at eval — parity tests run in eval mode)."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_reference_micformer(reference_root: str = "/root/reference",
                             embed_dim: int = 48, num_classes: int = 8,
                             window_size=(2, 2, 2)):
    """Instantiate the reference torch Head (MICFormer_self.py:1042-1055).

    Imports the UNTRUSTED reference module read-only for numeric comparison.
    Returns the torch module in eval mode.
    """
    import importlib.util
    import os

    _install_timm_shim()
    models_dir = os.path.join(reference_root, "MicFormer", "models")

    # load STN first so MICFormer_self's `from .STN import ...` resolves:
    # register both under a synthetic package name.
    pkg_name = "_ref_micformer_models"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [models_dir]
        sys.modules[pkg_name] = pkg
    for mod_name in ("STN", "MICFormer_self"):
        full = f"{pkg_name}.{mod_name}"
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(models_dir, mod_name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)

    Head = sys.modules[f"{pkg_name}.MICFormer_self"].Head
    model = Head(n_channels=1, embed_dim=embed_dim, num_classes=num_classes,
                 window_size=tuple(window_size))
    return model.eval()


# ---------------------------------------------------------------------------
# MicFormer state_dict -> flax params
# ---------------------------------------------------------------------------

def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _dense(sd, prefix):
    out = {"kernel": linear_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _self_block(sd, p):
    """TransformerBlock3D -> SwinBlock3D params (fused qkv from separate q/kv:
    flax splits qkv thirds in order q, k, v; torch kv rows are [k; v])."""
    qw = np.asarray(sd[p + ".self_attn.q.weight"])
    kvw = np.asarray(sd[p + ".self_attn.kv.weight"])
    qb = np.asarray(sd[p + ".self_attn.q.bias"])
    kvb = np.asarray(sd[p + ".self_attn.kv.bias"])
    qkv_w = np.concatenate([qw, kvw], axis=0)  # [3C, C]
    qkv_b = np.concatenate([qb, kvb], axis=0)
    return {
        "LayerNorm_0": _ln(sd, p + ".norm1"),
        "attn": {
            "qkv": {"kernel": linear_kernel(qkv_w), "bias": qkv_b},
            "proj": _dense(sd, p + ".self_attn.proj"),
        },
        "LayerNorm_1": _ln(sd, p + ".norm2"),
        "Mlp_0": {
            "Dense_0": _dense(sd, p + ".mlp.fc1"),
            "Dense_1": _dense(sd, p + ".mlp.fc2"),
        },
    }


def _cross_block(sd, p):
    """CrossTransformerBlock3D -> CrossBlock3D params."""
    return {
        "norm1": _ln(sd, p + ".norm1"),
        "offset_conv1": {
            "kernel": conv3x3_via_dot_kernel(sd[p + ".conv_offset.0.weight"]),
            "bias": np.asarray(sd[p + ".conv_offset.0.bias"]),
        },
        "offset_norm": _ln(sd, p + ".conv_offset.1.norm"),
        "offset_conv2": {"kernel": conv3d_kernel(sd[p + ".conv_offset.3.weight"])},
        "cross_attn": {
            "q": _dense(sd, p + ".cross_attn.q"),
            "kv": _dense(sd, p + ".cross_attn.kv"),
            "proj": _dense(sd, p + ".cross_attn.proj"),
        },
        "norm2": _ln(sd, p + ".norm2"),
        "mlp": {
            "Dense_0": _dense(sd, p + ".mlp.fc1"),
            "Dense_1": _dense(sd, p + ".mlp.fc2"),
        },
    }


def _dual_stage(sd, p, depth, resample_key=None):
    """BasicLayer -> DualStreamStage params."""
    out = {}
    for d in range(depth):
        out[f"self1_{d}"] = _self_block(sd, f"{p}.self_blocks1.{d}")
        out[f"self2_{d}"] = _self_block(sd, f"{p}.self_blocks2.{d}")
        out[f"cross1_{d}"] = _cross_block(sd, f"{p}.blocks1.{d}")
        out[f"cross2_{d}"] = _cross_block(sd, f"{p}.blocks2.{d}")
    if resample_key == "merge":
        out["downsample"] = {
            "Conv_0": {"kernel": conv3d_kernel(sd[p + ".downsample.down_conv.weight"]),
                       "bias": np.asarray(sd[p + ".downsample.down_conv.bias"])},
            "LayerNorm_0": _ln(sd, p + ".downsample.norm"),
        }
    elif resample_key == "expand":
        out["upsample"] = {
            "ConvTranspose_0": {
                "kernel": conv_transpose3d_kernel(sd[p + ".downsample.up_conv.weight"]),
                "bias": np.asarray(sd[p + ".downsample.up_conv.bias"])},
            "LayerNorm_0": _ln(sd, p + ".downsample.norm"),
        }
    return out


def micformer_params_from_torch(state_dict, depths=(2, 2, 6, 2)):
    """Reference Head state_dict -> flax MicFormer params tree.

    state_dict keys follow MICFormer_self.py:881-1055 (swin.* + out_conv.*).
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}
    n = len(depths)
    params = {
        "patch_embed": {"Conv_0": {
            "kernel": conv3d_kernel(sd["swin.patch_embed.proj.weight"]),
            "bias": np.asarray(sd["swin.patch_embed.proj.bias"]),
        }},
        "norm": _ln(sd, "swin.norm"),
        "norm2": _ln(sd, "swin.norm2"),
        "reverse_patch_embed": {
            "kernel": conv_transpose3d_kernel(sd["swin.reverse_patch_embedding.weight"]),
            "bias": np.asarray(sd["swin.reverse_patch_embedding.bias"]),
        },
        "out_conv": {
            "kernel": conv3d_kernel(sd["out_conv.weight"]),
            "bias": np.asarray(sd["out_conv.bias"]),
        },
    }
    for i in range(n):
        params[f"enc{i}"] = _dual_stage(
            sd, f"swin.layers.{i}", depths[i],
            resample_key="merge" if i < n - 1 else None)
    for inx, i in enumerate(reversed(range(n))):
        params[f"dec{inx}"] = _dual_stage(
            sd, f"swin.up_layers.{inx}", depths[i],
            resample_key="expand" if i > 0 else None)
        if inx > 0:
            params[f"concat_back{inx}"] = _dense(sd, f"swin.concat_back_dim.{inx}")
    return params
