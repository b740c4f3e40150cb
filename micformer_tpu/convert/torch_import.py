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


# ---------------------------------------------------------------------------
# VT-Unet: 2D-Swin pretrained-checkpoint inflation (load_from parity)
# ---------------------------------------------------------------------------

def inflate_patch_embed_2d_to_3d(w2d: np.ndarray, kd: int, in_channels: int) -> np.ndarray:
    """2D Swin patch-embed conv [E, C2d, kh, kw] -> flax 3D kernel
    [kd, kh, kw, in_channels, E].

    Channel adaptation: average the pretrained input channels (RGB) into one
    filter and replicate it per target modality; depth inflation: replicate
    over kd and divide by kd so a depth-constant input reproduces the 2D
    response (I3D 'mean' inflation)."""
    w2d = np.asarray(w2d)
    E, _, kh, kw = w2d.shape
    gray = w2d.mean(axis=1, keepdims=True)                    # [E, 1, kh, kw]
    w = np.repeat(gray, in_channels, axis=1)                  # [E, in, kh, kw]
    w3d = np.repeat(w[:, :, None], kd, axis=2) / float(kd)    # [E, in, kd, kh, kw]
    return np.ascontiguousarray(w3d.transpose(2, 3, 4, 1, 0))


def inflate_rel_pos_table_2d_to_3d(table2d: np.ndarray, window_size) -> np.ndarray | None:
    """2D rel-pos bias table [(2wh-1)(2ww-1), h] -> 3D
    [(2wd-1)(2wh-1)(2ww-1), h] by replicating across the depth-delta axis
    (the Video-Swin inflation rule for additive biases). Returns None when the
    2D table does not factor as (2wh-1)(2ww-1) of the target window."""
    t = np.asarray(table2d)
    wd, wh, ww = window_size
    nh, nw = 2 * wh - 1, 2 * ww - 1
    if t.shape[0] != nh * nw:
        return None
    t = t.reshape(nh, nw, -1)
    t3 = np.broadcast_to(t[None], (2 * wd - 1, nh, nw, t.shape[-1]))
    return np.ascontiguousarray(t3.reshape((2 * wd - 1) * nh * nw, -1))


def _set_if_match(params, path, value, report):
    """Overwrite params[path...] when shapes agree (the reference load_from
    deletes shape-mismatched keys, vision_transformer.py:75-80)."""
    node = params
    for k in path[:-1]:
        if not isinstance(node, dict) or k not in node:
            report["missing"].append("/".join(path))
            return
        node = node[k]
    leaf = path[-1]
    if not isinstance(node, dict) or leaf not in node:
        report["missing"].append("/".join(path))
        return
    if tuple(np.shape(node[leaf])) != tuple(np.shape(value)):
        report["skipped"].append(
            f"{'/'.join(path)}: ckpt{tuple(np.shape(value))} != "
            f"model{tuple(np.shape(node[leaf]))}")
        return
    node[leaf] = np.asarray(value, dtype=np.asarray(node[leaf]).dtype)
    report["loaded"].append("/".join(path))


def vtunet_params_from_swin2d(state_dict, params, *, depths=(2, 2, 2, 1),
                              window_size=(7, 7, 7), patch_size=(4, 4, 4),
                              in_channels: int = 2):
    """Inflate a 2D Swin-Transformer checkpoint into flax VT-UNet params.

    Reference semantics (VT-Unet/vtunet/vision_transformer.py:52-86 load_from):
      - unwrap ckpt['model'] upstream; keys follow the official 2D Swin naming
        (patch_embed.proj, layers.{i}.blocks.{b}.{norm1,attn.qkv,attn.proj,
        attn.relative_position_bias_table,norm2,mlp.fc1,mlp.fc2}, norm).
      - encoder weights are MIRRORED into the decoder: layers.X ->
        layers_up.(3-X) (here: enc{i}_b{b} -> dec{n-1-i}_b{b}).
      - shape-mismatched tensors are dropped (non-strict load).
    Beyond the reference (which drops all 2D<->3D mismatches), genuinely 2D
    tensors are INFLATED: patch-embed conv by depth-replication/kd, rel-pos
    bias tables by depth-delta replication — so a 2D-pretrained encoder
    actually initializes the 3D model instead of silently loading nothing.

    Args:
      state_dict: torch state_dict (or numpy mapping) of the 2D checkpoint.
      params: flax params tree from VTUNet.init (mutated copy returned).
    Returns (params, report) with report = {loaded, skipped, missing} lists.
    """
    import copy as _copy

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params = _copy.deepcopy(params)
    report = {"loaded": [], "skipped": [], "missing": []}
    n = len(depths)

    if "patch_embed.proj.weight" in sd:
        _set_if_match(
            params, ("patch_embed", "Conv_0", "kernel"),
            inflate_patch_embed_2d_to_3d(sd["patch_embed.proj.weight"],
                                         patch_size[0], in_channels), report)
        if "patch_embed.proj.bias" in sd:
            _set_if_match(params, ("patch_embed", "Conv_0", "bias"),
                          sd["patch_embed.proj.bias"], report)
        if "patch_embed.norm.weight" in sd:
            _set_if_match(params, ("patch_embed", "LayerNorm_0", "scale"),
                          sd["patch_embed.norm.weight"], report)
            _set_if_match(params, ("patch_embed", "LayerNorm_0", "bias"),
                          sd["patch_embed.norm.bias"], report)
    if "norm.weight" in sd:
        _set_if_match(params, ("norm", "scale"), sd["norm.weight"], report)
        _set_if_match(params, ("norm", "bias"), sd["norm.bias"], report)

    def load_block(src_prefix, dst_block):
        p = src_prefix
        if p + ".norm1.weight" not in sd:
            return
        _set_if_match(params, (dst_block, "norm1", "scale"), sd[p + ".norm1.weight"], report)
        _set_if_match(params, (dst_block, "norm1", "bias"), sd[p + ".norm1.bias"], report)
        _set_if_match(params, (dst_block, "norm2", "scale"), sd[p + ".norm2.weight"], report)
        _set_if_match(params, (dst_block, "norm2", "bias"), sd[p + ".norm2.bias"], report)
        _set_if_match(params, (dst_block, "attn", "qkv", "kernel"),
                      linear_kernel(sd[p + ".attn.qkv.weight"]), report)
        if p + ".attn.qkv.bias" in sd:
            _set_if_match(params, (dst_block, "attn", "qkv", "bias"),
                          sd[p + ".attn.qkv.bias"], report)
        _set_if_match(params, (dst_block, "attn", "proj", "kernel"),
                      linear_kernel(sd[p + ".attn.proj.weight"]), report)
        _set_if_match(params, (dst_block, "attn", "proj", "bias"),
                      sd[p + ".attn.proj.bias"], report)
        tkey = p + ".attn.relative_position_bias_table"
        if tkey in sd:
            t3 = inflate_rel_pos_table_2d_to_3d(sd[tkey], window_size)
            if t3 is None:
                report["skipped"].append(f"{dst_block}/rel_pos_bias_table: "
                                         f"2D table {sd[tkey].shape} does not "
                                         f"factor for window {window_size}")
            else:
                _set_if_match(params, (dst_block, "attn", "rel_pos_bias_table"),
                              t3, report)
        _set_if_match(params, (dst_block, "mlp", "Dense_0", "kernel"),
                      linear_kernel(sd[p + ".mlp.fc1.weight"]), report)
        _set_if_match(params, (dst_block, "mlp", "Dense_0", "bias"),
                      sd[p + ".mlp.fc1.bias"], report)
        _set_if_match(params, (dst_block, "mlp", "Dense_1", "kernel"),
                      linear_kernel(sd[p + ".mlp.fc2.weight"]), report)
        _set_if_match(params, (dst_block, "mlp", "Dense_1", "bias"),
                      sd[p + ".mlp.fc2.bias"], report)

    for i in range(n):
        for b in range(depths[i]):
            src = f"layers.{i}.blocks.{b}"
            load_block(src, f"enc{i}_b{b}")
            # encoder -> decoder mirror (load_from: layers.X -> layers_up.(3-X))
            inx = n - 1 - i
            if inx >= 1:
                load_block(src, f"dec{inx}_b{b}")
    return params, report


# ---------------------------------------------------------------------------
# Generic non-strict pretrained-weight transfer (nnU-Net load_pretrained_weights)
# ---------------------------------------------------------------------------

def load_pretrained_params(params, pretrained, skip_heads: bool = True,
                           head_markers=("seg", "head", "out_conv")):
    """nnU-Net `run/load_pretrained_weights.py` semantics for flax trees:
    copy every leaf whose path exists in `pretrained` with a matching shape;
    segmentation heads are NOT transferred by default ("THIS DOES NOT
    TRANSFER SEGMENTATION HEADS!"). Returns (params, report).

    Both arguments are nested param dicts (e.g. restored from another run's
    orbax checkpoint, possibly trained with a different num_classes).
    """
    import copy as _copy

    out = _copy.deepcopy(params)
    report = {"loaded": [], "skipped": [], "missing": []}

    def walk(dst, src, path):
        for key, dval in dst.items():
            p = path + (key,)
            if isinstance(dval, dict):
                if isinstance(src.get(key), dict):
                    walk(dval, src[key], p)
                else:
                    report["missing"].append("/".join(p))
                continue
            if skip_heads and any(m in seg for seg in p for m in head_markers):
                report["skipped"].append("/".join(p) + ": head (not transferred)")
                continue
            sval = src.get(key)
            if sval is None:
                report["missing"].append("/".join(p))
            elif tuple(np.shape(sval)) != tuple(np.shape(dval)):
                report["skipped"].append(
                    f"{'/'.join(p)}: ckpt{tuple(np.shape(sval))} != "
                    f"model{tuple(np.shape(dval))}")
            else:
                dst[key] = np.asarray(sval, dtype=np.asarray(dval).dtype)
                report["loaded"].append("/".join(p))

    walk(out, pretrained, ())
    return out, report
