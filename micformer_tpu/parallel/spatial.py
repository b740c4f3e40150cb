"""Spatial (single-forward) model parallelism — halo-exchange sharding.

The aux-subsystem slot SURVEY §5 reserves for volumes larger than one chip's
HBM: shard ONE forward pass over the mesh's 'space' axis by slabbing the D
(depth) dimension, exchanging 1-voxel conv halos between neighbor shards over
ICI (`jax.lax.ppermute`), and psum-ing InstanceNorm statistics so every shard
normalizes with the GLOBAL mean/var. Bit-for-bit equal to the single-device
forward (tests/test_spatial_parallel.py) — this is NOT overlap-blend tile
approximation (that engine lives in infer/sharded.py); it is the exact model.

Design notes (TPU-first):
  - halos ride `ppermute` (nearest-neighbor ICI traffic, no all-gather);
    edge shards receive zeros — ppermute's non-covered-destination semantics
    happen to equal SAME-conv zero padding exactly.
  - stride-s convs and k==s transposed convs stay shard-local provided every
    shard's local D is divisible by the stage's cumulative stride — the same
    divisibility nnU-Net plans guarantee globally (pool kernels 1 or 2).
  - built for models.generic_unet.GenericUNet (the plan-driven nnU-Net
    architecture): conv -> InstanceNorm -> LeakyReLU stages, strided-conv
    downsampling, transposed-conv upsampling, skip concat, 1x1 seg head.

Reference capability replaced (studied, not translated): the vendored
nnU-Net's `all in GPU` / fp16 fallbacks for big volumes
(neural_network.py:291-427) — the reference SHRINKS the problem; here the
problem shards across chips.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x, lo: int, hi: int, axis_name: str):
    """Pad the D axis (axis 1 of [B, D, H, W, C]) with neighbor slabs.

    Shard i receives the last `lo` voxels of shard i-1 and the first `hi`
    voxels of shard i+1; the first/last shards receive zeros (SAME-conv
    zero-padding parity via ppermute's zero-fill for uncovered destinations).
    """
    n = jax.lax.psum(1, axis_name)
    parts = []
    if lo:
        left = jax.lax.ppermute(x[:, -lo:], axis_name,
                                perm=[(i, i + 1) for i in range(n - 1)])
        parts.append(left)
    parts.append(x)
    if hi:
        right = jax.lax.ppermute(x[:, :hi], axis_name,
                                 perm=[(i + 1, i) for i in range(n - 1)])
        parts.append(right)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _same_pads(k: int, s: int):
    """XLA 'SAME' padding split for extents divisible by the stride:
    pad_total = max(k - s, 0), lo = total // 2 (so stride-2 k3 pads (0, 1) —
    NOT (1, 1); the halo amounts must match this split exactly)."""
    total = max(k - s, 0)
    lo = total // 2
    return lo, total - lo


def _conv(x, kernel, bias, stride, halo_padded_z: bool):
    """SAME conv with explicit pads; when the D axis is already halo-padded,
    its pad is 0 (the neighbors' voxels supply it)."""
    nd = kernel.ndim - 2
    spatial_pads = []
    for a in range(nd):
        lo, hi = _same_pads(kernel.shape[a], stride[a])
        if a == 0 and halo_padded_z:
            lo, hi = 0, 0
        spatial_pads.append((lo, hi))
    dn = ("NDHWC", "DHWIO", "NDHWC") if nd == 3 else ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=tuple(stride), padding=spatial_pads,
        dimension_numbers=dn)
    return out + bias


def _spatial_conv(x, kernel, bias, stride, axis_name):
    lo, hi = _same_pads(kernel.shape[0], stride[0])
    xp = halo_exchange(x, lo, hi, axis_name)
    return _conv(xp, kernel, bias, tuple(stride), True)


def _spatial_instance_norm(x, scale, bias, axis_name, eps=1e-5):
    """InstanceNorm with GLOBAL statistics: psum local sums over 'space'."""
    axes = tuple(range(1, x.ndim - 1))
    cnt = jax.lax.psum(jnp.asarray(float(np.prod(x.shape[1:-1])), x.dtype),
                       axis_name)
    s = jax.lax.psum(jnp.sum(x, axes), axis_name)          # [B, C]
    ss = jax.lax.psum(jnp.sum(x * x, axes), axis_name)
    mean = s / cnt
    var = ss / cnt - mean ** 2
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    return y * scale + bias


def _conv_in_lrelu(x, p, stride, axis_name):
    x = _spatial_conv(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                      stride, axis_name)
    x = _spatial_instance_norm(x, p["InstanceNorm_0"]["scale"],
                               p["InstanceNorm_0"]["bias"], axis_name)
    return jax.nn.leaky_relu(x, 0.01)


def _generic_unet_local_forward(params, x, pool_kernels, conv_kernels,
                                conv_per_stage, axis_name):
    """Shard-local GenericUNet forward on channels-last [B, D_local, H, W, C];
    mirrors models/generic_unet.py with spatial collectives."""
    n_stages = len(conv_kernels)
    skips = []
    for i in range(n_stages):
        stride = tuple(pool_kernels[i - 1]) if i > 0 else (1,) * len(conv_kernels[0])
        for c in range(conv_per_stage):
            s = stride if c == 0 else (1,) * len(stride)
            x = _conv_in_lrelu(x, params[f"enc{i}_conv{c}"], s, axis_name)
        if i < n_stages - 1:
            skips.append(x)

    for j in range(n_stages - 2, -1, -1):
        up_k = tuple(pool_kernels[j])
        pk = params[f"up{j}"]
        x = jax.lax.conv_transpose(
            x, pk["kernel"], strides=up_k, padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=False,
        ) + pk["bias"]
        x = jnp.concatenate([x, skips[j]], axis=-1)
        for c in range(conv_per_stage):
            x = _conv_in_lrelu(x, params[f"dec{j}_conv{c}"],
                               (1,) * len(up_k), axis_name)
    seg = params["seg0"]
    x = _conv(x, seg["kernel"], seg["bias"], (1,) * len(up_k), False)
    return x


def spatial_sharded_apply(model, variables, volume, mesh: Mesh,
                          axis: str = "space"):
    """Run ONE GenericUNet forward with the volume slabbed over mesh[axis].

    Args:
      model: models.generic_unet.GenericUNet (3D, deep_supervision=False).
      variables: the model's flax variables ({"params": ...}).
      volume: [B, C, D, H, W] with D divisible by
        mesh.shape[axis] * prod(pool z-strides) (per-shard stage alignment).
      mesh: jax Mesh containing `axis`.

    Returns [B, num_classes, D, H, W] logits, numerically equal to
    model.apply(variables, volume).
    """
    assert not model.deep_supervision, "spatial path serves inference heads"
    n = mesh.shape[axis]
    D = volume.shape[2]
    zstride = int(np.prod([p[0] for p in model.pool_kernels]))
    assert D % (n * zstride) == 0, (
        f"D={D} must divide shards({n}) x cumulative z-stride({zstride})")

    # replicate params onto the mesh: restored checkpoints arrive committed
    # to a single device, which shard_map rejects
    params = jax.device_put(variables["params"], NamedSharding(mesh, P()))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, axis)),
        out_specs=P(None, None, axis),
    )
    def run(params, vol):
        x = jnp.moveaxis(vol, 1, -1)  # channels-last, D is axis 1
        out = _generic_unet_local_forward(
            params, x,
            [tuple(p) for p in model.pool_kernels],
            [tuple(k) for k in model.conv_kernels],
            model.conv_per_stage, axis)
        return jnp.moveaxis(out, -1, 1).astype(jnp.float32)

    vol_sharded = jax.device_put(volume, NamedSharding(mesh, P(None, None, axis)))
    return run(params, vol_sharded)
