"""Plan-driven Generic U-Net — the nnU-Net dynamic architecture, TPU-native.

Capability parity with the vendored nnU-Net `Generic_UNet`
(MedNeXt/nnunet_mednext/network_architecture/generic_UNet.py:167): the
architecture is not fixed — per-stage pooling kernels and conv kernels come
from the experiment plan (pipeline/planner.py), so anisotropic datasets get
anisotropic pool/kernel schedules, exactly like
`experiment_planner_baseline_3DUNet.get_properties_for_stage` output feeds
the torch model. Supports both 2D and 3D (kernel rank selects the case, like
nnU-Net's Generic_UNet conv_op argument).

Structure (generic_UNet.py defaults): conv_per_stage=2 blocks of
conv→InstanceNorm→LeakyReLU(1e-2), downsampling by strided first conv of the
next stage (default_3D strided-conv variant), transposed-conv upsampling,
skip concatenation, per-resolution 1x1 seg heads when deep supervision is on,
feature width doubling capped at 320 (3D) / 512 (2D).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import InstanceNorm, to_channels_last, to_channels_first
from micformer_tpu import registry


class ConvInLRelu(nn.Module):
    """conv → InstanceNorm → LeakyReLU(0.01) (generic_UNet ConvDropoutNormNonlin
    with nnU-Net defaults: no dropout, affine InstanceNorm, lrelu 1e-2)."""

    features: int
    kernel: tuple
    stride: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel)
        s = tuple(self.stride) if self.stride else (1,) * len(k)
        x = nn.Conv(self.features, k, strides=s, padding="SAME", dtype=self.dtype)(x)
        x = InstanceNorm(affine=True, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)


class GenericUNet(nn.Module):
    """Input [B, C, *spatial] (rank from kernel length), logits [B, K, *spatial].

    pool_kernels: per-downsampling-stage stride tuples (e.g. 5x (2,2,2)).
    conv_kernels: per-stage conv kernel tuples, len = len(pool_kernels)+1.
    """

    num_classes: int = 8
    base_num_features: int = 32
    pool_kernels: Sequence[tuple] = ((2, 2, 2),) * 5
    conv_kernels: Sequence[tuple] = ((3, 3, 3),) * 6
    conv_per_stage: int = 2
    max_features: int = 320
    deep_supervision: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert len(self.conv_kernels) == len(self.pool_kernels) + 1, (
            "need one conv kernel schedule per resolution stage")
        x = to_channels_last(x)
        n_stages = len(self.conv_kernels)

        def width(i):
            return min(self.base_num_features * 2 ** i, self.max_features)

        # encoder: stage 0 at full res; stages i>0 open with a strided conv
        # (the plan's pool kernel), nnU-Net strided-conv downsampling variant
        skips = []
        for i in range(n_stages):
            stride = tuple(self.pool_kernels[i - 1]) if i > 0 else None
            for c in range(self.conv_per_stage):
                x = ConvInLRelu(width(i), self.conv_kernels[i],
                                stride=stride if c == 0 else None,
                                dtype=self.dtype, name=f"enc{i}_conv{c}")(x)
            if i < n_stages - 1:
                skips.append(x)

        # decoder: transpose-conv up (kernel = the matching pool kernel),
        # concat skip, conv_per_stage blocks at the skip's width
        seg_outputs = []
        for j in range(n_stages - 2, -1, -1):
            up_k = tuple(self.pool_kernels[j])
            x = nn.ConvTranspose(width(j), up_k, strides=up_k, padding="VALID",
                                 dtype=self.dtype, name=f"up{j}")(x)
            x = jnp.concatenate([x, skips[j]], axis=-1)
            for c in range(self.conv_per_stage):
                x = ConvInLRelu(width(j), self.conv_kernels[j],
                                dtype=self.dtype, name=f"dec{j}_conv{c}")(x)
            if self.deep_supervision or j == 0:
                seg = nn.Conv(self.num_classes, (1,) * len(up_k), padding="VALID",
                              dtype=self.dtype, name=f"seg{j}")(x)
                seg_outputs.append(to_channels_first(seg).astype(jnp.float32))

        if self.deep_supervision:
            # highest resolution first (MultipleOutputLoss2 weighting order)
            return seg_outputs[::-1]
        return seg_outputs[-1]


def build_from_plan(plan: dict, num_classes: int | None = None,
                    deep_supervision: bool = False, dtype=jnp.float32):
    """Instantiate GenericUNet from an experiment plan (pipeline/planner.py
    plan_experiment output) — the consumer nnU-Net's plans files feed
    (generic_UNet.py:167 via nnUNetTrainerV2.process_plans)."""
    pools = tuple(tuple(p) for p in plan["pool_op_kernel_sizes"])
    convs = tuple(tuple(k) for k in plan["conv_kernel_sizes"])
    k = num_classes if num_classes is not None else len(plan.get("classes", [])) or 8
    ndim = len(convs[0])
    return GenericUNet(
        num_classes=k,
        base_num_features=plan.get("base_num_features", 32),
        pool_kernels=pools,
        conv_kernels=convs,
        max_features=320 if ndim == 3 else 512,
        deep_supervision=deep_supervision,
        dtype=dtype,
    )


@registry.register("generic_unet", num_classes=8)
def build_generic_unet(**kw):
    if "plan" in kw:
        plan = kw.pop("plan")
        return build_from_plan(plan, **kw)
    return GenericUNet(**kw)
