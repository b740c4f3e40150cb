"""3D U-Net — functional equivalent of the reference's MONAI UNet config.

Reference usage (Unet/train_mmwhs_noPad.py:92-93):
  monai.networks.nets.UNet(spatial_dims=3, in_channels=2, out_channels=8,
                           channels=(4, 8, 16, 32, 64), strides=(2, 2, 2, 2))
i.e. 5 levels, stride-2 conv downsampling, ConvTranspose upsampling, skip
concatenation, Conv->InstanceNorm->PReLU units, 1-voxel-resolution logits head.

TPU-first notes: channels-last NDHWC throughout; all shapes static; bf16
compute optional via `dtype` with f32 params.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import ConvNormAct, to_channels_last, to_channels_first
from micformer_tpu import registry


class UNet3D(nn.Module):
    num_classes: int = 8
    channels: Sequence[int] = (4, 8, 16, 32, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = to_channels_last(x)
        chs = list(self.channels)
        skips = []
        # encoder: stride-2 conv per level except the deepest
        for i, c in enumerate(chs[:-1]):
            x = ConvNormAct(c, kernel=3, stride=2 if i > 0 else 1, dtype=self.dtype,
                            name=f"down{i}")(x)
            skips.append(x)
        x = ConvNormAct(chs[-1], kernel=3, stride=2, dtype=self.dtype, name="bottom")(x)
        # decoder: transpose-conv up + skip concat + conv
        for i in reversed(range(len(chs) - 1)):
            x = ConvNormAct(chs[i], kernel=3, stride=2, transpose=True,
                            dtype=self.dtype, name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConvNormAct(chs[i], kernel=3, dtype=self.dtype, name=f"dec{i}")(x)
        x = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="head")(x)
        return to_channels_first(x).astype(jnp.float32)


@registry.register("unet3d", num_classes=8, channels=(4, 8, 16, 32, 64))
def build_unet3d(**kw):
    return UNet3D(**kw)
