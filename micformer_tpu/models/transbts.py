"""TransBTS — conv U-Net encoder + ViT bottleneck + conv-cascade decoder.

Behavioral parity with reference TransBTS/TransBTS/ (TransBTS.py,
Transformer.py, Unet_skipconnection.py), studied not translated:
  - Unet encoder (Unet_skipconnection.py): InitConv(in->16, k3, dropout 0.2),
    pre-act GroupNorm residual EnBlocks, stride-2 conv EnDowns; taps
    x1_1 (16@full), x2_1 (32@1/2), x3_1 (64@1/4), x (128@1/8).
  - encode (TransBTS.py:79-111): BN+ReLU+conv k3 (128->512) -> flatten to
    tokens -> LEARNED positional embedding -> dropout -> 4 pre-LN ViT blocks
    (heads 8, mlp 4096, dropout 0.1); decode consumes the LAST block's output
    (intmd 'Z4', :206-215) — the pre_head_ln'd final output is unused there.
  - decode (:155-238): reshape tokens -> 512@1/8 -> EnBlock1 (512->128
    double conv, NO residual) -> EnBlock2 (residual) -> 3x (DeUp_Cat: 1³ conv
    -> transpose k2 s2 -> concat skip -> 1³ conv; DeBlock residual) ->
    1³ conv head -> SOFTMAX (the reference emits probabilities, :231 — kept
    behind `softmax_output`, default True for parity).
  - MM-WHS config (TransBTS/train_mmwhs_noPad.py:92-103): img 128, channels 2,
    classes 8, embed 512, heads 8, layers 4, hidden 4096, dropout 0.1.

Norm equivalence note: the reference mixes GroupNorm (encoder) and
BatchNorm3d (decoder); at the reference batch size (1) BatchNorm train-mode
statistics reduce over spatial dims only, i.e. InstanceNorm — implemented as
InstanceNorm(affine) to keep the step functional (no mutable batch stats).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from micformer_tpu.models.layers import InstanceNorm, Mlp, to_channels_last, to_channels_first
from micformer_tpu.ops.attention import multi_head_attention, split_heads, merge_heads
from micformer_tpu import registry


def _gn(x, dtype, name=None, groups=8):
    return nn.GroupNorm(epsilon=1e-5, num_groups=min(groups, x.shape[-1]), dtype=dtype, name=name)(x)


class EnBlock(nn.Module):
    """Pre-act residual: GN -> ReLU -> conv -> GN -> ReLU -> conv + x."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = _gn(x, self.dtype)
        h = nn.relu(h)
        h = nn.Conv(C, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        h = _gn(h, self.dtype)
        h = nn.relu(h)
        h = nn.Conv(C, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        return h + x


class ViTBlock(nn.Module):
    dim: int
    heads: int
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        # pre-LN self-attention over [B, N, C]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        q, k, v = (split_heads(t, self.heads) for t in jnp.split(qkv, 3, axis=-1))
        a = merge_heads(multi_head_attention(q, k, v))
        a = nn.Dense(self.dim, dtype=self.dtype, name="proj")(a)
        a = nn.Dropout(self.dropout, deterministic=deterministic)(a)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = Mlp(self.hidden, self.dim, self.dropout, dtype=self.dtype)(h, deterministic)
        return x + h


class TransBTS(nn.Module):
    num_classes: int = 8
    base_channels: int = 16
    embedding_dim: int = 512
    num_heads: int = 8
    num_layers: int = 4
    hidden_dim: int = 4096
    dropout: float = 0.1
    softmax_output: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = to_channels_last(x)
        bc = self.base_channels

        # --- conv encoder with skips
        h = nn.Conv(bc, (3, 3, 3), padding=1, dtype=self.dtype, name="init_conv")(x)
        h = nn.Dropout(0.2, deterministic=deterministic)(h)
        x1 = EnBlock(dtype=self.dtype, name="en1")(h)
        h = nn.Conv(2 * bc, (3, 3, 3), strides=(2, 2, 2), padding=1,
                    dtype=self.dtype, name="down1")(x1)
        h = EnBlock(dtype=self.dtype, name="en2_1")(h)
        x2 = EnBlock(dtype=self.dtype, name="en2_2")(h)
        h = nn.Conv(4 * bc, (3, 3, 3), strides=(2, 2, 2), padding=1,
                    dtype=self.dtype, name="down2")(x2)
        h = EnBlock(dtype=self.dtype, name="en3_1")(h)
        x3 = EnBlock(dtype=self.dtype, name="en3_2")(h)
        h = nn.Conv(8 * bc, (3, 3, 3), strides=(2, 2, 2), padding=1,
                    dtype=self.dtype, name="down3")(x3)
        # stage 4 is FOUR residual blocks (Unet_skipconnection.py:88-92
        # EnBlock4_1..EnBlock4_4)
        h = EnBlock(dtype=self.dtype, name="en4_1")(h)
        h = EnBlock(dtype=self.dtype, name="en4_2")(h)
        h = EnBlock(dtype=self.dtype, name="en4_3")(h)
        h = EnBlock(dtype=self.dtype, name="en4_4")(h)

        # --- tokenize + ViT bottleneck
        B, D, H, W, _ = h.shape
        h = InstanceNorm(affine=True, dtype=self.dtype, name="pre_vit_norm")(h)
        h = nn.relu(h)
        h = nn.Conv(self.embedding_dim, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_x")(h)
        tokens = h.reshape(B, D * H * W, self.embedding_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, D * H * W, self.embedding_dim))
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout, deterministic=deterministic)(tokens)
        for i in range(self.num_layers):
            tokens = ViTBlock(self.embedding_dim, self.num_heads, self.hidden_dim,
                              self.dropout, dtype=self.dtype,
                              name=f"vit{i}")(tokens, deterministic)

        # --- decode (Z4, no pre-head LN: TransBTS.py:206-215)
        h = tokens.reshape(B, D, H, W, self.embedding_dim)
        e = self.embedding_dim
        # EnBlock1: 512 -> 128 double conv (no residual)
        h = nn.Conv(e // 4, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(e // 4, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _res_de_block(h, self.dtype, "deblock8")

        for j, (cout, skip) in enumerate([(e // 8, x3), (e // 16, x2), (e // 32, x1)]):
            h = nn.Conv(cout, (1, 1, 1), dtype=self.dtype, name=f"deup{j}_c1")(h)
            h = nn.ConvTranspose(cout, (2, 2, 2), strides=(2, 2, 2), padding="VALID",
                                 dtype=self.dtype, name=f"deup{j}_up")(h)
            h = jnp.concatenate([skip, h], axis=-1)
            h = nn.Conv(cout, (1, 1, 1), dtype=self.dtype, name=f"deup{j}_c3")(h)
            h = _res_de_block(h, self.dtype, f"deblock{j}")

        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="endconv")(h)
        out = to_channels_first(out).astype(jnp.float32)
        if self.softmax_output:
            out = nn.softmax(out, axis=1)
        return out


class _DeBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.Conv(C, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(C, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        h = InstanceNorm(affine=True, dtype=self.dtype)(h)
        h = nn.relu(h)
        return h + x


def _res_de_block(h, dtype, name):
    return _DeBlock(dtype=dtype, name=name)(h)


@registry.register("transbts", num_classes=8)
def build_transbts(**kw):
    return TransBTS(**kw)
