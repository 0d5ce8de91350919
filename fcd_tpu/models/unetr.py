"""UNETR: ViT encoder + convolutional decoder (MONAI UNETR equivalent).

Functional re-design of the configuration the reference selects
(get_model.py:96-112: hidden 768, mlp 1024, 12 heads, conv patch embed,
feature_size 16, res blocks, dropout 0.1): a 12-layer ViT over 16^3
patches whose hidden states at depths 3/6/9/12 feed deconv feature
pyramids and UNETR upsample blocks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fcd_tpu.ops.blocks import MLPBlock, UnetrBasicBlock, UnetrUpBlock
from fcd_tpu.ops.layers import Conv3d, ConvTranspose3d, Dense, LayerNorm


class _SelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, N, C = x.shape
        h = self.num_heads
        c = C // h
        qkv = Dense(3 * C, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, h, c)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))  # (B,h,N,c)
        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k) / jnp.sqrt(jnp.float32(c)).astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        out = Dense(C, dtype=self.dtype)(out)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(out)


class _ViTBlock(nn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x + _SelfAttention(self.hidden_size, self.num_heads, self.dropout_rate,
                               self.dtype)(LayerNorm()(x), train=train)
        x = x + MLPBlock(self.mlp_dim, self.dropout_rate, self.dtype)(
            LayerNorm()(x), train=train)
        return x


class UNETR(nn.Module):
    out_channels: int = 2
    img_size: Tuple[int, int, int] = (128, 128, 128)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 1024
    num_heads: int = 12
    num_layers: int = 12
    patch: int = 16
    norm_name: str = "instance"
    res_block: bool = True
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B = x.shape[0]
        grid = tuple(s // self.patch for s in self.img_size)
        n_tokens = grid[0] * grid[1] * grid[2]

        # conv patch embedding (proj_type='conv')
        tokens = Conv3d(self.hidden_size, kernel_size=self.patch, stride=self.patch,
                        use_bias=True, dtype=self.dtype)(x)
        tokens = tokens.reshape(B, n_tokens, self.hidden_size)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n_tokens, self.hidden_size))
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.dropout_rate, deterministic=not train)(tokens)

        hidden = []
        for i in range(self.num_layers):
            tokens = _ViTBlock(self.hidden_size, self.mlp_dim, self.num_heads,
                               self.dropout_rate, self.dtype)(tokens, train=train)
            hidden.append(tokens)

        def feat(t):
            return t.reshape(B, *grid, self.hidden_size)

        fs = self.feature_size

        def deconv_stack(t, out_ch, n_up):
            """hidden state -> conv pyramid: an initial deconv to out_ch, then
            (n_up - 1) x (deconv + basic block) (MONAI UnetrPrUpBlock with
            conv_block=True, res_block=True)."""
            y = ConvTranspose3d(out_ch, 2, 2, use_bias=False, dtype=self.dtype)(feat(t))
            for _ in range(n_up - 1):
                y = ConvTranspose3d(out_ch, 2, 2, use_bias=False, dtype=self.dtype)(y)
                y = UnetrBasicBlock(
                    out_channels=out_ch, kernel_size=3, stride=1,
                    norm_name=self.norm_name, res_block=self.res_block,
                    use_bias=False, dtype=self.dtype,
                )(y, train=train)
            return y

        enc1 = UnetrBasicBlock(out_channels=fs, kernel_size=3, stride=1,
                               norm_name=self.norm_name, res_block=self.res_block,
                               use_bias=False, dtype=self.dtype)(x, train=train)
        enc2 = deconv_stack(hidden[2], fs * 2, 3)   # z3 -> /2 resolution
        enc3 = deconv_stack(hidden[5], fs * 4, 2)   # z6 -> /4
        enc4 = deconv_stack(hidden[8], fs * 8, 1)   # z9 -> /8
        bottleneck = feat(hidden[11])               # z12 at /16

        def up(inp, skip, out_ch):
            return UnetrUpBlock(
                out_channels=out_ch, kernel_size=3, upsample_kernel_size=2,
                norm_name=self.norm_name, res_block=self.res_block,
                use_bias=False, dtype=self.dtype,
            )(inp, skip, train=train)

        d4 = up(bottleneck, enc4, fs * 8)
        d3 = up(d4, enc3, fs * 4)
        d2 = up(d3, enc2, fs * 2)
        d1 = up(d2, enc1, fs)
        return Conv3d(self.out_channels, 1, 1, use_bias=True, dtype=self.dtype)(d1)
