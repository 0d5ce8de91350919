"""UNETR++: efficient-paired-attention encoder/decoder.

TPU-native re-design of the reference port (networks/unetr_pp/unetr_pp.py:8-142,
model_components.py:13-148, transformerblock.py:7-130): a 4-stage
conv-downsample encoder (4x stem) where every stage is a stack of EPA
transformer blocks, sum-skip transposed-conv decoders with EPA stacks, and
an optional deep-supervision triple head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fcd_tpu.ops.attention import EPABlock
from fcd_tpu.ops.blocks import UnetResBlock
from fcd_tpu.ops.layers import Conv3d, ConvTranspose3d, GroupNorm


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


class UNETR_PP(nn.Module):
    out_channels: int = 2
    in_channels_hint: int = 2       # only used for the stem GroupNorm groups
    feature_size: int = 16
    hidden_size: int = 256
    num_heads: int = 4
    depths: Tuple[int, ...] = (3, 3, 3, 3)
    dims: Tuple[int, ...] = (32, 64, 128, 256)
    proj_sizes: Tuple[int, ...] = (64, 64, 64, 32)
    patch_size: Tuple[int, int, int] = (128, 128, 128)
    norm_name: str = "instance"
    do_ds: bool = False
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        p = self.patch_size
        # grid sizes per encoder stage: /4, /8, /16, /32
        grids = [tuple(s // (4 * 2 ** i) for s in p) for i in range(4)]

        # ---- encoder (model_components.py:14-74) ----
        hidden_states = []
        h = x
        for i in range(4):
            if i == 0:
                h = Conv3d(self.dims[0], kernel_size=4, stride=4, use_bias=False,
                           dtype=self.dtype)(h)
                h = GroupNorm(num_groups=min(self.in_channels_hint, self.dims[0]))(h)
            else:
                h = Conv3d(self.dims[i], kernel_size=2, stride=2, use_bias=False,
                           dtype=self.dtype)(h)
                h = GroupNorm(num_groups=self.dims[i - 1])(h)
            n_tokens = _prod(grids[i])
            for _ in range(self.depths[i]):
                h = EPABlock(
                    input_size=n_tokens,
                    hidden_size=self.dims[i],
                    proj_size=self.proj_sizes[i],
                    num_heads=self.num_heads,
                    dropout_rate=self.dropout_rate,
                    pos_embed=True,
                    dtype=self.dtype,
                )(h, train=train)
            hidden_states.append(h)

        enc1, enc2, enc3, enc4 = hidden_states

        # full-resolution conv branch (unetr_pp.py:62-70)
        conv_block = UnetResBlock(
            out_channels=self.feature_size, kernel_size=3, stride=1,
            norm_name=self.norm_name, use_bias=False, dtype=self.dtype,
        )(x, train=train)

        # ---- decoders (model_components.py:77-148, unetr_pp.py:71-110) ----
        def up_epa(inp, skip, out_ch, grid, proj_size):
            out = ConvTranspose3d(out_ch, kernel_size=2, stride=2, use_bias=False,
                                  dtype=self.dtype)(inp)
            out = out + skip
            n_tokens = _prod(grid)
            for _ in range(3):
                out = EPABlock(
                    input_size=n_tokens,
                    hidden_size=out_ch,
                    proj_size=proj_size,
                    num_heads=self.num_heads,
                    dropout_rate=0.1,
                    pos_embed=True,
                    dtype=self.dtype,
                )(out, train=train)
            return out

        dec3 = up_epa(enc4, enc3, self.feature_size * 8, grids[2], 64)
        dec2 = up_epa(dec3, enc2, self.feature_size * 4, grids[1], 64)
        dec1 = up_epa(dec2, enc1, self.feature_size * 2, grids[0], 64)

        # final decoder: 4x transposed conv + conv residual block
        out = ConvTranspose3d(self.feature_size, kernel_size=4, stride=4,
                              use_bias=False, dtype=self.dtype)(dec1)
        out = out + conv_block
        out = UnetResBlock(
            out_channels=self.feature_size, kernel_size=3, stride=1,
            norm_name=self.norm_name, use_bias=False, dtype=self.dtype,
        )(out, train=train)

        logits = Conv3d(self.out_channels, kernel_size=1, use_bias=True,
                        dtype=self.dtype)(out)
        if self.do_ds:
            ds2 = Conv3d(self.out_channels, kernel_size=1, use_bias=True,
                         dtype=self.dtype)(dec1)
            ds3 = Conv3d(self.out_channels, kernel_size=1, use_bias=True,
                         dtype=self.dtype)(dec2)
            return [logits, ds2, ds3]
        return logits
